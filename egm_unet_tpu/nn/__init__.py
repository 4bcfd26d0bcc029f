"""Neural-net building blocks (flax.linen, NHWC, bf16-ready)."""

from egm_unet_tpu.nn.layers import (  # noqa: F401
    BasicConv,
    Conv,
    DoubleConv,
    EdgeAwareFeatureEnhancer,
    torch_bias_init,
    torch_kernel_init,
)
from egm_unet_tpu.nn.attention import (  # noqa: F401
    ChannelAttention,
    MCAGate,
    MCALayer,
    RecursiveGatedAttention,
    SpatialAttention,
)
from egm_unet_tpu.nn.grfb import GRFB, EdgeEnhancedGRFB, FusionConv  # noqa: F401
