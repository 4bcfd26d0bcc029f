"""Core tensor ops: NHWC convolution wrappers, pooling, resize, stencils.

All ops use NHWC activations and HWIO kernels (TPU-native layouts; the MXU
consumes the channel-contraction directly without transposes). The PyTorch
reference is NCHW/OIHW — converters live in ``egm_unet_tpu.utils.convert``.
"""

from egm_unet_tpu.ops.conv import (  # noqa: F401
    conv2d,
    conv_transpose2d_nonoverlap,
    depthwise_conv2d,
)
from egm_unet_tpu.ops.pooling import (  # noqa: F401
    avg_pool2d,
    global_avg_pool,
    global_max_pool,
    global_std_pool,
    max_pool2d,
    min_pool2d,
)
from egm_unet_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear_align_corners,
)
from egm_unet_tpu.ops.stencil import (  # noqa: F401
    LAPLACE4,
    LAPLACE8,
    SOBEL_X,
    SOBEL_Y,
    stencil2d,
)
from egm_unet_tpu.ops.fft import fft_magnitude_enhance  # noqa: F401
from egm_unet_tpu.ops.shuffle import channel_shuffle  # noqa: F401
