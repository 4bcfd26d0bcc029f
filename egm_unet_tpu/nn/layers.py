"""Basic conv blocks (flax.linen, NHWC).

Initialization policy: convs/linears use torch's default
``kaiming_uniform(a=sqrt(5))`` distribution (uniform ±1/sqrt(fan_in)) so
from-scratch training dynamics track the reference; expressed in JAX as
``variance_scaling(1/3, 'fan_in', 'uniform')``.

BatchNorm momentum translation: torch updates
``ra = (1-m)*ra + m*batch`` while flax uses ``ra = m*ra + (1-m)*batch``, so
flax momentum = 1 - torch momentum (torch 0.1 -> 0.9 here; BasicConv's
torch 0.01 -> 0.99, ref: src/EGM-UNet.py:966).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv(nn.Module):
    """Conv2d with integer symmetric padding, torch-style defaults."""

    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int = 1
    padding: int | Sequence[int] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (
            self.kernel_size, self.kernel_size)
        p = self.padding if isinstance(self.padding, (tuple, list)) else (
            self.padding, self.padding)
        fan_in = (x.shape[-1] // self.groups) * k[0] * k[1]
        conv = nn.Conv(
            features=self.features,
            kernel_size=tuple(k),
            strides=(self.stride, self.stride),
            padding=(
                (int(p[0]), int(p[0])),
                (int(p[1]), int(p[1])),
            ),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=lambda key, shape, dtype=jnp.float32: torch_bias_init(
                key, shape, dtype, fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

        from egm_unet_tpu.ops.quant import current_quant_mode

        mode = current_quant_mode()
        if mode == "calibrate":
            # full-precision forward, recording this conv input's abs-max
            # into the quant_stats collection (ops/quant.py
            # calibrate_quant_scales turns it into static act_scales)
            self.sow("quant_stats", "act_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.asarray(0.0, jnp.float32))
            return conv(x)
        if mode in ("int8", "int8full"):
            # serving-only int8 path (ops/quant.py): same param tree — the
            # dummy call materializes the nn.Conv params, XLA removes it.
            # A calibrated static act_scale (quant_scales collection) lets
            # XLA fuse the quantize into the producer; absent that, the
            # scale is computed dynamically per input.
            from egm_unet_tpu.ops.quant import int8_conv

            _ = conv(jnp.zeros((1, k[0] + 2, k[1] + 2, x.shape[-1]), x.dtype))
            params = conv.variables["params"]
            act_scale = (self.get_variable("quant_scales", "act_scale")
                         if self.has_variable("quant_scales", "act_scale")
                         else None)
            return int8_conv(
                x, params["kernel"], params.get("bias"),
                stride=(self.stride, self.stride),
                padding=((int(p[0]), int(p[0])), (int(p[1]), int(p[1]))),
                dilation=(self.dilation, self.dilation),
                groups=self.groups, act_scale=act_scale)
        return conv(x)


class BatchNorm(nn.Module):
    """BN with torch-style momentum argument (see module docstring)."""

    torch_momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.torch_momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class BasicConv(nn.Module):
    """conv -> BN(eps 1e-5, torch momentum 0.01) -> ReLU, each optional.

    ref: src/EGM-UNet.py:958-975.  bias=False by default.

    ``fold_bn=True`` builds the inference-specialized graph: the BN is gone
    and the conv carries a bias instead; pair with
    ``models.fold_bn.fold_bn_variables`` to produce the folded params.
    """

    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int = 1
    padding: int | Sequence[int] = 0
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    bn: bool = True
    use_bias: bool = False
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        folded = self.bn and self.fold_bn
        conv = Conv(self.features, self.kernel_size, self.stride,
                    self.padding, self.dilation, self.groups,
                    self.use_bias or folded, self.dtype)
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) \
            else (self.kernel_size, self.kernel_size)
        p = self.padding if isinstance(self.padding, (tuple, list)) else (
            self.padding, self.padding)
        if (folded and not train and tuple(k) == (3, 3) and self.stride == 1
                and tuple(p) == (1, 1) and self.dilation == 1
                and self.groups == 1):
            y = maybe_conv3x3_gemm(conv, x, self.features, relu=self.relu)
            if y is not None:
                return y
        x = conv(x)
        if self.bn and not folded:
            x = BatchNorm(torch_momentum=0.01, dtype=self.dtype)(x, train)
        if self.relu:
            x = nn.relu(x)
        from egm_unet_tpu.ops.quant import qstore

        # int8-dataflow storage site (ops/quant.py): post-ReLU outputs are
        # non-negative -> uint8; linear outputs -> symmetric int8
        return qstore(self, x, "out", signed=not self.relu)


def maybe_conv3x3_gemm(conv: "Conv", x: jax.Array, features: int,
                       relu: bool):
    """Route a folded-inference 3x3/stride-1/pad-1 conv (+bias, optional
    fused ReLU) through the implicit-GEMM Pallas kernel
    (ops/pallas/conv3x3.py) when ``$EGM_CONV_IMPL=pallas`` and the kernel's
    row-block/channel constraints hold.  Returns None to fall back to XLA.

    Trace-time env switch like EGM_UP_IMPL — a measurement hook first
    (tools/conv_bench.py / PERF.md), a default only if it wins end to end.
    ``$EGM_CONV_SITES`` (comma list of substrings matched against the
    module path, e.g. ``down1/conv2,down2``) further restricts the routing
    to individual call sites so each profiled offender can be measured
    alone.  The conv params come from the same submodule (dummy call
    materializes them; XLA removes the dead op), so checkpoints are
    impl-agnostic.
    """
    import os

    from egm_unet_tpu.ops.quant import current_quant_mode

    if (os.environ.get("EGM_CONV_IMPL", "xla") not in ("pallas", "pallas-both")
            or current_quant_mode() is not None or x.ndim != 4):
        return None
    sites = os.environ.get("EGM_CONV_SITES", "")
    if sites and not any(
            s and s in "/".join(conv.scope.path) for s in sites.split(",")):
        return None
    from egm_unet_tpu.ops.pallas.conv3x3 import (conv3x3_gemm,
                                                 conv3x3_gemm_supported)

    if not conv3x3_gemm_supported(x.shape, features, x.dtype):
        return None
    _ = conv(jnp.zeros((1, 5, 5, x.shape[-1]), x.dtype))
    params = conv.variables["params"]["Conv_0"]
    return conv3x3_gemm(x, params["kernel"].astype(x.dtype), params["bias"],
                        relu=relu)


def site_barrier(module: nn.Module, x: jax.Array, tag: str,
                 env: str = "EGM_CBR_BARRIER") -> jax.Array:
    """Per-site producer-materialization experiment switch.

    ``$EGM_CBR_BARRIER`` is a comma list of substrings matched against this
    call site's ``<module path>:<tag>`` (e.g. ``down1/conv1:out``), or
    ``all``.  A match inserts ``lax.optimization_barrier`` so the value is
    materialized once instead of being re-evaluated inside each window tap
    of a consumer conv (the round-2 profile showed such fused producers push
    encoder convs 2-4x off roofline; PERF.md).  Off by default — purely a
    measurement hook, read at trace time like EGM_MCA_BARRIER."""
    import os

    spec = os.environ.get(env, "")
    if not spec:
        return x
    path = "/".join(module.scope.path) + ":" + tag
    if spec == "all" or any(s and s in path for s in spec.split(",")):
        return jax.lax.optimization_barrier(x)
    return x


def pad_to_match(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Zero-pad x1 spatially to x2's H/W (ref: src/unet.py:40-44 /
    src/EGM-UNet.py:940-945).  Shapes are static under jit."""
    dy = x2.shape[1] - x1.shape[1]
    dx = x2.shape[2] - x1.shape[2]
    if dy == 0 and dx == 0:
        return x1
    return jnp.pad(
        x1, ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0))
    )


class ConvBNReLU(nn.Module):
    """conv3x3(pad 1, no bias) -> BN(default momentum) -> ReLU — one half of
    DoubleConv (ref: src/EGM-UNet.py:44-55).  ``fold_bn``: see BasicConv.

    ``up_pair=(x2, x1)`` runs the decoder-stage form
    relu(conv3x3(concat([x2, up2x(x1)]))) with the upsample+concat INSIDE
    this module: under ``nn.remat`` the saved residuals are then the small
    (x2, x1) pair rather than the full-width concat — the decoder concat
    temporaries were exactly what OOM'd bs-128 training (PERF.md round 2).
    On folded graphs with ``up_impl='pallas'`` it instead calls the fused
    Pallas kernel (ops/pallas/upconv.py).  The param tree is identical in
    every mode — the same Conv submodule provides the kernel/bias.
    """

    features: int
    dtype: Any = jnp.float32
    fold_bn: bool = False
    up_impl: Optional[str] = None  # None = respect $EGM_UP_IMPL

    @nn.compact
    def __call__(self, x, train: bool = False, *, up_pair=None):
        import os

        conv = Conv(self.features, 3, padding=1, use_bias=self.fold_bn,
                    dtype=self.dtype)
        if up_pair is not None:
            x2, x1 = up_pair
            impl = self.up_impl or os.environ.get("EGM_UP_IMPL", "xla")
            # the fused kernel pads channels to a 128 multiple on real TPUs
            # (ops/pallas/upconv.py DMA alignment) — at up3/up4 (C=64/32,
            # large maps) that 2-4x HBM blowup OOMs; only take aligned stages
            lanes_ok = (jax.default_backend() != "tpu"
                        or (x1.shape[-1] % 128 == 0 and x2.shape[-1] % 128 == 0))
            if (self.fold_bn and not train and impl == "pallas" and lanes_ok
                    and x2.shape[1] == 2 * x1.shape[1]
                    and x2.shape[2] == 2 * x1.shape[2]):
                cin = x2.shape[-1] + x1.shape[-1]
                # materialize the conv's (identical) params without running
                # it; the dummy op is dead code XLA removes
                _ = conv(jnp.zeros((1, 3, 3, cin), x1.dtype))
                p = conv.variables["params"]["Conv_0"]

                from egm_unet_tpu.ops.pallas.upconv import up_concat_conv

                return up_concat_conv(x2, x1, p["kernel"], p["bias"])

            from egm_unet_tpu.ops.resize import upsample2x_bilinear_align_corners

            x1 = upsample2x_bilinear_align_corners(x1)
            if os.environ.get("EGM_UP_BARRIER", "0") == "1":
                # materialize the resize result so XLA can't fuse the resize
                # matmuls into the consumer conv's operand (experiment
                # switch, like EGM_MCA_BARRIER; see PERF.md)
                x1 = jax.lax.optimization_barrier(x1)
            x1 = pad_to_match(x1, x2)
            if (self.fold_bn and not train
                    and os.environ.get("EGM_UP_SPLIT", "0") == "1"):
                # split-conv decoder: conv(cat([x2, x1]), W) ==
                # conv(x2, W[:, :, :c2]) + conv(x1, W[:, :, c2:]) — the
                # full-width concat tensor is never stored; the two partial
                # convs read the (possibly int8-stored) operands directly
                # and their accumulators add in one fusion.  Exact (same
                # linear operator), measurement knob like EGM_UP_IMPL.
                from egm_unet_tpu.ops.conv import conv2d
                from egm_unet_tpu.ops.quant import qstore

                cin = x2.shape[-1] + x1.shape[-1]
                _ = conv(jnp.zeros((1, 3, 3, cin), x1.dtype))
                p = conv.variables["params"]["Conv_0"]
                k = p["kernel"].astype(x1.dtype)
                c2 = x2.shape[-1]
                y = (conv2d(x2, k[:, :, :c2], padding=1)
                     + conv2d(x1, k[:, :, c2:], padding=1)
                     + p["bias"].astype(x1.dtype))
                return site_barrier(self, qstore(self, nn.relu(y), "out"),
                                    "out")
            x = jnp.concatenate([x2, x1], axis=-1)
        if self.fold_bn and not train:
            y = maybe_conv3x3_gemm(conv, x, self.features, relu=True)
            if y is not None:
                return site_barrier(self, y, "out")
        x = conv(x)
        if not self.fold_bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        from egm_unet_tpu.ops.quant import qstore

        return site_barrier(self, qstore(self, nn.relu(x), "out"), "out")


class DoubleConv(nn.Module):
    """(conv3x3 BN ReLU) x2 with optional mid width
    (ref: src/EGM-UNet.py:44-55, src/unet.py:7-19).

    ``fine_remat`` checkpoints each ConvBNReLU individually (explicit names
    keep the param tree identical), so a decoder stage's backward holds one
    conv-wide temporary at a time instead of the whole stage — the last
    memory cliff between bs-64 and bs-128 training at 480px."""

    features: int
    mid_features: Optional[int] = None
    dtype: Any = jnp.float32
    fold_bn: bool = False
    up_impl: Optional[str] = None
    fine_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, *, up_pair=None):
        import os

        mid = self.mid_features or self.features
        CBR = (nn.remat(ConvBNReLU, static_argnums=(2,)) if self.fine_remat
               else ConvBNReLU)
        cbr1 = CBR(mid, self.dtype, fold_bn=self.fold_bn,
                   up_impl=self.up_impl, name="ConvBNReLU_0")
        cbr2 = CBR(self.features, self.dtype, fold_bn=self.fold_bn,
                   name="ConvBNReLU_1")

        if (self.fold_bn and not train
                and os.environ.get("EGM_CONV_IMPL", "xla") in (
                    "pallas-pair", "pallas-both")):
            sites = os.environ.get("EGM_CONV_SITES", "")
            from egm_unet_tpu.ops.pallas.conv3x3 import (
                conv3x3_pair_gemm, conv3x3_pair_supported)
            from egm_unet_tpu.ops.quant import current_quant_mode

            site_ok = (not sites or any(
                s and s in "/".join(self.scope.path)
                for s in sites.split(",")))
            if site_ok and current_quant_mode() is None:
                xc = x
                if (up_pair is not None
                        and up_pair[0].shape[1] == 2 * up_pair[1].shape[1]
                        and up_pair[0].shape[2] == 2 * up_pair[1].shape[2]):
                    # decoder stage: the upsample+concat stay on the XLA
                    # side (exact interpolation-matrix resize); the two
                    # convs consuming the concat fuse into one kernel.
                    x2, x1 = up_pair
                    cat_shape = x2.shape[:-1] + (x2.shape[-1] + x1.shape[-1],)
                    if conv3x3_pair_supported(cat_shape, mid, self.features,
                                              x1.dtype):
                        from egm_unet_tpu.ops.resize import (
                            upsample2x_bilinear_align_corners)

                        xu = upsample2x_bilinear_align_corners(x1)
                        xc = jnp.concatenate([x2, xu], axis=-1)
                if (xc is not None and xc.ndim == 4
                        and conv3x3_pair_supported(xc.shape, mid,
                                                   self.features, xc.dtype)):
                    # fused DoubleConv: both folded convs in one Pallas
                    # program, the conv1 output never touching HBM
                    # (ops/pallas/conv3x3.py conv3x3_pair_gemm).  Params
                    # come from the same submodules (dummy calls; XLA
                    # removes the dead ops).
                    _ = cbr1(jnp.zeros((1, 4, 4, xc.shape[-1]), xc.dtype),
                             False)
                    _ = cbr2(jnp.zeros((1, 4, 4, mid), xc.dtype), False)
                    p1 = cbr1.variables["params"]["Conv_0"]["Conv_0"]
                    p2 = cbr2.variables["params"]["Conv_0"]["Conv_0"]
                    dt = xc.dtype
                    return conv3x3_pair_gemm(
                        xc, p1["kernel"].astype(dt), p1["bias"],
                        p2["kernel"].astype(dt), p2["bias"])

        max_c = int(os.environ.get("EGM_DC_S2D_MAXC", "64"))
        if (self.fold_bn and up_pair is None and not train and x.ndim == 4
                and os.environ.get("EGM_DC_IMPL", "xla") == "s2d"
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and max(x.shape[-1], mid, self.features) <= max_c):
            # space-to-depth rewrite (ops/spacedepth.py): both folded convs
            # run in 2x2-cell space with 4x channels — one relayout pair per
            # block. Params come from the same submodules (dummy calls
            # materialize them; XLA removes the dead ops).
            _ = cbr1(jnp.zeros((1, 4, 4, x.shape[-1]), x.dtype), False)
            _ = cbr2(jnp.zeros((1, 4, 4, mid), x.dtype), False)
            p1 = cbr1.variables["params"]["Conv_0"]["Conv_0"]
            p2 = cbr2.variables["params"]["Conv_0"]["Conv_0"]

            from egm_unet_tpu.ops.spacedepth import double_conv_s2d

            dt = x.dtype
            return double_conv_s2d(x, p1["kernel"].astype(dt),
                                   p1["bias"].astype(dt),
                                   p2["kernel"].astype(dt),
                                   p2["bias"].astype(dt))

        x = cbr1(x, train, up_pair=up_pair)
        x = cbr2(x, train)
        return x


class EdgeAwareFeatureEnhancer(nn.Module):
    """edge = x - AvgPool3x3(x); w = sigmoid(BN(conv1x1(edge)));
    out = w*x + x  (ref: src/EGM-UNet.py:872-886)."""

    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from egm_unet_tpu.ops.pooling import avg_pool2d

        edge = x - avg_pool2d(x, 3, 1, 1)
        w = Conv(x.shape[-1], 1, dtype=self.dtype)(edge)
        if not self.fold_bn:
            w = BatchNorm(dtype=self.dtype)(w, train)
        w = nn.sigmoid(w)
        return w * x + x
