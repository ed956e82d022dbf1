"""DLA-34 backbone with deformable-conv iterative deep aggregation neck.

Ground-up flax/linen re-implementation of the reference backbone
(reference: model/backbone/dla_dcn.py:20-452): DLA-34 trunk (7x7 stem + 6
levels with recursive Tree/Root aggregation, levels [1,1,1,2,2,1], channels
[16,32,64,128,256,512]), then DLAUp + IDAUp where every projection/node conv
is a 3x3 DCNv2 and every upsample is a bilinear-initialised depthwise
transposed conv.  Output: one stride-4, 64-channel NHWC feature map.

TPU-first choices: NHWC layout throughout (XLA's preferred conv layout),
BatchNorm statistics over the global (sharded) batch so data-parallel
training gets synchronized BN for free under GSPMD, and the DCN expressed as
gather+matmul (see ops/dcn.py) or a Pallas kernel.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.dcn import modulated_deform_conv, modulated_deform_conv_shift

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (torch uses 0.1)


class ConvBnRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=1e-5, dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=1e-5, dtype=self.dtype)(out)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual bottleneck (reference:
    model/backbone/dlav0.py:59-97; expansion fixed at 2 by every deep-DLA
    constructor there)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        mid = self.planes // self.expansion
        out = ConvBnRelu(mid, kernel=1, dtype=self.dtype)(x, train=train)
        out = ConvBnRelu(mid, stride=self.stride, dilation=self.dilation,
                         dtype=self.dtype)(out, train=train)
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=1e-5, dtype=self.dtype)(out)
        return nn.relu(out + residual)


class BottleneckX(nn.Module):
    """ResNeXt-style grouped bottleneck (reference:
    model/backbone/dlav0.py:100-141; cardinality 32, 64 for dla102x2)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        mid = self.planes * self.cardinality // 32
        out = ConvBnRelu(mid, kernel=1, dtype=self.dtype)(x, train=train)
        pad = self.dilation
        out = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                      padding=[(pad, pad), (pad, pad)],
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=self.cardinality,
                      use_bias=False, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=1e-5, dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=1e-5, dtype=self.dtype)(out)
        return nn.relu(out + residual)


def _make_block(block: str, planes: int, stride: int, cardinality: int,
                dtype) -> nn.Module:
    if block == "basic":
        return BasicBlock(planes, stride, dtype=dtype)
    if block == "bottleneck":
        return Bottleneck(planes, stride, dtype=dtype)
    if block == "bottleneckx":
        return BottleneckX(planes, stride, cardinality=cardinality, dtype=dtype)
    raise ValueError(f"unknown DLA block {block!r}")


class Root(nn.Module):
    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: List[jnp.ndarray], train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(
            jnp.concatenate(children, axis=-1))
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=self.dtype)(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    block: str = "basic"            # basic | bottleneck | bottleneckx
    cardinality: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        root_dim = self.root_dim or 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        children = [] if children is None else list(children)
        bottom = nn.max_pool(x, (self.stride, self.stride),
                             strides=(self.stride, self.stride)) if self.stride > 1 else x
        if self.in_channels != self.out_channels:
            proj = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                           dtype=self.dtype)(bottom)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=BN_MOMENTUM, epsilon=1e-5,
                                    dtype=self.dtype)(proj)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = _make_block(self.block, self.out_channels, self.stride,
                             self.cardinality, self.dtype)(x, residual,
                                                           train=train)
            x2 = _make_block(self.block, self.out_channels, 1,
                             self.cardinality, self.dtype)(x1, train=train)
            return Root(self.out_channels, self.root_residual,
                        dtype=self.dtype)([x2, x1] + children, train=train)

        x1 = Tree(self.levels - 1, self.in_channels, self.out_channels,
                  self.stride, root_residual=self.root_residual,
                  block=self.block, cardinality=self.cardinality,
                  dtype=self.dtype)(x, residual, train=train)
        children.append(x1)
        return Tree(self.levels - 1, self.out_channels, self.out_channels,
                    root_dim=root_dim + self.out_channels,
                    root_residual=self.root_residual,
                    block=self.block, cardinality=self.cardinality,
                    dtype=self.dtype)(x1, children=children, train=train)


class DLA(nn.Module):
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    residual_root: bool = False
    block: str = "basic"
    cardinality: int = 32
    dtype: Any = jnp.float32
    packed_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        ch = self.channels
        x = x.astype(self.dtype)
        B, H, W, Cin = x.shape
        if (self.packed_stem and self.levels[0] == 1 and self.levels[1] == 1
                and H % 2 == 0 and W % 2 == 0):
            return self._packed_call(x, train)

        # stem: 7x7 stride-1
        x = nn.Conv(ch[0], (7, 7), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)

        outputs = []
        # level0 / level1: plain conv levels
        y = x
        for _ in range(self.levels[0]):
            y = ConvBnRelu(ch[0], dtype=self.dtype)(y, train=train)
        outputs.append(y)
        for i in range(self.levels[1]):
            y = ConvBnRelu(ch[1], stride=2 if i == 0 else 1,
                           dtype=self.dtype)(y, train=train)
        outputs.append(y)
        return self._trees(y, outputs, train)

    def _packed_call(self, x, train: bool) -> List[jnp.ndarray]:
        """Space-to-depth stem (ops/packed_stem.py): identical math to the
        unpacked branch with an identical parameter tree, but every
        full-resolution conv runs at half resolution with phases packed into
        channels (MXU-shaped contractions, no full-res intermediates; the
        full-res level0 output is unpacked lazily and DCE'd when unused)."""
        from .packed_stem import (PackedConvBnRelu, PackedDownConvBnRelu,
                                  bn_relu_packed, depth_to_space,
                                  pack_kernel, space_to_depth)
        from .packed_stem import _Kernel

        ch = self.channels
        cin = x.shape[-1]
        xp = space_to_depth(x)
        w7 = _Kernel((7, 7, cin, ch[0]), name="Conv_0")()
        y = jax.lax.conv_general_dilated(
            xp, pack_kernel(w7.astype(self.dtype), Kp=5, phases_out=True),
            window_strides=(1, 1), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bn = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                          epsilon=1e-5, dtype=self.dtype, name="BatchNorm_0")
        y = bn_relu_packed(y, ch[0], bn)

        outputs = []
        y = PackedConvBnRelu(ch[0], ch[0], BN_MOMENTUM, dtype=self.dtype,
                             name="ConvBnRelu_0")(y, train=train)
        outputs.append(depth_to_space(y))
        y = PackedDownConvBnRelu(ch[1], ch[0], BN_MOMENTUM, dtype=self.dtype,
                                 name="ConvBnRelu_1")(y, train=train)
        outputs.append(y)
        return self._trees(y, outputs, train)

    def _trees(self, y, outputs: List[jnp.ndarray], train: bool
               ) -> List[jnp.ndarray]:
        ch = self.channels
        # levels 2-5: aggregation trees
        for lv in range(2, 6):
            y = Tree(self.levels[lv], ch[lv - 1], ch[lv], 2,
                     level_root=(lv != 2),
                     root_residual=self.residual_root, block=self.block,
                     cardinality=self.cardinality,
                     dtype=self.dtype)(y, train=train)
            outputs.append(y)
        return outputs


def _kaiming_uniform_dcn(key, shape, dtype=jnp.float32):
    """The reference DCNv2 weight reset: uniform(-s, s), s = 1/sqrt(fan_in)
    (reference: model/backbone/DCNv2/dcn_v2.py reset_parameters)."""
    fan_in = shape[0] * shape[1] * shape[2]
    s = 1.0 / math.sqrt(fan_in)
    return nn.initializers.uniform(scale=2 * s)(key, shape, dtype) - s


class DCN(nn.Module):
    """Deformable conv whose offsets/masks come from a zero-initialised conv
    on the same input (reference: model/backbone/DCNv2/dcn_v2.py:97-128).

    ``impl``: "shift" (gather-free, TPU-fast, offsets bounded by max_offset),
    "gather" (exact XLA gather path, unbounded offsets, slow on TPU).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    impl: str = "shift"
    max_offset: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, epilogue_scale=None, epilogue_shift=None):
        k = self.kernel * self.kernel
        om = nn.Conv(3 * k, (self.kernel, self.kernel),
                     strides=(self.stride, self.stride),
                     padding=[(self.padding,) * 2] * 2,
                     kernel_dilation=(self.dilation,) * 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype)(x)
        o1, o2, mask_logits = jnp.split(om.astype(jnp.float32), 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = nn.sigmoid(mask_logits)
        # observability for the offset-clamp study (tools/offset_stats.py):
        # inert unless the caller requests mutable=["intermediates"]
        self.sow("intermediates", "offset", offset)

        cin = x.shape[-1]
        weight = self.param("kernel", _kaiming_uniform_dcn,
                            (self.kernel, self.kernel, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        simple_geom = (self.stride == 1 and self.dilation == 1 and self.kernel == 3)
        if self.impl in ("pallas3", "pallas3b") and simple_geom:
            from ...ops.dcn_pallas_v3 import dcn_pallas_v3, dcn_pallas_v3_vjp

            # third-generation layout (C on sublanes, W on lanes): the hat-map
            # application becomes a sublane broadcast instead of the v2
            # lane->sublane relayout that ate 82% of the v2 kernel
            # (docs/DESIGN.md round-3 ablation; 4.4x at the hot shape).
            # "pallas3b" ships x in bf16 (halved relayout+DMA bytes; window
            # math stays f32 — exact on the bf16-quantized input).
            transfer = jnp.bfloat16 if self.impl == "pallas3b" else None
            if epilogue_scale is not None:
                # eval-only fused BN+ReLU epilogue (no VJP: inference path);
                # the conv bias folds into the shift
                return dcn_pallas_v3(
                    x.astype(jnp.float32), offset, mask, weight, None,
                    max_offset=self.max_offset, transfer_dtype=transfer,
                    epilogue=(epilogue_scale,
                              epilogue_shift + bias * epilogue_scale))
            return dcn_pallas_v3_vjp(x.astype(jnp.float32), offset, mask,
                                     weight, bias, self.max_offset, transfer)
        if epilogue_scale is not None:
            raise ValueError("epilogue fusion requires a pallas3 impl with "
                             "3x3/stride-1/dilation-1 geometry")
        if self.impl in ("pallas2", "pallas2p") and simple_geom:
            from ...ops.dcn_pallas_v2 import dcn_pallas_v2_vjp

            # kernel window math stays f32 even under a bf16 model (bf16
            # windows were not a measured win and the downstream BN casts
            # back to the model dtype); "pallas2p" additionally lane-packs
            # two pixels per 128-lane tile on C=Co=64 layers (docs/DESIGN.md)
            return dcn_pallas_v2_vjp(x.astype(jnp.float32), offset, mask,
                                     weight, bias, self.max_offset,
                                     self.impl == "pallas2p")
        if self.impl == "pallas" and simple_geom:
            from ...ops.dcn_pallas_bwd import dcn_pallas_vjp

            return dcn_pallas_vjp(x.astype(jnp.float32), offset, mask, weight,
                                  bias, self.max_offset)
        if self.impl == "shift" and simple_geom:
            return modulated_deform_conv_shift(x, offset, mask, weight, bias,
                                               max_offset=self.max_offset)
        return modulated_deform_conv(
            x, offset, mask, weight, bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation)


# Eval-time BN+ReLU epilogue fusion into the v3 Pallas DCN kernels
# (TPU.DCN_FUSE_BN_RELU; build_backbone calls set_fuse_bn_relu).  Same
# set-at-build-time pattern as ops.dcn_pallas_v3.set_dx_kernel.
_FUSE_BN_RELU = False


def set_fuse_bn_relu(enabled: bool) -> None:
    global _FUSE_BN_RELU
    _FUSE_BN_RELU = bool(enabled)


class _BNParams(nn.Module):
    """Declares BatchNorm's exact param/stat tree WITHOUT applying it, so
    the eval-fused path can fold scale/bias/mean/var into the DCN kernel
    epilogue while staying checkpoint-compatible with nn.BatchNorm."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class DeformConvBlock(nn.Module):
    """DCN -> BN -> ReLU (reference: model/backbone/dla_dcn.py:384-396).

    dcn_impl == "none" swaps in a plain 3x3 conv (the reference's no-DCN
    dlav0 variant, model/backbone/dlav0.py:534)."""

    features: int
    dcn_impl: str = "shift"
    max_offset: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dcn_impl == "none":
            x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype)(x)
        elif (not train and _FUSE_BN_RELU
              and self.dcn_impl in ("pallas3", "pallas3b")):
            # fold eval-BN + ReLU into the kernel's output write:
            # bn(y) = y*a + b with a = scale/sqrt(var+eps),
            # b = bias - mean*a; the conv bias folds into b as bias_c*a
            scale, bias, mean, var = _BNParams(self.features,
                                               name="BatchNorm_0")()
            a = scale * jax.lax.rsqrt(var + 1e-5)
            b = bias - mean * a
            return DCN(self.features, impl=self.dcn_impl,
                       max_offset=self.max_offset, dtype=self.dtype)(
                x, epilogue_scale=a, epilogue_shift=b).astype(self.dtype)
        else:
            x = DCN(self.features, impl=self.dcn_impl,
                    max_offset=self.max_offset, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


def _bilinear_upsample_init(key, shape, dtype=jnp.float32):
    """Bilinear kernel for depthwise transposed conv
    (reference: model/backbone/dla_dcn.py:372-381)."""
    kh, kw, _, c = shape  # HWIO with I=1 (depthwise)
    f = math.ceil(kh / 2)
    center = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((kh, kw), dtype=np.float32)
    for i in range(kh):
        for j in range(kw):
            w[i, j] = (1 - abs(i / f - center)) * (1 - abs(j / f - center))
    return jnp.asarray(np.tile(w[:, :, None, None], (1, 1, 1, c)), dtype)


class BilinearUp(nn.Module):
    """Depthwise transposed conv, kernel 2f, stride f, pad f/2 (trainable,
    bilinear-initialised; reference: model/backbone/dla_dcn.py:372-381).

    Two identical-math implementations, pinned to the torch ConvTranspose2d
    oracle by tests/test_op_golden.py:

    - "dilated" (default): lhs-dilated depthwise conv on XLA's conv path.
    - "phase": exact phase decomposition — with kernel 2f/stride f every
      output pixel receives exactly two taps per axis, so phase (a, b) is a
      4-term per-channel weighted sum of shifted x copies, interleaved.

    Device A/B at all 8 flagship call shapes (tools/bilinear_ablate.py,
    trace-timed): dilated wins ~2x everywhere (3.1 vs 6.0 ms per forward
    total) — the phase interleave transpose costs more than the VPU conv it
    replaces, and a full-bench A/B agreed (96.4 vs 99+ img/s)."""

    factor: int
    impl: str = "dilated"            # "dilated" | "phase" — identical math

    @nn.compact
    def __call__(self, x):
        f = self.factor
        B, H, W, c = x.shape
        kernel = self.param("kernel", _bilinear_upsample_init, (2 * f, 2 * f, 1, c))
        if self.impl == "dilated":
            # conv_transpose(stride f, k=2f, pad=f/2) == lhs-dilated conv with
            # the spatially flipped kernel and padding k-1-f/2 per side
            pad = 2 * f - 1 - f // 2
            return jax.lax.conv_general_dilated(
                x, kernel[::-1, ::-1].astype(x.dtype),
                window_strides=(1, 1),
                padding=[(pad, pad), (pad, pad)],
                lhs_dilation=(f, f),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
        # ConvTranspose2d: out[y] = sum_i x[i] * K[y + p - f*i], 0 <= y+p-f*i < 2f.
        # For y = f*m + a: the two valid taps are t = r_a and t = r_a + f with
        # r_a = (a+p) % f, sources m + e_a and m + e_a - 1, e_a = (a+p) // f.
        p = f // 2
        k = kernel.astype(x.dtype)[:, :, 0, :]              # (2f, 2f, C)
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # zero borders

        def sh(dy, dx):
            return xpad[:, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W, :]

        rows = []
        for a in range(f):
            ra, ea = (a + p) % f, (a + p) // f
            cols = []
            for b in range(f):
                rb, eb = (b + p) % f, (b + p) // f
                cols.append(k[ra, rb] * sh(ea, eb)
                            + k[ra, rb + f] * sh(ea, eb - 1)
                            + k[ra + f, rb] * sh(ea - 1, eb)
                            + k[ra + f, rb + f] * sh(ea - 1, eb - 1))
            rows.append(jnp.stack(cols, axis=0))
        out = jnp.stack(rows, axis=0)                        # (f, f, B, H, W, C)
        return out.transpose(2, 3, 0, 4, 1, 5).reshape(B, f * H, f * W, c)


class IDAUp(nn.Module):
    """Iterative deep aggregation over a pyramid slice
    (reference: model/backbone/dla_dcn.py:399-425)."""

    out_channels: int
    up_factors: Sequence[int]
    dcn_impl: str = "shift"
    dcn_max_offset: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        layers = list(layers)
        for i in range(1, len(layers)):
            f = int(self.up_factors[i])
            proj = DeformConvBlock(self.out_channels, dcn_impl=self.dcn_impl,
                                   max_offset=self.dcn_max_offset,
                                   dtype=self.dtype,
                                   name=f"proj_{i}")(layers[i], train=train)
            up = BilinearUp(f, name=f"up_{i}")(proj) if f > 1 else proj
            layers[i] = DeformConvBlock(self.out_channels, dcn_impl=self.dcn_impl,
                                        max_offset=self.dcn_max_offset,
                                        dtype=self.dtype,
                                        name=f"node_{i}")(
                up + layers[i - 1], train=train)
        return layers


class DLAUp(nn.Module):
    """Full pyramid aggregation: repeatedly merge the deepest levels upward
    (reference: model/backbone/dla_dcn.py:429-452)."""

    channels: Sequence[int]          # channels of the input pyramid slice
    scales: Sequence[int]
    dcn_impl: Any = "shift"          # one impl, or a per-stage tuple
    dcn_max_offsets: Sequence[int] = (2, 2, 2)   # per ida stage, deepest first
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        layers = list(layers)
        channels = list(self.channels)
        scales = np.array(self.scales, dtype=int)
        impls = (list(self.dcn_impl) if isinstance(self.dcn_impl, (tuple, list))
                 else [self.dcn_impl] * (len(layers) - 1))
        out = [layers[-1]]
        for i in range(len(layers) - 1):
            j = -i - 2
            ida = IDAUp(channels[j], (scales[j:] // scales[j]).tolist(),
                        dcn_impl=impls[i],
                        dcn_max_offset=int(self.dcn_max_offsets[i]),
                        dtype=self.dtype, name=f"ida_{i}")
            merged = ida(layers[j:], train=train)
            layers[j:] = merged
            scales[j + 1:] = scales[j]
            channels[j + 1:] = [channels[j]] * len(channels[j + 1:])
            out.insert(0, layers[-1])
        return out


class DLASeg(nn.Module):
    """Backbone entry: DLA trunk -> DLAUp -> final IDAUp -> stride-4 map
    (reference: model/backbone/dla_dcn.py:30-58)."""

    down_ratio: int = 4
    last_level: int = 5
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    dcn_impl: str = "shift"
    # optional per-stage impl override (same stage order as dcn_max_offsets):
    # e.g. ("gather", "pallas", "pallas", "pallas") runs the exact gather on
    # the tiny coarse maps (where unbounded-trained offsets roam far) and the
    # fast bounded kernel on the expensive fine maps
    dcn_impls: Any = None            # Optional[Tuple[str, str, str, str]]
    dcn_max_offset: int = 2
    # optional per-stage clamp (ida_0 = deepest merge, ida_1, ida_2, final
    # ida_up): the measured offset distributions (docs/DESIGN.md) are an
    # order of magnitude wider on the coarse stages, whose tiny maps make a
    # larger window nearly free
    dcn_max_offsets: Any = None      # Optional[Tuple[int, int, int, int]]
    dtype: Any = jnp.float32
    remat: bool = False
    packed_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        first_level = int(math.log2(self.down_ratio))
        # rematerialize the trunk in backward (jax.checkpoint): its plain
        # convs are cheap to recompute and its activations dominate HBM at
        # the flagship 384x1280/batch-8 config (cfg.TPU.REMAT_BACKBONE)
        trunk_cls = (nn.remat(DLA, static_argnums=(2,)) if self.remat else DLA)
        feats = trunk_cls(self.levels, self.channels, dtype=self.dtype,
                          packed_stem=self.packed_stem, name="base")(x, train)
        # neck runs in the compute dtype; the Pallas DCN kernel accumulates
        # f32 either way and picks bf16 window math when fed bf16
        feats = [f.astype(self.dtype) for f in feats]

        n_stages = len(self.channels[first_level:])  # DLAUp stages + ida_up
        rs = (tuple(self.dcn_max_offsets) if self.dcn_max_offsets
              else (self.dcn_max_offset,) * n_stages)
        impls = (tuple(self.dcn_impls) if self.dcn_impls
                 else (self.dcn_impl,) * n_stages)

        ch = list(self.channels[first_level:])
        scales = [2 ** i for i in range(len(ch))]
        pyramid = DLAUp(ch, scales, dcn_impl=impls[:-1],
                        dcn_max_offsets=rs[:-1], dtype=self.dtype,
                        name="dla_up")(feats[first_level:], train=train)

        n_final = self.last_level - first_level
        y = [pyramid[i] for i in range(n_final)]
        y = IDAUp(self.channels[first_level],
                  [2 ** i for i in range(n_final)], dcn_impl=impls[-1],
                  dcn_max_offset=rs[-1], dtype=self.dtype,
                  name="ida_up")(y, train=train)
        return y[-1]


def default_dcn_impl(use_pallas: bool = True, kernel_version: int = 1) -> str:
    """Platform-appropriate DCN implementation: the Pallas kernel on TPU, the
    exact XLA gather path elsewhere (CPU/GPU gathers are fine)."""
    if jax.default_backend() == "tpu":
        if use_pallas:
            # v3 default ships x in bf16 (pallas3b): device-validated exact
            # parity vs the f32 kernel on the bf16-quantized input across all
            # 8 model shapes, 7-15% faster (halved relayout+DMA bytes), and
            # the synthetic accuracy gate is unchanged (3d@0.5 moderate
            # 42.26 vs 42.24 f32; docs/DESIGN.md round-4)
            return {1: "pallas", 2: "pallas2", 3: "pallas3b"}[kernel_version]
        return "shift"
    return "gather"


N_DCN_STAGES = 4  # ida_0 (deepest merge), ida_1, ida_2, final ida_up


def resolve_dcn_stages(cfg):
    """The (impls, max_offsets) each of the 4 neck stages will actually use,
    after DCN_FORCE_IMPL / DCN_IMPL_PER_STAGE / platform defaults resolve."""
    body = cfg.MODEL.BACKBONE.CONV_BODY
    if body == "dla34_nodcn" or body.startswith("dlav0"):
        impl = "none"
    else:
        impl = (cfg.TPU.DCN_FORCE_IMPL
                or default_dcn_impl(cfg.TPU.USE_PALLAS_DCN,
                                    cfg.TPU.DCN_KERNEL_VERSION))
    impls = (tuple(cfg.TPU.DCN_IMPL_PER_STAGE)
             or (impl,) * N_DCN_STAGES)
    rs = (tuple(cfg.TPU.DCN_MAX_OFFSET_PER_STAGE)
          or (cfg.TPU.DCN_MAX_OFFSET,) * N_DCN_STAGES)
    return impls, rs


def build_backbone(cfg):
    body = cfg.MODEL.BACKBONE.CONV_BODY
    set_fuse_bn_relu(getattr(cfg.TPU, "DCN_FUSE_BN_RELU", False))
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    if body == "dlav0" or body.startswith("dlav0_"):
        # the reference's vanilla (no-DCN) family, dla34 ... dla169
        from .dlav0 import DLAV0Seg

        base = body[len("dlav0_"):] if body.startswith("dlav0_") else "dla34"
        return DLAV0Seg(base_name=base,
                        down_ratio=cfg.MODEL.BACKBONE.DOWN_RATIO,
                        dtype=dtype)
    if body == "dla34":
        impl = (cfg.TPU.DCN_FORCE_IMPL
                or default_dcn_impl(cfg.TPU.USE_PALLAS_DCN,
                                    cfg.TPU.DCN_KERNEL_VERSION))
    elif body == "dla34_nodcn":
        # DCN-neck topology with plain 3x3 convs in place of every DCN
        impl = "none"
    else:
        raise NotImplementedError(body)
    per_stage = tuple(cfg.TPU.DCN_MAX_OFFSET_PER_STAGE) or None
    per_stage_impl = tuple(cfg.TPU.DCN_IMPL_PER_STAGE) or None
    return DLASeg(down_ratio=cfg.MODEL.BACKBONE.DOWN_RATIO,
                  dcn_impl=impl,
                  dcn_impls=per_stage_impl,
                  dcn_max_offset=cfg.TPU.DCN_MAX_OFFSET,
                  dcn_max_offsets=per_stage,
                  dtype=dtype,
                  remat=bool(cfg.TPU.REMAT_BACKBONE),
                  packed_stem=bool(cfg.TPU.PACKED_STEM))
