"""Space-to-depth ("packed") DLA stem: the exact same function, MXU-shaped.

The DLA-34 stem runs three convs at (or near) full input resolution with
3-32 channels (reference: model/backbone/dla_dcn.py:91-101 — base_layer 7x7
s1 C16, level0 3x3 s1 C16, level1 3x3 s2 C32).  On TPU those layers are the
single largest inference cost after the DCN neck (14.1 ms of a 90.6 ms
batch-8 iter, round-4 trace): a 7x7 conv with 3 input / 16 output channels
uses ~12% of the MXU's output columns and pays full-resolution HBM traffic
for every intermediate.

This package computes the *identical* math on a 2x2 space-to-depth packing
of the image: every full-resolution conv becomes a half-resolution conv
whose input/output channels carry the four pixel phases (Cx4), so the MXU
sees 12->64, 64->64 and 64->32 contractions on a quarter of the positions,
and no full-resolution tensor is ever materialized (level0's full-res
output is unpacked lazily and dead-code-eliminated when, as in MonoFlex,
only strides >=4 are consumed).  The packed kernels are pure index-relayouts
(with zero padding) of the canonical 7x7x3x16 / 3x3x16x16 / 3x3x16x32
parameters, built inside the forward pass, so the parameter tree,
checkpoints, and the torch weight importer are untouched, and gradients
flow to the canonical weights through the relayout.

Derivation: with output phases a,b in {0,1} and packed taps m,n, output
pixel (2i+a, 2j+b) of a KxK pad-P stride-1 conv reads input rows 2(i+m)+c
where dy = 2m+c-a must lie in [-P, P]; the packed kernel therefore scatters
w[dy+P, dx+P, ci, co] into W'[m+M, n+M, (2c+d)*Cin+ci, (2a+b)*Cout+co].
A stride-2 pad-1 3x3 conv keeps only phase (0,0), becoming a 2x2 packed
conv with top/left padding 1 that emits the half-res output directly in
normal layout.  BatchNorm stays exact by viewing the packed tensor as
(B, H', W', 4, C) and letting flax reduce over the four leading axes
(full-resolution statistics == statistics over all four phases).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel index (2c+d)*C + ci."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth: (B, H', W', 4C) -> (B, 2H', 2W', C)."""
    B, Hp, Wp, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, Hp, Wp, 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * Hp, 2 * Wp, C)


def _packed_indices(K: int, Kp: int, phases_out: bool):
    """Static scatter indices mapping w (K, K, ., .) into the packed kernel.

    Returns (dst, src) int arrays: dst rows (m+M, n+M, in_phase, out_phase),
    src rows (dy+P, dx+P).  phases_out=False builds the stride-2 kernel
    (output phase (0,0) only)."""
    P = (K - 1) // 2
    M = (Kp - 1) // 2 if phases_out else Kp - 1
    dst, src = [], []
    out_phases = ((0, 0), (0, 1), (1, 0), (1, 1)) if phases_out else ((0, 0),)
    for a, b in out_phases:
        for m in range(-M, Kp - M):
            for n in range(-M, Kp - M):
                for c in range(2):
                    for d in range(2):
                        dy = 2 * m + c - a
                        dx = 2 * n + d - b
                        if not (-P <= dy <= P and -P <= dx <= P):
                            continue
                        dst.append((m + M, n + M, 2 * c + d, 2 * a + b))
                        src.append((dy + P, dx + P))
    return np.array(dst, dtype=np.int32), np.array(src, dtype=np.int32)


def pack_kernel(w: jnp.ndarray, Kp: int, phases_out: bool = True) -> jnp.ndarray:
    """Relayout w (K, K, Cin, Cout) into the packed kernel.

    phases_out=True  -> (Kp, Kp, 4*Cin, 4*Cout), stride-1, pad (Kp-1)//2.
    phases_out=False -> (Kp, Kp, 4*Cin, Cout), stride-2 phase-(0,0) kernel;
                        apply with spatial padding (Kp-1, 0) per dim.
    """
    K, _, Cin, Cout = w.shape
    dst, src = _packed_indices(K, Kp, phases_out)
    n_out_phase = 4 if phases_out else 1
    out = jnp.zeros((Kp, Kp, 4 * Cin, n_out_phase * Cout), w.dtype)
    ci = np.arange(Cin)
    co = np.arange(Cout)
    blk_ci = dst[:, 2, None] * Cin + ci[None, :]            # (n, Cin)
    blk_co = dst[:, 3, None] * Cout + co[None, :]           # (n, Cout)
    return out.at[dst[:, 0, None, None], dst[:, 1, None, None],
                  blk_ci[:, :, None], blk_co[:, None, :]].set(
        w[src[:, 0], src[:, 1]])


class _Kernel(nn.Module):
    """Bare conv-kernel parameter holder.  Named so its parameter path
    (<name>/kernel) aliases the nn.Conv the unpacked path would create;
    lecun-normal init matches flax's nn.Conv default."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


def bn_relu_packed(x: jnp.ndarray, real_ch: int, bn: nn.Module) -> jnp.ndarray:
    """Apply a flax BatchNorm (+ReLU) over a packed (B, H', W', 4*C) tensor
    with statistics per REAL channel — bit-equal to full-resolution BN."""
    B, Hp, Wp, _ = x.shape
    x = bn(x.reshape(B, Hp, Wp, 4, real_ch))
    return nn.relu(x).reshape(B, Hp, Wp, 4 * real_ch)


class PackedConvBnRelu(nn.Module):
    """Packed-layout twin of dla.ConvBnRelu for a 3x3 stride-1 conv: packed
    (B,H',W',4C_in) -> packed (B,H',W',4*features).  Parameter tree matches
    ConvBnRelu (Conv_0/kernel (3,3,C_in,features) + BatchNorm_0)."""

    features: int
    in_features: int
    momentum: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = _Kernel((3, 3, self.in_features, self.features), name="Conv_0")()
        wp = pack_kernel(w.astype(self.dtype), Kp=3, phases_out=True)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), wp, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bn = nn.BatchNorm(use_running_average=not train,
                          momentum=self.momentum, epsilon=1e-5,
                          dtype=self.dtype, name="BatchNorm_0")
        return bn_relu_packed(y, self.features, bn)


class PackedDownConvBnRelu(nn.Module):
    """Packed-layout twin of a 3x3 stride-2 ConvBnRelu: packed
    (B,H',W',4C_in) -> UNPACKED half-res (B,H',W',features).  Parameter tree
    matches ConvBnRelu (Conv_0/kernel (3,3,C_in,features) + BatchNorm_0)."""

    features: int
    in_features: int
    momentum: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = _Kernel((3, 3, self.in_features, self.features), name="Conv_0")()
        wp = pack_kernel(w.astype(self.dtype), Kp=2, phases_out=False)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), wp, window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.BatchNorm(use_running_average=not train, momentum=self.momentum,
                         epsilon=1e-5, dtype=self.dtype,
                         name="BatchNorm_0")(y)
        return nn.relu(y)
