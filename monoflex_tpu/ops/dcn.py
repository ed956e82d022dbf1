"""Modulated deformable convolution v2 for TPU (pure-XLA path).

TPU-native re-design of the reference CUDA extension
(reference: model/backbone/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:125,
model/backbone/DCNv2/dcn_v2.py:16-128): instead of an explicit im2col buffer
+ batched GEMM, we express the op as

    bilinear-gather (4 corner gathers, XLA `take_along_axis`)
      -> mask modulation (VPU, fused)
      -> one big matmul over (taps x C_in) (MXU)

which XLA fuses end-to-end; gradients for input / offset / mask / weight /
bias come from autodiff of this graph (the CUDA backward's col2im /
col2im_coord kernels are exactly that transpose).  A hand-tiled Pallas kernel
with the same semantics lives in ``dcn_pallas.py``.

Layouts: NHWC activations, HWIO weights.  Offsets are interleaved per tap
(channel 2k = dy_k, 2k+1 = dx_k) and masks are post-sigmoid, matching the
reference channel contract so checkpoints can be ported.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _sample_grid(h_out: int, w_out: int, kh: int, kw: int, stride: int,
                 padding: int, dilation: int):
    """Static base sampling positions: (h_out, w_out, K) for y and x."""
    ys = jnp.arange(h_out) * stride - padding
    xs = jnp.arange(w_out) * stride - padding
    kys = jnp.arange(kh) * dilation
    kxs = jnp.arange(kw) * dilation
    base_y = ys[:, None, None, None] + kys[None, None, :, None]     # (Ho,1,kh,1)
    base_x = xs[None, :, None, None] + kxs[None, None, None, :]     # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (h_out, w_out, kh, kw)).reshape(h_out, w_out, kh * kw)
    base_x = jnp.broadcast_to(base_x, (h_out, w_out, kh, kw)).reshape(h_out, w_out, kh * kw)
    return base_y.astype(jnp.float32), base_x.astype(jnp.float32)


def bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample x (B,H,W,C) at float positions (B,Ho,Wo,K).

    Out-of-bounds corner taps contribute zero (zero padding), matching the
    reference kernel's boundary behaviour.
    Returns (B, Ho, Wo, K, C).
    """
    B, H, W, C = x.shape
    _, Ho, Wo, K = ys.shape

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0    # weight of y0+1
    wx = xs - x0

    x_flat = x.reshape(B, H * W, C)
    out = None
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = y0 + dy
        xi = x0 + dx
        w = ((wy if dy else (1.0 - wy)) * (wx if dx else (1.0 - wx)))
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(B, Ho * Wo * K)
        g = jnp.take_along_axis(x_flat, idx[:, :, None], axis=1)
        g = g.reshape(B, Ho, Wo, K, C)
        contrib = g * (w * valid.astype(x.dtype))[..., None]
        out = contrib if out is None else out + contrib
    return out


def modulated_deform_conv(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                          weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                          stride: int = 1, padding: int = 1,
                          dilation: int = 1) -> jnp.ndarray:
    """DCNv2 forward.

    x:      (B, H, W, Cin)
    offset: (B, Ho, Wo, 2K)  interleaved (dy_k, dx_k)
    mask:   (B, Ho, Wo, K)   post-sigmoid modulation
    weight: (kh, kw, Cin, Cout)
    """
    B, H, W, Cin = x.shape
    kh, kw = weight.shape[0], weight.shape[1]
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y, base_x = _sample_grid(Ho, Wo, kh, kw, stride, padding, dilation)
    dy = offset[..., 0::2]
    dx = offset[..., 1::2]
    ys = base_y[None] + dy
    xs = base_x[None] + dx

    sampled = bilinear_gather(x, ys, xs)                      # (B,Ho,Wo,K,Cin)
    sampled = sampled * mask[..., None]
    acc_t = jnp.promote_types(x.dtype, jnp.float32)  # f32 accumulation for bf16
    out = jax.lax.dot_general(
        sampled.reshape(B * Ho * Wo, K * Cin),
        weight.reshape(K * Cin, -1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    ).reshape(B, Ho, Wo, -1)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def plain_conv_equivalent(x: jnp.ndarray, weight: jnp.ndarray,
                          bias: jnp.ndarray | None = None, stride: int = 1,
                          padding: int = 1, dilation: int = 1) -> jnp.ndarray:
    """Regular conv with the same layout, for zero-offset equivalence tests
    (mirrors the reference's check_zero_offset test idea,
    reference: model/backbone/DCNv2/testcuda.py:32)."""
    out = jax.lax.conv_general_dilated(
        x, weight,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out
