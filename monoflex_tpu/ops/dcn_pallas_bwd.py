"""Backward pass for the Pallas DCN kernel + the custom-VJP wrapper.

Gradient structure (y = sum_k (S_k(x; o_k) * m_k) W_k + b, S_k the
hat-window bilinear sample of ops/dcn_pallas.py):

    u_k    = g W_k^T
    dx[q]  = sum_k sum_d hatw_{k,d}(q-d) * m_k(q-d) * u_k(q-d)   (mirrored)
    do y_k = m_k * <SY_k, u_k>_C   with SY_k = sum_d hat'_y hat_x x[p+d]
    do x_k = m_k * <SX_k, u_k>_C   with SX_k = sum_d hat_y hat'_x x[p+d]
    dm_k   = <S_k, u_k>_C
    dW_k   = (S_k m_k)^T g         db = sum g

Round-2 redesign (the round-1 monolithic kernel OOM-killed the Mosaic
compiler): THREE small kernels (dx | dW+dmask | doffset), each with the same
bounded-window shift structure as the forward and the exact (2R+1)^2 term
range.  The offset gradient is refactored from per-term channel inner
products into two extra "derivative sample" window accumulations (SY, SX)
followed by ONE channel contraction per tap — 3x less vector work and far
smaller kernel IR.  The dx kernel slices the halo buffers down to tile size
BEFORE the multiply (the round-1 kernel multiplied full halo-sized buffers,
a ~4x overspend).

The clamp on offsets zeroes their gradient outside [-R, R], matching
jnp.clip's VJP in the XLA oracle (ops/dcn.py: modulated_deform_conv_shift).
Reference semantics: model/backbone/DCNv2/src/cuda/dcn_v2_cuda.cu:97-208
(col2im / col2im_coord / weight-grad GEMM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dcn_pallas import _GUARD, _pick_tile_h, dcn_pallas


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _dhat(t):
    # d/dt max(0, 1-|t|) = -sign(t) where |t| < 1
    return jnp.where(jnp.abs(t) < 1.0, -jnp.sign(t), 0.0)


# ---------------------------------------------------------------------------
# kernel 1: dx — mirrored window over source pixels
# ---------------------------------------------------------------------------

def _dx_kernel(g_hbm, offh_hbm, maskh_hbm, w_ref, dx_ref,
               gv_ref, uv_ref, offh_ref, maskh_ref, acc_ref, sem,
               *, tile_h: int, width: int, max_offset: int, compute_dtype):
    R = max_offset
    P = R + 1
    win_h = gv_ref.shape[1]
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h

    for src, dst in ((g_hbm, gv_ref), (offh_hbm, offh_ref),
                     (maskh_hbm, maskh_ref)):
        cp = pltpu.make_async_copy(src.at[b, :, pl.ds(row0, win_h), :], dst, sem)
        cp.start()
        cp.wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        # u_k = g W_k^T over the halo window, one row-matmul at a time
        # (contract W_k's Co dim directly: the MXU takes transposed operands)
        for h in range(win_h):
            uv_ref[:, h, :] = jax.lax.dot_general(
                w_ref[k], gv_ref[:, h, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(uv_ref.dtype)

        oyh = jnp.clip(offh_ref[2 * k], -R, R)          # (win_h, Wx)
        oxh = jnp.clip(offh_ref[2 * k + 1], -R, R)
        mh = maskh_ref[k]
        for dy in range(ky - R, ky + R + 1):
            wyh = _hat(oyh + (ky - dy))                  # halo frame, rank-2
            for dx in range(kx - R, kx + R + 1):
                # dx[q] += w_{k,d}(q-d) m_k(q-d) u_k(q-d): slice halo at -d
                sl = (slice(_GUARD - dy, _GUARD - dy + tile_h),
                      slice(P - dx, P - dx + width))
                w_map = (wyh[sl] * _hat(oxh[sl] + (kx - dx)) * mh[sl])
                u_sl = uv_ref[:, _GUARD - dy: _GUARD - dy + tile_h,
                              P - dx: P - dx + width]
                acc_ref[...] += u_sl * w_map[None].astype(uv_ref.dtype)
    dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# kernel 2: dW + dmask — recompute S_k, contract
# ---------------------------------------------------------------------------

def _dwm_kernel(x_hbm, off_ref, mask_ref, g_ref, w_ref, dmask_ref, dw_ref,
                xv_ref, u_ref, s_ref, sem,
                *, tile_h: int, width: int, max_offset: int, compute_dtype):
    R = max_offset
    P = R + 1
    win_h = xv_ref.shape[1]
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h

    cp = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(row0, win_h), :], xv_ref, sem)
    cp.start()
    cp.wait()

    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        for h in range(tile_h):
            u_ref[:, h, :] = jax.lax.dot_general(
                w_ref[k], g_ref[0, :, h, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(u_ref.dtype)

        oy = jnp.clip(off_ref[0, 2 * k], -R, R)
        ox = jnp.clip(off_ref[0, 2 * k + 1], -R, R)
        s_ref[...] = jnp.zeros_like(s_ref)
        for dy in range(ky - R, ky + R + 1):
            wy = _hat(oy + (ky - dy))
            rows = xv_ref[:, _GUARD + dy: _GUARD + dy + tile_h, :]
            for dx in range(kx - R, kx + R + 1):
                w_map = wy * _hat(ox + (kx - dx))
                window = rows[:, :, P + dx: P + dx + width]
                s_ref[...] += window * w_map[None].astype(s_ref.dtype)

        dmask_ref[0, k] = jnp.sum(
            s_ref[...].astype(jnp.float32) * u_ref[...].astype(jnp.float32),
            axis=0)
        # dW_k = (S_k m_k)^T g over tile pixels, contracting W row by row
        sk = s_ref[...] * mask_ref[0, k][None].astype(s_ref.dtype)
        for h in range(tile_h):
            partial = jax.lax.dot_general(
                sk[:, h, :], g_ref[0, :, h, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (C, Co)
            if h == 0:
                dw_acc = partial
            else:
                dw_acc = dw_acc + partial
        dw_ref[0, 0, k] = dw_acc


# ---------------------------------------------------------------------------
# kernel 3: doffset — derivative samples SY/SX, one contraction per tap
# ---------------------------------------------------------------------------

def _doff_kernel(x_hbm, off_ref, mask_ref, g_ref, w_ref, doff_ref,
                 xv_ref, u_ref, sy_ref, sx_ref, sem,
                 *, tile_h: int, width: int, max_offset: int, compute_dtype):
    R = max_offset
    P = R + 1
    win_h = xv_ref.shape[1]
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h

    cp = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(row0, win_h), :], xv_ref, sem)
    cp.start()
    cp.wait()

    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        for h in range(tile_h):
            u_ref[:, h, :] = jax.lax.dot_general(
                w_ref[k], g_ref[0, :, h, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(u_ref.dtype)

        oy_raw = off_ref[0, 2 * k]
        ox_raw = off_ref[0, 2 * k + 1]
        oy = jnp.clip(oy_raw, -R, R)
        ox = jnp.clip(ox_raw, -R, R)
        sy_ref[...] = jnp.zeros_like(sy_ref)
        sx_ref[...] = jnp.zeros_like(sx_ref)
        for dy in range(ky - R, ky + R + 1):
            ty = oy + (ky - dy)
            wy = _hat(ty)
            gy = _dhat(ty)
            rows = xv_ref[:, _GUARD + dy: _GUARD + dy + tile_h, :]
            for dx in range(kx - R, kx + R + 1):
                tx = ox + (kx - dx)
                window = rows[:, :, P + dx: P + dx + width]
                sy_ref[...] += window * (gy * _hat(tx))[None].astype(sy_ref.dtype)
                sx_ref[...] += window * (wy * _dhat(tx))[None].astype(sx_ref.dtype)

        m_k = mask_ref[0, k]
        in_y = (jnp.abs(oy_raw) <= R).astype(jnp.float32)
        in_x = (jnp.abs(ox_raw) <= R).astype(jnp.float32)
        u32 = u_ref[...].astype(jnp.float32)
        doff_ref[0, 2 * k] = jnp.sum(
            sy_ref[...].astype(jnp.float32) * u32, axis=0) * m_k * in_y
        doff_ref[0, 2 * k + 1] = jnp.sum(
            sx_ref[...].astype(jnp.float32) * u32, axis=0) * m_k * in_x


def _pad_spatial(t, guard, pad_h, wx, w, p):
    return jnp.pad(t, ((0, 0), (0, 0), (guard, guard + pad_h), (p, wx - w - p)))


def _prep(x, offset, mask, weight, g, max_offset, compute_dtype):
    """Shared layout/padding prep for the three backward kernels."""
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    P = R + 1
    # base sublane tile only: the bwd kernels hold several halo-sized VMEM
    # buffers, so no single-tile upsizing for small maps
    tile_h = 16 if compute_dtype == jnp.bfloat16 else 8
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * _GUARD
    Wx = W + 2 * P
    Wx = Wx + (-Wx) % 128

    xt = _pad_spatial(jnp.transpose(x, (0, 3, 1, 2)).astype(compute_dtype),
                      _GUARD, pad_h, Wx, W, P)
    gt = jnp.transpose(g, (0, 3, 1, 2)).astype(jnp.float32)
    gth = _pad_spatial(gt.astype(compute_dtype), _GUARD, pad_h, Wx, W, P)
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    # halo copies of offsets / mask for the dx mirrored window (mask halo
    # zero-padded so out-of-image sources contribute nothing)
    offh = _pad_spatial(off_t, _GUARD, pad_h, Wx, W, P)
    maskh = _pad_spatial(mask_t, _GUARD, pad_h, Wx, W, P)
    if pad_h:
        off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    w_t = jnp.transpose(weight.reshape(9, C, Co), (0, 2, 1)).astype(compute_dtype)
    dims = dict(B=B, H=H, W=W, C=C, Co=Co, P=P, tile_h=tile_h, Hp=Hp,
                win_h=win_h, Wx=Wx)
    return (xt, gt, gth, off_t, mask_t, offh, maskh, w_t), dims


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_bwd_dx(x, offset, mask, weight, g, max_offset: int = 3,
                      compute_dtype=None):
    """Input gradient only (kernel 1); NHWC in/out."""
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    (xt, gt, gth, off_t, mask_t, offh, maskh, w_t), d = _prep(
        x, offset, mask, weight, g, max_offset, compute_dtype)
    B, H, W, C, Co = d["B"], d["H"], d["W"], d["C"], d["Co"]
    tile_h, Hp, win_h, Wx = d["tile_h"], d["Hp"], d["win_h"], d["Wx"]
    grid = (B, Hp // tile_h)
    common = dict(tile_h=tile_h, width=W, max_offset=max_offset,
                  compute_dtype=compute_dtype)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, **common),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                     # g halo
            pl.BlockSpec(memory_space=pltpu.ANY),                     # off halo
            pl.BlockSpec(memory_space=pltpu.ANY),                     # mask halo
            pl.BlockSpec((9, Co, C), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, tile_h, W), lambda b, h: (b, 0, h, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Co, win_h, Wx), compute_dtype),
            pltpu.VMEM((C, win_h, Wx), compute_dtype),
            pltpu.VMEM((18, win_h, Wx), jnp.float32),
            pltpu.VMEM((9, win_h, Wx), jnp.float32),
            pltpu.VMEM((C, tile_h, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(gth, offh, maskh, w_t)
    return jnp.transpose(dx[:, :, :H, :], (0, 2, 3, 1)).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_bwd_dwm(x, offset, mask, weight, g, max_offset: int = 3,
                       compute_dtype=None):
    """Weight + mask gradients (kernel 2); returns (dmask, dweight)."""
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    (xt, gt, gth, off_t, mask_t, offh, maskh, w_t), d = _prep(
        x, offset, mask, weight, g, max_offset, compute_dtype)
    B, H, W, C, Co = d["B"], d["H"], d["W"], d["C"], d["Co"]
    tile_h, Hp, win_h, Wx = d["tile_h"], d["Hp"], d["win_h"], d["Wx"]
    grid = (B, Hp // tile_h)
    n_tiles = Hp // tile_h
    common = dict(tile_h=tile_h, width=W, max_offset=max_offset,
                  compute_dtype=compute_dtype)
    dmask, dw = pl.pallas_call(
        functools.partial(_dwm_kernel, **common),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                     # x halo
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, Co, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((9, Co, C), lambda b, h: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 1, 9, C, Co), lambda b, h: (b, h, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 9, Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, 9, C, Co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, win_h, Wx), compute_dtype),
            pltpu.VMEM((C, tile_h, W), compute_dtype),
            pltpu.VMEM((C, tile_h, W), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, off_t, mask_t, gt, w_t)
    dmask = jnp.transpose(dmask[:, :, :H, :], (0, 2, 3, 1)).astype(mask.dtype)
    dw = jnp.sum(dw, axis=(0, 1)).reshape(3, 3, C, Co).astype(weight.dtype)
    return dmask, dw


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_bwd_doff(x, offset, mask, weight, g, max_offset: int = 3,
                        compute_dtype=None):
    """Offset gradient (kernel 3); NHWC in/out."""
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    (xt, gt, gth, off_t, mask_t, offh, maskh, w_t), d = _prep(
        x, offset, mask, weight, g, max_offset, compute_dtype)
    B, H, W, C, Co = d["B"], d["H"], d["W"], d["C"], d["Co"]
    tile_h, Hp, win_h, Wx = d["tile_h"], d["Hp"], d["win_h"], d["Wx"]
    grid = (B, Hp // tile_h)
    common = dict(tile_h=tile_h, width=W, max_offset=max_offset,
                  compute_dtype=compute_dtype)
    doff = pl.pallas_call(
        functools.partial(_doff_kernel, **common),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                     # x halo
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, Co, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((9, Co, C), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 18, Hp, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, win_h, Wx), compute_dtype),
            pltpu.VMEM((C, tile_h, W), compute_dtype),
            pltpu.VMEM((C, tile_h, W), compute_dtype),
            pltpu.VMEM((C, tile_h, W), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, off_t, mask_t, gt, w_t)
    return jnp.transpose(doff[:, :, :H, :], (0, 2, 3, 1)).astype(offset.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_bwd(x, offset, mask, weight, g, max_offset: int = 3,
                   compute_dtype=None):
    """Returns (dx, doffset, dmask, dweight, dbias); NHWC in/out."""
    dx = dcn_pallas_bwd_dx(x, offset, mask, weight, g, max_offset=max_offset,
                           compute_dtype=compute_dtype)
    dmask, dw = dcn_pallas_bwd_dwm(x, offset, mask, weight, g,
                                   max_offset=max_offset,
                                   compute_dtype=compute_dtype)
    doff = dcn_pallas_bwd_doff(x, offset, mask, weight, g,
                               max_offset=max_offset,
                               compute_dtype=compute_dtype)
    db = jnp.sum(g, axis=(0, 1, 2))
    return dx, doff, dmask, dw, db


# ---------------------------------------------------------------------------
# custom-VJP wrapper: forward = Pallas kernel, backward = Pallas kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dcn_pallas_vjp(x, offset, mask, weight, bias, max_offset: int = 3):
    return dcn_pallas(x, offset, mask, weight, bias, max_offset=max_offset)


def _fwd(x, offset, mask, weight, bias, max_offset):
    out = dcn_pallas(x, offset, mask, weight, bias, max_offset=max_offset)
    return out, (x, offset, mask, weight)


def _bwd(max_offset, residuals, g):
    x, offset, mask, weight = residuals
    dx, doff, dmask, dw, db = dcn_pallas_bwd(x, offset, mask, weight, g,
                                             max_offset=max_offset)
    return dx, doff, dmask, dw, db


dcn_pallas_vjp.defvjp(_fwd, _bwd)
