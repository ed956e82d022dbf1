"""Backward pass for the Pallas DCN kernel + the custom-VJP wrapper.

Gradient structure (y = sum_k (S_k(x; o_k) * m_k) W_k + b, S_k the
hat-window bilinear sample of ops/dcn_pallas.py):

    u_k    = (g W_k^T) * m_k
    dx[q]  = sum_k sum_d hatw_{k,d}(q - d) * u_k(q - d)      (mirrored window)
    do y_k = sum_d hat'_y * hat_x * <x[p+d], (g W_k^T)[p]>_C * m_k
    dm_k   = <S_k, g W_k^T>_C
    dW_k   = S_k^T g         db = sum g

Everything is the same bounded-window shift pattern as the forward, so one
kernel per grid tile computes all five gradients with two halo DMAs (x and g)
and VMEM-resident accumulation.  dW is emitted per-tile and reduced outside.

The clamp on offsets zeroes their gradient outside [-R, R], matching
jnp.clip's VJP in the XLA oracle (ops/dcn.py: modulated_deform_conv_shift).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dcn_pallas import _GUARD, dcn_pallas


def _dcn_bwd_kernel(x_hbm, g_hbm, off_ref, offh_hbm, mask_ref, maskh_hbm,
                    w_ref, dx_ref, doff_ref, dmask_ref, dw_ref,
                    xv_ref, gv_ref, uv_ref, s_ref, offh_ref, maskh_ref,
                    sem, *, tile_h: int, width: int, max_offset: int):
    R = max_offset
    P = R + 2
    C = xv_ref.shape[0]
    Co = gv_ref.shape[0]
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    win_h = xv_ref.shape[1]

    for src, dst in ((x_hbm, xv_ref), (g_hbm, gv_ref),
                     (offh_hbm, offh_ref), (maskh_hbm, maskh_ref)):
        cp = pltpu.make_async_copy(src.at[b, :, pl.ds(row0, win_h), :], dst, sem)
        cp.start()
        cp.wait()

    dx_ref[0] = jnp.zeros_like(dx_ref[0])

    def hat(t):
        return jnp.maximum(0.0, 1.0 - jnp.abs(t))

    def dhat(t):
        # d/dt max(0, 1-|t|) = -sign(t) where |t| < 1
        return jnp.where(jnp.abs(t) < 1.0, -jnp.sign(t), 0.0)

    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        wk = w_ref[k]                                   # (Co, C)

        # u over the halo window: (g W_k^T), per halo row
        for h in range(win_h):
            uv_ref[:, h, :] = jnp.dot(
                wk.T, gv_ref[:, h, :], preferred_element_type=jnp.float32)

        # ---- gradients at tile pixels p: s_k, dmask, doffset ----
        oy_raw = off_ref[0, 2 * k]
        ox_raw = off_ref[0, 2 * k + 1]
        oy = jnp.clip(oy_raw, -R, R)
        ox = jnp.clip(ox_raw, -R, R)
        in_rng_y = (jnp.abs(oy_raw) <= R).astype(jnp.float32)
        in_rng_x = (jnp.abs(ox_raw) <= R).astype(jnp.float32)
        m_k = mask_ref[0, k]
        u_tile = uv_ref[:, _GUARD: _GUARD + tile_h, P: P + width]

        s_ref[...] = jnp.zeros_like(s_ref)
        doy = jnp.zeros((tile_h, width), dtype=jnp.float32)
        dox = jnp.zeros((tile_h, width), dtype=jnp.float32)
        for dy in range(ky - R - 1, ky + R + 2):
            ty = oy + (ky - dy)
            wy = hat(ty)
            gy = dhat(ty)
            rows = xv_ref[:, _GUARD + dy: _GUARD + dy + tile_h, :]
            for dx in range(kx - R - 1, kx + R + 2):
                tx = ox + (kx - dx)
                wx = hat(tx)
                window = rows[:, :, P + dx: P + dx + width]
                s_ref[...] += window * (wy * wx)[None, :, :]
                # channel inner product <x[p+d], u[p]>
                e = jnp.sum(window * u_tile, axis=0)
                doy += gy * wx * e
                dox += wy * dhat(tx) * e
        dmask_ref[0, k] = jnp.sum(s_ref[...] * u_tile, axis=0)
        doff_ref[0, 2 * k] = doy * m_k * in_rng_y
        doff_ref[0, 2 * k + 1] = dox * m_k * in_rng_x

        # ---- dW_k = (S_k * m_k)^T g over tile pixels ----
        sk = s_ref[...] * m_k[None, :, :]
        for h in range(tile_h):
            partial = jnp.dot(sk[:, h, :], gv_ref[:, _GUARD + h, P: P + width].T,
                              preferred_element_type=jnp.float32)
            if h == 0:
                dw_acc = partial
            else:
                dw_acc = dw_acc + partial
        dw_ref[0, 0, k] = dw_acc                       # (C, Co)

        # ---- dx: mirrored window over source pixels q - d ----
        oyh = jnp.clip(offh_ref[2 * k], -R, R)          # (win_h, Wx)
        oxh = jnp.clip(offh_ref[2 * k + 1], -R, R)
        mh = maskh_ref[k]
        for dy in range(ky - R - 1, ky + R + 2):
            # source tile rows shifted by -dy relative to dx tile rows
            wyh = hat(oyh + (ky - dy))
            for dx in range(kx - R - 1, kx + R + 2):
                w_map = wyh * hat(oxh + (kx - dx)) * mh      # halo-frame weights
                contrib = uv_ref[...] * w_map[None, :, :]
                # dx[q] += contrib at p = q - (dy, dx): read halo at offset -d
                dx_ref[0] += contrib[:, _GUARD - dy: _GUARD - dy + tile_h,
                                     P - dx: P - dx + width]


def _pad_spatial(t, guard, pad_h, wx, w, p):
    return jnp.pad(t, ((0, 0), (0, 0), (guard, guard + pad_h), (p, wx - w - p)))


@functools.partial(jax.jit, static_argnames=("max_offset", "tile_h"))
def dcn_pallas_bwd(x, offset, mask, weight, g, max_offset: int = 3,
                   tile_h: int = 8):
    """Returns (dx, doffset, dmask, dweight, dbias); NHWC in/out."""
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    P = R + 2
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * _GUARD
    Wx = W + 2 * P
    Wx = Wx + (-Wx) % 128

    xt = _pad_spatial(jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32),
                      _GUARD, pad_h, Wx, W, P)
    gt = _pad_spatial(jnp.transpose(g, (0, 3, 1, 2)).astype(jnp.float32),
                      _GUARD, pad_h, Wx, W, P)
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    # halo copies of offsets / mask for the dx mirrored window (mask halo
    # zero-padded so out-of-image sources contribute nothing)
    offh = _pad_spatial(off_t, _GUARD, pad_h, Wx, W, P)
    maskh = _pad_spatial(mask_t, _GUARD, pad_h, Wx, W, P)
    if pad_h:
        off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    w_t = jnp.transpose(weight.reshape(9, C, Co), (0, 2, 1)).astype(jnp.float32)

    grid = (B, Hp // tile_h)
    kernel = functools.partial(_dcn_bwd_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset)
    n_tiles = Hp // tile_h
    dx, doff, dmask, dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                     # x padded
            pl.BlockSpec(memory_space=pltpu.ANY),                     # g padded
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),                     # offsets halo
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),                     # mask halo
            pl.BlockSpec((9, Co, C), lambda b, h: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 1, 9, C, Co), lambda b, h: (b, h, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((B, 18, Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((B, 9, Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, 9, C, Co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, win_h, Wx), jnp.float32),
            pltpu.VMEM((Co, win_h, Wx), jnp.float32),
            pltpu.VMEM((C, win_h, Wx), jnp.float32),
            pltpu.VMEM((C, tile_h, W), jnp.float32),
            pltpu.VMEM((18, win_h, Wx), jnp.float32),
            pltpu.VMEM((9, win_h, Wx), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, gt, off_t, offh, mask_t, maskh, w_t)

    dx = jnp.transpose(dx[:, :, :H, :], (0, 2, 3, 1)).astype(x.dtype)
    doff = jnp.transpose(doff[:, :, :H, :], (0, 2, 3, 1)).astype(offset.dtype)
    dmask = jnp.transpose(dmask[:, :, :H, :], (0, 2, 3, 1)).astype(mask.dtype)
    dw = jnp.sum(dw, axis=(0, 1))                      # (9, C, Co)
    dw = dw.reshape(3, 3, C, Co).astype(weight.dtype)
    db = jnp.sum(g, axis=(0, 1, 2))
    return dx, doff, dmask, dw, db


# ---------------------------------------------------------------------------
# custom-VJP wrapper: forward = Pallas kernel, backward = Pallas kernel
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
