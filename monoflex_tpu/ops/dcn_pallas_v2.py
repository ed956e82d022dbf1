"""Pallas DCN v2: NHWC-native layout, shift-free accumulation, fat matmuls.

Same math as ops/dcn_pallas.py (modulated deformable 3x3 conv via an exact
(2R+1)^2 shift window; reference CUDA counterpart:
model/backbone/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:125) but a second-
generation kernel layout driven by the round-1 profile (the v1 kernel ran
~10x off the VPU roofline; docs/DESIGN.md):

v1 layout (C on sublanes, W on lanes) pays a misaligned-lane access on every
dx shift and a misaligned-sublane access on every dy shift — ~2-3 extra VPU
ops per term — and contracts channels with tile_h small per-row matmuls.

v2 keeps the tensors in the framework's native NHWC:

  x window:  (win_h, W + 2P, C)   rows on the UNTILED outer dim, C on lanes
  - dy shifts index the outer dim: free.
  - dx shifts are hoisted: the window is pre-expanded once per grid step
    into 2P+1 column-aligned copies xs[j] = xv[:, j:j+W, :], so all
    (2R+1)^2 term reads in the hot loop are fully aligned vector loads.
  - the hat-weight maps are computed compactly (tile_h x W, W on lanes),
    with the tap mask folded in, and broadcast along C at use.
  - per tap, the channel contraction is ONE (tile_h*W, C) @ (C, Co) matmul
    (the (tile_h, W, C) -> (tile_h*W, C) view is free because W is a
    multiple of the 8-row sublane tile), accumulated in f32 on the MXU.
  - input, offsets, mask, weights and output all keep their framework
    layouts: the v1 wrapper's six NHWC<->NCHW transposes disappear.

Mixed precision: window math and matmul inputs in compute_dtype (bf16 on a
bf16 model), f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(H: int) -> int:
    # rows are on the untiled outer dim, so any tile_h works; 16 amortizes
    # the 2P-row halo re-read and keeps the matmul LHS tall
    if H <= 32:
        return 16 * max(1, -(-H // 16))  # whole (padded) map in one tile
    return 16


def _dcn2_kernel(x_hbm, off_ref, mask_ref, w_ref, out_ref, xv_ref, xs_ref,
                 s_ref, t_ref, acc_ref, sem, *, tile_h: int, width: int,
                 max_offset: int, compute_dtype):
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    win_h = xv_ref.shape[0]                    # tile_h + 2 * P

    # halo window: padded rows [row0, row0 + win_h), full padded width
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, win_h)], xv_ref, sem)
    copy.start()
    copy.wait()

    # hoist every column shift out of the term loop: xs[j] is the window
    # shifted left by j columns, so hot-loop reads are aligned
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, j: j + width, :]

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        # compact (tile_h, W) weight maps, W on lanes; mask folds into wy
        oy = jnp.clip(off_ref[0, 2 * k], -R, R)
        ox = jnp.clip(off_ref[0, 2 * k + 1], -R, R)
        mk = mask_ref[0, k]

        s_ref[...] = jnp.zeros_like(s_ref)
        for dy in range(ky - R, ky + R + 1):
            wy = (jnp.maximum(0.0, 1.0 - jnp.abs(oy + (ky - dy))) * mk)
            t_ref[...] = jnp.zeros_like(t_ref)
            for dx in range(kx - R, kx + R + 1):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(ox + (kx - dx)))
                rows = xs_ref[P + dx, P + dy: P + dy + tile_h, :, :]
                t_ref[...] += rows * wx[:, :, None].astype(compute_dtype)
            s_ref[...] += t_ref[...] * wy[:, :, None].astype(compute_dtype)

        sk = s_ref[...].reshape(tile_h * width, s_ref.shape[-1])
        acc_ref[...] += jnp.dot(sk, w_ref[k],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc_ref[...].reshape(out_ref.shape[1:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_v2(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                  max_offset: int = 2, compute_dtype=None) -> jnp.ndarray:
    """NHWC modulated deformable conv, v2 kernel.

    Same contract as ops.dcn_pallas.dcn_pallas: x (B,H,W,C); offset
    (B,H,W,18) interleaved (dy,dx); mask (B,H,W,9) post-sigmoid;
    weight (3,3,C,Co).  Returns (B,H,W,Co) in x.dtype.
    """
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    P = R + 1
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    tile_h = _pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    # manually-DMA'd buffers must have tile-aligned trailing dims: channels
    # (lanes) padded to 128, the W+2P column dim (sublanes) padded to 8
    Cp = C + (-C) % 128
    wp2f = W + 2 * P
    wp2f = wp2f + (-wp2f) % 8

    xt = jnp.pad(x.astype(compute_dtype),
                 ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cp - C)))
    # offsets/mask transposed to (B, 18|9, Hp, W): per-tap maps come out
    # compact (tile_h rows on sublanes, W on lanes) for cheap hat math
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    if pad_h:
        off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    w_t = jnp.pad(weight.reshape(9, C, Co).astype(compute_dtype),
                  ((0, 0), (0, Cp - C), (0, 0)))

    grid = (B, Hp // tile_h)
    kernel = functools.partial(_dcn2_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((9, Cp, Co), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, Co), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, wp2f, Cp), compute_dtype),
            pltpu.VMEM((2 * P + 1, win_h, W, Cp), compute_dtype),
            pltpu.VMEM((tile_h, W, Cp), compute_dtype),
            pltpu.VMEM((tile_h, W, Cp), compute_dtype),
            pltpu.VMEM((tile_h * W, Co), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, off_t, mask_t, w_t)

    out = out[:, :H]
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# lane-packed forward: two adjacent pixels per 128-lane tile (C = Co = 64)
# ---------------------------------------------------------------------------


def _packed_kernel(x_hbm, offe_ref, offo_ref, maske_ref, masko_ref, w_ref,
                   out_ref, xv_ref, xs_ref, s_ref, t_ref, acc_ref, sem, *,
                   tile_h: int, width: int, max_offset: int, compute_dtype):
    """At C=64 the standard layout pads channels to 128 lanes, wasting half
    of every window FMA and matmul.  This kernel packs two adjacent pixels
    (64 channels each) into one 128-lane tile: the (W,64) -> (W/2,128) view
    is a free bitcast outside, tap weights become block-diagonal (128,128),
    and odd-pixel column shifts recombine lane halves of adjacent pairs.
    Left pad 4 (even, >= P) keeps pair parity in the halo."""
    R = max_offset
    P = R + 1
    wh = width // 2
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])], xv_ref, sem)
    copy.start()
    copy.wait()
    for j in range(2 * P + 1):
        s = j + 1                         # pixel start in the padded row
        a = s // 2
        if s % 2 == 0:
            xs_ref[j] = xv_ref[:, a: a + wh, :]
        else:
            xs_ref[j] = jnp.concatenate(
                [xv_ref[:, a: a + wh, 64:],
                 xv_ref[:, a + 1: a + 1 + wh, :64]], axis=-1)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        oy_e = jnp.clip(offe_ref[0, pl.ds(2 * k, 1)][0], -R, R)
        oy_o = jnp.clip(offo_ref[0, pl.ds(2 * k, 1)][0], -R, R)
        ox_e = jnp.clip(offe_ref[0, pl.ds(2 * k + 1, 1)][0], -R, R)
        ox_o = jnp.clip(offo_ref[0, pl.ds(2 * k + 1, 1)][0], -R, R)
        mk_e = maske_ref[0, pl.ds(k, 1)][0]
        mk_o = masko_ref[0, pl.ds(k, 1)][0]
        s_ref[...] = jnp.zeros_like(s_ref)
        for e in range(-R, R + 1):
            wy_e = _hat(oy_e - e) * mk_e
            wy_o = _hat(oy_o - e) * mk_o
            wy = jnp.concatenate(
                [jnp.broadcast_to(wy_e[:, :, None], wy_e.shape + (64,)),
                 jnp.broadcast_to(wy_o[:, :, None], wy_o.shape + (64,))],
                axis=-1).astype(compute_dtype)
            t_ref[...] = jnp.zeros_like(t_ref)
            for f in range(-R, R + 1):
                wx_e = _hat(ox_e - f)
                wx_o = _hat(ox_o - f)
                wx = jnp.concatenate(
                    [jnp.broadcast_to(wx_e[:, :, None], wx_e.shape + (64,)),
                     jnp.broadcast_to(wx_o[:, :, None], wx_o.shape + (64,))],
                    axis=-1).astype(compute_dtype)
                rows = xs_ref[pl.ds(P + kx + f, 1),
                              pl.ds(P + ky + e, tile_h), :, :][0]
                t_ref[...] += rows * wx
            s_ref[...] += t_ref[...] * wy
        sk = s_ref[...].reshape(tile_h * wh, s_ref.shape[-1])
        acc_ref[...] += jnp.dot(sk, w_ref[pl.ds(k, 1)][0],
                                preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, 9, tap_body, 0)
    out_ref[0] = acc_ref[...].reshape(out_ref.shape[1:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_v2_packed(x, offset, mask, weight,
                         bias: Optional[jnp.ndarray] = None,
                         max_offset: int = 2, compute_dtype=None):
    """Lane-packed NHWC modulated deformable conv (C = Co = 64, even W).

    Same contract as dcn_pallas_v2; ~2x lane utilization on the five
    stride-4 neck layers that dominate the inference profile."""
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    assert C == 64 and Co == 64 and W % 2 == 0, (C, Co, W)
    R = max_offset
    P = R + 1
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    tile_h = _pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    wh = W // 2
    # pair count padded to a multiple of 8: the packed halo's second-minor
    # dim is manually DMA'd and must be sublane-tile aligned
    np_pairs = ((W + 8) // 2 + 7) // 8 * 8
    right = np_pairs * 2 - W - 4

    xt = jnp.pad(x.astype(compute_dtype),
                 ((0, 0), (P, P + pad_h), (4, right), (0, 0)))
    xp = xt.reshape(B, Hp + 2 * P, np_pairs, 128)
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    if pad_h:
        off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    offe, offo = off_t[..., 0::2], off_t[..., 1::2]
    maske, masko = mask_t[..., 0::2], mask_t[..., 1::2]
    wk = weight.reshape(9, C, Co).astype(compute_dtype)
    wblk = jnp.zeros((9, 128, 128), compute_dtype)
    wblk = wblk.at[:, :64, :64].set(wk).at[:, 64:, 64:].set(wk)

    kernel = functools.partial(_packed_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 18, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((9, 128, 128), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wh, 128),
                               lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, wh, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, np_pairs, 128), compute_dtype),
            pltpu.VMEM((2 * P + 1, win_h, wh, 128), compute_dtype),
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),
            pltpu.VMEM((tile_h * wh, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, offe, offo, maske, masko, wblk)
    out = out.reshape(B, Hp, W, 64)[:, :H]
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# backward kernel 1, v2 layout: dx — mirrored window over source pixels
# ---------------------------------------------------------------------------

def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _dx2_kernel(g_hbm, offh_hbm, maskh_hbm, w_ref, dx_ref,
                gv_ref, uv_ref, us_ref, offh_ref, maskh_ref, hxm_ref,
                wmap_ref, acc_ref, sem,
                *, tile_h: int, width: int, max_offset: int, compute_dtype):
    """dx[q] = sum_k sum_d hatw_{k,d}(q-d) m_k(q-d) u_k(q-d), u_k = g W_k^T.

    v2 layout: NHWC halos (rows outer, C/Co on lanes), u_k formed by ONE
    (win_h*Wp2, Co) @ (Co, cc) matmul per tap, then pre-shifted into 2P+1
    column-aligned copies so every window term is an aligned read.  The grid
    carries a channel-chunk dim so the deep 512-channel layer's working set
    stays small (the v1 kernel's whole-C scratch drove the f32 train-step
    VMEM overflow; docs/DESIGN.md).

    Taps run under lax.fori_loop (a Python unroll of all 225 window terms
    spilled 119 MB of vector registers and overflowed VMEM on v5e).  The
    tap-dependent window reads are dynamic indices on untiled dims; the
    tap-dependent weight-map windows — whose row dim lives on SUBLANES,
    where dynamic slice starts are illegal — are extracted with dynamic
    pltpu.roll + static slice instead."""
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    win_h = gv_ref.shape[0]                    # tile_h + 2 * P
    wp2 = gv_ref.shape[1]

    # g rows live on the untiled outer dim (any slice length); the compact
    # off/mask halos have rows on SUBLANES, so their slice length must be a
    # multiple of 8 -> they carry an 8-row guard band like the v1 kernels
    win_h8 = offh_ref.shape[1]
    for src, dst in ((g_hbm, gv_ref), (offh_hbm, offh_ref),
                     (maskh_hbm, maskh_ref)):
        cp = pltpu.make_async_copy(src.at[b, pl.ds(row0, win_h)]
                                   if src is g_hbm else
                                   src.at[b, :, pl.ds(row0, win_h8), :],
                                   dst, sem)
        cp.start()
        cp.wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    gk = gv_ref[...].reshape(win_h * wp2, gv_ref.shape[-1])

    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        uv_ref[...] = jnp.dot(gk, w_ref[pl.ds(k, 1)][0],
                              preferred_element_type=jnp.float32).reshape(
            uv_ref.shape).astype(uv_ref.dtype)
        for j in range(2 * P + 1):
            us_ref[j] = uv_ref[:, j: j + width, :]

        oyh = jnp.clip(offh_ref[pl.ds(2 * k, 1)][0], -R, R)   # (win_h8, wp2o)
        oxh = jnp.clip(offh_ref[pl.ds(2 * k + 1, 1)][0], -R, R)
        mh = maskh_ref[pl.ds(k, 1)][0]
        # hat_x * mask maps depend only on f: hoist out of the inner loop
        for j, f in enumerate(range(-R, R + 1)):
            hxm_ref[j] = _hat(oxh - f) * mh
        for e in range(-R, R + 1):              # dy = ky + e
            wyh = _hat(oyh - e)
            for j, f in enumerate(range(-R, R + 1)):   # dx = kx + f
                # weight-map window rows [8-dy, 8-dy+tile_h) x cols
                # [P-dx, P-dx+width): dynamic roll to the origin + static
                # slice (rows are sublanes: dynamic starts are illegal).
                # shifts biased positive by the axis size: pltpu.roll with a
                # NEGATIVE dynamic shift silently corrupts data on v5e
                # (probed: positive exact, negative wrong)
                wm = pltpu.roll(wyh * hxm_ref[j],
                                shift=(ky + e) - 8 + win_h8, axis=0)
                wm = pltpu.roll(wm, shift=(kx + f) - P + wyh.shape[1], axis=1)
                wmap_ref[...] = wm[:tile_h, :width]
                rows = us_ref[pl.ds(P - kx - f, 1),
                              pl.ds(P - ky - e, tile_h)][0]
                acc_ref[...] += (rows * wmap_ref[...][:, :, None].astype(
                    compute_dtype))
        return carry

    jax.lax.fori_loop(0, 9, tap_body, 0)
    dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype",
                                             "channel_chunk"))
def dcn_pallas_v2_bwd_dx(x, offset, mask, weight, g, max_offset: int = 2,
                         compute_dtype=None, channel_chunk=None):
    """Gradient w.r.t. x for the v2 DCN (same contract as
    ops.dcn_pallas_bwd.dcn_pallas_bwd_dx; x only supplies shape/dtype)."""
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    P = R + 1
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    # 16-row tiles: the 8-row tile only existed to cap the unrolled loop's
    # register spills, which the fori-loop tap dispatch eliminated; the
    # larger tile amortizes the halo DMA and the per-tap u matmul rows
    tile_h = _pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    wp2 = W + 2 * P
    wp2 = wp2 + (-wp2) % 8                    # free (rows, W) merge for MXU

    Cop = Co + (-Co) % 128        # minor dim of the DMA'd g: 128-aligned
    # zero-padded halos: gradient/mask outside the map contribute nothing
    gt = jnp.pad(g.astype(compute_dtype),
                 ((0, 0), (P, P + pad_h), (P, wp2 - W - P), (0, Cop - Co)))
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    # 8-row guard bands (rows are sublanes in the compact layout); the minor
    # (column) dim of these manually-DMA'd buffers must be 128-lane aligned
    # (Mosaic: "Slice shape along dimension 3 must be aligned to tiling"),
    # so they get extra right padding beyond the wp2 compute width
    wp2o = wp2 + (-wp2) % 128
    off_t = jnp.pad(off_t, ((0, 0), (0, 0), (8, 8 + pad_h), (P, wp2o - W - P)))
    mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (8, 8 + pad_h),
                              (P, wp2o - W - P)))
    # W_k^T chunks along the dx channel dim C (rows padded with the g lanes)
    w_t = jnp.pad(
        jnp.transpose(weight.reshape(9, C, Co), (0, 2, 1)).astype(compute_dtype),
        ((0, 0), (0, Cop - Co), (0, 0)))

    cc = channel_chunk or (C if C <= 256 else 256)
    assert C % cc == 0, (C, cc)
    grid = (B, Hp // tile_h, C // cc)
    kernel = functools.partial(_dx2_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, Cop, cc), lambda b, h, ci: (0, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, cc),
                               lambda b, h, ci: (b, h, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, wp2, Cop), compute_dtype),
            pltpu.VMEM((win_h, wp2, cc), compute_dtype),
            pltpu.VMEM((2 * P + 1, win_h, W, cc), compute_dtype),
            pltpu.VMEM((18, tile_h + 16, wp2o), jnp.float32),
            pltpu.VMEM((9, tile_h + 16, wp2o), jnp.float32),
            pltpu.VMEM((2 * P + 1, tile_h + 16, wp2o), jnp.float32),
            pltpu.VMEM((tile_h, W), jnp.float32),
            pltpu.VMEM((tile_h, W, cc), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(gt, off_t, mask_t, w_t)
    return out[:, :H].astype(x.dtype)


def _packed_dx_kernel(g_hbm, offe_hbm, offo_hbm, maske_hbm, masko_hbm, w_ref,
                      dx_ref, gv_ref, uv_ref, us_ref, offe_ref, offo_ref,
                      maske_ref, masko_ref, wtmp_ref, wmap_ref, acc_ref, sem,
                      *, tile_h: int, width: int, max_offset: int,
                      compute_dtype):
    """Lane-packed dx (C = Co = 64): two output pixels per 128-lane tile.

    Taps iterate fori over tap ROWS (ky dynamic -> dynamic positive row
    rolls on the compact maps, as in the unpacked kernel) with tap COLUMNS
    statically unrolled: the packed column slice start and the source-pixel
    parity assignment depend on kx + f and must be static.  The parity-split
    offset/mask halos (even/odd source columns) let each output parity read
    its per-pixel weight map with a static lane slice."""
    R = max_offset
    P = R + 1
    wh = width // 2
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    win_h = gv_ref.shape[0]
    pairs = gv_ref.shape[1]
    win_h8 = offe_ref.shape[1]

    for src, dst in ((g_hbm, gv_ref), (offe_hbm, offe_ref),
                     (offo_hbm, offo_ref), (maske_hbm, maske_ref),
                     (masko_hbm, masko_ref)):
        cp = pltpu.make_async_copy(src.at[b, pl.ds(row0, win_h)]
                                   if src is g_hbm else
                                   src.at[b, :, pl.ds(row0, win_h8), :],
                                   dst, sem)
        cp.start()
        cp.wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    gk = gv_ref[...].reshape(win_h * pairs, gv_ref.shape[-1])

    def row_body(krow, carry):
        ky = krow - 1
        for kxi, kx in enumerate(((-1), 0, 1)):
            k = krow * 3 + kxi
            uv_ref[...] = jnp.dot(gk, w_ref[pl.ds(k, 1)][0],
                                  preferred_element_type=jnp.float32).reshape(
                uv_ref.shape).astype(uv_ref.dtype)
            for j in range(2 * P + 1):
                s = j + 1
                a = s // 2
                if s % 2 == 0:
                    us_ref[j] = uv_ref[:, a: a + wh, :]
                else:
                    us_ref[j] = jnp.concatenate(
                        [uv_ref[:, a: a + wh, 64:],
                         uv_ref[:, a + 1: a + 1 + wh, :64]], axis=-1)

            oy_e = jnp.clip(offe_ref[pl.ds(2 * k, 1)][0], -R, R)
            oy_o = jnp.clip(offo_ref[pl.ds(2 * k, 1)][0], -R, R)
            ox_e = jnp.clip(offe_ref[pl.ds(2 * k + 1, 1)][0], -R, R)
            ox_o = jnp.clip(offo_ref[pl.ds(2 * k + 1, 1)][0], -R, R)
            mh_e = maske_ref[pl.ds(k, 1)][0]
            mh_o = masko_ref[pl.ds(k, 1)][0]

            for e in range(-R, R + 1):
                wy_e = _hat(oy_e - e)
                wy_o = _hat(oy_o - e)
                rowshift = (ky + e) - 8 + win_h8   # positive dynamic roll
                for f in range(-R, R + 1):
                    dxs = kx + f                   # static column shift
                    s0 = 4 - dxs                   # even-output source col
                    p0 = s0 % 2
                    a0 = (s0 - p0) // 2
                    s1 = s0 + 1
                    p1 = s1 % 2
                    a1 = (s1 - p1) // 2
                    hx_e = _hat(ox_e - f) * mh_e
                    hx_o = _hat(ox_o - f) * mh_o
                    prod_e = wy_e * hx_e           # even-PARITY source map
                    prod_o = wy_o * hx_o
                    m0 = prod_e if p0 == 0 else prod_o
                    m1 = prod_e if p1 == 0 else prod_o
                    # stage the rolled/offset-layout slices through an
                    # aligned scratch before the rank-expanding reshape:
                    # Mosaic cannot shape_cast a 2-D vector with a lane-offset
                    # layout to 3-D (same fix as _dx2_kernel / DESIGN.md
                    # round-2 campaign item 4)
                    wtmp_ref[0] = pltpu.roll(m0, shift=rowshift, axis=0)[
                        :tile_h, a0: a0 + wh]
                    wtmp_ref[1] = pltpu.roll(m1, shift=rowshift, axis=0)[
                        :tile_h, a1: a1 + wh]
                    wmap_ref[...] = jnp.concatenate(
                        [jnp.broadcast_to(wtmp_ref[0][:, :, None],
                                          (tile_h, wh, 64)),
                         jnp.broadcast_to(wtmp_ref[1][:, :, None],
                                          (tile_h, wh, 64))],
                        axis=-1)
                    rows = us_ref[pl.ds(P - dxs, 1),
                                  pl.ds(P - ky - e, tile_h)][0]
                    acc_ref[...] += rows * wmap_ref[...].astype(compute_dtype)
        return carry

    jax.lax.fori_loop(0, 3, row_body, 0)
    dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_v2_packed_bwd_dx(x, offset, mask, weight, g,
                                max_offset: int = 2, compute_dtype=None):
    """Lane-packed gradient w.r.t. x (C = Co = 64, even W)."""
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    assert C == 64 and Co == 64 and W % 2 == 0, (C, Co, W)
    R = max_offset
    P = R + 1
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    tile_h = _pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    wh = W // 2
    pairs = ((W + 8) // 2 + 7) // 8 * 8      # g halo pairs, 8-aligned
    gright = pairs * 2 - W - 4
    whp = wh + 4                             # parity-split map halo width
    whp128 = whp + (-whp) % 128              # DMA minor-dim alignment

    gt = jnp.pad(g.astype(compute_dtype),
                 ((0, 0), (P, P + pad_h), (4, gright), (0, 0)))
    gp = gt.reshape(B, Hp + 2 * P, pairs, 128)
    # parity-split compact halos with 8-row guard bands; source-pixel column
    # m sits at split col m//2 of the (m%2) map, with the same left pad 4
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    off_t = jnp.pad(off_t, ((0, 0), (0, 0), (8, 8 + pad_h), (4, 4)))
    mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (8, 8 + pad_h), (4, 4)))
    offe = jnp.pad(off_t[..., 0::2], ((0, 0),) * 3 + ((0, whp128 - whp),))
    offo = jnp.pad(off_t[..., 1::2], ((0, 0),) * 3 + ((0, whp128 - whp),))
    maske = jnp.pad(mask_t[..., 0::2], ((0, 0),) * 3 + ((0, whp128 - whp),))
    masko = jnp.pad(mask_t[..., 1::2], ((0, 0),) * 3 + ((0, whp128 - whp),))
    wkT = jnp.transpose(weight.reshape(9, C, Co),
                        (0, 2, 1)).astype(compute_dtype)
    wtblk = jnp.zeros((9, 128, 128), compute_dtype)
    wtblk = wtblk.at[:, :64, :64].set(wkT).at[:, 64:, 64:].set(wkT)

    kernel = functools.partial(_packed_dx_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, 128, 128), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wh, 128),
                               lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, wh, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, pairs, 128), compute_dtype),
            pltpu.VMEM((win_h, pairs, 128), compute_dtype),
            pltpu.VMEM((2 * P + 1, win_h, wh, 128), compute_dtype),
            pltpu.VMEM((18, tile_h + 16, whp128), jnp.float32),
            pltpu.VMEM((18, tile_h + 16, whp128), jnp.float32),
            pltpu.VMEM((9, tile_h + 16, whp128), jnp.float32),
            pltpu.VMEM((9, tile_h + 16, whp128), jnp.float32),
            pltpu.VMEM((2, tile_h, wh), jnp.float32),
            pltpu.VMEM((tile_h, wh, 128), jnp.float32),
            pltpu.VMEM((tile_h, wh, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(gp, offe, offo, maske, masko, wtblk)
    return out.reshape(B, Hp, W, C)[:, :H].astype(x.dtype)


# ---------------------------------------------------------------------------
# backward kernel 2, v2 layout: dW + dmask (recompute S_k, contract)
# ---------------------------------------------------------------------------

def _dhat(t):
    # d/dt max(0, 1-|t|) = -sign(t) where |t| < 1
    return jnp.where(jnp.abs(t) < 1.0, -jnp.sign(t), 0.0)


def _window_sample(xs_ref, oy, ox, ky, kx, R, P, tile_h, width, s_ref, t_ref,
                   compute_dtype, dy_weight=_hat, dx_weight=_hat):
    """Accumulate the tap's (2R+1)^2 shift window into s_ref (v2 layout);
    dy_weight/dx_weight swap hat -> hat' for the derivative samples SY/SX."""
    s_ref[...] = jnp.zeros_like(s_ref)
    for dy in range(ky - R, ky + R + 1):
        wy = dy_weight(oy + (ky - dy))
        t_ref[...] = jnp.zeros_like(t_ref)
        for dx in range(kx - R, kx + R + 1):
            wx = dx_weight(ox + (kx - dx))
            rows = xs_ref[P + dx, P + dy: P + dy + tile_h, :, :]
            t_ref[...] += rows * wx[:, :, None].astype(compute_dtype)
        s_ref[...] += t_ref[...] * wy[:, :, None].astype(compute_dtype)


def _dwm2_kernel(x_hbm, off_ref, mask_ref, g_ref, wt_ref, dmask_ref, dw_ref,
                 xv_ref, xs_ref, u_ref, s_ref, t_ref, sem,
                 *, tile_h: int, width: int, max_offset: int, compute_dtype):
    """dmask_k = <S_k, u_k>_C, dW_k = (S_k m_k)^T g  (v2 layout: NHWC tiles,
    C on lanes; the channel inner product is a lane reduction and the weight
    gradient is one A^T B matmul per tap)."""
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h

    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])],
                               xv_ref, sem)
    cp.start()
    cp.wait()
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, j: j + width, :]

    g2 = g_ref[0].reshape(tile_h * width, g_ref.shape[-1])
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        u_ref[...] = jnp.dot(g2, wt_ref[k],
                             preferred_element_type=jnp.float32).reshape(
            u_ref.shape).astype(u_ref.dtype)
        oy = jnp.clip(off_ref[0, 2 * k], -R, R)
        ox = jnp.clip(off_ref[0, 2 * k + 1], -R, R)
        _window_sample(xs_ref, oy, ox, ky, kx, R, P, tile_h, width,
                       s_ref, t_ref, compute_dtype)

        dmask_ref[0, :, :, k] = jnp.sum(
            s_ref[...].astype(jnp.float32) * u_ref[...].astype(jnp.float32),
            axis=-1)
        mk = mask_ref[0, k]
        sk = (s_ref[...] * mk[:, :, None].astype(compute_dtype)).reshape(
            tile_h * width, s_ref.shape[-1])
        dw_ref[0, 0, k] = jax.lax.dot_general(
            sk, g2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_v2_bwd_dwm(x, offset, mask, weight, g, max_offset: int = 2,
                          compute_dtype=None):
    """Weight + mask gradients, v2 layout; returns (dmask, dweight)."""
    args, d = _prep2(x, offset, mask, weight, g, max_offset, compute_dtype)
    xt, off_t, mask_t, gt, w_nat, w_t = args
    B, H, W, C, Co = d["B"], d["H"], d["W"], d["C"], d["Co"]
    Cp = d["Cp"]
    tile_h, Hp, win_h, P = d["tile_h"], d["Hp"], d["win_h"], d["P"]
    n_tiles = Hp // tile_h
    kernel = functools.partial(_dwm2_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset,
                               compute_dtype=d["compute_dtype"])
    dmask, dw = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, tile_h, W, Co), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((9, Co, Cp), lambda b, h: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, W, 9), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 9, Cp, Co), lambda b, h: (b, h, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, W, 9), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, 9, Cp, Co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((win_h, d["wp2f"], Cp), d["compute_dtype"]),
            pltpu.VMEM((2 * P + 1, win_h, W, Cp), d["compute_dtype"]),
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, off_t, mask_t, gt, w_t)
    dmask = dmask[:, :H].astype(mask.dtype)
    dw = jnp.sum(dw, axis=(0, 1))[:, :C].reshape(3, 3, C, Co).astype(weight.dtype)
    return dmask, dw


# ---------------------------------------------------------------------------
# backward kernel 3, v2 layout: doffset — derivative samples SY/SX
# ---------------------------------------------------------------------------

def _doff2_kernel(x_hbm, off_ref, mask_ref, g_ref, wt_ref, doff_ref,
                  xv_ref, xs_ref, u_ref, s_ref, t_ref, sem,
                  *, tile_h: int, width: int, max_offset: int, compute_dtype):
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h

    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])],
                               xv_ref, sem)
    cp.start()
    cp.wait()
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, j: j + width, :]

    g2 = g_ref[0].reshape(tile_h * width, g_ref.shape[-1])
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        u_ref[...] = jnp.dot(g2, wt_ref[k],
                             preferred_element_type=jnp.float32).reshape(
            u_ref.shape).astype(u_ref.dtype)
        oy_raw = off_ref[0, 2 * k]
        ox_raw = off_ref[0, 2 * k + 1]
        oy = jnp.clip(oy_raw, -R, R)
        ox = jnp.clip(ox_raw, -R, R)
        mk = mask_ref[0, k]
        u32 = u_ref[...].astype(jnp.float32)

        # SY: hat'_y hat_x;   SX: hat_y hat'_x
        _window_sample(xs_ref, oy, ox, ky, kx, R, P, tile_h, width,
                       s_ref, t_ref, compute_dtype, dy_weight=_dhat)
        doff_ref[0, :, :, 2 * k] = (jnp.sum(
            s_ref[...].astype(jnp.float32) * u32, axis=-1)
            * mk * (jnp.abs(oy_raw) <= R).astype(jnp.float32))
        _window_sample(xs_ref, oy, ox, ky, kx, R, P, tile_h, width,
                       s_ref, t_ref, compute_dtype, dx_weight=_dhat)
        doff_ref[0, :, :, 2 * k + 1] = (jnp.sum(
            s_ref[...].astype(jnp.float32) * u32, axis=-1)
            * mk * (jnp.abs(ox_raw) <= R).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_v2_bwd_doff(x, offset, mask, weight, g, max_offset: int = 2,
                           compute_dtype=None):
    """Offset gradient, v2 layout; NHWC in/out."""
    args, d = _prep2(x, offset, mask, weight, g, max_offset, compute_dtype)
    xt, off_t, mask_t, gt, w_nat, w_t = args
    B, H, W, C, Co = d["B"], d["H"], d["W"], d["C"], d["Co"]
    Cp = d["Cp"]
    tile_h, Hp, win_h, P = d["tile_h"], d["Hp"], d["win_h"], d["P"]
    kernel = functools.partial(_doff2_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset,
                               compute_dtype=d["compute_dtype"])
    doff = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, tile_h, W, Co), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((9, Co, Cp), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, 18), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, 18), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, d["wp2f"], Cp), d["compute_dtype"]),
            pltpu.VMEM((2 * P + 1, win_h, W, Cp), d["compute_dtype"]),
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, off_t, mask_t, gt, w_t)
    return doff[:, :H].astype(offset.dtype)


def _dwmo2_kernel(x_hbm, off_ref, mask_ref, g_ref, wt_ref,
                  dmask_ref, dw_ref, doff_ref,
                  xv_ref, xs_ref, u_ref, s_ref, sy_ref, sx_ref, t_ref, td_ref,
                  sem,
                  *, tile_h: int, width: int, max_offset: int, compute_dtype):
    """Fused dmask + dW + doffset in a SINGLE window sweep.

    S (hat*hat), SY (hat'*hat) and SX (hat*hat') share every `rows` read: the
    inner dx loop accumulates t += rows*wx and td += rows*wx', the outer dy
    loop distributes wy/wy' over both.  ~1.1k vector ops per tap-sweep vs
    ~2.2k for the split dwm+doff pair and ~3.3k for the old three-pass fused
    kernel (whose Mosaic compile ran >45 min at the stride-4 shape) — this
    is both the fastest-compiling and fastest-running form of the non-dx
    backward."""
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h

    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])],
                               xv_ref, sem)
    cp.start()
    cp.wait()
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, j: j + width, :]

    g2 = g_ref[0].reshape(tile_h * width, g_ref.shape[-1])

    # taps run under lax.fori_loop, NOT a Python unroll: Mosaic compile time
    # grows superlinearly with unrolled vector-op count (measured on v5e:
    # dwm 1 pass 5.5 min, doff 2 passes >18 min, 3-pass fused >45 min per
    # shape), so the tap body is compiled once and every tap-dependent
    # access (wt_ref[k], off/mask channel, xs window position, output tap
    # channel) is a dynamic index on an UNTILED dim — dmask/dw/doff keep the
    # tap axis off the lane dim for exactly this reason (transposed back by
    # the host wrapper).
    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        u_ref[...] = jnp.dot(g2, wt_ref[pl.ds(k, 1)][0],
                             preferred_element_type=jnp.float32).reshape(
            u_ref.shape).astype(u_ref.dtype)
        u32 = u_ref[...].astype(jnp.float32)
        oy_raw = off_ref[0, pl.ds(2 * k, 1)][0]
        ox_raw = off_ref[0, pl.ds(2 * k + 1, 1)][0]
        oy = jnp.clip(oy_raw, -R, R)
        ox = jnp.clip(ox_raw, -R, R)
        mk = mask_ref[0, pl.ds(k, 1)][0]

        s_ref[...] = jnp.zeros_like(s_ref)
        sy_ref[...] = jnp.zeros_like(sy_ref)
        sx_ref[...] = jnp.zeros_like(sx_ref)
        for e in range(-R, R + 1):          # dy = ky + e
            wy = _hat(oy - e)
            wyd = _dhat(oy - e)
            t_ref[...] = jnp.zeros_like(t_ref)
            td_ref[...] = jnp.zeros_like(td_ref)
            for f in range(-R, R + 1):      # dx = kx + f
                wx = _hat(ox - f)
                wxd = _dhat(ox - f)
                rows = xs_ref[pl.ds(P + kx + f, 1),
                              pl.ds(P + ky + e, tile_h), :, :][0]
                t_ref[...] += rows * wx[:, :, None].astype(compute_dtype)
                td_ref[...] += rows * wxd[:, :, None].astype(compute_dtype)
            s_ref[...] += t_ref[...] * wy[:, :, None].astype(compute_dtype)
            sx_ref[...] += td_ref[...] * wy[:, :, None].astype(compute_dtype)
            sy_ref[...] += t_ref[...] * wyd[:, :, None].astype(compute_dtype)

        dmask_ref[0, pl.ds(k, 1)] = jnp.sum(
            s_ref[...].astype(jnp.float32) * u32, axis=-1)[None]
        sk = (s_ref[...] * mk[:, :, None].astype(compute_dtype)).reshape(
            tile_h * width, s_ref.shape[-1])
        dw_ref[0, 0, pl.ds(k, 1)] = jax.lax.dot_general(
            sk, g2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]
        # doffset: derivative samples, gated to zero where the raw offset
        # sits beyond the clamp (matching the clipped forward)
        doff_ref[0, pl.ds(2 * k, 1)] = (jnp.sum(
            sy_ref[...].astype(jnp.float32) * u32, axis=-1)
            * mk * (jnp.abs(oy_raw) <= R).astype(jnp.float32))[None]
        doff_ref[0, pl.ds(2 * k + 1, 1)] = (jnp.sum(
            sx_ref[...].astype(jnp.float32) * u32, axis=-1)
            * mk * (jnp.abs(ox_raw) <= R).astype(jnp.float32))[None]
        return carry

    jax.lax.fori_loop(0, 9, tap_body, 0)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_v2_bwd_dwmo(x, offset, mask, weight, g, max_offset: int = 2,
                           compute_dtype=None):
    """Fused mask + weight + offset gradients; returns (dmask, dw, doff)."""
    args, d = _prep2(x, offset, mask, weight, g, max_offset, compute_dtype)
    xt, off_t, mask_t, gt, w_nat, w_t = args
    B, H, W, C, Co = d["B"], d["H"], d["W"], d["C"], d["Co"]
    Cp = d["Cp"]
    tile_h, Hp, win_h, P = d["tile_h"], d["Hp"], d["win_h"], d["P"]
    n_tiles = Hp // tile_h
    kernel = functools.partial(_dwmo2_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset,
                               compute_dtype=d["compute_dtype"])
    dmask, dw, doff = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, tile_h, W, Co), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((9, Co, Cp), lambda b, h: (0, 0, 0)),
        ],
        out_specs=[
            # tap axis on an untiled dim (dynamic per-tap writes from the
            # fori_loop body); transposed to NHWC below
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 1, 9, Cp, Co), lambda b, h: (b, h, 0, 0, 0)),
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 9, Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, 9, Cp, Co), jnp.float32),
            jax.ShapeDtypeStruct((B, 18, Hp, W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((win_h, d["wp2f"], Cp), d["compute_dtype"]),
            pltpu.VMEM((2 * P + 1, win_h, W, Cp), d["compute_dtype"]),
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),   # u
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),   # s
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),   # sy
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),   # sx
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),   # t
            pltpu.VMEM((tile_h, W, Cp), d["compute_dtype"]),   # td
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, off_t, mask_t, gt, w_t)
    dmask = jnp.transpose(dmask, (0, 2, 3, 1))[:, :H].astype(mask.dtype)
    dw = jnp.sum(dw, axis=(0, 1))[:, :C].reshape(3, 3, C, Co).astype(weight.dtype)
    doff = jnp.transpose(doff, (0, 2, 3, 1))[:, :H].astype(offset.dtype)
    return dmask, dw, doff


def _packed_dwmo_kernel(x_hbm, offe_ref, offo_ref, maske_ref, masko_ref,
                        g_ref, wt_ref,
                        dmaske_ref, dmasko_ref, dw_ref, doffe_ref, doffo_ref,
                        xv_ref, xs_ref, u_ref, s_ref, sy_ref, sx_ref, t_ref,
                        td_ref, sem,
                        *, tile_h: int, width: int, max_offset: int,
                        compute_dtype):
    """Lane-packed single-sweep dmask+dW+doffset (C = Co = 64).

    Same packing as the packed forward (two pixels per 128-lane tile,
    block-diagonal weights); the per-pixel channel reductions split the
    lane dim in halves (even pixel = lanes 0..63, odd = 64..127) and write
    parity-separated outputs that the wrapper re-interleaves.  The packed
    dW contraction produces a (128,128) block matrix whose diagonal blocks
    are the even/odd-pixel contributions; the wrapper sums them."""
    R = max_offset
    P = R + 1
    wh = width // 2
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h

    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])],
                               xv_ref, sem)
    cp.start()
    cp.wait()
    for j in range(2 * P + 1):
        s = j + 1
        a = s // 2
        if s % 2 == 0:
            xs_ref[j] = xv_ref[:, a: a + wh, :]
        else:
            xs_ref[j] = jnp.concatenate(
                [xv_ref[:, a: a + wh, 64:],
                 xv_ref[:, a + 1: a + 1 + wh, :64]], axis=-1)

    g2 = g_ref[0].reshape(tile_h * wh, g_ref.shape[-1])

    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        u_ref[...] = jnp.dot(g2, wt_ref[pl.ds(k, 1)][0],
                             preferred_element_type=jnp.float32).reshape(
            u_ref.shape).astype(u_ref.dtype)
        u32 = u_ref[...].astype(jnp.float32)
        oye_raw = offe_ref[0, pl.ds(2 * k, 1)][0]
        oyo_raw = offo_ref[0, pl.ds(2 * k, 1)][0]
        oxe_raw = offe_ref[0, pl.ds(2 * k + 1, 1)][0]
        oxo_raw = offo_ref[0, pl.ds(2 * k + 1, 1)][0]
        oy_e = jnp.clip(oye_raw, -R, R)
        oy_o = jnp.clip(oyo_raw, -R, R)
        ox_e = jnp.clip(oxe_raw, -R, R)
        ox_o = jnp.clip(oxo_raw, -R, R)
        mk_e = maske_ref[0, pl.ds(k, 1)][0]
        mk_o = masko_ref[0, pl.ds(k, 1)][0]

        s_ref[...] = jnp.zeros_like(s_ref)
        sy_ref[...] = jnp.zeros_like(sy_ref)
        sx_ref[...] = jnp.zeros_like(sx_ref)
        for e in range(-R, R + 1):
            wy = jnp.concatenate(
                [jnp.broadcast_to(_hat(oy_e - e)[:, :, None],
                                  (tile_h, wh, 64)),
                 jnp.broadcast_to(_hat(oy_o - e)[:, :, None],
                                  (tile_h, wh, 64))],
                axis=-1).astype(compute_dtype)
            wyd = jnp.concatenate(
                [jnp.broadcast_to(_dhat(oy_e - e)[:, :, None],
                                  (tile_h, wh, 64)),
                 jnp.broadcast_to(_dhat(oy_o - e)[:, :, None],
                                  (tile_h, wh, 64))],
                axis=-1).astype(compute_dtype)
            t_ref[...] = jnp.zeros_like(t_ref)
            td_ref[...] = jnp.zeros_like(td_ref)
            for f in range(-R, R + 1):
                wx = jnp.concatenate(
                    [jnp.broadcast_to(_hat(ox_e - f)[:, :, None],
                                      (tile_h, wh, 64)),
                     jnp.broadcast_to(_hat(ox_o - f)[:, :, None],
                                      (tile_h, wh, 64))],
                    axis=-1).astype(compute_dtype)
                wxd = jnp.concatenate(
                    [jnp.broadcast_to(_dhat(ox_e - f)[:, :, None],
                                      (tile_h, wh, 64)),
                     jnp.broadcast_to(_dhat(ox_o - f)[:, :, None],
                                      (tile_h, wh, 64))],
                    axis=-1).astype(compute_dtype)
                rows = xs_ref[pl.ds(P + kx + f, 1),
                              pl.ds(P + ky + e, tile_h), :, :][0]
                t_ref[...] += rows * wx
                td_ref[...] += rows * wxd
            s_ref[...] += t_ref[...] * wy
            sx_ref[...] += td_ref[...] * wy
            sy_ref[...] += t_ref[...] * wyd

        s32 = s_ref[...].astype(jnp.float32) * u32
        dmaske_ref[0, pl.ds(k, 1)] = jnp.sum(s32[..., :64], axis=-1)[None]
        dmasko_ref[0, pl.ds(k, 1)] = jnp.sum(s32[..., 64:], axis=-1)[None]
        mk = jnp.concatenate(
            [jnp.broadcast_to(mk_e[:, :, None], (tile_h, wh, 64)),
             jnp.broadcast_to(mk_o[:, :, None], (tile_h, wh, 64))],
            axis=-1).astype(compute_dtype)
        sk = (s_ref[...] * mk).reshape(tile_h * wh, s_ref.shape[-1])
        dw_ref[0, 0, pl.ds(k, 1)] = jax.lax.dot_general(
            sk, g2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]
        sy32 = sy_ref[...].astype(jnp.float32) * u32
        sx32 = sx_ref[...].astype(jnp.float32) * u32
        doffe_ref[0, pl.ds(2 * k, 1)] = (
            jnp.sum(sy32[..., :64], axis=-1) * mk_e
            * (jnp.abs(oye_raw) <= R).astype(jnp.float32))[None]
        doffo_ref[0, pl.ds(2 * k, 1)] = (
            jnp.sum(sy32[..., 64:], axis=-1) * mk_o
            * (jnp.abs(oyo_raw) <= R).astype(jnp.float32))[None]
        doffe_ref[0, pl.ds(2 * k + 1, 1)] = (
            jnp.sum(sx32[..., :64], axis=-1) * mk_e
            * (jnp.abs(oxe_raw) <= R).astype(jnp.float32))[None]
        doffo_ref[0, pl.ds(2 * k + 1, 1)] = (
            jnp.sum(sx32[..., 64:], axis=-1) * mk_o
            * (jnp.abs(oxo_raw) <= R).astype(jnp.float32))[None]
        return carry

    jax.lax.fori_loop(0, 9, tap_body, 0)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_v2_packed_bwd_dwmo(x, offset, mask, weight, g,
                                  max_offset: int = 2, compute_dtype=None):
    """Lane-packed fused mask/weight/offset gradients (C = Co = 64)."""
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    assert C == 64 and Co == 64 and W % 2 == 0, (C, Co, W)
    R = max_offset
    P = R + 1
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    tile_h = _pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    wh = W // 2
    np_pairs = ((W + 8) // 2 + 7) // 8 * 8
    right = np_pairs * 2 - W - 4
    n_tiles = Hp // tile_h

    xt = jnp.pad(x.astype(compute_dtype),
                 ((0, 0), (P, P + pad_h), (4, right), (0, 0)))
    xp = xt.reshape(B, Hp + 2 * P, np_pairs, 128)
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    gt = g.astype(compute_dtype)
    if pad_h:
        off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        gt = jnp.pad(gt, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
    offe, offo = off_t[..., 0::2], off_t[..., 1::2]
    maske, masko = mask_t[..., 0::2], mask_t[..., 1::2]
    gp = gt.reshape(B, Hp, wh, 128)
    wkT = jnp.transpose(weight.reshape(9, C, Co),
                        (0, 2, 1)).astype(compute_dtype)
    wtblk = jnp.zeros((9, 128, 128), compute_dtype)
    wtblk = wtblk.at[:, :64, :64].set(wkT).at[:, 64:, 64:].set(wkT)

    kernel = functools.partial(_packed_dwmo_kernel, tile_h=tile_h, width=W,
                               max_offset=max_offset,
                               compute_dtype=compute_dtype)
    dme, dmo, dw, dfe, dfo = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 18, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, tile_h, wh, 128), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((9, 128, 128), lambda b, h: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 9, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 1, 9, 128, 128), lambda b, h: (b, h, 0, 0, 0)),
            pl.BlockSpec((1, 18, tile_h, wh), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 18, tile_h, wh), lambda b, h: (b, 0, h, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 9, Hp, wh), jnp.float32),
            jax.ShapeDtypeStruct((B, 9, Hp, wh), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, 9, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 18, Hp, wh), jnp.float32),
            jax.ShapeDtypeStruct((B, 18, Hp, wh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((win_h, np_pairs, 128), compute_dtype),
            pltpu.VMEM((2 * P + 1, win_h, wh, 128), compute_dtype),
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),   # u
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),   # s
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),   # sy
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),   # sx
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),   # t
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),   # td
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, offe, offo, maske, masko, gp, wtblk)

    def interleave(ch, a, bb):
        # (B, ch, Hp, wh) x2 -> NHWC (B, H, W, ch)
        v = jnp.stack([a, bb], axis=-1).reshape(B, ch, Hp, W)
        return jnp.transpose(v, (0, 2, 3, 1))[:, :H]

    dmask = interleave(9, dme, dmo).astype(mask.dtype)
    doff = interleave(18, dfe, dfo).astype(offset.dtype)
    dwb = jnp.sum(dw, axis=(0, 1))
    dwk = (dwb[:, :64, :64] + dwb[:, 64:, 64:]).reshape(3, 3, C, Co)
    return dmask, dwk.astype(weight.dtype), doff


def _prep2(x, offset, mask, weight, g, max_offset, compute_dtype):
    """Shared operand prep for the v2 dwm/doff kernels (NHWC halos for x,
    compact transposed offset/mask, NHWC g tiles, both weight forms)."""
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    P = max_offset + 1
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    tile_h = _pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    # manually-DMA'd buffers must have tile-aligned trailing dims: channels
    # (lanes) padded to 128, the W+2P column dim (sublanes) padded to 8
    Cp = C + (-C) % 128
    wp2f = W + 2 * P
    wp2f = wp2f + (-wp2f) % 8

    xt = jnp.pad(x.astype(compute_dtype),
                 ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cp - C)))
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    gt = g.astype(compute_dtype)
    if pad_h:
        off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        gt = jnp.pad(gt, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
    w_nat = weight.reshape(9, C, Co).astype(compute_dtype)
    # u = g @ W_k^T must produce Cp columns so the lane-reduce against the
    # Cp-padded window sample lines up (padded cols are zero)
    w_t = jnp.pad(jnp.transpose(w_nat, (0, 2, 1)), ((0, 0), (0, 0), (0, Cp - C)))
    d = dict(B=B, H=H, W=W, C=C, Co=Co, Cp=Cp, wp2f=wp2f, tile_h=tile_h,
             Hp=Hp, win_h=win_h, P=P, compute_dtype=compute_dtype)
    return (xt, off_t, mask_t, gt, w_nat, w_t), d


def dcn_pallas_v2_bwd(x, offset, mask, weight, g, max_offset: int = 2,
                      compute_dtype=None, fused: bool = True,
                      packed: bool = False):
    """All five gradients via the v2 kernels (two when fused, else three).

    fused=True runs the SINGLE-SWEEP dwmo kernel (S/SY/SX accumulated in one
    window pass).  Mosaic compile time scales hard with unrolled vector-op
    count: the old three-pass fused kernel took >45 min per shape and the
    split doff kernel (two passes) >18 min, while single-sweep dwmo carries
    the fewest ops of any arrangement.  The split dwm/doff pair remains for
    comparison/debug.  packed=True lane-packs the dwmo sweep on eligible
    (C = Co = 64, even W) shapes."""
    C, Co, W = x.shape[-1], weight.shape[-1], x.shape[2]
    if packed and C == 64 and Co == 64 and W % 2 == 0:
        dx = dcn_pallas_v2_packed_bwd_dx(x, offset, mask, weight, g,
                                         max_offset=max_offset,
                                         compute_dtype=compute_dtype)
    else:
        dx = dcn_pallas_v2_bwd_dx(x, offset, mask, weight, g,
                                  max_offset=max_offset,
                                  compute_dtype=compute_dtype)
    if packed and C == 64 and Co == 64 and W % 2 == 0:
        dmask, dw, doff = dcn_pallas_v2_packed_bwd_dwmo(
            x, offset, mask, weight, g, max_offset=max_offset,
            compute_dtype=compute_dtype)
    elif fused:
        dmask, dw, doff = dcn_pallas_v2_bwd_dwmo(
            x, offset, mask, weight, g, max_offset=max_offset,
            compute_dtype=compute_dtype)
    else:
        dmask, dw = dcn_pallas_v2_bwd_dwm(x, offset, mask, weight, g,
                                          max_offset=max_offset,
                                          compute_dtype=compute_dtype)
        doff = dcn_pallas_v2_bwd_doff(x, offset, mask, weight, g,
                                      max_offset=max_offset,
                                      compute_dtype=compute_dtype)
    db = jnp.sum(g, axis=(0, 1, 2))
    return dx, doff, dmask, dw, db


def _primal(x, offset, mask, weight, bias, max_offset, packed):
    C, Co, W = x.shape[-1], weight.shape[-1], x.shape[2]
    if packed and C == 64 and Co == 64 and W % 2 == 0:
        return dcn_pallas_v2_packed(x, offset, mask, weight, bias,
                                    max_offset=max_offset)
    return dcn_pallas_v2(x, offset, mask, weight, bias, max_offset=max_offset)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dcn_pallas_v2_vjp(x, offset, mask, weight, bias, max_offset: int = 2,
                      packed: bool = False):
    """v2 forward (lane-packed on eligible shapes when packed=True) + v2
    backward kernels."""
    return _primal(x, offset, mask, weight, bias, max_offset, packed)


def _fwd(x, offset, mask, weight, bias, max_offset, packed):
    out = _primal(x, offset, mask, weight, bias, max_offset, packed)
    return out, (x, offset, mask, weight)


def _bwd(max_offset, packed, residuals, g):
    x, offset, mask, weight = residuals
    return dcn_pallas_v2_bwd(x, offset, mask, weight, g,
                             max_offset=max_offset, packed=packed)


dcn_pallas_v2_vjp.defvjp(_fwd, _bwd)
