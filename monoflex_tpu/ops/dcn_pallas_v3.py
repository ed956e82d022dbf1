"""Pallas DCN v3: C-on-sublanes / W-on-lanes layout ("v15" in the ablation).

Same math as ops/dcn_pallas_v2.py (modulated deformable 3x3 conv via an
exact (2R+1)^2 shift window; reference CUDA counterpart:
model/backbone/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:125) but a third-
generation layout driven by the round-3 device ablation (tools/fwd_ablate.py):

The v2 (NHWC) kernel spends 82% of its time NOT on the window FMAs but on
relayouting the per-pixel hat-weight maps: a compact (tile_h, W) map with W
on lanes must become (tile_h, W, 1) — a unit-MINOR dim — before broadcasting
along C, and that lane->sublane relayout costs about as much as a full-width
FMA, paid 30x per tap (measured: full 15.82 ms vs scalar-map ablation
2.24 ms at (8,96,320,64->64)).

v3 transposes the feature map to (rows, C, W): C on SUBLANES, W on LANES,
rows on the untiled outer dim.  The map application becomes wm[:, None, :]
— a unit SECOND-MINOR dim, i.e. a cheap sublane broadcast.  Consequences:

  - column (dx) shifts are pre-shifted LANE copies (the v2 xs trick, now on
    the lane axis); row (dy) shifts index the untiled dim: both free;
  - for C=64 there is NO lane padding (W fills the 128 lanes), so the
    window FMAs do no padded work — v2 padded C 64->128 and wasted half of
    every vector op on the five dominant stride-4 layers;
  - the tap matmul contracts C (the sublane dim of both operands) per row
    and emits (W, Co) — already the NHWC output tile layout;
  - Mosaic compiles in seconds (5.6 s at the hot shape vs minutes for v2):
    far fewer relayout ops to schedule.

Measured (8,96,320,64->64, f32, R=2, v5e): v2 15.82 ms -> v3 3.56 ms
(4.4x), bit-exact vs v2.

The backward kernels (dx / fused dW+dmask+doffset) carry the same layout:
every hat/dhat map application is a sublane broadcast, the per-pixel channel
reductions (dmask/doffset) are SUBLANE reductions emitting (tile_h, W) maps
directly, and the dW contraction runs per-row (C, W) x (Co, W)^T on the MXU.

Mosaic/v5e constraints inherited from the round-2 campaign (docs/DESIGN.md):
taps run under lax.fori_loop (unrolled-op count drives superlinear compile
time and vreg spills); tap-dependent reads index UNTILED dims; the dx
kernel's map-window extraction uses dynamic pltpu.roll with positive-biased
shifts (negative dynamic shifts silently corrupt data on v5e).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _dhat(t):
    # d/dt max(0, 1-|t|) = -sign(t) where |t| < 1
    return jnp.where(jnp.abs(t) < 1.0, -jnp.sign(t), 0.0)


def _pick_tile_h(H: int) -> int:
    # rows live on the untiled outer dim; 16 amortizes the 2P-row halo
    if H <= 32:
        return 16 * max(1, -(-H // 16))  # whole (padded) map in one tile
    return 16


def _dims(H, W, C, Co, R):
    """Shared layout arithmetic: lane-padded widths, sublane-padded C."""
    P = R + 1
    tile_h = _pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    wp = W + (-W) % 128                  # W on lanes
    wp2f = wp + 2 * P
    wp2f = wp2f + (-wp2f) % 128          # DMA minor-dim alignment
    Cs = C + (-C) % 8                    # C on sublanes
    Cos = Co + (-Co) % 8
    return P, tile_h, pad_h, Hp, win_h, wp, wp2f, Cs, Cos


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd3_kernel(x_hbm, off_ref, mask_ref, w_ref, *rest,
                 tile_h, max_offset, compute_dtype, fuse=False):
    if fuse:
        # ep_ref rows: 0 = per-channel scale, 1 = shift (folded eval-BN +
        # conv bias); epilogue applies scale*out + shift then ReLU in VMEM,
        # saving the two HBM passes XLA's separate BN+ReLU fusion costs
        ep_ref, out_ref, xv_ref, xs_ref, s_ref, t_ref, sem = rest
    else:
        out_ref, xv_ref, xs_ref, s_ref, t_ref, sem = rest
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    wp = xs_ref.shape[-1]                      # lane-padded W

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])], xv_ref, sem)
    copy.start()
    copy.wait()
    # pre-shifted column copies: xs[j][r, c, w] = xv[r, c, w + j].  When x is
    # shipped in a narrower transfer dtype (bf16 halves the HBM relayout +
    # DMA bytes) the upcast to the f32 window math rides these copies for
    # free; bf16->f32 is exact, so the kernel output is bit-identical to
    # running the f32 kernel on a bf16-quantized x.
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, :, j: j + wp].astype(xs_ref.dtype)

    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        oy = jnp.clip(off_ref[0, pl.ds(2 * k, 1)][0], -R, R)
        ox = jnp.clip(off_ref[0, pl.ds(2 * k + 1, 1)][0], -R, R)
        mk = mask_ref[0, pl.ds(k, 1)][0]

        s_ref[...] = jnp.zeros_like(s_ref)
        for e in range(-R, R + 1):
            wy = (_hat(oy - e) * mk)[:, None, :].astype(compute_dtype)
            t_ref[...] = jnp.zeros_like(t_ref)
            for f in range(-R, R + 1):
                wx = _hat(ox - f)[:, None, :].astype(compute_dtype)
                rows = xs_ref[pl.ds(P + kx + f, 1),
                              pl.ds(P + ky + e, tile_h), :, :][0]
                t_ref[...] += rows * wx
            s_ref[...] += t_ref[...] * wy

        # contract C (sublanes of both operands); rows emit (W, Co) = NHWC
        for r in range(tile_h):
            out_ref[0, r] += jax.lax.dot_general(
                s_ref[r], w_ref[pl.ds(k, 1)][0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:out_ref.shape[2]].astype(
                out_ref.dtype)
        return carry

    out_ref[0] = jnp.zeros_like(out_ref[0])
    jax.lax.fori_loop(0, 9, tap_body, 0)
    if fuse:
        out_ref[0] = jnp.maximum(
            out_ref[0] * ep_ref[0:1][None] + ep_ref[1:2][None], 0.0)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype",
                                              "transfer_dtype"))
def dcn_pallas_v3(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                  max_offset: int = 2, compute_dtype=None,
                  transfer_dtype=None,
                  epilogue: Optional[tuple] = None) -> jnp.ndarray:
    """NHWC modulated deformable conv, v3 (C-sublane/W-lane) kernel.

    Same contract as ops.dcn_pallas_v2.dcn_pallas_v2: x (B,H,W,C); offset
    (B,H,W,18) interleaved (dy,dx); mask (B,H,W,9) post-sigmoid;
    weight (3,3,C,Co).  Returns (B,H,W,Co) in x.dtype.

    transfer_dtype: dtype x is SHIPPED in (the XLA-side relayout to the
    kernel layout and the HBM->VMEM DMA).  bf16 halves those bytes while the
    window math stays in compute_dtype (upcast rides the in-VMEM shift
    copies); output == the f32 kernel on jnp.asarray(x, transfer_dtype).

    epilogue: optional (scale, shift) pair of (Co,) f32 vectors — the kernel
    applies relu(out*scale + shift) in VMEM before the output write (folded
    eval-mode BN + ReLU; the conv bias must be pre-folded into shift by the
    caller — ``bias`` is ignored when epilogue is given).  Inference-only:
    the VJP wrappers never pass it.
    """
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    if transfer_dtype is None:
        transfer_dtype = compute_dtype
    P, tile_h, pad_h, Hp, win_h, wp, wp2f, Cs, _ = _dims(H, W, C, Co, R)

    # x to (B, Hp + 2P, Cs, wp2f): C on sublanes, W on lanes
    xt = jnp.pad(x.astype(transfer_dtype),
                 ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cs - C)))
    xt = jnp.transpose(xt, (0, 1, 3, 2))
    # offset/mask maps lane-padded to wp so the hat maps broadcast directly
    # against the (tile_h, Cs, wp) accumulators
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, wp - W)))
    mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, wp - W)))
    w_t = jnp.pad(weight.reshape(9, C, Co).astype(compute_dtype),
                  ((0, 0), (0, Cs - C), (0, 0)))

    kernel = functools.partial(_fwd3_kernel, tile_h=tile_h, max_offset=R,
                               compute_dtype=compute_dtype,
                               fuse=epilogue is not None)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 18, tile_h, wp), lambda b, h: (b, 0, h, 0)),
        pl.BlockSpec((1, 9, tile_h, wp), lambda b, h: (b, 0, h, 0)),
        pl.BlockSpec((9, Cs, Co), lambda b, h: (0, 0, 0)),
    ]
    operands = [xt, off_t, mask_t, w_t]
    if epilogue is not None:
        scale, shift = epilogue
        ep = jnp.zeros((8, Co), jnp.float32)
        ep = ep.at[0].set(scale.astype(jnp.float32))
        ep = ep.at[1].set(shift.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((8, Co), lambda b, h: (0, 0)))
        operands.append(ep)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, W, Co), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, Cs, wp2f), transfer_dtype),
            pltpu.VMEM((2 * P + 1, win_h, Cs, wp), compute_dtype),
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(*operands)

    out = out[:, :H]
    if bias is not None and epilogue is None:
        out = out + bias
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# backward kernel 1: dx — mirrored window over source pixels
# ---------------------------------------------------------------------------


def _dx3_kernel(g_hbm, offh_hbm, maskh_hbm, w_ref, dx_ref,
                gv_ref, uv_ref, us_ref, offh_ref, maskh_ref, hxm_ref,
                wmap_ref, acc_ref, sem,
                *, tile_h, max_offset, compute_dtype):
    """dx[q] = sum_k sum_d hatw_{k,d}(q-d) m_k(q-d) u_k(q-d), u_k = g W_k^T.

    v3 layout: g halo (win_h, Co, wp2) rows untiled, u_k formed per-row on
    the MXU ((C,Co) @ (Co, wp2)), pre-shifted into 2P+1 lane-aligned copies.
    The per-source-pixel weight maps live compact ((win_h8, wp2o) rows on
    sublanes); tap-dependent row/col extraction is dynamic positive
    pltpu.roll + static slice, and the map application is the cheap
    [:, None, :] sublane broadcast."""
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    win_h = gv_ref.shape[0]
    wp = acc_ref.shape[-1]

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

    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        # u_k[c, w] = sum_co W_k[c, co] g[co, w]: per-row MXU matmul
        # contracting the SUBLANE dim of both operands (w_ref holds W_k^T)
        for r in range(win_h):
            uv_ref[r] = jax.lax.dot_general(
                w_ref[pl.ds(k, 1)][0], gv_ref[r],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(uv_ref.dtype)
        for j in range(2 * P + 1):
            us_ref[j] = uv_ref[:, :, j: j + wp]

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
                # [P-dx, P-dx+wp): dynamic roll to the origin + static slice
                # (rows are sublanes: dynamic starts are illegal).  Shifts
                # biased positive: pltpu.roll with a NEGATIVE dynamic shift
                # silently corrupts data on v5e (docs/DESIGN.md item 8)
                wm = pltpu.roll(wyh * hxm_ref[j],
                                shift=(ky + e) - 8 + win_h8, axis=0)
                wm = pltpu.roll(wm, shift=(kx + f) - P + wyh.shape[1], axis=1)
                wmap_ref[...] = wm[:tile_h, :wp]
                rows = us_ref[pl.ds(P - kx - f, 1),
                              pl.ds(P - ky - e, tile_h)][0]
                acc_ref[...] += (rows * wmap_ref[...][:, None, :].astype(
                    compute_dtype))
        return carry

    jax.lax.fori_loop(0, 9, tap_body, 0)
    # emitted in kernel layout (tile_h, Cs, wp); XLA transposes to NHWC
    # outside (an in-kernel per-row transpose is exactly the relayout class
    # this kernel generation exists to avoid)
    dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype"))
def dcn_pallas_v3_bwd_dx(x, offset, mask, weight, g, max_offset: int = 2,
                         compute_dtype=None):
    """Gradient w.r.t. x for the v3 DCN (x only supplies shape/dtype)."""
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    P, tile_h, pad_h, Hp, win_h, wp, wp2f, Cs, Cos = _dims(H, W, C, Co, R)

    # g halo to (B, Hp + 2P, Cos, wp2f): Co on sublanes, W on lanes
    gt = jnp.pad(g.astype(compute_dtype),
                 ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cos - Co)))
    gt = jnp.transpose(gt, (0, 1, 3, 2))
    # compact per-pixel maps with 8-row guard bands (rows on sublanes); the
    # minor dim of these manually-DMA'd buffers must be 128-lane aligned
    wp2o = wp2f                       # already a 128 multiple
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    off_t = jnp.pad(off_t, ((0, 0), (0, 0), (8, 8 + pad_h), (P, wp2o - W - P)))
    mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (8, 8 + pad_h),
                              (P, wp2o - W - P)))
    # W_k^T as (9, Cos, Cs): u contracts the sublane dim of both operands
    w_t = jnp.pad(
        jnp.transpose(weight.reshape(9, C, Co), (0, 2, 1)).astype(
            compute_dtype),
        ((0, 0), (0, Cos - Co), (0, Cs - C)))

    kernel = functools.partial(_dx3_kernel, tile_h=tile_h, max_offset=R,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, Cos, Cs), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, Cs, wp), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Cs, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, Cos, wp2f), compute_dtype),
            pltpu.VMEM((win_h, Cs, wp2f), compute_dtype),
            pltpu.VMEM((2 * P + 1, win_h, Cs, wp), compute_dtype),
            pltpu.VMEM((18, tile_h + 16, wp2o), jnp.float32),
            pltpu.VMEM((9, tile_h + 16, wp2o), jnp.float32),
            pltpu.VMEM((2 * P + 1, tile_h + 16, wp2o), jnp.float32),
            pltpu.VMEM((tile_h, wp), jnp.float32),
            pltpu.VMEM((tile_h, Cs, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(gt, off_t, mask_t, w_t)
    # kernel layout (B, Hp, Cs, wp) -> NHWC
    return jnp.transpose(out, (0, 1, 3, 2))[:, :H, :W, :C].astype(x.dtype)


# ---------------------------------------------------------------------------
# backward kernel 1b: dx v4 — roll-free tap windows
# ---------------------------------------------------------------------------
#
# dx3 (above) extracts each tap's destination-aligned weight map with TWO
# dynamic pltpu.rolls per (tap, dy, dx) — 450 rolls of a (tile_h+16, wp2o)
# f32 map per grid step, which is why dx3 runs ~2.3x the forward kernel's
# time at the hot shape (9.02 vs 3.95 ms) despite identical FMA counts.
# The rolls exist because (a) the tap index k is a fori_loop variable, so
# the map row shift ky+e is dynamic, and (b) the compact maps keep rows on
# SUBLANES, where dynamic slice starts are illegal on v5e.
#
# v4 removes both causes instead of paying for them:
#   - taps are unrolled in PYTHON (9 static (ky, kx)); only the 2R+1-trip
#     row loop runs under fori, so every map COLUMN slice start
#     (P - kx - f) is a static lane offset;
#   - offset/mask maps are staged rows-UNTILED with a singleton sublane dim
#     ((27, win_h, 1, wp2f) — the sublane padding costs VMEM, not HBM), so
#     the dynamic row start (P - ky - e, e the fori index) lands on an
#     untiled dim: legal, and free of shuffles.
# The u = W_k^T g staging and the 2P+1 pre-shifted column banks are
# unchanged from dx3.  Zero pltpu.roll calls remain.


def _dx4_kernel(g_hbm, omm_hbm, w_ref, dx_ref,
                gv_ref, uv_ref, us_ref, mv_ref, acc_ref, sem,
                *, tile_h, max_offset, compute_dtype):
    """dx[p] = sum_k sum_{e,f} hat(oy_k(q)-e) hat(ox_k(q)-f) m_k(q) u_k(q),
    q = p - (ky+e, kx+f), u_k = g W_k^T — all shifts static or untiled."""
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    win_h = gv_ref.shape[0]
    wp = acc_ref.shape[-1]

    for src, dst in ((g_hbm, gv_ref), (omm_hbm, mv_ref)):
        cp = pltpu.make_async_copy(src.at[b, pl.ds(row0, win_h)]
                                   if src is g_hbm else
                                   src.at[b, :, pl.ds(row0, win_h)],
                                   dst, sem)
        cp.start()
        cp.wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    for k in range(9):                       # static taps
        ky = k // 3 - 1
        kx = k % 3 - 1
        # u_k[c, w] = sum_co W_k[c, co] g[co, w]: per-row MXU matmul
        for r in range(win_h):
            uv_ref[r] = jax.lax.dot_general(
                w_ref[k], gv_ref[r],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(uv_ref.dtype)
        for j in range(2 * P + 1):
            us_ref[j] = uv_ref[:, :, j: j + wp]

        def e_body(ei, carry, ky=ky, kx=kx):
            e = (ei - R).astype(jnp.float32)
            rs = P + R - ky - ei             # dynamic start, untiled rows
            oy = mv_ref[2 * k, pl.ds(rs, tile_h)]        # (tile_h, 1, wp2f)
            mk = mv_ref[18 + k, pl.ds(rs, tile_h)]
            hym = _hat(jnp.clip(oy, -R, R) - e) * mk
            ox = jnp.clip(mv_ref[2 * k + 1, pl.ds(rs, tile_h)], -R, R)
            for f in range(-R, R + 1):
                cs = P - kx - f              # static lane offset
                wm = hym[:, :, cs: cs + wp] * _hat(ox[:, :, cs: cs + wp] - f)
                rows = us_ref[pl.ds(P - kx - f, 1),
                              pl.ds(rs, tile_h)][0]
                acc_ref[...] += rows * wm.astype(compute_dtype)
            return carry

        jax.lax.fori_loop(0, 2 * R + 1, e_body, 0)

    dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype",
                                              "transfer_dtype"))
def dcn_pallas_v4_bwd_dx(x, offset, mask, weight, g, max_offset: int = 2,
                         compute_dtype=None, transfer_dtype=None):
    """Roll-free dx (see _dx4_kernel).  Same contract as dcn_pallas_v3_bwd_dx.

    transfer_dtype: dtype g AND weight are SHIPPED in.  bf16 halves the g
    relayout/DMA bytes and runs the u = W_k^T g matmuls at the MXU's bf16
    rate; u accumulates in f32 (exact for bf16 inputs), so the result equals
    the f32 kernel on bf16-quantized (g, weight).
    """
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    if transfer_dtype is None:
        transfer_dtype = compute_dtype
    P, tile_h, pad_h, Hp, win_h, wp, wp2f, Cs, Cos = _dims(H, W, C, Co, R)

    # g halo to (B, Hp + 2P, Cos, wp2f): Co on sublanes, W on lanes
    gt = jnp.pad(g.astype(transfer_dtype),
                 ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cos - Co)))
    gt = jnp.transpose(gt, (0, 1, 3, 2))
    # offset(18) + mask(9) channels, rows UNTILED with a singleton sublane
    # dim; same row/col halo as gt so source-pixel windows line up
    omm = jnp.concatenate([offset, mask], axis=-1).astype(jnp.float32)
    omm = jnp.pad(omm, ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, 0)))
    omm = jnp.transpose(omm, (0, 3, 1, 2))[:, :, :, None, :]

    kernel = functools.partial(_dx4_kernel, tile_h=tile_h, max_offset=R,
                               compute_dtype=compute_dtype)
    # W_k^T as (9, Cos, Cs)
    w_t = jnp.pad(
        jnp.transpose(weight.reshape(9, C, Co), (0, 2, 1)).astype(
            transfer_dtype),
        ((0, 0), (0, Cos - Co), (0, Cs - C)))
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, Cos, Cs), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, Cs, wp), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Cs, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, Cos, wp2f), transfer_dtype),
            pltpu.VMEM((win_h, Cs, wp2f), compute_dtype),
            pltpu.VMEM((2 * P + 1, win_h, Cs, wp), compute_dtype),
            pltpu.VMEM((27, win_h, 1, wp2f), jnp.float32),
            pltpu.VMEM((tile_h, Cs, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(gt, omm, w_t)
    # kernel layout (B, Hp, Cs, wp) -> NHWC
    return jnp.transpose(out, (0, 1, 3, 2))[:, :H, :W, :C].astype(x.dtype)


# ---------------------------------------------------------------------------
# backward kernel 1c: dx v5 — window-sum first, weight contraction after
# ---------------------------------------------------------------------------
#
# Device timing showed dx4's roll removal only bought 1.2x at the hot shape:
# the dominant overhead vs the forward kernel is the PER-TAP u = W_k^T g
# staging — dx3/dx4 re-run the win_h matmuls and re-stage the 2P+1 column
# banks for every tap (63 bank copies of a (win_h, Cs, wp) tile per grid
# step vs the forward's 7).  Reassociating the contraction removes it:
#
#   dx[p, c] = sum_k W_k[c, :] . z_k[p],   z_k[p] = sum_{e,f} wm_kef(p) g(p-d)
#
# i.e. accumulate the weighted g-windows per tap (the forward kernel's exact
# FMA structure, reading g banks staged ONCE per grid step) and contract
# with W_k^T on the MXU afterwards (tile_h matmuls per tap, same count as
# the forward).  Map mechanics are dx4's (rows-untiled, static lane
# offsets, zero rolls).


def _dx5_kernel(g_hbm, omm_hbm, w_ref, dx_ref,
                gv_ref, gs_ref, mv_ref, s_ref, acc_ref, sem,
                *, tile_h, max_offset, compute_dtype):
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    win_h = gv_ref.shape[0]
    wp = s_ref.shape[-1]

    for src, dst in ((g_hbm, gv_ref), (omm_hbm, mv_ref)):
        cp = pltpu.make_async_copy(src.at[b, pl.ds(row0, win_h)]
                                   if src is g_hbm else
                                   src.at[b, :, pl.ds(row0, win_h)],
                                   dst, sem)
        cp.start()
        cp.wait()
    # g column banks staged once (the upcast from a narrow transfer dtype
    # rides these copies; see _fwd3_kernel)
    for j in range(2 * P + 1):
        gs_ref[j] = gv_ref[:, :, j: j + wp].astype(gs_ref.dtype)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    for k in range(9):                       # static taps
        ky = k // 3 - 1
        kx = k % 3 - 1
        s_ref[...] = jnp.zeros_like(s_ref)

        def e_body(ei, carry, ky=ky, kx=kx, k=k):
            e = (ei - R).astype(jnp.float32)
            rs = P + R - ky - ei             # dynamic start, untiled rows
            oy = mv_ref[2 * k, pl.ds(rs, tile_h)]        # (tile_h, 1, wp2f)
            mk = mv_ref[18 + k, pl.ds(rs, tile_h)]
            hym = _hat(jnp.clip(oy, -R, R) - e) * mk
            ox = jnp.clip(mv_ref[2 * k + 1, pl.ds(rs, tile_h)], -R, R)
            for f in range(-R, R + 1):
                cs = P - kx - f              # static lane offset
                wm = hym[:, :, cs: cs + wp] * _hat(ox[:, :, cs: cs + wp] - f)
                rows = gs_ref[cs, pl.ds(rs, tile_h)]
                s_ref[...] += rows * wm.astype(compute_dtype)
            return carry

        jax.lax.fori_loop(0, 2 * R + 1, e_body, 0)

        # contract Co (sublanes of both operands): (Cos, Cs) x (Cos, wp)
        for r in range(tile_h):
            acc_ref[r] += jax.lax.dot_general(
                w_ref[k], s_ref[r],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype",
                                              "transfer_dtype"))
def dcn_pallas_v5_bwd_dx(x, offset, mask, weight, g, max_offset: int = 2,
                         compute_dtype=None, transfer_dtype=None):
    """dx via window-sum-then-contract (see _dx5_kernel).  Same contract as
    dcn_pallas_v3_bwd_dx.

    transfer_dtype: dtype g is SHIPPED and bank-staged in.  The weighted
    window sum accumulates g upcast to compute_dtype, so bf16 output equals
    the f32 kernel on the bf16-quantized g (W is never quantized here).
    """
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    if transfer_dtype is None:
        transfer_dtype = compute_dtype
    P, tile_h, pad_h, Hp, win_h, wp, wp2f, Cs, Cos = _dims(H, W, C, Co, R)

    gt = jnp.pad(g.astype(transfer_dtype),
                 ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cos - Co)))
    gt = jnp.transpose(gt, (0, 1, 3, 2))
    omm = jnp.concatenate([offset, mask], axis=-1).astype(jnp.float32)
    omm = jnp.pad(omm, ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, 0)))
    omm = jnp.transpose(omm, (0, 3, 1, 2))[:, :, :, None, :]
    # W_k^T as (9, Cos, Cs)
    w_t = jnp.pad(
        jnp.transpose(weight.reshape(9, C, Co), (0, 2, 1)).astype(
            compute_dtype),
        ((0, 0), (0, Cos - Co), (0, Cs - C)))

    kernel = functools.partial(_dx5_kernel, tile_h=tile_h, max_offset=R,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, Cos, Cs), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, Cs, wp), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Cs, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, Cos, wp2f), transfer_dtype),
            pltpu.VMEM((2 * P + 1, win_h, Cos, wp), compute_dtype),
            pltpu.VMEM((27, win_h, 1, wp2f), jnp.float32),
            pltpu.VMEM((tile_h, Cos, wp), compute_dtype),
            pltpu.VMEM((tile_h, Cs, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(gt, omm, w_t)
    return jnp.transpose(out, (0, 1, 3, 2))[:, :H, :W, :C].astype(x.dtype)


# ---------------------------------------------------------------------------
# backward kernel 2: fused dmask + dW + doffset in a single window sweep
# ---------------------------------------------------------------------------


def _dwmo3_kernel(x_hbm, off_ref, mask_ref, g_ref, w_ref,
                  dmask_ref, dw_ref, doff_ref,
                  xv_ref, xs_ref, u_ref, s_ref, sy_ref, sx_ref, t_ref, td_ref,
                  dwacc_ref, sem,
                  *, tile_h, max_offset, compute_dtype):
    """dmask_k = <S_k, u_k>_C, dW_k = (S_k m_k) g^T, doff from SY/SX — one
    window sweep accumulates S (hat*hat), SY (hat'*hat), SX (hat*hat').

    v3 layout: channel reductions are SUBLANE reductions emitting (tile_h, W)
    maps that write straight to the compact outputs; the dW contraction is a
    per-row (Cs, wp) x (Cos, wp)^T MXU matmul (contracting the lane dim)."""
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    wp = xs_ref.shape[-1]

    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])],
                               xv_ref, sem)
    cp.start()
    cp.wait()
    # x may arrive in a narrower transfer dtype (see dcn_pallas_v3): the
    # upcast to the window-math dtype rides these shift copies for free
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, :, j: j + wp].astype(xs_ref.dtype)

    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        # u_k[c, w] = sum_co W_k[c, co] g[co, w]: per-row MXU matmul
        # contracting the SUBLANE dim of both operands (w_ref holds W_k^T)
        for r in range(tile_h):
            u_ref[r] = jax.lax.dot_general(
                w_ref[pl.ds(k, 1)][0], g_ref[0, r],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(u_ref.dtype)
        oy_raw = off_ref[0, pl.ds(2 * k, 1)][0]
        ox_raw = off_ref[0, pl.ds(2 * k + 1, 1)][0]
        oy = jnp.clip(oy_raw, -R, R)
        ox = jnp.clip(ox_raw, -R, R)
        mk = mask_ref[0, pl.ds(k, 1)][0]

        s_ref[...] = jnp.zeros_like(s_ref)
        sy_ref[...] = jnp.zeros_like(sy_ref)
        sx_ref[...] = jnp.zeros_like(sx_ref)
        for e in range(-R, R + 1):          # dy = ky + e
            wy = _hat(oy - e)[:, None, :].astype(compute_dtype)
            wyd = _dhat(oy - e)[:, None, :].astype(compute_dtype)
            t_ref[...] = jnp.zeros_like(t_ref)
            td_ref[...] = jnp.zeros_like(td_ref)
            for f in range(-R, R + 1):      # dx = kx + f
                wx = _hat(ox - f)[:, None, :].astype(compute_dtype)
                wxd = _dhat(ox - f)[:, None, :].astype(compute_dtype)
                rows = xs_ref[pl.ds(P + kx + f, 1),
                              pl.ds(P + ky + e, tile_h), :, :][0]
                t_ref[...] += rows * wx
                td_ref[...] += rows * wxd
            s_ref[...] += t_ref[...] * wy
            sx_ref[...] += td_ref[...] * wy
            sy_ref[...] += t_ref[...] * wyd

        u32 = u_ref[...].astype(jnp.float32)
        # channel inner products: sublane reductions -> (tile_h, wp)
        dmask_ref[0, pl.ds(k, 1)] = jnp.sum(
            s_ref[...].astype(jnp.float32) * u32, axis=1)[None]
        doff_ref[0, pl.ds(2 * k, 1)] = (jnp.sum(
            sy_ref[...].astype(jnp.float32) * u32, axis=1)
            * mk * (jnp.abs(oy_raw) <= R).astype(jnp.float32))[None]
        doff_ref[0, pl.ds(2 * k + 1, 1)] = (jnp.sum(
            sx_ref[...].astype(jnp.float32) * u32, axis=1)
            * mk * (jnp.abs(ox_raw) <= R).astype(jnp.float32))[None]
        # dW_k: contract pixels — per-row (Cs, wp) x (Cos, wp)^T on the MXU
        mkb = mk[:, None, :].astype(compute_dtype)
        dwacc_ref[...] = jnp.zeros_like(dwacc_ref)
        for r in range(tile_h):
            dwacc_ref[...] += jax.lax.dot_general(
                (s_ref[r] * mkb[r]), g_ref[0, r],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        dw_ref[0, 0, pl.ds(k, 1)] = dwacc_ref[...][None]
        return carry

    jax.lax.fori_loop(0, 9, tap_body, 0)


@functools.partial(jax.jit, static_argnames=("max_offset", "compute_dtype",
                                              "transfer_dtype"))
def dcn_pallas_v3_bwd_dwmo(x, offset, mask, weight, g, max_offset: int = 2,
                           compute_dtype=None, transfer_dtype=None):
    """Fused mask + weight + offset gradients; returns (dmask, dw, doff).

    transfer_dtype: dtype x is SHIPPED in (relayout + HBM->VMEM DMA), as in
    dcn_pallas_v3.  When the forward ran with transfer_dtype=bf16 the TRUE
    gradient of that forward evaluates dW/dmask/doffset at the bf16-quantized
    x, so passing the same transfer_dtype here is both faster and more exact.
    (dx never reads x — it is unaffected by the forward's quantization.)
    """
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    R = max_offset
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    if transfer_dtype is None:
        transfer_dtype = compute_dtype
    P, tile_h, pad_h, Hp, win_h, wp, wp2f, Cs, Cos = _dims(H, W, C, Co, R)
    n_tiles = Hp // tile_h

    xt = jnp.pad(x.astype(transfer_dtype),
                 ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cs - C)))
    xt = jnp.transpose(xt, (0, 1, 3, 2))
    off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
    off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, wp - W)))
    mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, wp - W)))
    # g tiles in (B, Hp, Cos, wp) layout
    gt = jnp.pad(g.astype(compute_dtype),
                 ((0, 0), (0, pad_h), (0, wp - W), (0, Cos - Co)))
    gt = jnp.transpose(gt, (0, 1, 3, 2))
    # W_k^T as (9, Cos, Cs): u contracts the sublane dim of both operands
    w_t = jnp.pad(
        jnp.transpose(weight.reshape(9, C, Co), (0, 2, 1)).astype(
            compute_dtype),
        ((0, 0), (0, Cos - Co), (0, Cs - C)))

    kernel = functools.partial(_dwmo3_kernel, tile_h=tile_h, max_offset=R,
                               compute_dtype=compute_dtype)
    dmask, dw, doff = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, wp), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, wp), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, tile_h, Cos, wp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((9, Cos, Cs), lambda b, h: (0, 0, 0)),
        ],
        out_specs=[
            # tap axis on an untiled dim (dynamic per-tap writes from the
            # fori_loop body); transposed to NHWC below
            pl.BlockSpec((1, 9, tile_h, wp), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 1, 9, Cs, Cos), lambda b, h: (b, h, 0, 0, 0)),
            pl.BlockSpec((1, 18, tile_h, wp), lambda b, h: (b, 0, h, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 9, Hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, 9, Cs, Cos), jnp.float32),
            jax.ShapeDtypeStruct((B, 18, Hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((win_h, Cs, wp2f), transfer_dtype),
            pltpu.VMEM((2 * P + 1, win_h, Cs, wp), compute_dtype),
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),   # u
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),   # s
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),   # sy
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),   # sx
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),   # t
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),   # td
            pltpu.VMEM((Cs, Cos), jnp.float32),            # dW accumulator
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, off_t, mask_t, gt, w_t)
    dmask = jnp.transpose(dmask, (0, 2, 3, 1))[:, :H, :W].astype(mask.dtype)
    doff = jnp.transpose(doff, (0, 2, 3, 1))[:, :H, :W].astype(offset.dtype)
    dw = jnp.sum(dw, axis=(0, 1))[:, :C, :Co].reshape(
        3, 3, C, Co).astype(weight.dtype)
    return dmask, dw, doff


# Which dx formulation dcn_pallas_v3_bwd dispatches to.  Configured via
# cfg.TPU.DCN_DX_KERNEL (build_model calls set_dx_kernel); the
# MONOFLEX_DX_KERNEL env var overrides both for ad-hoc tooling A/Bs.
_DX_KERNEL = "dx3"


def set_dx_kernel(name: str) -> None:
    """Set the process-wide dx-backward dispatch (called by build_model)."""
    global _DX_KERNEL
    if name not in ("dx3", "dx4", "dx5"):
        raise ValueError(f"unknown dx kernel {name!r} (dx3|dx4|dx5)")
    _DX_KERNEL = name


def dcn_pallas_v3_bwd(x, offset, mask, weight, g, max_offset: int = 2,
                      compute_dtype=None, transfer_dtype=None):
    """All five gradients via the v3-generation kernels.

    The dx kernel is chosen by ``set_dx_kernel`` / cfg.TPU.DCN_DX_KERNEL
    (module default dx3; MONOFLEX_DX_KERNEL env var overrides).  All three
    formulations compute the same math — dx4 is roll-free (device-validated
    at 2.4e-7 vs dx3), dx5 window-sums g then contracts W^T on the MXU.
    dx always ships g in f32 regardless of transfer_dtype: transfer_dtype
    quantizes x (whose true gradient is unchanged), while quantizing g
    would approximate the propagated gradient itself.
    """
    dx_fn = {"dx3": dcn_pallas_v3_bwd_dx,
             "dx4": dcn_pallas_v4_bwd_dx,
             "dx5": dcn_pallas_v5_bwd_dx}[
        os.environ.get("MONOFLEX_DX_KERNEL", _DX_KERNEL)]
    dx = dx_fn(x, offset, mask, weight, g, max_offset=max_offset,
               compute_dtype=compute_dtype)
    dmask, dw, doff = dcn_pallas_v3_bwd_dwmo(
        x, offset, mask, weight, g, max_offset=max_offset,
        compute_dtype=compute_dtype, transfer_dtype=transfer_dtype)
    db = jnp.sum(g, axis=(0, 1, 2))
    return dx, doff, dmask, dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dcn_pallas_v3_vjp(x, offset, mask, weight, bias, max_offset: int = 2,
                      transfer_dtype=None):
    """v3 forward + v3 backward kernels."""
    return dcn_pallas_v3(x, offset, mask, weight, bias, max_offset=max_offset,
                         transfer_dtype=transfer_dtype)


def _fwd(x, offset, mask, weight, bias, max_offset, transfer_dtype):
    out = dcn_pallas_v3(x, offset, mask, weight, bias, max_offset=max_offset,
                        transfer_dtype=transfer_dtype)
    return out, (x, offset, mask, weight)


def _bwd(max_offset, transfer_dtype, residuals, g):
    x, offset, mask, weight = residuals
    return dcn_pallas_v3_bwd(x, offset, mask, weight, g,
                             max_offset=max_offset,
                             transfer_dtype=transfer_dtype)


dcn_pallas_v3_vjp.defvjp(_fwd, _bwd)
