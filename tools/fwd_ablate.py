"""Ablate the v2 DCN forward kernel on real TPU to locate the cost.

Variants at the stride-4 train-mix shape (8,96,320,64)->64:
  full    — the production kernel (baseline)
  nomap   — weight maps replaced by a scalar constant: isolates the
            xs-window FMA + matmul cost (no per-pixel map compute, no
            (tile_h,W)->(tile_h,W,C) broadcast/relayout)
  nobcast — maps computed but applied as a scalar (jnp.max reduces the map
            to a scalar): keeps the hat math, drops the broadcast/relayout
  hoistwx — production math but the 2R+1 wx maps hoisted out of the dy loop
            (computed once per tap instead of per (dy,dx))

Usage: python tools/fwd_ablate.py [--shape 96,320,64,64] [--iters 20]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monoflex_tpu.ops import dcn_pallas_v2 as V2


def _kernel(x_hbm, off_ref, mask_ref, w_ref, out_ref, xv_ref, xs_ref,
            s_ref, t_ref, acc_ref, sem, *, tile_h, width, max_offset,
            compute_dtype, variant):
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])], xv_ref, sem)
    copy.start()
    copy.wait()
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, j: j + width, :]

    acc_ref[...] = jnp.zeros_like(acc_ref)

    if variant in ("fori", "foribf16"):
        # taps under lax.fori_loop (the backward kernels' structure): body
        # compiled once; window reads become dynamic indices on untiled dims
        def tap_body(k, carry):
            ky = k // 3 - 1
            kx = k % 3 - 1
            oy = jnp.clip(off_ref[0, pl.ds(2 * k, 1)][0], -R, R)
            ox = jnp.clip(off_ref[0, pl.ds(2 * k + 1, 1)][0], -R, R)
            mk = mask_ref[0, pl.ds(k, 1)][0]
            s_ref[...] = jnp.zeros_like(s_ref)
            for e in range(-R, R + 1):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - e)) * mk
                t_ref[...] = jnp.zeros_like(t_ref)
                for f in range(-R, R + 1):
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ox - f))
                    rows = xs_ref[pl.ds(P + kx + f, 1),
                                  pl.ds(P + ky + e, tile_h), :, :][0]
                    t_ref[...] += rows * wx[:, :, None].astype(compute_dtype)
                s_ref[...] += t_ref[...] * wy[:, :, None].astype(compute_dtype)
            sk = s_ref[...].reshape(tile_h * width, s_ref.shape[-1])
            acc_ref[...] += jnp.dot(sk, w_ref[pl.ds(k, 1)][0],
                                    preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(0, 9, tap_body, 0)
        out_ref[0] = acc_ref[...].reshape(
            out_ref.shape[1:]).astype(out_ref.dtype)
        return

    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        oy = jnp.clip(off_ref[0, 2 * k], -R, R)
        ox = jnp.clip(off_ref[0, 2 * k + 1], -R, R)
        mk = mask_ref[0, k]

        if variant == "hoistwx":
            wxs = [V2._hat(ox + (kx - dx)) for dx in range(kx - R, kx + R + 1)]

        s_ref[...] = jnp.zeros_like(s_ref)
        for dy in range(ky - R, ky + R + 1):
            t_ref[...] = jnp.zeros_like(t_ref)
            for i, dx in enumerate(range(kx - R, kx + R + 1)):
                rows = xs_ref[P + dx, P + dy: P + dy + tile_h, :, :]
                if variant == "nomap":
                    t_ref[...] += rows * jnp.asarray(0.5, compute_dtype)
                elif variant == "nobcast":
                    wx = V2._hat(ox + (kx - dx))
                    t_ref[...] += rows * jnp.max(wx).astype(compute_dtype)
                elif variant == "hoistwx":
                    t_ref[...] += rows * wxs[i][:, :, None].astype(compute_dtype)
                else:
                    wx = V2._hat(ox + (kx - dx))
                    t_ref[...] += rows * wx[:, :, None].astype(compute_dtype)
            if variant == "nomap":
                s_ref[...] += t_ref[...] * jnp.asarray(0.5, compute_dtype)
            elif variant == "nobcast":
                wy = V2._hat(oy + (ky - dy)) * mk
                s_ref[...] += t_ref[...] * jnp.max(wy).astype(compute_dtype)
            else:
                wy = V2._hat(oy + (ky - dy)) * mk
                s_ref[...] += t_ref[...] * wy[:, :, None].astype(compute_dtype)

        sk = s_ref[...].reshape(tile_h * width, s_ref.shape[-1])
        acc_ref[...] += jnp.dot(sk, w_ref[k],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc_ref[...].reshape(out_ref.shape[1:]).astype(out_ref.dtype)


def _kernel_hoist3d(x_hbm, off_ref, mask_ref, w_ref, out_ref, xv_ref, xs_ref,
                    wxs_ref, s_ref, t_ref, acc_ref, sem, *,
                    tile_h, width, max_offset, compute_dtype):
    """Stage the relayouted hat maps: the (tile_h, W) -> (tile_h, W, 1)
    lane->sublane relayout costs ~as many vreg writes as a full-width FMA,
    and the production kernel pays it 30x per tap (25 wx + 5 wy).  Here each
    tap writes the 2R+1 wx maps into a broadcast-ready VMEM scratch once and
    applies wy inline (used once per dy), so the relayout count drops to
    10/tap.  Taps run under fori (a python unroll of the staged writes
    spilled vregs and overflowed VMEM: 182.7M/128M)."""
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])], xv_ref, sem)
    copy.start()
    copy.wait()
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, j: j + width, :]

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        oy = jnp.clip(off_ref[0, pl.ds(2 * k, 1)][0], -R, R)
        ox = jnp.clip(off_ref[0, pl.ds(2 * k + 1, 1)][0], -R, R)
        mk = mask_ref[0, pl.ds(k, 1)][0]
        for i, f in enumerate(range(-R, R + 1)):
            wxs_ref[i] = V2._hat(ox - f)[:, :, None]

        s_ref[...] = jnp.zeros_like(s_ref)
        for e in range(-R, R + 1):
            wy = (V2._hat(oy - e) * mk)[:, :, None].astype(compute_dtype)
            t_ref[...] = jnp.zeros_like(t_ref)
            for i, f in enumerate(range(-R, R + 1)):
                rows = xs_ref[pl.ds(P + kx + f, 1),
                              pl.ds(P + ky + e, tile_h), :, :][0]
                t_ref[...] += rows * wxs_ref[i].astype(compute_dtype)
            s_ref[...] += t_ref[...] * wy

        sk = s_ref[...].reshape(tile_h * width, s_ref.shape[-1])
        acc_ref[...] += jnp.dot(sk, w_ref[pl.ds(k, 1)][0],
                                preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, 9, tap_body, 0)
    out_ref[0] = acc_ref[...].reshape(out_ref.shape[1:]).astype(out_ref.dtype)


def build_hoist3d(shapes, max_offset=2, compute_dtype=jnp.float32):
    B, H, W, C, Co = shapes
    R = max_offset
    P = R + 1
    tile_h = V2._pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    Cp = C + (-C) % 128
    wp2f = W + 2 * P
    wp2f = wp2f + (-wp2f) % 8

    kernel = functools.partial(_kernel_hoist3d, tile_h=tile_h, width=W,
                               max_offset=R, compute_dtype=compute_dtype)
    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024),
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
            pltpu.VMEM((2 * P + 1, tile_h, W, 1), jnp.float32),
            pltpu.VMEM((tile_h, W, Cp), compute_dtype),
            pltpu.VMEM((tile_h, W, Cp), compute_dtype),
            pltpu.VMEM((tile_h * W, Co), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    @jax.jit
    def fn(x, offset, mask, weight):
        xt = jnp.pad(x.astype(compute_dtype),
                     ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cp - C)))
        off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
        mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
        if pad_h:
            off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
            mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        w_t = jnp.pad(weight.reshape(9, C, Co).astype(compute_dtype),
                      ((0, 0), (0, Cp - C), (0, 0)))
        return call(xt, off_t, mask_t, w_t)[:, :H]

    return fn


def _packed_kernel(x_hbm, offe_ref, offo_ref, maske_ref, masko_ref, w_ref,
                   out_ref, xv_ref, xs_ref, s_ref, t_ref, acc_ref, sem, *,
                   tile_h, width, max_offset, compute_dtype):
    """Lane-packed forward: two adjacent pixels share a 128-lane tile
    (64 channels each), so every window FMA does double duty and the tap
    matmul contracts a full 128 dim (block-diagonal weights).

    Padded-pixel layout: left pad 4 (even, >= P) keeps pair parity; the
    2P+1 column shifts land on pixel starts 1..7 — even starts are clean
    pair slices, odd starts recombine lane halves of adjacent pairs."""
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
            wy_e = (jnp.maximum(0.0, 1.0 - jnp.abs(oy_e - e)) * mk_e)
            wy_o = (jnp.maximum(0.0, 1.0 - jnp.abs(oy_o - e)) * mk_o)
            wy = jnp.concatenate(
                [jnp.broadcast_to(wy_e[:, :, None], wy_e.shape + (64,)),
                 jnp.broadcast_to(wy_o[:, :, None], wy_o.shape + (64,))],
                axis=-1).astype(compute_dtype)
            t_ref[...] = jnp.zeros_like(t_ref)
            for f in range(-R, R + 1):
                wx_e = jnp.maximum(0.0, 1.0 - jnp.abs(ox_e - f))
                wx_o = jnp.maximum(0.0, 1.0 - jnp.abs(ox_o - f))
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


def build_packed(shapes, max_offset=2, compute_dtype=jnp.float32):
    """Packed-lane forward wrapper (C=64, Co=64 only)."""
    B, H, W, C, Co = shapes
    assert C == 64 and Co == 64 and W % 2 == 0, (C, Co, W)
    R = max_offset
    P = R + 1
    tile_h = V2._pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    wh = W // 2
    np_pairs = (W + 8) // 2              # left pad 4 + right pad 4

    kernel = functools.partial(_packed_kernel, tile_h=tile_h, width=W,
                               max_offset=R, compute_dtype=compute_dtype)
    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, Hp // tile_h),
        compiler_params=None if interpret else pltpu.CompilerParams(
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
    )

    @jax.jit
    def fn(x, offset, mask, weight):
        xt = jnp.pad(x.astype(compute_dtype),
                     ((0, 0), (P, P + pad_h), (4, 4), (0, 0)))
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
        out = call(xp, offe, offo, maske, masko, wblk)
        return out.reshape(B, Hp, W, 64)[:, :H]

    return fn


def _kernel_v15(x_hbm, off_ref, mask_ref, w_ref, out_ref, xv_ref, xs_ref,
                s_ref, t_ref, sem, *, tile_h, width, max_offset,
                compute_dtype):
    """v1.5 layout: C on SUBLANES, W on LANES, rows untiled.

    The map application becomes wm[:, None, :] -- a unit SECOND-MINOR dim,
    i.e. a sublane broadcast, instead of v2's pathological unit-minor
    (lane->sublane) relayout that eats 82% of the v2 kernel (ablation:
    full 15.8 ms vs nobcast 2.9 ms).  Column shifts are pre-shifted lane
    copies (the v2 xs trick, now on lanes); row shifts index the untiled
    dim; for C=64 there is NO lane padding (W fills the lanes), so the
    window FMAs do no padded work.  The tap matmul contracts C (the
    sublane dim of both operands) and emits (W, Co) -- already the NHWC
    output tile layout."""
    R = max_offset
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    wp = xs_ref.shape[-1]                      # padded W (lane dim)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, xv_ref.shape[0])], xv_ref, sem)
    copy.start()
    copy.wait()
    # pre-shifted column copies: xs[j][r, c, w] = xv[r, c, w + j]
    for j in range(2 * P + 1):
        xs_ref[j] = xv_ref[:, :, j: j + wp]

    def tap_body(k, carry):
        ky = k // 3 - 1
        kx = k % 3 - 1
        oy = jnp.clip(off_ref[0, pl.ds(2 * k, 1)][0], -R, R)
        ox = jnp.clip(off_ref[0, pl.ds(2 * k + 1, 1)][0], -R, R)
        mk = mask_ref[0, pl.ds(k, 1)][0]

        s_ref[...] = jnp.zeros_like(s_ref)
        for e in range(-R, R + 1):
            wy = (V2._hat(oy - e) * mk)[:, None, :].astype(compute_dtype)
            t_ref[...] = jnp.zeros_like(t_ref)
            for f in range(-R, R + 1):
                wx = V2._hat(ox - f)[:, None, :].astype(compute_dtype)
                rows = xs_ref[pl.ds(P + kx + f, 1),
                              pl.ds(P + ky + e, tile_h), :, :][0]
                t_ref[...] += rows * wx
            s_ref[...] += t_ref[...] * wy

        # contract C (sublanes of both operands): out rows (W, Co) = NHWC
        for r in range(t_ref.shape[0]):
            out_ref[0, r] += jax.lax.dot_general(
                s_ref[r], w_ref[pl.ds(k, 1)][0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:out_ref.shape[2]].astype(
                out_ref.dtype)
        return carry

    out_ref[0] = jnp.zeros_like(out_ref[0])
    jax.lax.fori_loop(0, 9, tap_body, 0)


def build_v15(shapes, max_offset=2, compute_dtype=jnp.float32):
    B, H, W, C, Co = shapes
    R = max_offset
    P = R + 1
    tile_h = V2._pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    # W on lanes: the halo must cover the widest pre-shifted copy
    # (wp + 2P columns), padded to a 128-multiple for the DMA minor dim;
    # C on sublanes: pad to 8
    wp = W + (-W) % 128
    wp2f = wp + 2 * P
    wp2f = wp2f + (-wp2f) % 128
    Cs = C + (-C) % 8

    kernel = functools.partial(_kernel_v15, tile_h=tile_h, width=W,
                               max_offset=R, compute_dtype=compute_dtype)
    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, Hp // tile_h),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, wp), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, wp), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((9, Cs, Co), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, Co), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, Cs, wp2f), compute_dtype),
            pltpu.VMEM((2 * P + 1, win_h, Cs, wp), compute_dtype),
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),
            pltpu.VMEM((tile_h, Cs, wp), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    @jax.jit
    def fn(x, offset, mask, weight):
        # x transposed to (B, Hp + 2P, C, Wp2): C on sublanes, W on lanes
        xt = jnp.pad(x.astype(compute_dtype),
                     ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cs - C)))
        xt = jnp.transpose(xt, (0, 1, 3, 2))
        # offset/mask maps padded on W to the lane-padded width so the hat
        # maps broadcast directly against the (tile_h, Cs, wp) accumulators
        off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
        mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
        off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, wp - W)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, wp - W)))
        w_t = jnp.pad(weight.reshape(9, C, Co).astype(compute_dtype),
                      ((0, 0), (0, Cs - C), (0, 0)))
        return call(xt, off_t, mask_t, w_t)[:, :H]

    return fn


def _packed_h3_kernel(x_hbm, offe_ref, offo_ref, maske_ref, masko_ref, w_ref,
                      out_ref, xv_ref, xs_ref, wxs_ref, wys_ref, s_ref, t_ref,
                      acc_ref, sem, *, tile_h, width, max_offset,
                      compute_dtype):
    """Packed forward with staged hat maps: the per-term map construction
    (2 half-width relayouts + a concat, ~= one full-width FMA) moves out of
    the 25-term loop into 10 staged writes per tap."""
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
        s = j + 1
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
        for i in range(2 * P + 1):
            e = i - R
            wy_e = (jnp.maximum(0.0, 1.0 - jnp.abs(oy_e - e)) * mk_e)
            wy_o = (jnp.maximum(0.0, 1.0 - jnp.abs(oy_o - e)) * mk_o)
            wys_ref[i] = jnp.concatenate(
                [jnp.broadcast_to(wy_e[:, :, None], wy_e.shape + (64,)),
                 jnp.broadcast_to(wy_o[:, :, None], wy_o.shape + (64,))],
                axis=-1).astype(wys_ref.dtype)
            wx_e = jnp.maximum(0.0, 1.0 - jnp.abs(ox_e - e))
            wx_o = jnp.maximum(0.0, 1.0 - jnp.abs(ox_o - e))
            wxs_ref[i] = jnp.concatenate(
                [jnp.broadcast_to(wx_e[:, :, None], wx_e.shape + (64,)),
                 jnp.broadcast_to(wx_o[:, :, None], wx_o.shape + (64,))],
                axis=-1).astype(wxs_ref.dtype)
        s_ref[...] = jnp.zeros_like(s_ref)
        for j, e in enumerate(range(-R, R + 1)):
            t_ref[...] = jnp.zeros_like(t_ref)
            for i, f in enumerate(range(-R, R + 1)):
                rows = xs_ref[pl.ds(P + kx + f, 1),
                              pl.ds(P + ky + e, tile_h), :, :][0]
                t_ref[...] += rows * wxs_ref[pl.ds(i, 1)][0]
            s_ref[...] += t_ref[...] * wys_ref[pl.ds(j, 1)][0]
        sk = s_ref[...].reshape(tile_h * wh, s_ref.shape[-1])
        acc_ref[...] += jnp.dot(sk, w_ref[pl.ds(k, 1)][0],
                                preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, 9, tap_body, 0)
    out_ref[0] = acc_ref[...].reshape(out_ref.shape[1:]).astype(out_ref.dtype)


def build_packed_h3(shapes, max_offset=2, compute_dtype=jnp.float32):
    B, H, W, C, Co = shapes
    assert C == 64 and Co == 64 and W % 2 == 0, (C, Co, W)
    R = max_offset
    P = R + 1
    tile_h = V2._pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    wh = W // 2
    np_pairs = (W + 8) // 2

    kernel = functools.partial(_packed_h3_kernel, tile_h=tile_h, width=W,
                               max_offset=R, compute_dtype=compute_dtype)
    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, Hp // tile_h),
        compiler_params=None if interpret else pltpu.CompilerParams(
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
            pltpu.VMEM((2 * P + 1, tile_h, wh, 128), compute_dtype),
            pltpu.VMEM((2 * P + 1, tile_h, wh, 128), compute_dtype),
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),
            pltpu.VMEM((tile_h, wh, 128), compute_dtype),
            pltpu.VMEM((tile_h * wh, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    @jax.jit
    def fn(x, offset, mask, weight):
        xt = jnp.pad(x.astype(compute_dtype),
                     ((0, 0), (P, P + pad_h), (4, 4), (0, 0)))
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
        out = call(xp, offe, offo, maske, masko, wblk)
        return out.reshape(B, Hp, W, 64)[:, :H]

    return fn


def build_variant(variant, shapes, max_offset=2):
    B, H, W, C, Co = shapes
    R = max_offset
    P = R + 1
    compute_dtype = jnp.bfloat16 if variant == "foribf16" else jnp.float32
    tile_h = V2._pick_tile_h(H)
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * P
    Cp = C + (-C) % 128
    wp2f = W + 2 * P
    wp2f = wp2f + (-wp2f) % 8

    kernel = functools.partial(_kernel, tile_h=tile_h, width=W,
                               max_offset=R, compute_dtype=compute_dtype,
                               variant=variant)
    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, Hp // tile_h),
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
    )

    @jax.jit
    def fn(x, offset, mask, weight):
        xt = jnp.pad(x.astype(compute_dtype),
                     ((0, 0), (P, P + pad_h), (P, wp2f - W - P), (0, Cp - C)))
        off_t = jnp.transpose(offset, (0, 3, 1, 2)).astype(jnp.float32)
        mask_t = jnp.transpose(mask, (0, 3, 1, 2)).astype(jnp.float32)
        if pad_h:
            off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
            mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        w_t = jnp.pad(weight.reshape(9, C, Co).astype(compute_dtype),
                      ((0, 0), (0, Cp - C), (0, 0)))
        return call(xt, off_t, mask_t, w_t)[:, :H]

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="96,320,64,64")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default="full,nomap,nobcast,hoistwx")
    ap.add_argument("--parity", action="store_true",
                    help="also diff each variant against the production "
                         "kernel on device (nomap/nobcast are math ablations "
                         "and expected to differ)")
    args = ap.parse_args()
    H, W, C, Co = (int(v) for v in args.shape.split(","))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, H, W, C), jnp.float32)
    off = jnp.asarray(rng.randn(args.batch, H, W, 18) * 1.5, jnp.float32)
    mask = jnp.asarray(rng.rand(args.batch, H, W, 9), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32)

    from trace_time import device_time

    for v in args.variants.split(","):
        if v == "packed":
            fn = build_packed((args.batch, H, W, C, Co))
        elif v == "packedbf16":
            fn = build_packed((args.batch, H, W, C, Co),
                              compute_dtype=jnp.bfloat16)
        elif v == "packedh3":
            fn = build_packed_h3((args.batch, H, W, C, Co))
        elif v == "packedh3bf16":
            fn = build_packed_h3((args.batch, H, W, C, Co),
                                 compute_dtype=jnp.bfloat16)
        elif v == "v15":
            fn = build_v15((args.batch, H, W, C, Co))
        elif v == "v15bf16":
            fn = build_v15((args.batch, H, W, C, Co),
                           compute_dtype=jnp.bfloat16)
        elif v == "hoist3d":
            fn = build_hoist3d((args.batch, H, W, C, Co))
        elif v == "hoist3dbf16":
            fn = build_hoist3d((args.batch, H, W, C, Co),
                               compute_dtype=jnp.bfloat16)
        else:
            fn = build_variant(v, (args.batch, H, W, C, Co))
        try:
            t0 = time.perf_counter()
            out = fn(x, off, mask, w)
            jax.block_until_ready(out)
        except Exception as exc:  # noqa: BLE001 — keep measuring the rest
            print(f"{v:12s} FAILED: {str(exc)[:300]}", flush=True)
            continue
        compile_s = time.perf_counter() - t0
        # wall-clock on this tunnel backend is untrustworthy (see
        # trace_time.py); report the profiler's device time instead
        ms, _ = device_time(lambda: fn(x, off, mask, w), iters=args.iters)
        rel = ""
        if args.parity:
            ref = V2.dcn_pallas_v2(x, off, mask, w, max_offset=2)
            denom = float(jnp.max(jnp.abs(ref))) or 1.0
            rel = (f"  relerr {float(jnp.max(jnp.abs(ref - out))) / denom:.2e}")
        print(f"{v:12s} compile {compile_s:6.1f}s  device {ms:8.3f} ms/call"
              f"{rel}", flush=True)


if __name__ == "__main__":
    main()
