"""Ablate the NHWC -> (C-sublane, W-lane) relayout that feeds the v3 DCN
kernels.

The round-4 inference trace shows ~5-6 ms/iter of XLA `copy` ops whose
long_name is exactly the jnp.pad + jnp.transpose(0,1,3,2) prologue of
ops/dcn_pallas_v3.py (and the train trace shows ~3x that for the x/g
transposes of the backward kernels).  XLA implements the W<->C swap as a
layout-assignment copy at ~160 GB/s effective — far off the ~700 GB/s a
streaming relayout should reach.

Variants (hot shape (8,96,320,64), R=2 conventions: Cs=64, wp2f=648, P=3):
  xla    — jnp.pad + jnp.transpose (the production prologue)
  dot    — pad + identity-matmul: einsum('bhwc,cd->bhdw', x, I) with the
           identity behind an optimization_barrier so the algebraic
           simplifier cannot fold the dot back into a transpose; the MXU
           emits the transposed layout directly.
  pallas — a Pallas kernel that DMAs 8-row NHWC blocks and emits the
           transposed rows via an MXU identity contraction per row.

Usage: python tools/transpose_ablate.py [--shape 8,96,320,64] [--iters 20]
"""

import argparse
import functools
import os
import sys

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


def _dims(H, W, C, R):
    P = R + 1
    wp = W + (-W) % 128
    wp2f = wp + 2 * P
    wp2f = wp2f + (-wp2f) % 128
    Cs = C + (-C) % 8
    return P, wp, wp2f, Cs


def xla_variant(x, R=2):
    B, H, W, C = x.shape
    P, wp, wp2f, Cs = _dims(H, W, C, R)
    xt = jnp.pad(x, ((0, 0), (P, P), (P, wp2f - W - P), (0, Cs - C)))
    return jnp.transpose(xt, (0, 1, 3, 2))


def dot_variant(x, R=2):
    B, H, W, C = x.shape
    P, wp, wp2f, Cs = _dims(H, W, C, R)
    xt = jnp.pad(x, ((0, 0), (P, P), (P, wp2f - W - P), (0, Cs - C)))
    eye = jax.lax.optimization_barrier(jnp.eye(Cs, dtype=x.dtype))
    return jnp.einsum("bhwc,cd->bhdw", xt, eye)


def _tr_kernel(x_ref, eye_ref, out_ref, *, P, W):
    out_ref[...] = jnp.zeros_like(out_ref)
    for r in range(x_ref.shape[1]):
        s = jax.lax.dot_general(
            eye_ref[...], x_ref[0, r],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Cs, W)
        out_ref[0, r, :, P:P + W] = s.astype(out_ref.dtype)


def _trT_kernel(x_ref, out_ref, *, P, W):
    out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[0, :, :, P:P + W] = jnp.transpose(x_ref[0], (0, 2, 1))


def pallasT_variant(x, R=2, tile_r=8):
    """Mosaic-native 3-D transpose per block (no MXU)."""
    B, H, W, C = x.shape
    P, wp, wp2f, Cs = _dims(H, W, C, R)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cs - C)))
    kernel = functools.partial(_trT_kernel, P=P, W=W)
    return pl.pallas_call(
        kernel,
        grid=(B, H // tile_r),
        in_specs=[pl.BlockSpec((1, tile_r, W, Cs), lambda b, r: (b, r, 0, 0))],
        out_specs=pl.BlockSpec((1, tile_r, Cs, wp2f), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Cs, wp2f), x.dtype),
    )(xp)


def pallas_variant(x, R=2, tile_r=8):
    """Core rows only (no row halo) — timing proxy for the relayout."""
    B, H, W, C = x.shape
    P, wp, wp2f, Cs = _dims(H, W, C, R)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cs - C)))
    eye = jnp.eye(Cs, dtype=x.dtype)
    kernel = functools.partial(_tr_kernel, P=P, W=W)
    return pl.pallas_call(
        kernel,
        grid=(B, H // tile_r),
        in_specs=[
            pl.BlockSpec((1, tile_r, W, Cs), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((Cs, Cs), lambda b, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_r, Cs, wp2f), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Cs, wp2f), x.dtype),
    )(xp, eye)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="8,96,320,64")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default="xla,dot,pallas,pallasT")
    args = ap.parse_args()
    B, H, W, C = map(int, args.shape.split(","))
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, C), jnp.float32)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_time import device_time

    fns = {"xla": xla_variant, "dot": dot_variant, "pallas": pallas_variant, "pallasT": pallasT_variant}
    ref = np.asarray(xla_variant(x))
    for name in args.variants.split(","):
        fn = jax.jit(fns[name])
        out = np.asarray(fn(x))
        if name == "xla":
            err = 0.0
        elif name == "dot":
            err = float(np.abs(out - ref).max())
        else:  # pallas: compare against the core rows of ref
            P = 3
            err = float(np.abs(out - ref[:, P:P + H]).max())
        ms, by_op = device_time(lambda: fn(x), iters=args.iters)
        top = sorted(by_op.items(), key=lambda kv: -kv[1])[:4]
        print(f"{name:7s} ms/call={ms:7.3f}  maxerr={err:.2e}  top={top}")


if __name__ == "__main__":
    main()
