"""Localize the on-device dx5-vs-dx3 mismatch (round-5 investigation).

Round 4 left a hot-shape record of dx5 at 2.1e-3 max relerr vs dx3 on device
while interpret-mode parity is exact.  Hypothesis: the MXU runs f32
dot_general at DEFAULT precision (bf16-truncated inputs); dx3/dx4 contract
W^T g per tap BEFORE the window weighting while dx5 window-sums first and
contracts after, so the truncation applies to different operand values and
the two results differ at bf16 granularity — a precision artifact, not a
lowering bug.  Under f32 matmul precision both should agree to ~1e-6.

All reductions happen ON DEVICE (the tunnel moves large arrays at ~100 KB/s;
never np.asarray a full feature map here).

Usage (detached):
  nohup python tools/dx5_diff_probe.py > /tmp/dx5_probe.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from monoflex_tpu.ops import dcn_pallas_v3 as V3


def report(tag, ref, got):
    """Device-side diff reductions; host transfer is a handful of scalars."""
    d = jnp.abs(ref - got)
    denom = jnp.max(jnp.abs(ref))
    thr = 1e-5 * denom
    bad = (d > thr).astype(jnp.int32)
    relerr, nbad, per_row, per_col, per_chan = jax.device_get((
        jnp.max(d) / denom, jnp.sum(bad),
        jnp.sum(bad, axis=(0, 2, 3)), jnp.sum(bad, axis=(0, 1, 3)),
        jnp.sum(bad, axis=(0, 1, 2))))
    print(f"[{tag}] max relerr {float(relerr):.3e}; {int(nbad)}/{d.size} "
          f"elements over 1e-5", flush=True)
    if int(nbad):
        rows = np.nonzero(per_row)[0]
        cols = np.nonzero(per_col)[0]
        chans = np.nonzero(per_chan)[0]
        print(f"  rows {len(rows)}/{per_row.size} "
              f"[{rows[:6]}..{rows[-3:]}], cols {len(cols)}/{per_col.size}, "
              f"chans {len(chans)}/{per_chan.size}", flush=True)


def main():
    H, W, C, Co = 96, 320, 64, 64
    B, R = 8, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    off = jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Co), jnp.float32)

    ref = V3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g, max_offset=R)
    got = V3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g, max_offset=R)
    report("default-prec dx5 vs dx3", ref, got)

    with jax.default_matmul_precision("float32"):
        ref_hi = V3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g, max_offset=R)
        got_hi = V3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g, max_offset=R)
    report("f32-prec dx5 vs dx3", ref_hi, got_hi)
    report("dx3 default vs f32-prec", ref_hi, ref)
    report("dx5 default vs f32-prec", got_hi, got)

    from trace_time import device_time
    for name, fn in [
        ("dx3_hi", lambda: V3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g,
                                                   max_offset=R)),
        ("dx5_hi", lambda: V3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g,
                                                   max_offset=R)),
    ]:
        with jax.default_matmul_precision("float32"):
            ms, _ = device_time(fn, iters=5)
        print(f"{name}: {ms:.3f} ms device (f32 matmul precision)", flush=True)


if __name__ == "__main__":
    main()
