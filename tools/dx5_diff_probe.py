"""Localize the on-device dx5-vs-dx3 mismatch (round-5 investigation).

Round 4 left a hot-shape record of dx5 at 2.1e-3 max relerr vs dx3 on device
while interpret-mode parity is exact — a Mosaic-lowering-level discrepancy.
This probe computes both kernels on device and reports the structure of the
differing elements (rows mod tile_h, columns, channels, batch), which
distinguishes e.g. a halo/bank staging bug (edge columns), a grid-row bug
(rows at tile boundaries), or an accumulation race (diffuse).

Usage (detached):
  nohup python tools/dx5_diff_probe.py > /tmp/dx5_probe.log 2>&1 &
"""

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

from monoflex_tpu.ops import dcn_pallas_v3 as V3


def main():
    H, W, C, Co = 96, 320, 64, 64
    B, R = 8, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    off = jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Co), jnp.float32)

    ref = np.asarray(V3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g, max_offset=R))
    got = np.asarray(V3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g, max_offset=R))
    d = np.abs(ref - got)
    denom = np.abs(ref).max()
    print(f"max relerr {d.max() / denom:.3e}  (denom {denom:.3f})", flush=True)

    thr = 1e-5 * denom
    bad = np.argwhere(d > thr)
    print(f"{bad.shape[0]} / {d.size} elements over {thr:.2e}")
    if bad.shape[0] == 0:
        return
    for axis, name, mod in [(0, "batch", None), (1, "row", 8),
                            (2, "col", 128), (3, "chan", None)]:
        vals, counts = np.unique(bad[:, axis], return_counts=True)
        print(f"{name}: {len(vals)} distinct; "
              f"head {[int(v) for v in vals[:12]]}; "
              f"tail {[int(v) for v in vals[-6:]]}")
        if mod:
            mv, mc = np.unique(bad[:, axis] % mod, return_counts=True)
            print(f"  {name} % {mod}: " +
                  ", ".join(f"{int(a)}:{int(b)}" for a, b in zip(mv, mc)))
    # worst offender context
    i = np.unravel_index(np.argmax(d), d.shape)
    print(f"worst at {i}: ref {ref[i]:.6f} got {got[i]:.6f}")


if __name__ == "__main__":
    main()
