"""Measure learned DCN offset distributions per neck layer (VERDICT r1 #4).

The Pallas/shift DCN clamps learned offsets to +-R feature px
(config TPU.DCN_MAX_OFFSET, default 2) where the reference CUDA kernel is
unbounded (reference: model/backbone/DCNv2/dcn_v2.py:97-128).  This tool runs
a checkpoint over a dataset, captures every DCN layer's offset map via flax
intermediates, and prints per-layer |offset| percentiles + the fraction that
the clamp would saturate — the data that justifies (or revises) R per layer.

Usage:
  MONOFLEX_PLATFORM=cpu MONOFLEX_DATA_DIR=/tmp/conv_data \
    python tools/offset_stats.py --config runs/monoflex.yaml \
    --ckpt /tmp/conv_run/ckpt/model_final --max_batches 8 \
    INPUT.HEIGHT_TEST 96 INPUT.WIDTH_TEST 320
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten_intermediates(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, (dict,)) or hasattr(v, "items"):
            out.update(flatten_intermediates(v, path))
        else:
            out[path] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="runs/monoflex.yaml")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--max_batches", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    platform = os.environ.get("MONOFLEX_PLATFORM")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from monoflex_tpu.config import get_cfg_defaults
    from monoflex_tpu.data.dataset import KITTIDataset
    from monoflex_tpu.data.loader import collate, make_test_loader
    from monoflex_tpu.models.detector import build_model
    from monoflex_tpu.train.checkpoint import Checkpointer
    from monoflex_tpu.train.solver import build_optimizer
    from monoflex_tpu.train.train_step import TrainState

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    data_root = os.path.join(os.environ.get("MONOFLEX_DATA_DIR", "datasets"),
                             "kitti", "training")

    model = build_model(cfg)
    ds = KITTIDataset(cfg, data_root, is_train=False)
    loader = make_test_loader(cfg, ds)

    sample = {k: jnp.asarray(v) for k, v in collate([ds[0]]).items()}
    variables = model.init(jax.random.PRNGKey(0), sample["image"],
                           sample.get("edge_indices"), sample.get("edge_len"),
                           train=False)
    tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=1)
    template = TrainState(step=jnp.zeros((), jnp.int32),
                          params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tx.init(variables["params"]),
                       skips=jnp.zeros((), jnp.int32))
    ckptr = Checkpointer(os.path.dirname(args.ckpt))
    state, _ = ckptr.load(template, args.ckpt)

    @jax.jit
    def capture(params, batch_stats, batch):
        _, inter = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], batch.get("edge_indices"), batch.get("edge_len"),
            train=False, mutable=["intermediates"])
        return inter["intermediates"]

    acc = {}
    n = 0
    for batch in loader:
        if n >= args.max_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        inter = jax.device_get(capture(state.params, state.batch_stats, batch))
        flat = flatten_intermediates(inter)
        for path, v in flat.items():
            if "offset" not in path:
                continue
            v = np.abs(np.asarray(v)).ravel()
            acc.setdefault(path, []).append(v)
        n += 1

    R = cfg.TPU.DCN_MAX_OFFSET
    rows = []
    for path in sorted(acc):
        v = np.concatenate(acc[path])
        rows.append({
            "layer": path.replace("/offset", ""),
            "p50": round(float(np.percentile(v, 50)), 4),
            "p90": round(float(np.percentile(v, 90)), 4),
            "p99": round(float(np.percentile(v, 99)), 4),
            "max": round(float(v.max()), 4),
            "frac_clipped": round(float((v > R).mean()), 6),
            "frac_gt_1": round(float((v > 1.0).mean()), 6),
        })
    print(f"DCN |offset| stats over {n} batches (clamp R={R}):")
    for r in rows:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
