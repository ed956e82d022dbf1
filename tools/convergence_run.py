"""Synthetic 3D convergence gate: train on a rendered cuboid world, track AP.

The accuracy gate for a 3D detector must show the 3D metrics learning, not
just 2D (VERDICT r2 #4).  This orchestrates the whole loop:

  1. build a rendered synthetic-KITTI set (shaded 3D cuboids: class color,
     depth shading, heading-face asymmetry, corner keypoints — everything
     MonoFlex regresses is visually present; tests/synthetic_kitti.py),
  2. train the flagship config at reduced resolution with periodic eval,
  3. parse tensorboard/scalars.jsonl into an AP-vs-iteration trend table.

Reference recipe being miniaturized: /root/reference/runs/monoflex.yaml:61-78
(batch 8, AdamW 3e-4, eval on val each interval, select Car_3d moderate).

Usage:
  python tools/convergence_run.py --platform cpu --iters 3200
  python tools/convergence_run.py --platform tpu --impl pallas3   # on-chip
  python tools/convergence_run.py --table-only --output /tmp/conv_run
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_dataset(root: str, frames: int, seed: int, scale: int):
    from synthetic_kitti import make_synthetic_kitti

    marker = os.path.join(root, "kitti", "training", "ImageSets", "train.txt")
    if os.path.exists(marker):
        return
    make_synthetic_kitti(os.path.join(root, "kitti", "training"),
                         seed=seed, scale=scale, n_random_frames=frames,
                         render=True)


def print_table(output: str):
    path = os.path.join(output, "tensorboard", "scalars.jsonl")
    if not os.path.exists(path):
        print(f"no scalars at {path}")
        return
    rows = {}
    keys = set()
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            ev = {k.replace("eval/", ""): v for k, v in rec.items()
                  if k.startswith("eval/Car_")}
            if ev:
                rows.setdefault(rec["step"], {}).update(ev)
                keys.update(ev)
    # moderate-difficulty trend for the headline metrics (key naming from
    # eval/ap.py: {cls}_image = 2D bbox, _3d_{iou}, _bev_{iou}, _aos)
    cols = [k for k in ("Car_image/moderate", "Car_aos/moderate",
                        "Car_bev_0.50/moderate", "Car_3d_0.50/moderate",
                        "Car_bev_0.70/moderate", "Car_3d_0.70/moderate")
            if k in keys]
    if not cols:
        cols = sorted(k for k in keys if "/moderate" in k)[:6]
    print("| iter | " + " | ".join(c.replace("Car_", "") for c in cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    for step in sorted(rows):
        vals = [f"{rows[step].get(c, float('nan')):.2f}" for c in cols]
        print(f"| {step} | " + " | ".join(vals) + " |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/conv_data")
    ap.add_argument("--output", default="/tmp/conv_run")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--impl", default="",
                    help="TPU.DCN_FORCE_IMPL override (e.g. pallas3, gather)")
    ap.add_argument("--iters", type=int, default=3200)
    ap.add_argument("--eval-interval", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--frames", type=int, default=110,
                    help="random rendered frames (last fifth become val)")
    ap.add_argument("--table-only", action="store_true")
    ap.add_argument("overrides", nargs="*", help="extra cfg KEY VALUE pairs")
    args = ap.parse_args()

    if args.table_only:
        print_table(args.output)
        return

    build_dataset(args.root, args.frames, args.seed, args.scale)

    env = dict(os.environ)
    env["MONOFLEX_DATA_DIR"] = args.root
    if args.platform == "cpu":
        env["MONOFLEX_PLATFORM"] = "cpu"
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "plain_train_net.py"),
        "--config", os.path.join(REPO, "runs", "monoflex.yaml"),
        "--output", args.output,
        "INPUT.HEIGHT_TRAIN", "96", "INPUT.WIDTH_TRAIN", "320",
        "INPUT.HEIGHT_TEST", "96", "INPUT.WIDTH_TEST", "320",
        "SOLVER.IMS_PER_BATCH", str(args.batch),
        "SOLVER.MAX_ITERATION", str(args.iters),
        "SOLVER.EVAL_AND_SAVE_EPOCH", "False",
        "SOLVER.EVAL_INTERVAL", str(args.eval_interval),
        "SOLVER.SAVE_CHECKPOINT_INTERVAL", str(args.eval_interval),
        "TEST.IMS_PER_BATCH", "4",
        "DATALOADER.NUM_WORKERS", "2",
        "DATALOADER.CACHE_DATASET", "True",
        "SEED", str(args.seed),
    ]
    if args.impl:
        cmd += ["TPU.DCN_FORCE_IMPL", args.impl]
    cmd += list(args.overrides)
    print(" ".join(cmd), flush=True)
    rc = subprocess.call(cmd, env=env)
    print_table(args.output)
    sys.exit(rc)


if __name__ == "__main__":
    main()
