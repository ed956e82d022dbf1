"""FLOPs/img + MFU accounting for the flagship model (VERDICT r2 #8).

Uses XLA's own cost model (compiled.cost_analysis()) on the CPU backend with
the exact-gather DCN path — the arithmetic is impl-independent, so the count
transfers to the TPU kernels.  Prints FLOPs for forward(+decode) and the full
train step, and the implied TFLOP/s / MFU at given throughputs.

Usage: MONOFLEX_PLATFORM=cpu python tools/flops.py [--img_s 51.2] [--train_img_s 7.99]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_TFLOPS = 394.0   # per chip
V5E_PEAK_F32_TFLOPS = 197.0    # f32 ~ half bf16 on the MXU


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_s", type=float, default=51.2,
                    help="measured inference img/s to convert to MFU")
    ap.add_argument("--train_img_s", type=float, default=7.99,
                    help="measured train img/s to convert to MFU")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", os.environ.get("MONOFLEX_PLATFORM", "cpu"))
    import jax.numpy as jnp

    from monoflex_tpu.config import get_cfg_defaults
    from monoflex_tpu.data.synthetic import make_dummy_batch
    from monoflex_tpu.losses.loss_computation import LossComputer
    from monoflex_tpu.models.detector import build_model
    from monoflex_tpu.train.solver import build_optimizer
    from monoflex_tpu.train.train_step import TrainState, make_train_step

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "runs", "monoflex.yaml"))
    cfg.defrost()
    cfg.TPU.DCN_FORCE_IMPL = "gather"  # impl-independent arithmetic, CPU-safe
    cfg.freeze()

    model = build_model(cfg)
    b = args.batch
    batch = {k: jnp.asarray(v) for k, v in make_dummy_batch(b).items()}
    variables = model.init(jax.random.PRNGKey(0), batch["image"],
                           batch["edge_indices"], batch["edge_len"], train=False)

    def forward(variables, batch):
        return model.apply(variables, batch["image"], batch["edge_indices"],
                           batch["edge_len"], train=False)

    fwd_cost = (jax.jit(forward).lower(variables, batch).compile()
                .cost_analysis())
    fwd_flops = float(fwd_cost["flops"]) / b

    loss_computer = LossComputer(cfg)
    tx, _ = build_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       skips=jnp.zeros((), jnp.int32))
    step = make_train_step(model, loss_computer, tx)
    train_cost = jax.jit(step).lower(state, batch).compile().cost_analysis()
    train_flops = float(train_cost["flops"]) / b

    inf_tflops = fwd_flops * args.img_s / 1e12
    train_tflops = train_flops * args.train_img_s / 1e12
    print(json.dumps({
        "fwd_gflops_per_img": round(fwd_flops / 1e9, 2),
        "train_gflops_per_img": round(train_flops / 1e9, 2),
        "bytes_accessed_fwd_gb_per_img": round(
            float(fwd_cost.get("bytes accessed", 0.0)) / b / 1e9, 3),
        "inference": {
            "img_s": args.img_s,
            "achieved_tflops": round(inf_tflops, 3),
            "mfu_vs_f32_peak_pct": round(100 * inf_tflops / V5E_PEAK_F32_TFLOPS, 2),
            "mfu_vs_bf16_peak_pct": round(100 * inf_tflops / V5E_PEAK_BF16_TFLOPS, 2),
        },
        "train": {
            "img_s": args.train_img_s,
            "achieved_tflops": round(train_tflops, 3),
            "mfu_vs_f32_peak_pct": round(100 * train_tflops / V5E_PEAK_F32_TFLOPS, 2),
            "mfu_vs_bf16_peak_pct": round(100 * train_tflops / V5E_PEAK_BF16_TFLOPS, 2),
        },
    }, indent=1))


if __name__ == "__main__":
    main()
