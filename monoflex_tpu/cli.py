"""Train / evaluate MonoFlex-TPU — the CLI implementation.

Invoked as `python tools/plain_train_net.py ...` (reference CLI parity) or
the installed `monoflex-train` console script.
"""

import os

import jax

# MONOFLEX_PLATFORM=cpu|tpu overrides the backend (some environments pre-pin
# jax_platforms at interpreter startup, so an env var alone is not enough)
if os.environ.get("MONOFLEX_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MONOFLEX_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MONOFLEX_COMPILE_CACHE",
                                 os.path.join(os.getcwd(), ".jax_cache")))

import jax.numpy as jnp

from .config import DatasetCatalog
from .data.dataset import CachedFlipDataset, KITTIDataset
from .data.loader import collate, make_train_loader
from .decode.postprocessor import PostProcessor
from .engine.defaults import default_argument_parser, default_setup, setup
from .engine.inference import inference, inference_all_depths
from .engine.trainer import do_train
from .losses.loss_computation import LossComputer
from .models.detector import build_model
from .parallel.mesh import make_mesh, replicated
from .train.checkpoint import Checkpointer
from .train.solver import build_optimizer
from .train.train_step import (TrainState, make_eval_step,
                                           make_train_step)


def build_datasets(cfg, need_train: bool = True):
    test_name = cfg.DATASETS.TEST[0]
    test_root = DatasetCatalog.get(test_name)["args"]["root"]
    eval_ds = KITTIDataset(cfg, test_root, is_train=False)
    if not need_train:
        return eval_ds, eval_ds
    train_name = cfg.DATASETS.TRAIN[0]
    train_root = DatasetCatalog.get(train_name)["args"]["root"]
    if cfg.DATALOADER.CACHE_DATASET:
        train_ds = CachedFlipDataset(cfg, train_root, is_train=True)
    else:
        train_ds = KITTIDataset(cfg, train_root, is_train=True)
    return train_ds, eval_ds


def main():
    """Parse args and launch (multi-host aware) the training/eval driver."""
    from .engine.launch import launch

    args = default_argument_parser().parse_args()
    launch(_run, args.coordinator_address, args.num_processes,
           args.process_id, args)


def _run(args):
    from .utils import comm

    cfg = setup(args)
    logger, seed = default_setup(cfg, args, rank=comm.get_rank())

    # every process must build bit-identical initial params (GSPMD replicates
    # by value; there is no DDP-style param broadcast), and the samplers must
    # agree on the epoch permutation they rank-stride — share one seed
    shared_seed = comm.broadcast_object(seed) % (2 ** 31)

    model = build_model(cfg)
    post = PostProcessor(cfg)
    loss_computer = LossComputer(cfg)

    train_ds, eval_ds = build_datasets(cfg, need_train=not args.test)
    sample = collate([train_ds[0]])
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    variables = model.init(jax.random.PRNGKey(shared_seed), sample["image"],
                           sample.get("edge_indices"), sample.get("edge_len"),
                           train=False)

    steps_per_epoch = max(1, len(train_ds) // cfg.SOLVER.IMS_PER_BATCH)
    tx, schedule = build_optimizer(cfg, variables["params"], steps_per_epoch)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       skips=jnp.zeros((), jnp.int32))

    checkpointer = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "ckpt"),
                                cfg.SOLVER.LOAD_OPTIMIZER_SCHEDULER)
    ckpt_path = cfg.MODEL.WEIGHT or None
    restored = bool(ckpt_path) or checkpointer.has_checkpoint()
    state, start_iter = checkpointer.load(state, ckpt_path)
    if start_iter:
        logger.info(f"resumed from iteration {start_iter}")

    if restored and cfg.TPU.DCN_OFFSET_GUARD != "off":
        # imported weights + bounded-window DCN kernels are a measured AP-0
        # footgun; scan the learned offsets and warn / auto-reroute
        from .utils.dcn_guard import dcn_offset_guard

        fired, suggestion, _ = dcn_offset_guard(
            cfg, {"params": state.params, "batch_stats": state.batch_stats},
            sample, logger=logger)
        if fired and suggestion is not None:
            logger.warning("DCN offset guard (auto): rebuilding model with "
                           f"TPU.DCN_IMPL_PER_STAGE={list(suggestion)}")
            cfg.defrost()
            cfg.TPU.DCN_IMPL_PER_STAGE = suggestion
            cfg.freeze()
            model = build_model(cfg)

    mesh = make_mesh(args.num_chips)
    # device_put's cross-process value check is a device collective; meet at
    # the coordinator first so per-host init-compile skew can't trip the
    # much tighter collective-rendezvous timeout
    comm.coordination_barrier("pre_device_put")
    state = jax.device_put(state, replicated(mesh))
    eval_step = jax.jit(make_eval_step(model, post), static_argnames="output_depth")

    if args.test:
        # label-less submission run on DATASETS.TEST_SPLIT (reference:
        # engine/test_net.py:9-35) — writes txts, skips AP
        from .engine.test_net import run_test

        if not restored:
            logger.warning(
                "--test with RANDOMLY INITIALIZED weights: no --ckpt given "
                "and no checkpoint found in OUTPUT_DIR — the submission "
                "txts will be garbage")

        with mesh:
            run_test(cfg, eval_step, state, eval_ds,
                     eval_all_depths=args.eval_all_depths, logger=logger)
        return

    if args.eval:
        out = os.path.join(cfg.OUTPUT_DIR, "inference")
        with mesh:
            if args.eval_all_depths:
                inference_all_depths(cfg, eval_step, state, eval_ds, out,
                                     logger=logger)
            else:
                inference(cfg, eval_step, state, eval_ds, out,
                          metrics=cfg.TEST.METRIC, logger=logger,
                          model=model, visualize=args.vis)
        return

    # snapshot framework source + configs into the run directory
    # (reference: utils/backup_files.py:57-70); rank-gated so pod hosts on a
    # shared filesystem don't race on the same files
    if comm.is_main_process():
        from .utils.backup_files import sync_root

        n_backed = sync_root(os.path.dirname(os.path.abspath(__file__)),
                             cfg.OUTPUT_DIR)
        logger.info(f"backed up {n_backed} source files to "
                    f"{cfg.OUTPUT_DIR}/backup")

    train_loader = make_train_loader(cfg, train_ds, rank=comm.get_rank(),
                                     world_size=comm.get_world_size(),
                                     seed=shared_seed)
    train_step = jax.jit(make_train_step(model, loss_computer, tx), donate_argnums=0)
    with mesh:
        do_train(cfg, model, train_step, eval_step, state, train_loader,
                 eval_dataset=eval_ds, mesh=mesh, schedule=schedule,
                 logger=logger, start_iter=start_iter,
                 profile_steps=args.profile)


if __name__ == "__main__":
    main()
