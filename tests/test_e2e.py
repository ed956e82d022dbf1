"""End-to-end smoke: train a few steps on a tiny synthetic KITTI set, eval,
checkpoint round-trip. This is the integration test the reference lacks
(SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.data.dataset import KITTIDataset
from monoflex_tpu.data.loader import collate, make_train_loader
from monoflex_tpu.decode.postprocessor import PostProcessor
from monoflex_tpu.engine.inference import inference
from monoflex_tpu.engine.trainer import do_train
from monoflex_tpu.losses.loss_computation import LossComputer
from monoflex_tpu.models.detector import build_model
from monoflex_tpu.train.checkpoint import Checkpointer
from monoflex_tpu.train.solver import build_optimizer
from monoflex_tpu.train.train_step import (TrainState, make_eval_step,
                                           make_train_step)
from synthetic_kitti import make_synthetic_kitti

pytestmark = pytest.mark.slow  # heavy integration: skip via -m 'not slow'


RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(RUN_YAML)
    cfg.INPUT.HEIGHT_TRAIN = 96
    cfg.INPUT.WIDTH_TRAIN = 320
    cfg.INPUT.HEIGHT_TEST = 96
    cfg.INPUT.WIDTH_TEST = 320
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.EVAL_AND_SAVE_EPOCH = False
    cfg.SOLVER.EVAL_INTERVAL = 1000   # no mid-train eval in the loop test
    cfg.SOLVER.SAVE_CHECKPOINT_INTERVAL = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.IMS_PER_BATCH = 3
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("out"))
    return cfg


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    return make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti_small")), scale=4)


@pytest.fixture(scope="module")
def stack(tiny_cfg, tiny_root):
    cfg = tiny_cfg
    model = build_model(cfg)
    loss_computer = LossComputer(cfg)
    post = PostProcessor(cfg)
    train_ds = KITTIDataset(cfg, tiny_root, is_train=True, augment=False)
    eval_ds = KITTIDataset(cfg, tiny_root, is_train=False)

    sample = {k: jnp.asarray(v) for k, v in collate([train_ds[0]]).items()}
    variables = model.init(jax.random.PRNGKey(0), sample["image"],
                           sample["edge_indices"], sample["edge_len"], train=False)
    tx, schedule = build_optimizer(cfg, variables["params"], steps_per_epoch=2)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       skips=jnp.zeros((), jnp.int32))
    train_step = jax.jit(make_train_step(model, loss_computer, tx))
    eval_step = jax.jit(make_eval_step(model, post), static_argnames="output_depth")
    return cfg, model, train_ds, eval_ds, state, train_step, eval_step, schedule


def test_train_loop_and_checkpoint(stack):
    cfg, model, train_ds, eval_ds, state, train_step, eval_step, schedule = stack
    loader = make_train_loader(cfg, train_ds)
    state = do_train(cfg, model, train_step, eval_step, state, loader,
                     eval_dataset=None, schedule=schedule, max_iter=3)
    assert int(state.step) == 3
    ckpt_dir = os.path.join(cfg.OUTPUT_DIR, "ckpt")
    assert os.path.exists(os.path.join(ckpt_dir, "model_final"))
    assert os.path.exists(os.path.join(ckpt_dir, "model_checkpoint_2"))
    assert os.path.exists(os.path.join(ckpt_dir, "last_checkpoint"))
    # scalars were logged
    assert os.path.getsize(os.path.join(cfg.OUTPUT_DIR, "tensorboard", "scalars.jsonl")) > 0


def test_checkpoint_resume(stack):
    cfg, model, train_ds, eval_ds, state, train_step, eval_step, schedule = stack
    ckptr = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "ckpt"))
    restored, start_iter = ckptr.load(jax.device_get(state))
    assert start_iter == 3  # model_final tagged last
    p_new = jax.tree.leaves(restored.params)[0]
    p_init = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(p_new), np.asarray(p_init))

    # weights-only restore
    ckptr2 = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "ckpt"),
                          load_optimizer_scheduler=False)
    restored2, start2 = ckptr2.load(jax.device_get(state))
    assert start2 == 0


def test_inference_end_to_end(stack):
    cfg, model, train_ds, eval_ds, state, train_step, eval_step, schedule = stack
    out_dir = os.path.join(cfg.OUTPUT_DIR, "inference")
    results = inference(cfg, eval_step, state, eval_ds, out_dir,
                        metrics=("R40",))
    # untrained model: APs exist (likely 0) and txts were written
    assert "Car_3d_0.70/moderate" in results
    pred_dir = os.path.join(out_dir, "data")
    assert sorted(os.listdir(pred_dir)) == ["000000.txt", "000001.txt", "000002.txt"]
    assert results["images"] == 3


def test_test_split_submission(stack, tmp_path):
    """--test routes through engine/test_net.run_test on the label-less
    TEST_SPLIT: txts are written, AP evaluation is skipped (reference:
    engine/test_net.py:9-35)."""
    import shutil

    from monoflex_tpu.engine.test_net import run_test

    cfg, model, train_ds, eval_ds, state, train_step, eval_step, schedule = stack
    # a KITTI "testing" root has no label_2 at all
    test_root = str(tmp_path / "testing")
    shutil.copytree(eval_ds.root, test_root)
    shutil.rmtree(os.path.join(test_root, "label_2"))

    c = cfg.clone()
    c.OUTPUT_DIR = str(tmp_path / "out")
    c.DATASETS.TEST_SPLIT = "test"
    ds = KITTIDataset(c, test_root, is_train=False)
    assert ds.split == "test"
    results = run_test(c, eval_step, state, ds)
    pred_dir = os.path.join(c.OUTPUT_DIR, "inference_test", "data")
    assert sorted(os.listdir(pred_dir)) == ["000000.txt", "000001.txt",
                                            "000002.txt"]
    # label-less: no AP keys, just throughput stats
    assert "Car_3d_0.70/moderate" not in results
    assert results["images"] == 3


def test_train_with_eval_hook_and_best_ckpt(stack):
    """Mid-training eval fires, APs land in the scalar log, and the
    metric-gated best checkpoint is written."""
    cfg, model, train_ds, eval_ds, state, train_step, eval_step, schedule = stack
    import copy

    c = cfg.clone()
    c.OUTPUT_DIR = cfg.OUTPUT_DIR + "_evalhook"
    c.SOLVER.EVAL_INTERVAL = 2
    loader = make_train_loader(c, train_ds)
    state2 = do_train(c, model, train_step, eval_step, state, loader,
                      eval_dataset=eval_ds, schedule=schedule, max_iter=2)
    ckpt_dir = os.path.join(c.OUTPUT_DIR, "ckpt")
    # untrained model gets AP 0 >= best(-1) -> best checkpoint written
    assert os.path.exists(os.path.join(ckpt_dir, "model_moderate_best_soft"))
    assert os.path.exists(os.path.join(c.OUTPUT_DIR, "eval_2", "data"))
