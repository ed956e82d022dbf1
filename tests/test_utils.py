import logging
import os
import time

import numpy as np


def test_smoothed_value_and_metric_logger():
    from monoflex_tpu.utils.metric_logger import MetricLogger, SmoothedValue

    sv = SmoothedValue(window_size=3)
    for v in [1, 2, 3, 4]:
        sv.update(v)
    assert sv.avg == 3.0           # window [2,3,4]
    assert sv.global_avg == 2.5
    assert sv.median == 3

    ml = MetricLogger()
    ml.update(loss=1.0, acc=0.5)
    ml.update(loss=3.0, acc=0.7)
    assert "loss" in str(ml)
    assert ml.loss.global_avg == 2.0


def test_logger_rank_gating(tmp_path):
    from monoflex_tpu.utils.logger import log_first_n, setup_logger

    lg0 = setup_logger("test_rank0", str(tmp_path), rank=0, filename="log.txt")
    lg0.info("hello")
    assert os.path.getsize(tmp_path / "log.txt") > 0
    lg1 = setup_logger("test_rank1", str(tmp_path), rank=1)
    assert all(isinstance(h, logging.NullHandler) for h in lg1.handlers)
    for _ in range(5):
        log_first_n(lg0, "only twice", n=2, key="k")


def test_timer():
    from monoflex_tpu.utils.timer import Timer

    t = Timer()
    t.tic()
    time.sleep(0.01)
    avg = t.toc()
    assert avg >= 0.01
    assert t.calls == 1


def test_seed_all_rng():
    from monoflex_tpu.utils.envs import seed_all_rng

    s = seed_all_rng(42)
    a = np.random.rand(3)
    seed_all_rng(42)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    assert seed_all_rng(None) != seed_all_rng(None)


def test_sync_root(tmp_path):
    from monoflex_tpu.utils.backup_files import sync_root

    src = tmp_path / "src"
    (src / "pkg").mkdir(parents=True)
    (src / "pkg" / "a.py").write_text("x = 1")
    (src / "b.yaml").write_text("k: v")
    (src / "c.txt").write_text("ignored")
    n = sync_root(str(src), str(tmp_path / "out"))
    assert n == 2
    assert (tmp_path / "out" / "backup" / "pkg" / "a.py").exists()
    assert not (tmp_path / "out" / "backup" / "c.txt").exists()


def test_uncertainty_weights():
    import jax.numpy as jnp

    from monoflex_tpu.losses.uncertainty import (apply_uncertainty_weights,
                                                 init_log_variances)

    lv = init_log_variances(["a", "b"])
    losses = {"a": jnp.array(2.0), "b": jnp.array(4.0)}
    out, reg = apply_uncertainty_weights(losses, lv)
    assert float(out["a"]) == 2.0 and float(reg) == 0.0
    lv = {"a": jnp.array(1.0), "b": jnp.array(0.0)}
    out, reg = apply_uncertainty_weights(losses, lv)
    np.testing.assert_allclose(float(out["a"]), 2.0 * np.exp(-1.0), rtol=1e-6)
    np.testing.assert_allclose(float(reg), 0.5, rtol=1e-6)


def test_comm_single_process():
    from monoflex_tpu.utils import comm

    assert comm.get_rank() == 0
    assert comm.get_world_size() == 1
    assert comm.is_main_process()
    comm.synchronize()  # no-op single process
    assert comm.broadcast_object({"a": 1}) == {"a": 1}
    assert isinstance(comm.shared_random_seed(), int)


def test_launch_single_process():
    from monoflex_tpu.engine.launch import get_rank, get_world_size, launch, synchronize

    called = {}

    def main_fn(x):
        called["x"] = x

    launch(main_fn, None, None, None, 42)
    assert called["x"] == 42
    assert get_rank() == 0 and get_world_size() == 1
    synchronize()


def test_model_catalog_unknown():
    import pytest as _pytest

    from monoflex_tpu.config.paths_catalog import DatasetCatalog, ModelCatalog

    with _pytest.raises(RuntimeError):
        ModelCatalog.get("catalog://NO/SUCH")
    with _pytest.raises(RuntimeError):
        DatasetCatalog.get("nope")


def test_checkpoint_load_across_ema_boundary(tmp_path):
    """A checkpoint saved with one SOLVER.EMA_DECAY setting loads under the
    other: the opt_state STRUCTURE differs (ParamEmaState wraps the inner
    state), so Checkpointer.load falls back to a weights+stats-only restore
    instead of failing the full-template restore."""
    import jax.numpy as jnp
    import optax

    from monoflex_tpu.train.checkpoint import Checkpointer
    from monoflex_tpu.train.solver import with_param_ema
    from monoflex_tpu.train.train_step import TrainState

    params = {"w": jnp.arange(4.0)}
    tx_plain = optax.sgd(0.1)
    tx_ema = with_param_ema(optax.sgd(0.1), 0.99)

    def mk(tx, val=0.0):
        return TrainState(step=jnp.ones((), jnp.int32),
                          params={"w": jnp.arange(4.0) + val},
                          batch_stats={"m": jnp.zeros(2) + val},
                          opt_state=tx.init(params),
                          skips=jnp.zeros((), jnp.int32))

    ck = Checkpointer(str(tmp_path / "a"))
    ck.save("model_x", mk(tx_plain, val=7.0))
    st, it = ck.load(mk(tx_ema), str(tmp_path / "a" / "model_x"))
    assert it == 0  # optimizer/scheduler NOT restored across the boundary
    assert float(st.params["w"][0]) == 7.0
    assert float(st.batch_stats["m"][0]) == 7.0

    ck2 = Checkpointer(str(tmp_path / "b"))
    ck2.save("model_y", mk(tx_ema, val=3.0))
    st2, it2 = ck2.load(mk(tx_plain), str(tmp_path / "b" / "model_y"))
    assert it2 == 0 and float(st2.params["w"][0]) == 3.0
