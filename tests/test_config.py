import os

import pytest

from monoflex_tpu.config import get_cfg_defaults

RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


def test_defaults_clone_independent():
    c1 = get_cfg_defaults()
    c2 = get_cfg_defaults()
    c1.SOLVER.BASE_LR = 1.0
    assert c2.SOLVER.BASE_LR != 1.0


def test_merge_from_run_yaml():
    cfg = get_cfg_defaults()
    cfg.merge_from_file(RUN_YAML)
    assert cfg.INPUT.ORIENTATION == "multi-bin"
    assert cfg.MODEL.HEAD.ENABLE_EDGE_FUSION is True
    assert cfg.SOLVER.BASE_LR == 3e-4
    assert cfg.SOLVER.IMS_PER_BATCH == 8
    assert cfg.MODEL.HEAD.OUTPUT_DEPTH == "soft"
    # heads-are-data: 8 groups, 10 outputs
    assert len(cfg.MODEL.HEAD.REGRESSION_HEADS) == 8
    total = sum(c for grp in cfg.MODEL.HEAD.REGRESSION_CHANNELS for c in grp)
    assert total == 50


def test_merge_from_list():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.01", "MODEL.HEAD.NUM_CHANNEL", "128"])
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.HEAD.NUM_CHANNEL == 128


def test_unknown_key_rejected():
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVER.NO_SUCH_KEY", "1"])


def test_freeze():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 5.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 5.0


def test_key2channel():
    from monoflex_tpu.models.heads.key2channel import Key2Channel

    cfg = get_cfg_defaults()
    cfg.merge_from_file(RUN_YAML)
    k2c = Key2Channel(cfg.MODEL.HEAD.REGRESSION_HEADS, cfg.MODEL.HEAD.REGRESSION_CHANNELS)
    assert k2c("2d_dim") == slice(0, 4)
    assert k2c("3d_offset") == slice(4, 6)
    assert k2c("corner_offset") == slice(6, 26)
    assert k2c("corner_uncertainty") == slice(26, 29)
    assert k2c("3d_dim") == slice(29, 32)
    assert k2c("ori_cls") == slice(32, 40)
    assert k2c("ori_offset") == slice(40, 48)
    assert k2c("depth") == slice(48, 49)
    assert k2c("depth_uncertainty") == slice(49, 50)
