import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.data.dataset import KITTIDataset
from monoflex_tpu.data.loader import collate
from monoflex_tpu.decode.kitti_writer import result_rows_to_lines, write_kitti_results
from monoflex_tpu.decode.postprocessor import PostProcessor
from monoflex_tpu.models.heads.key2channel import Key2Channel
from synthetic_kitti import make_synthetic_kitti

RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


@pytest.fixture(scope="module")
def cfg():
    c = get_cfg_defaults()
    c.merge_from_file(RUN_YAML)
    return c


@pytest.fixture(scope="module")
def setup(cfg, tmp_path_factory):
    root = make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti")))
    ds = KITTIDataset(cfg, root, is_train=True, augment=False)
    batch = collate([ds[0]])
    return ds, {k: jnp.asarray(v) for k, v in batch.items()}


def gt_predictions(cfg, batch):
    """Heatmap with delta peaks at GT centers + exact regression rows."""
    k2c = Key2Channel(cfg.MODEL.HEAD.REGRESSION_HEADS, cfg.MODEL.HEAD.REGRESSION_CHANNELS)
    B, Ho, Wo, ncls = batch["hm"].shape
    cls_map = np.full((B, Ho, Wo, ncls), 1e-4, dtype=np.float32)
    reg = np.zeros((B, Ho, Wo, 50), dtype=np.float32)
    mean = np.asarray(cfg.MODEL.HEAD.DIMENSION_MEAN)
    for b in range(B):
        for i in range(40):
            if not batch["reg_mask"][b, i]:
                continue
            cx, cy = np.asarray(batch["target_centers"][b, i])
            cls_id = int(batch["cls_ids"][b, i])
            cls_map[b, cy, cx, cls_id] = 0.95
            row = np.zeros(50, dtype=np.float32)
            box = np.asarray(batch["2d_bboxes"][b, i])
            center = np.array([cx, cy], dtype=np.float32)
            row[k2c("2d_dim")] = np.concatenate([center - box[:2], box[2:] - center])
            row[k2c("3d_offset")] = np.asarray(batch["offset_3D"][b, i])
            row[k2c("corner_offset")] = np.asarray(batch["keypoints"][b, i, :, :2]).reshape(-1)
            dims = np.asarray(batch["dimensions"][b, i])
            row[k2c("3d_dim")] = np.log(dims / mean[cls_id])
            ori = np.asarray(batch["orientations"][b, i])
            for k in range(4):
                row[k2c("ori_cls")][2 * k + 1] = 20.0 if ori[k] == 1 else -20.0
                off = ori[4 + k] if ori[k] == 1 else 0.0
                row[k2c("ori_offset")][2 * k] = math.sin(off)
                row[k2c("ori_offset")][2 * k + 1] = math.cos(off)
            depth = float(batch["locations"][b, i, 2])
            row[k2c("depth")] = -math.log(depth)
            # strongly favour direct depth in the soft ensemble
            row[k2c("depth_uncertainty")] = -6.0
            row[k2c("corner_uncertainty")] = 3.0
            reg[b, cy, cx] = row
    return {"cls": jnp.asarray(cls_map), "reg": jnp.asarray(reg)}


def test_decode_recovers_ground_truth(cfg, setup):
    ds, batch = setup
    pp = PostProcessor(cfg)
    preds = gt_predictions(cfg, batch)
    result, valid, extras = pp(preds, batch)
    result = np.asarray(result[0])
    valid = np.asarray(valid[0])
    n_gt = int(batch["reg_mask"].sum())
    assert valid.sum() == n_gt

    objs = ds.filtrate_objects(ds.get_label_objects(0))
    got = result[valid]
    # sort by depth to match
    got = got[np.argsort(got[:, 11])]
    objs = sorted(objs, key=lambda o: o.t[2])
    for row, obj in zip(got, objs):
        assert int(row[0]) == {"Car": 0, "Pedestrian": 1, "Cyclist": 2}[obj.type]
        d_alpha = (row[1] - obj.alpha + math.pi) % (2 * math.pi) - math.pi
        assert abs(d_alpha) < 0.02
        np.testing.assert_allclose(row[6:9], [obj.h, obj.w, obj.l], atol=0.02)
        np.testing.assert_allclose(row[9:12], obj.t, atol=0.25)
        d_ry = (row[12] - obj.ry + math.pi) % (2 * math.pi) - math.pi
        assert abs(d_ry) < 0.02
        # 2D box in original image coords
        np.testing.assert_allclose(row[2:6], obj.box2d, atol=5.0)


def test_score_threshold_masks(cfg, setup):
    ds, batch = setup
    pp = PostProcessor(cfg)
    preds = gt_predictions(cfg, batch)
    # heatmap below threshold -> nothing valid
    low = {"cls": preds["cls"] * 0 + 1e-4, "reg": preds["reg"]}
    _, valid, _ = pp(low, batch)
    assert np.asarray(valid).sum() == 0


def test_depth_output_modes(cfg, setup):
    ds, batch = setup
    pp = PostProcessor(cfg)
    preds = gt_predictions(cfg, batch)
    for mode in ["direct", "soft", "hard", "mean", "keypoints_avg", "keypoints_center",
                 "keypoints_02", "keypoints_13"]:
        result, valid, _ = pp(preds, batch, output_depth=mode)
        assert np.isfinite(np.asarray(result)).all(), mode
        # each mode still produces metric-scale depths
        z = np.asarray(result[0])[np.asarray(valid[0]), 11]
        assert (z > 0.1).all() and (z < 100).all(), mode


def test_uncertainty_scales_scores(cfg, setup):
    ds, batch = setup
    pp = PostProcessor(cfg)
    preds = gt_predictions(cfg, batch)
    result, valid, extras = pp(preds, batch)
    scores = np.asarray(result[0])[np.asarray(valid[0]), 13]
    vis = np.asarray(extras["vis_scores"][0])[np.asarray(valid[0])]
    assert (scores <= vis + 1e-6).all()
    assert (scores >= 0.95 * 0.0).all()


def test_kitti_writer(tmp_path, cfg, setup):
    ds, batch = setup
    pp = PostProcessor(cfg)
    preds = gt_predictions(cfg, batch)
    result, valid, _ = pp(preds, batch)
    out = str(tmp_path / "preds")
    write_kitti_results(out, np.asarray(batch["image_id"]), np.asarray(result),
                        np.asarray(valid))
    path = os.path.join(out, "000000.txt")
    assert os.path.exists(path)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == int(batch["reg_mask"].sum())
    parts = lines[0].split(" ")
    assert parts[0] in ("Car", "Pedestrian", "Cyclist")
    assert len(parts) == 16


def test_oracle_depth_mode(cfg, setup):
    """Oracle mode should pick the estimator closest to GT depth for matched
    boxes, beating the soft ensemble on depth accuracy."""
    ds, batch = setup
    pp = PostProcessor(cfg)
    preds = gt_predictions(cfg, batch)
    # corrupt the direct depth channel so estimators disagree
    from monoflex_tpu.models.heads.key2channel import Key2Channel
    k2c = Key2Channel(cfg.MODEL.HEAD.REGRESSION_HEADS, cfg.MODEL.HEAD.REGRESSION_CHANNELS)
    reg = np.asarray(preds["reg"]).copy()
    reg[..., k2c("depth")] = reg[..., k2c("depth")] - 1.0  # biased direct depth
    bad = {"cls": preds["cls"], "reg": jnp.asarray(reg)}

    res_soft, valid, _ = pp(bad, batch, output_depth="soft")
    res_oracle, valid_o, _ = pp(bad, batch, output_depth="oracle")
    gt_depths = {}
    for i in range(40):
        if batch["reg_mask"][0, i]:
            gt_depths[float(batch["locations"][0, i, 2])] = True

    def depth_err(res, val):
        z = np.asarray(res[0])[np.asarray(val), 11]
        errs = [min(abs(zz - g) for g in gt_depths) for zz in z]
        return np.mean(errs)

    assert depth_err(res_oracle, np.asarray(valid_o[0])) <= depth_err(
        res_soft, np.asarray(valid[0])) + 1e-6
