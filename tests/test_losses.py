import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.data.dataset import KITTIDataset
from monoflex_tpu.data.loader import collate
from monoflex_tpu.losses.loss_computation import LossComputer
from monoflex_tpu.models.heads.key2channel import Key2Channel
from monoflex_tpu.ops.rotated_iou import iou_3d_pairs, rotated_iou_pairs
from synthetic_kitti import make_synthetic_kitti

RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


@pytest.fixture(scope="module")
def cfg():
    c = get_cfg_defaults()
    c.merge_from_file(RUN_YAML)
    return c


@pytest.fixture(scope="module")
def batch(cfg, tmp_path_factory):
    root = make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti")))
    ds = KITTIDataset(cfg, root, is_train=True, augment=False)
    samples = [ds[i] for i in range(3)]
    b = collate(samples)
    return {k: jnp.asarray(v) for k, v in b.items()}


def random_predictions(cfg, batch, seed=0):
    rng = np.random.RandomState(seed)
    B, Ho, Wo, C = batch["hm"].shape
    cls = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4, (B, Ho, Wo, C)).astype(np.float32))
    reg = jnp.asarray(rng.randn(B, Ho, Wo, 50).astype(np.float32) * 0.1)
    return {"cls": cls, "reg": reg}


def perfect_predictions(cfg, batch):
    """Scatter ground-truth-consistent regression values at target centers."""
    k2c = Key2Channel(cfg.MODEL.HEAD.REGRESSION_HEADS, cfg.MODEL.HEAD.REGRESSION_CHANNELS)
    hm = np.asarray(batch["hm"])
    B, Ho, Wo, ncls = hm.shape
    reg = np.zeros((B, Ho, Wo, 50), dtype=np.float32)
    mean = np.asarray(cfg.MODEL.HEAD.DIMENSION_MEAN)

    for b in range(B):
        for i in range(40):
            if not batch["reg_mask"][b, i]:
                continue
            cx, cy = np.asarray(batch["target_centers"][b, i])
            row = np.zeros(50, dtype=np.float32)
            box = np.asarray(batch["2d_bboxes"][b, i])
            center = np.array([cx, cy], dtype=np.float32)
            row[k2c("2d_dim")] = np.concatenate([center - box[:2], box[2:] - center])
            row[k2c("3d_offset")] = np.asarray(batch["offset_3D"][b, i])
            row[k2c("corner_offset")] = np.asarray(batch["keypoints"][b, i, :, :2]).reshape(-1)
            cls_id = int(batch["cls_ids"][b, i])
            dims = np.asarray(batch["dimensions"][b, i])
            row[k2c("3d_dim")] = np.log(dims / mean[cls_id])
            ori = np.asarray(batch["orientations"][b, i])
            ori_cls = np.zeros(8, dtype=np.float32)
            ori_off = np.zeros(8, dtype=np.float32)
            for k in range(4):
                ori_cls[2 * k + 1] = 20.0 if ori[k] == 1 else -20.0
                off = ori[4 + k] if ori[k] == 1 else 0.0
                ori_off[2 * k] = math.sin(off)
                ori_off[2 * k + 1] = math.cos(off)
            row[k2c("ori_cls")] = ori_cls
            row[k2c("ori_offset")] = ori_off
            depth = float(batch["locations"][b, i, 2])
            # invert inv_sigmoid decode: d = 1/sigmoid(x) - 1 -> x = -log(d)
            row[k2c("depth")] = -math.log(depth)
            row[k2c("depth_uncertainty")] = 0.0
            row[k2c("corner_uncertainty")] = 0.0
            reg[b, cy, cx] = row
    cls_map = np.clip(hm, 1e-4, 1 - 1e-4)
    return {"cls": jnp.asarray(cls_map), "reg": jnp.asarray(reg)}


def test_loss_keys_and_finiteness(cfg, batch):
    computer = LossComputer(cfg)
    preds = random_predictions(cfg, batch)
    loss_dict, log_dict = computer(preds, batch)
    expect = set(cfg.MODEL.HEAD.LOSS_NAMES)
    assert set(loss_dict.keys()) == expect
    for k, v in {**loss_dict, **log_dict}.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_losses_near_zero_for_perfect_predictions(cfg, batch):
    computer = LossComputer(cfg)
    preds = perfect_predictions(cfg, batch)
    loss_dict, log_dict = computer(preds, batch)
    for key in ["bbox_loss", "offset_loss", "dims_loss", "orien_loss", "keypoint_loss",
                "trunc_offset_loss"]:
        assert float(loss_dict[key]) < 1e-2, f"{key}={float(loss_dict[key])}"
    # depth from inverse sigmoid is exact; keypoint-triangulated depth is
    # geometric so only approximately equal to the label depth
    assert float(loss_dict["depth_loss"]) < 1e-2
    assert float(loss_dict["weighted_avg_depth_loss"]) < 0.5
    assert float(loss_dict["corner_loss"]) < 0.5
    assert float(log_dict["2D_IoU"]) > 0.99
    assert float(log_dict["3D_IoU"]) > 0.8
    assert float(log_dict["depth_MAE"]) < 1e-3


def test_gradients_flow(cfg, batch):
    computer = LossComputer(cfg)
    preds = random_predictions(cfg, batch)

    def total(reg):
        loss_dict, _ = computer({"cls": preds["cls"], "reg": reg}, batch)
        return sum(loss_dict.values())

    g = jax.grad(total)(preds["reg"])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_empty_batch_no_nan(cfg, batch):
    computer = LossComputer(cfg)
    empty = dict(batch)
    empty["reg_mask"] = jnp.zeros_like(batch["reg_mask"])
    preds = random_predictions(cfg, batch)
    loss_dict, log_dict = computer(preds, empty)
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k


def test_jit_compatible(cfg, batch):
    computer = LossComputer(cfg)
    preds = random_predictions(cfg, batch)

    @jax.jit
    def run(p, b):
        ld, lg = computer(p, b)
        return sum(ld.values())

    v = run(preds, batch)
    assert np.isfinite(float(v))


class TestRotatedIoU:
    def test_identical_boxes(self):
        sq = jnp.array([[[0.0, 0], [2, 0], [2, 2], [0, 2]]])
        iou = rotated_iou_pairs(sq, sq)
        np.testing.assert_allclose(np.asarray(iou), [1.0], atol=1e-5)

    def test_disjoint(self):
        a = jnp.array([[[0.0, 0], [1, 0], [1, 1], [0, 1]]])
        b = jnp.array([[[5.0, 5], [6, 5], [6, 6], [5, 6]]])
        np.testing.assert_allclose(np.asarray(rotated_iou_pairs(a, b)), [0.0], atol=1e-6)

    def test_half_overlap(self):
        a = jnp.array([[[0.0, 0], [2, 0], [2, 2], [0, 2]]])
        b = jnp.array([[[1.0, 0], [3, 0], [3, 2], [1, 2]]])
        # inter 2, union 6
        np.testing.assert_allclose(np.asarray(rotated_iou_pairs(a, b)), [2 / 6], atol=1e-5)

    def test_rotated_45(self):
        # unit square vs itself rotated 45 deg about its center
        c, s = math.sqrt(2) / 2, math.sqrt(2) / 2
        sq = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])
        rot = sq @ np.array([[c, -s], [s, c]]).T
        iou = float(rotated_iou_pairs(jnp.asarray(sq[None]), jnp.asarray(rot[None]))[0])
        # analytic: intersection is a regular octagon, area 2*(sqrt(2)-1)
        inter = 2 * (math.sqrt(2) - 1)
        expect = inter / (2 - inter)
        assert abs(iou - expect) < 1e-4

    def test_iou3d_identical(self):
        from monoflex_tpu.core import geometry_jax as GJ

        corners = GJ.encode_box3d(jnp.array([0.3]), jnp.array([[4.0, 1.5, 2.0]]),
                                  jnp.array([[1.0, 1.0, 20.0]]))
        np.testing.assert_allclose(np.asarray(iou_3d_pairs(corners, corners)), [1.0], atol=1e-4)

    def test_iou3d_shifted(self):
        from monoflex_tpu.core import geometry_jax as GJ

        a = GJ.encode_box3d(jnp.array([0.0]), jnp.array([[4.0, 2.0, 2.0]]),
                            jnp.array([[0.0, 0.0, 20.0]]))
        b = GJ.encode_box3d(jnp.array([0.0]), jnp.array([[4.0, 2.0, 2.0]]),
                            jnp.array([[0.0, 1.0, 20.0]]))  # half-height offset
        # volume overlap = 4*2*1 (h overlap 1m of 2m), union = 2*16-8
        np.testing.assert_allclose(np.asarray(iou_3d_pairs(a, b)), [8 / 24], atol=1e-4)


class TestRotatedIoUEdgeCases:
    def test_degenerate_zero_area(self):
        import jax.numpy as jnp

        from monoflex_tpu.ops.rotated_iou import rotated_iou_pairs

        a = jnp.zeros((1, 4, 2))  # all corners at origin
        b = jnp.array([[[0.0, 0], [1, 0], [1, 1], [0, 1]]])
        iou = rotated_iou_pairs(a, b)
        assert np.isfinite(float(iou[0]))
        assert float(iou[0]) == 0.0

    def test_contained_box(self):
        import jax.numpy as jnp

        from monoflex_tpu.ops.rotated_iou import rotated_iou_pairs

        outer = jnp.array([[[0.0, 0], [4, 0], [4, 4], [0, 4]]])
        inner = jnp.array([[[1.0, 1], [3, 1], [3, 3], [1, 3]]])
        np.testing.assert_allclose(np.asarray(rotated_iou_pairs(inner, outer)),
                                   [4 / 16], atol=1e-5)

    def test_clockwise_winding_handled(self):
        import jax.numpy as jnp

        from monoflex_tpu.ops.rotated_iou import rotated_iou_pairs

        ccw = jnp.array([[[0.0, 0], [2, 0], [2, 2], [0, 2]]])
        cw = jnp.array([[[0.0, 0], [0, 2], [2, 2], [2, 0]]])
        np.testing.assert_allclose(np.asarray(rotated_iou_pairs(ccw, cw)), [1.0],
                                   atol=1e-5)
