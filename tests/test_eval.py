import math
import os

import numpy as np
import pytest

from monoflex_tpu.eval.ap import (clean_data, compute_statistics, eval_class,
                                  get_mAP_R40, get_official_eval_result,
                                  get_thresholds)
from monoflex_tpu.eval.kitti_common import get_label_anno
from monoflex_tpu.eval.rotate_iou import (box_corners, d3_box_overlap,
                                          image_box_overlap, rotate_iou_eval)


def make_anno(entries):
    """entries: list of (name, trunc, occ, alpha, bbox, lhw, xyz, ry, score)"""
    n = len(entries)
    return {
        "name": np.array([e[0] for e in entries]),
        "truncated": np.array([e[1] for e in entries], dtype=np.float64),
        "occluded": np.array([e[2] for e in entries], dtype=np.int64),
        "alpha": np.array([e[3] for e in entries], dtype=np.float64),
        "bbox": np.array([e[4] for e in entries], dtype=np.float64).reshape(n, 4),
        "dimensions": np.array([e[5] for e in entries], dtype=np.float64).reshape(n, 3),
        "location": np.array([e[6] for e in entries], dtype=np.float64).reshape(n, 3),
        "rotation_y": np.array([e[7] for e in entries], dtype=np.float64),
        "score": np.array([e[8] for e in entries], dtype=np.float64),
    }


def car(x=0.0, z=20.0, ry=0.0, score=0.9, bbox=(100, 100, 200, 160), name="Car"):
    return (name, 0.0, 0, 0.5, bbox, (3.9, 1.5, 1.6), (x, 1.6, z), ry, score)


class TestRotateIoU:
    def test_identical(self):
        b = np.array([[0.0, 0.0, 4.0, 2.0, 0.3]])
        np.testing.assert_allclose(rotate_iou_eval(b, b), [[1.0]], atol=1e-9)

    def test_axis_aligned_matches_simple(self):
        a = np.array([[0.0, 0.0, 4.0, 2.0, 0.0]])
        b = np.array([[1.0, 0.0, 4.0, 2.0, 0.0]])
        # inter = 3x2=6, union = 8+8-6
        np.testing.assert_allclose(rotate_iou_eval(a, b), [[0.6]], atol=1e-9)

    def test_criterion_2_returns_area(self):
        a = np.array([[0.0, 0.0, 4.0, 2.0, 0.0]])
        b = np.array([[1.0, 0.0, 4.0, 2.0, 0.0]])
        np.testing.assert_allclose(rotate_iou_eval(a, b, 2), [[6.0]], atol=1e-9)

    def test_rotated_45(self):
        a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
        b = np.array([[0.0, 0.0, 1.0, 1.0, math.pi / 4]])
        inter = 2 * (math.sqrt(2) - 1)
        np.testing.assert_allclose(rotate_iou_eval(a, b)[0, 0], inter / (2 - inter),
                                   atol=1e-6)

    def test_disjoint_prefilter(self):
        a = np.array([[0.0, 0.0, 1.0, 1.0, 0.5]])
        b = np.array([[10.0, 10.0, 1.0, 1.0, 1.2]])
        np.testing.assert_allclose(rotate_iou_eval(a, b), [[0.0]])

    def test_d3_overlap(self):
        # [x y z l h w ry]; same footprint, half height overlap
        a = np.array([[0.0, 1.0, 20.0, 4.0, 2.0, 2.0, 0.0]])
        b = np.array([[0.0, 2.0, 20.0, 4.0, 2.0, 2.0, 0.0]])
        # heights: a spans y in [-1,1], b in [0,2] -> iw = 1
        # inter = 8*1 = 8, union = 16+16-8 = 24
        np.testing.assert_allclose(d3_box_overlap(a, b), [[8 / 24]], atol=1e-9)

    def test_image_box_overlap(self):
        a = np.array([[0.0, 0, 10, 10]])
        b = np.array([[5.0, 0, 15, 10]])
        np.testing.assert_allclose(image_box_overlap(a, b), [[50 / 150]])


class TestCleanData:
    def test_neighbor_class_ignored(self):
        gt = make_anno([car(), car(name="Van")])
        dt = make_anno([car()])
        num_valid, ignored_gt, ignored_dt, dc = clean_data(gt, dt, 0, 1)
        assert num_valid == 1
        assert ignored_gt == [0, 1]
        assert ignored_dt == [0]

    def test_difficulty_height_filter(self):
        small_box = (100, 100, 120, 120)  # height 20 < 25
        gt = make_anno([car(bbox=small_box)])
        dt = make_anno([])
        num_valid, ignored_gt, _, _ = clean_data(gt, dt, 0, 2)
        assert num_valid == 0 and ignored_gt == [1]

    def test_dontcare_collected(self):
        gt = make_anno([car(name="DontCare")])
        dt = make_anno([])
        _, ignored_gt, _, dc = clean_data(gt, dt, 0, 1)
        assert ignored_gt == [-1]
        assert len(dc) == 1


class TestAPPipeline:
    def _perfect_setup(self, n_images=20):
        gts, dts = [], []
        for i in range(n_images):
            entries = [car(x=j * 5.0 - 5, score=0.9 - 0.1 * j) for j in range(3)]
            gts.append(make_anno(entries))
            dts.append(make_anno(entries))
        return gts, dts

    def test_perfect_predictions_ap100(self):
        gts, dts = self._perfect_setup()
        result, ret = get_official_eval_result(gts, dts, ["Car"], metric="R40")
        assert ret["Car_3d_0.70/moderate"] == pytest.approx(100.0, abs=1e-6)
        assert ret["Car_bev_0.70/easy"] == pytest.approx(100.0, abs=1e-6)
        assert ret["Car_image/easy"] == pytest.approx(100.0, abs=1e-6)
        assert ret["Car_aos/easy"] == pytest.approx(100.0, abs=0.1)

    def test_missing_half_reduces_ap(self):
        # enough GT that the 41 recall sample points are densely filled
        gts, dts = [], []
        for i in range(40):
            entries = [car(x=-5.0, score=0.9), car(x=5.0, score=0.8)]
            gts.append(make_anno(entries))
            dts.append(make_anno(entries[:1]))  # only one of two detected
        _, ret = get_official_eval_result(gts, dts, ["Car"], metric="R40")
        ap = ret["Car_3d_0.70/moderate"]
        assert 30 < ap < 60  # recall caps at 0.5

    def test_false_positives_reduce_precision(self):
        gts, dts = [], []
        for i in range(45):
            gt_entries = [car(x=0.0, score=1.0)]
            dt_entries = [car(x=0.0, score=0.9),
                          car(x=30.0, z=50.0, score=0.95, bbox=(300, 100, 360, 140))]
            gts.append(make_anno(gt_entries))
            dts.append(make_anno(dt_entries))
        _, ret = get_official_eval_result(gts, dts, ["Car"], metric="R40")
        assert ret["Car_3d_0.70/moderate"] < 100.0

    def test_shifted_boxes_fail_iou(self):
        gts, dts = [], []
        for i in range(45):
            gts.append(make_anno([car(x=0.0)]))
            dts.append(make_anno([car(x=1.5)]))  # BEV IoU < 0.7 at 1.5m shift
        _, ret = get_official_eval_result(gts, dts, ["Car"], metric="R40")
        assert ret["Car_3d_0.70/moderate"] == pytest.approx(0.0, abs=1e-6)
        # but the 0.5-overlap entry should pass... 1.5m shift on a 3.9m box:
        # inter = 2.4*1.6, union = 2*6.24-3.84 -> iou ~0.44 < 0.5 still 0
        assert ret["Car_image/easy"] == pytest.approx(100.0, abs=1e-6)

    def test_get_thresholds_subsamples(self):
        scores = np.linspace(0.1, 0.9, 100)
        th = get_thresholds(scores.copy(), 100)
        assert len(th) <= 41
        assert (np.diff(th) <= 0).all()


def test_label_round_trip(tmp_path):
    from monoflex_tpu.decode.kitti_writer import write_kitti_results

    row = np.zeros((1, 14), dtype=np.float32)
    row[0] = [0, 0.5, 100, 110, 200, 160, 1.5, 1.6, 3.9, 2.0, 1.6, 20.0, 0.7, 0.88]
    write_kitti_results(str(tmp_path), np.array([7]), row[None], np.array([[True]]))
    anno = get_label_anno(str(tmp_path / "000007.txt"))
    assert anno["name"][0] == "Car"
    np.testing.assert_allclose(anno["dimensions"][0], [3.9, 1.5, 1.6], atol=1e-5)
    np.testing.assert_allclose(anno["location"][0], [2.0, 1.6, 20.0], atol=1e-5)
    np.testing.assert_allclose(anno["score"][0], 0.88, atol=1e-5)
    np.testing.assert_allclose(anno["rotation_y"][0], 0.7, atol=1e-5)


class TestNativeKernels:
    """C++ kernels must agree with the numpy reference implementation."""

    def _have_native(self):
        from monoflex_tpu.native import load_native
        return load_native() is not None

    def test_rotate_iou_matches_numpy(self):
        if not self._have_native():
            pytest.skip("no native lib")
        from monoflex_tpu.eval import rotate_iou as R
        from monoflex_tpu.native import rotate_iou_eval_native

        rng = np.random.RandomState(0)
        boxes = np.stack([rng.uniform(-10, 10, 40), rng.uniform(0, 60, 40),
                          rng.uniform(1, 5, 40), rng.uniform(1, 3, 40),
                          rng.uniform(-3, 3, 40)], axis=1)
        qboxes = boxes + rng.randn(40, 5) * 0.5
        # numpy path (bypass native shortcut by calling internals)
        expect = np.zeros((40, 40))
        ca = R.box_corners(boxes)
        cb = R.box_corners(qboxes)
        for i in range(40):
            for j in range(40):
                poly = R._clip_polygon(ca[i], cb[j])
                inter = R._polygon_area(poly) if len(poly) >= 3 else 0.0
                denom = boxes[i, 2] * boxes[i, 3] + qboxes[j, 2] * qboxes[j, 3] - inter
                expect[i, j] = inter / denom if denom > 0 else 0.0
        got = rotate_iou_eval_native(boxes, qboxes, -1)
        np.testing.assert_allclose(got, expect, atol=1e-9)

    def test_d3_overlap_against_known(self):
        if not self._have_native():
            pytest.skip("no native lib")
        from monoflex_tpu.native import d3_box_overlap_native

        a = np.array([[0.0, 1.0, 20.0, 4.0, 2.0, 2.0, 0.0]])
        b = np.array([[0.0, 2.0, 20.0, 4.0, 2.0, 2.0, 0.0]])
        np.testing.assert_allclose(d3_box_overlap_native(a, b), [[8 / 24]], atol=1e-9)

    def test_image_overlap_matches_numpy(self):
        if not self._have_native():
            pytest.skip("no native lib")
        from monoflex_tpu.eval.rotate_iou import image_box_overlap
        from monoflex_tpu.native import image_box_overlap_native

        rng = np.random.RandomState(1)
        x1 = rng.uniform(0, 100, (30, 1)); y1 = rng.uniform(0, 100, (30, 1))
        boxes = np.concatenate([x1, y1, x1 + rng.uniform(5, 50, (30, 1)),
                                y1 + rng.uniform(5, 50, (30, 1))], axis=1)
        q = boxes + rng.randn(30, 4) * 3
        q[:, 2] = np.maximum(q[:, 2], q[:, 0] + 1)
        q[:, 3] = np.maximum(q[:, 3], q[:, 1] + 1)
        for crit in (-1, 0, 1):
            np.testing.assert_allclose(image_box_overlap_native(boxes, q, crit),
                                       image_box_overlap(boxes, q, crit), atol=1e-12)


def test_native_statistics_matches_python():
    """The C++ per-image AP matcher must match the python reference on random
    scenes across thresholds."""
    from monoflex_tpu.native import (compute_statistics_thresholds_native,
                                     load_native)

    if load_native() is None:
        pytest.skip("no native lib")
    rng = np.random.RandomState(0)
    for trial in range(5):
        n_gt, n_dt = rng.randint(1, 8), rng.randint(1, 10)
        overlaps = rng.rand(n_dt, n_gt)
        gt_datas = np.concatenate([rng.rand(n_gt, 4) * 100,
                                   rng.uniform(-3, 3, (n_gt, 1))], axis=1)
        dt_datas = np.concatenate([rng.rand(n_dt, 4) * 100,
                                   rng.uniform(-3, 3, (n_dt, 1)),
                                   rng.rand(n_dt, 1)], axis=1)
        ignored_gt = rng.choice([-1, 0, 1], n_gt)
        ignored_det = rng.choice([-1, 0, 1], n_dt)
        dc = rng.rand(2, 4) * 100
        dc[:, 2:] += dc[:, :2]
        thresholds = np.sort(rng.rand(6))[::-1].copy()
        for metric in (0, 1):
            pr_native = compute_statistics_thresholds_native(
                overlaps, dt_datas[:, -1], dt_datas[:, 4], gt_datas[:, 4],
                dt_datas[:, :4], ignored_gt, ignored_det, dc, metric, 0.5,
                thresholds, True)
            pr_py = np.zeros((len(thresholds), 4))
            for t, thresh in enumerate(thresholds):
                tp, fp, fn, sim, _ = compute_statistics(
                    overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc,
                    metric, 0.5, thresh=thresh, compute_fp=True, compute_aos=True)
                pr_py[t] = [tp, fp, fn, sim if sim != -1 else 0.0]
            np.testing.assert_allclose(pr_native, pr_py, atol=1e-9,
                                       err_msg=f"trial {trial} metric {metric}")


def test_coco_style_eval():
    from monoflex_tpu.eval.ap import get_coco_eval_result

    gts, dts = [], []
    for i in range(45):
        entries = [car(score=0.9)]
        gts.append(make_anno(entries))
        dts.append(make_anno(entries))
    result, (bbox, bev, d3, aos) = get_coco_eval_result(gts, dts, ["Car"])
    assert "coco AP@0.50:0.05:0.95" in result
    # perfect predictions at every overlap -> 100 across the sweep
    assert bbox[0, 1] == pytest.approx(100.0, abs=1e-6)
    assert d3[0, 1] == pytest.approx(100.0, abs=1e-6)


def test_get_label_annos_with_ids(tmp_path):
    from monoflex_tpu.eval.kitti_common import get_label_annos

    for i, n in [(0, 2), (3, 1)]:
        lines = ["Car 0.0 0 0.5 100 150 300 250 1.48 1.60 3.90 2.5 1.65 15.0 -1.39 0.9"] * n
        (tmp_path / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
    annos = get_label_annos(str(tmp_path), ["000000", "000003"])
    assert len(annos) == 2
    assert annos[0]["name"].shape == (2,)
    assert annos[1]["score"][0] == 0.9
    # dims converted to (l, h, w)
    np.testing.assert_allclose(annos[0]["dimensions"][0], [3.90, 1.48, 1.60])


def test_empty_prediction_file(tmp_path):
    from monoflex_tpu.eval.kitti_common import get_label_anno

    (tmp_path / "e.txt").write_text("")
    anno = get_label_anno(str(tmp_path / "e.txt"))
    assert anno["bbox"].shape == (0, 4)
    assert anno["name"].shape == (0,)
