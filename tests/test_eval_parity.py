"""Golden-parity: framework evaluator vs the vendored reference metric.

Runs monoflex_tpu.eval.ap.get_official_eval_result and the decorator-stripped
reference oracle (tests/ref_eval_oracle.py, transcribed from reference
data/datasets/evaluation/kitti_object_eval_python/eval.py:446-727) on the
same randomized annotations and asserts identical APs for every
class/difficulty/metric/overlap key, for both R40 and R11.
"""

import numpy as np
import pytest

from monoflex_tpu.eval import ap as our_ap

import ref_eval_oracle as oracle

CLASSES = ["Car", "Pedestrian", "Cyclist"]
GT_NAMES = ["Car", "Pedestrian", "Cyclist", "Van", "Person_sitting", "Truck",
            "DontCare"]


def _rand_anno(rng: np.random.RandomState, n: int, is_dt: bool,
               gt: dict | None = None):
    """A plausible KITTI annotation dict; DT annos perturb a GT anno so the
    matcher sees real TPs, plus extra false positives."""
    if is_dt and gt is not None:
        keep = rng.rand(len(gt["name"])) < 0.8
        n_fp = rng.randint(0, 4)
        names = [nm for nm, k in zip(gt["name"], keep) if k and nm != "DontCare"]
        bbox = gt["bbox"][np.array([k and nm != "DontCare"
                                    for nm, k in zip(gt["name"], keep)], bool)]
        loc = gt["location"][np.array([k and nm != "DontCare"
                                       for nm, k in zip(gt["name"], keep)], bool)]
        dims = gt["dimensions"][np.array([k and nm != "DontCare"
                                          for nm, k in zip(gt["name"], keep)], bool)]
        rot = gt["rotation_y"][np.array([k and nm != "DontCare"
                                         for nm, k in zip(gt["name"], keep)], bool)]
        alpha = gt["alpha"][np.array([k and nm != "DontCare"
                                      for nm, k in zip(gt["name"], keep)], bool)]
        # jitter
        bbox = bbox + rng.randn(*bbox.shape) * 2.0
        loc = loc + rng.randn(*loc.shape) * 0.15
        dims = dims * np.exp(rng.randn(*dims.shape) * 0.05)
        rot = rot + rng.randn(*rot.shape) * 0.05
        alpha = alpha + rng.randn(*alpha.shape) * 0.05
        # false positives
        fp = _rand_anno(rng, n_fp, is_dt=False)
        names = list(names) + [nm for nm in fp["name"] if nm != "DontCare"]
        sel = np.array([nm != "DontCare" for nm in fp["name"]], bool)
        bbox = np.concatenate([bbox, fp["bbox"][sel]], 0)
        loc = np.concatenate([loc, fp["location"][sel]], 0)
        dims = np.concatenate([dims, fp["dimensions"][sel]], 0)
        rot = np.concatenate([rot, fp["rotation_y"][sel]], 0)
        alpha = np.concatenate([alpha, fp["alpha"][sel]], 0)
        m = len(names)
        return {
            "name": np.array(names),
            "truncated": np.zeros(m),
            "occluded": np.zeros(m),
            "alpha": alpha,
            "bbox": bbox,
            "dimensions": dims,
            "location": loc,
            "rotation_y": rot,
            "score": rng.rand(m),
        }

    names = [GT_NAMES[rng.randint(0, len(GT_NAMES))] for _ in range(n)]
    x1 = rng.uniform(0, 1100, n)
    y1 = rng.uniform(0, 300, n)
    w = rng.uniform(20, 180, n)
    h = rng.uniform(20, 120, n)
    anno = {
        "name": np.array(names),
        "truncated": rng.choice([0.0, 0.1, 0.2, 0.4, 0.6], n),
        "occluded": rng.choice([0, 0, 1, 2, 3], n).astype(np.int64),
        "alpha": rng.uniform(-np.pi, np.pi, n),
        "bbox": np.stack([x1, y1, x1 + w, y1 + h], 1),
        "dimensions": np.stack([rng.uniform(3, 5, n), rng.uniform(1.3, 1.9, n),
                                rng.uniform(1.4, 1.9, n)], 1),
        "location": np.stack([rng.uniform(-20, 20, n), rng.uniform(1, 2.2, n),
                              rng.uniform(5, 60, n)], 1),
        "rotation_y": rng.uniform(-np.pi, np.pi, n),
    }
    return anno


def _make_annos(n_images=30, seed=0):
    rng = np.random.RandomState(seed)
    gt_annos, dt_annos = [], []
    for _ in range(n_images):
        n = rng.randint(0, 12)
        gt = _rand_anno(rng, n, is_dt=False)
        dt = _rand_anno(rng, n, is_dt=True, gt=gt)
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


@pytest.mark.parametrize("metric", ["R40", "R11"])
def test_official_eval_matches_reference(metric):
    gt_annos, dt_annos = _make_annos(n_images=30, seed=0)

    ref = oracle.get_official_eval_result(gt_annos, dt_annos, CLASSES,
                                          metric=metric)
    _, ours = our_ap.get_official_eval_result(gt_annos, dt_annos, CLASSES,
                                              metric=metric)

    assert set(ref.keys()) <= set(ours.keys()), (
        f"missing keys: {set(ref.keys()) - set(ours.keys())}")
    mismatches = {}
    for k, v in ref.items():
        if not np.isclose(ours[k], v, rtol=0, atol=1e-9):
            mismatches[k] = (float(ours[k]), float(v))
    assert not mismatches, f"AP mismatches (ours, reference): {mismatches}"
    # sanity: the comparison is non-trivial (some APs must be nonzero)
    assert any(v > 1.0 for v in ref.values())


def test_rotated_iou_matches_reference_kernel():
    """Our BEV rotated-IoU vs the transcribed device kernel on random pairs."""
    rng = np.random.RandomState(1)
    n, k = 24, 17
    boxes = np.stack([rng.uniform(-20, 20, n), rng.uniform(0, 60, n),
                      rng.uniform(1, 5, n), rng.uniform(1, 3, n),
                      rng.uniform(-np.pi, np.pi, n)], 1)
    qboxes = np.stack([rng.uniform(-20, 20, k), rng.uniform(0, 60, k),
                       rng.uniform(1, 5, k), rng.uniform(1, 3, k),
                       rng.uniform(-np.pi, np.pi, k)], 1)
    ref = oracle.rotate_iou_gpu_eval(boxes, qboxes)
    ours = our_ap.rotate_iou_eval(boxes, qboxes)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-5)
