"""Decode golden-parity: framework PostProcessor vs the reference's (torch).

Feeds IDENTICAL synthetic head outputs (random heatmap + regression maps at
the flagship 96x320 output resolution) to the reference PostProcessor
(reference: model/head/detector_infer.py:77-237, run via torch-CPU with
test-only import shims, tests/ref_decode_oracle.py) and to ours, and asserts
the decoded KITTI rows [cls alpha box2d hwl xyz ry score] match — the
semantics-parity gate VERDICT r1 asked for where checkpoint bit-parity is
blocked by the missing pretrained weights.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from ref_decode_oracle import load_reference_postprocessor, make_ref_targets
from synthetic_kitti import make_synthetic_kitti

REF_YAML = "/root/reference/runs/monoflex.yaml"
OUR_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")

# the reference decode path only supports batch 1 (its inference loop is
# batch-1; decode_box2d_fcos broadcasts pad_size per-image)
B, HO, WO, NCLS, NREG = 1, 96, 320, 3, 50
IMG_W, IMG_H = 1242, 375
PAD = (19, 4)  # center pad 1242x375 -> 1280x384 (int floor like pad_image)


def _synthetic_predictions(seed=0):
    """Plausible random head outputs shared by both decoders."""
    rng = np.random.RandomState(seed)
    cls = rng.rand(B, HO, WO, NCLS).astype(np.float32)
    # sparse-ish peaks so topk has structure; clamp like sigmoid_hm
    cls = np.clip(cls ** 6, 1e-4, 1 - 1e-4)
    reg = rng.randn(B, HO, WO, NREG).astype(np.float32) * 0.5
    return cls, reg


@pytest.fixture(scope="module")
def ref_stack(tmp_path_factory):
    cfg, mk, ParamsList, Calibration = load_reference_postprocessor(REF_YAML)
    root = make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti_ref")))
    calib_file = os.path.join(root, "calib", "000000.txt")
    return cfg, mk, ParamsList, Calibration, calib_file


def _run_reference(ref_stack, cls, reg, output_depth):
    import torch

    cfg, mk, ParamsList, Calibration, calib_file = ref_stack
    cfg.MODEL.HEAD.OUTPUT_DEPTH = output_depth
    pp = mk(cfg)
    preds = {
        "cls": torch.from_numpy(np.transpose(cls, (0, 3, 1, 2))),
        "reg": torch.from_numpy(np.transpose(reg, (0, 3, 1, 2))),
    }
    targets = make_ref_targets(ParamsList, Calibration, calib_file,
                               img_size=(IMG_W, IMG_H), pad_size=PAD, n=B)
    with torch.no_grad():
        result, eval_utils, vis = pp(preds, targets, test=True)
    return np.asarray(result.cpu().numpy(), dtype=np.float64)


def _run_ours(cls, reg, calib_file, output_depth):
    import jax.numpy as jnp

    from monoflex_tpu.config import get_cfg_defaults
    from monoflex_tpu.core.geometry import Calibration as OurCalib
    from monoflex_tpu.decode.postprocessor import PostProcessor

    cfg = get_cfg_defaults()
    cfg.merge_from_file(OUR_YAML)
    pp = PostProcessor(cfg)

    calib = OurCalib.from_kitti_file(calib_file) if hasattr(OurCalib, "from_kitti_file") else None
    if calib is None:
        # parse P2 directly
        with open(calib_file) as f:
            for line in f:
                if line.startswith("P2:"):
                    P = np.array([float(v) for v in line.split()[1:]]).reshape(3, 4)
                    break
        calib = OurCalib(P)
    params = np.array([[calib.f_u, calib.f_v, calib.c_u, calib.c_v,
                        calib.b_x, calib.b_y]], np.float32)
    batch = {
        "calib_params": jnp.asarray(np.tile(params, (B, 1))),
        "calib_P": jnp.asarray(np.tile(calib.P[None], (B, 1, 1)).astype(np.float32)),
        "pad_size": jnp.asarray(np.tile(np.array([PAD], np.float32), (B, 1))),
        "img_size": jnp.asarray(np.tile(np.array([[IMG_W, IMG_H]], np.float32), (B, 1))),
    }
    result, valid, _ = pp({"cls": jnp.asarray(cls), "reg": jnp.asarray(reg)}, batch,
                          output_depth=output_depth)
    result = np.asarray(result, dtype=np.float64).reshape(-1, 14)
    valid = np.asarray(valid).reshape(-1)
    return result[valid]


@pytest.mark.parametrize("output_depth", [
    "soft", "hard", "mean", "direct", "keypoints_avg", "keypoints_center",
    "keypoints_02", "keypoints_13",
])
def test_decode_rows_match_reference(ref_stack, output_depth):
    cls, reg = _synthetic_predictions(seed=0)
    ref_rows = _run_reference(ref_stack, cls, reg, output_depth)
    our_rows = _run_ours(cls, reg, ref_stack[4], output_depth)

    assert ref_rows.shape[0] > 5, "synthetic predictions produced no detections"
    assert our_rows.shape[0] == ref_rows.shape[0], (
        f"count mismatch: ours {our_rows.shape[0]} vs ref {ref_rows.shape[0]}")

    # sort both by score (ties measure-zero with random scores)
    ref_rows = ref_rows[np.argsort(-ref_rows[:, 13])]
    our_rows = our_rows[np.argsort(-our_rows[:, 13])]

    np.testing.assert_array_equal(our_rows[:, 0], ref_rows[:, 0])  # class
    # measured residuals (all 8 modes, seed 0): box2d/alpha/ry/score exactly
    # 0, hwl <=5e-7, xyz <=8e-6 — pure f32 rounding (~1e-7 relative on ~20 m
    # depths; the soft ensemble's inverse-uncertainty weighting is the widest
    # re-association). Tolerances pin that level so any semantic drift fails.
    for name, sl, tol in [("alpha", 1, 1e-6), ("box2d", slice(2, 6), 1e-6),
                          ("hwl", slice(6, 9), 2e-6), ("xyz", slice(9, 12), 5e-5),
                          ("ry", 12, 1e-6), ("score", 13, 1e-6)]:
        np.testing.assert_allclose(our_rows[:, sl], ref_rows[:, sl],
                                   rtol=0, atol=tol, err_msg=name)
