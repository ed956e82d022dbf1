import os

import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.data.dataset import KITTIDataset
from monoflex_tpu.data.loader import collate
from monoflex_tpu.decode.diagnostics import DiagnosticEvaluator
from synthetic_kitti import make_synthetic_kitti
from test_losses import perfect_predictions

RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(RUN_YAML)
    root = make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti")))
    ds = KITTIDataset(cfg, root, is_train=True, augment=False)
    batch = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    return cfg, batch


def test_depth_errors_near_zero_for_perfect(setup):
    cfg, batch = setup
    preds = perfect_predictions(cfg, batch)
    ev = DiagnosticEvaluator(cfg)
    errors = ev.evaluate_depths(batch, preds["reg"])
    assert float(errors["direct"]) < 1e-3     # inverse-sigmoid is exact
    assert float(errors["min"]) < 0.5
    for k, v in errors.items():
        assert np.isfinite(float(v)), k


def test_disentangled_iou_perfect(setup):
    cfg, batch = setup
    preds = perfect_predictions(cfg, batch)
    ev = DiagnosticEvaluator(cfg)
    ious = ev.evaluate_disentangled_iou(batch, preds["reg"], output_depth="direct")
    assert float(ious["offset_IoU"]) > 0.95
    assert float(ious["dims_IoU"]) > 0.95
    assert float(ious["orien_IoU"]) > 0.95
    assert float(ious["depth_IoU"]) > 0.95
    assert float(ious["pred_IoU"]) > 0.9


def test_disentangled_iou_perturbed_component(setup):
    """Perturbing one head should mainly hurt its own disentangled IoU."""
    cfg, batch = setup
    preds = perfect_predictions(cfg, batch)
    ev = DiagnosticEvaluator(cfg)
    from monoflex_tpu.models.heads.key2channel import Key2Channel
    k2c = Key2Channel(cfg.MODEL.HEAD.REGRESSION_HEADS, cfg.MODEL.HEAD.REGRESSION_CHANNELS)
    reg = np.asarray(preds["reg"]).copy()
    reg[..., k2c("3d_dim")] += 0.4           # inflate dims everywhere
    ious = ev.evaluate_disentangled_iou(batch, jnp.asarray(reg), output_depth="direct")
    assert float(ious["dims_IoU"]) < 0.9
    assert float(ious["offset_IoU"]) > 0.95  # unaffected component
