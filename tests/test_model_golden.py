"""Full-network golden: RUN the reference KeypointDetector (torch CPU) and
assert our model reproduces it after weight import (VERDICT r4 missing #2).

Per-op goldens (test_op_golden.py) and decode parity (test_decode_parity.py)
cannot catch a name-map transposition in utils/monoflex_import.py /
utils/dla34_import.py — only executing BOTH full networks on the same input
can.  The reference net runs via tests/ref_model_oracle.py (pure-torch DCN
matching the reference CPU kernel, InPlaceABN -> BN+leaky_relu in eval).

Reference: model/detector.py:11-38, utils/model_serialization.py:8-57.
"""

import os

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # builds + runs two full networks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W, B = 96, 320, 2
OH, OW = H // 4, W // 4


@pytest.fixture(scope="module")
def golden():
    from ref_model_oracle import (REF, load_reference_detector,
                                  make_edge_targets,
                                  randomize_reference_model)

    ref_cfg, ref_model = load_reference_detector(
        os.path.join(REF, "runs", "monoflex.yaml"), H, W)
    randomize_reference_model(ref_model, seed=0)

    rng = np.random.RandomState(3)
    img = rng.randn(B, H, W, 3).astype(np.float32)

    # non-duplicate border chain (left column then bottom row), zero-padded
    chain = ([(0, y) for y in range(OH - 1)] +
             [(x, OH - 1) for x in range(OW - 1)])
    E = len(chain)
    edge_indices = np.tile(np.array(chain, np.int32), (B, 1, 1))
    edge_len = np.full((B,), E, np.int32)

    with torch.no_grad():
        xt = torch.from_numpy(img.transpose(0, 3, 1, 2))
        feats_t = ref_model.backbone(xt)
        out_t = ref_model.heads.predictor(
            feats_t, make_edge_targets(edge_indices, edge_len))
    sd = {k: v.detach().cpu().numpy() for k, v in
          ref_model.state_dict().items()}
    return (sd, img, edge_indices, edge_len,
            feats_t.numpy(), out_t["cls"].numpy(), out_t["reg"].numpy())


@pytest.fixture(scope="module")
def ours(golden):
    import jax
    import jax.numpy as jnp

    from monoflex_tpu.config import get_cfg_defaults
    from monoflex_tpu.models.detector import build_model
    from monoflex_tpu.utils.monoflex_import import import_monoflex_checkpoint

    sd, img, edge_indices, edge_len, *_ = golden
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(REPO, "runs", "monoflex.yaml"))
    cfg.INPUT.HEIGHT_TRAIN = H
    cfg.INPUT.WIDTH_TRAIN = W
    cfg.INPUT.HEIGHT_TEST = H
    cfg.INPUT.WIDTH_TEST = W
    # identity normalization: both nets receive the identical tensor
    cfg.INPUT.PIXEL_MEAN = [0.0, 0.0, 0.0]
    cfg.INPUT.PIXEL_STD = [1.0, 1.0, 1.0]
    cfg.INPUT.TO_BGR = False
    # exact unbounded sampling, matching the reference kernel bit-for-bit
    # in structure (offsets here are ~1e-1, far inside any clamp anyway)
    cfg.TPU.DCN_FORCE_IMPL = "gather"
    cfg.freeze()

    model = build_model(cfg)
    imgj = jnp.asarray(img)
    ei = jnp.asarray(edge_indices)
    el = jnp.asarray(edge_len)
    variables = model.init(jax.random.PRNGKey(0), imgj, ei, el, train=False)
    new_p, new_s, missed = import_monoflex_checkpoint(
        variables["params"], variables["batch_stats"], sd, cfg, strict=True)
    assert not missed, f"unmapped torch entries: {sorted(missed)[:10]}"
    vs = {"params": new_p, "batch_stats": new_s}

    feats_j = model.apply(vs, imgj, train=False,
                          method=lambda m, x, train: m.backbone(x, train=train))
    out_j = model.apply(vs, imgj, ei, el, train=False)
    return feats_j, out_j


def _relerr(ref, got):
    return float(np.abs(ref - got).max() / (np.abs(ref).max() or 1.0))


def test_backbone_feature_parity(golden, ours):
    """DLA-34 trunk + DCN neck reproduce the reference feature map."""
    feats_t = golden[4]
    feats_j, _ = ours
    feats_j = np.asarray(feats_j).transpose(0, 3, 1, 2)
    assert feats_j.shape == feats_t.shape
    err = _relerr(feats_t, feats_j)
    assert err < 1e-3, f"backbone feature relerr {err:.2e}"


def test_head_output_parity(golden, ours):
    """Heatmap + concatenated regression maps (incl. edge fusion) match."""
    cls_t, reg_t = golden[5], golden[6]
    _, out_j = ours
    cls_j = np.asarray(out_j["cls"]).transpose(0, 3, 1, 2)
    reg_j = np.concatenate([np.asarray(t) for t in out_j["reg"]],
                           axis=-1).transpose(0, 3, 1, 2)
    assert cls_j.shape == cls_t.shape and reg_j.shape == reg_t.shape
    cls_err = _relerr(cls_t, cls_j)
    reg_err = _relerr(reg_t, reg_j)
    assert cls_err < 1e-3, f"cls relerr {cls_err:.2e}"
    assert reg_err < 1e-3, f"reg relerr {reg_err:.2e}"
