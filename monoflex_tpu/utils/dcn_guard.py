"""Clamp-vs-import safety guard for the bounded-window DCN kernels.

The TPU DCN implementations ("shift"/"pallas"/"pallas2"/"pallas2p") clamp
learned offsets to a +-R window, where the reference CUDA kernel is unbounded
(reference: model/backbone/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:125).  A
checkpoint trained with unbounded offsets (the reference's, or one trained
here with the "gather" impl) can place most of its sampling taps outside the
window; the measured outcome of silently clamping such weights is AP 0.00
(docs/DESIGN.md, round-2 clamp ablation).

This guard makes that documented failure mode self-enforcing: after a
checkpoint restore, it runs ONE batch through an unbounded ("gather") copy of
the model, reads every DCN layer's offset map via flax intermediates, and per
neck stage computes the fraction of |offset| beyond that stage's clamp R.  A
stage whose configured impl is bounded and whose saturation fraction exceeds
``cfg.TPU.DCN_GUARD_THRESHOLD`` fires the guard:

- ``TPU.DCN_OFFSET_GUARD = "warn"`` (default): log an unmissable warning with
  the per-stage table and the suggested per-stage impl fix.
- ``"auto"``: additionally return a per-stage impl tuple with the saturating
  stages switched to "gather" so the caller can rebuild the model.
- ``"off"``: skip the scan entirely.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

BOUNDED_IMPLS = frozenset(
    {"shift", "pallas", "pallas2", "pallas2p", "pallas3", "pallas3b"})


def _stage_of_path(path: str, n_stages: int) -> Optional[int]:
    """Map a flax intermediates path to its neck stage index.

    Stage order matches DLASeg/resolve_dcn_stages: dla_up/ida_0 (deepest
    merge) ... dla_up/ida_{n-2}, then the final top-level ida_up."""
    parts = path.split("/")
    for i, p in enumerate(parts):
        if p.startswith("ida_") and p[4:].isdigit():
            # dla_up/ida_k -> stage k; a top-level ida_up has no digit suffix
            return int(p[4:])
        if p == "ida_up":
            return n_stages - 1
    return None


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if hasattr(v, "items"):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def scan_offset_saturation(cfg, variables, batch) -> List[Dict]:
    """Per-stage |offset| statistics of ``variables`` under UNBOUNDED (gather)
    DCN semantics on one batch.  Returns one row per neck stage."""
    from ..models.backbone.dla import N_DCN_STAGES, resolve_dcn_stages
    from ..models.detector import build_model

    impls, rs = resolve_dcn_stages(cfg)

    scan_cfg = cfg.clone()
    scan_cfg.defrost()
    # offsets come from plain convs; running the scan with the unbounded
    # gather impl measures what the weights *want*, independent of any clamp,
    # and avoids compiling a Pallas kernel just for the scan
    scan_cfg.TPU.DCN_IMPL_PER_STAGE = ("gather",) * N_DCN_STAGES
    scan_cfg.freeze()
    model = build_model(scan_cfg)

    _, inter = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch["image"], batch.get("edge_indices"), batch.get("edge_len"),
        train=False, mutable=["intermediates"])

    per_stage: Dict[int, List[np.ndarray]] = {}
    for path, value in _flatten(inter["intermediates"]).items():
        if "offset" not in path:
            continue
        stage = _stage_of_path(path, N_DCN_STAGES)
        if stage is None:
            continue
        leaf = np.abs(np.asarray(jax.device_get(value))).ravel()
        per_stage.setdefault(stage, []).append(leaf)

    rows = []
    for stage in range(N_DCN_STAGES):
        if stage not in per_stage:
            continue
        v = np.concatenate(per_stage[stage])
        r = float(rs[stage])
        rows.append({
            "stage": stage,
            "impl": impls[stage],
            "bounded": impls[stage] in BOUNDED_IMPLS,
            "R": r,
            "p50": float(np.percentile(v, 50)),
            "p99": float(np.percentile(v, 99)),
            "max": float(v.max()),
            "frac_clipped": float((v > r).mean()),
        })
    return rows


def dcn_offset_guard(cfg, variables, batch,
                     logger: Optional[logging.Logger] = None,
                     ) -> Tuple[bool, Optional[Tuple[str, ...]], List[Dict]]:
    """Returns (fired, suggested_per_stage_impls_or_None, per_stage_rows).

    ``suggested`` is only non-None in "auto" mode when at least one bounded
    stage saturates; it keeps non-saturating stages on their configured impl.
    """
    mode = getattr(cfg.TPU, "DCN_OFFSET_GUARD", "warn")
    if mode == "off":
        return False, None, []
    logger = logger or logging.getLogger("monoflex")
    threshold = float(getattr(cfg.TPU, "DCN_GUARD_THRESHOLD", 0.05))

    rows = scan_offset_saturation(cfg, variables, batch)
    saturating = [r for r in rows if r["bounded"] and r["frac_clipped"] > threshold]
    if not saturating:
        return False, None, rows

    suggestion = tuple(
        "gather" if (r["bounded"] and r["frac_clipped"] > threshold) else r["impl"]
        for r in rows)
    table = "\n".join(
        f"  stage {r['stage']} impl={r['impl']:8s} R={r['R']:.0f} "
        f"|offset| p50={r['p50']:.2f} p99={r['p99']:.2f} max={r['max']:.2f} "
        f"frac>{r['R']:.0f}px={r['frac_clipped']:.1%}"
        + ("  <-- SATURATES" if r in saturating else "")
        for r in rows)
    logger.warning(
        "DCN OFFSET GUARD: this checkpoint's learned offsets exceed the "
        "bounded DCN window on %d neck stage(s) — the clamped kernels would "
        "silently discard its sampling taps (measured outcome: AP ~0, "
        "docs/DESIGN.md).\n%s\n"
        "Fix: set TPU.DCN_IMPL_PER_STAGE %s (or TPU.DCN_OFFSET_GUARD auto).",
        len(saturating), table, list(suggestion))
    return True, (suggestion if mode == "auto" else None), rows
