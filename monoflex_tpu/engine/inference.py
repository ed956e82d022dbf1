"""Inference driver: dataset sweep -> decode -> KITTI txts -> AP evaluation.

Re-design of the reference inference engine (reference:
engine/inference.py:17-197): instead of a batch-1 eager loop, batches of any
size run through one jitted forward+decode; per-image latency is measured
with jax.block_until_ready (the reference used cuda.synchronize).  Includes
the 8-way depth-method sweep (``inference_all_depths``) by re-running the
decode with each OUTPUT_DEPTH mode — only the small decode graph recompiles.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import numpy as np

from ..data.loader import make_test_loader
from ..decode.kitti_writer import write_kitti_results
from ..decode.postprocessor import PostProcessor
from ..eval import evaluate_python
from ..utils.timer import Timer
from ..core.geometry import Calibration

# default 8-way sweep matches the reference exactly, oracle included
# (reference: engine/inference.py:154)
DEPTH_METHODS = ["direct", "keypoints_center", "keypoints_02", "keypoints_13",
                 "hard", "soft", "mean", "oracle"]


def compute_on_dataset(eval_step, state, loader, output_dir: str,
                       output_depth: Optional[str] = None,
                       logger: Optional[logging.Logger] = None) -> Dict[str, float]:
    """Run the jitted eval step over the loader; dump per-image txts."""
    timer = Timer()
    n_images = 0
    os.makedirs(output_dir, exist_ok=True)
    for batch in loader:
        timer.tic()
        result, valid, _ = eval_step(state, batch, output_depth=output_depth)
        result, valid = jax.device_get((result, valid))
        timer.toc(average=False)
        n_images += result.shape[0]
        write_kitti_results(output_dir, np.asarray(batch["image_id"]), result, valid)
    stats = {
        "images": n_images,
        "s_per_img": timer.total_time / max(n_images, 1),
    }
    if logger:
        logger.info(f"inference: {n_images} images, "
                    f"{stats['s_per_img'] * 1000:.2f} ms/img (incl. host IO)")
    return stats


def run_diagnostics(cfg, model, state, loader, logger) -> Dict[str, float]:
    """Depth-error suite + disentangled IoU over the dataset
    (reference: engine/inference.py eval_utils aggregation)."""
    import jax
    import jax.numpy as jnp

    from ..decode.diagnostics import DiagnosticEvaluator

    diag = DiagnosticEvaluator(cfg)

    @jax.jit
    def diag_step(state, batch):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], batch.get("edge_indices"), batch.get("edge_len"),
            train=False)
        out = {}
        if cfg.TEST.EVAL_DEPTH:
            out.update({f"depth_err/{k}": v for k, v in
                        diag.evaluate_depths(batch, outputs["reg"]).items()})
        if cfg.TEST.EVAL_DIS_IOUS:
            out.update({f"dis_iou/{k}": v for k, v in
                        diag.evaluate_disentangled_iou(
                            batch, outputs["reg"],
                            cfg.MODEL.HEAD.OUTPUT_DEPTH if cfg.MODEL.HEAD.OUTPUT_DEPTH
                            in ("direct",) else "soft").items()})
        # weight by valid object count for dataset-level averaging
        out["_count"] = jnp.sum(batch["reg_mask"])
        return out

    sums: Dict[str, float] = {}
    total = 0.0
    for batch in loader:
        res = {k: float(v) for k, v in jax.device_get(diag_step(state, batch)).items()}
        n = res.pop("_count")
        total += n
        for k, v in res.items():
            sums[k] = sums.get(k, 0.0) + v * n
    results = {k: v / max(total, 1.0) for k, v in sums.items()}
    for k, v in sorted(results.items()):
        logger.info(f"{k}: {v:.4f}")
    return results


def visualize_predictions(cfg, eval_step, state, loader, output_dir: str,
                          max_images: int = 8) -> int:
    """Render detection overlays (reference: engine/visualize_infer.py)."""
    from ..utils.visualizer import show_image_with_boxes

    os.makedirs(output_dir, exist_ok=True)
    gt_fields = ("reg_mask", "gt_bboxes", "dimensions", "locations", "rotys")
    count = 0
    for batch in loader:
        result, valid, extras = eval_step(state, batch)
        result, valid = np.asarray(result), np.asarray(valid)
        kpts = np.asarray(extras["keypoints"]) if "keypoints" in extras else None
        centers = np.asarray(extras["points"]) if "points" in extras else None
        heatmap = np.asarray(extras["heatmap"]) if "heatmap" in extras else None
        has_gt = all(k in batch for k in gt_fields)
        for i in range(result.shape[0]):
            if count >= max_images:
                return count
            if int(batch["image_id"][i]) < 0:
                continue
            calib = Calibration(np.asarray(batch["calib_P"][i]))
            img = np.asarray(batch["image"][i])
            targets = ({k: np.asarray(batch[k][i]) for k in gt_fields}
                       if has_gt else None)
            show_image_with_boxes(
                img, result[i], valid[i], calib,
                score_threshold=cfg.TEST.VISUALIZE_THRESHOLD,
                heatmap=heatmap[i] if heatmap is not None else None,
                targets=targets,
                keypoints=kpts[i] if kpts is not None else None,
                centers=centers[i] if centers is not None else None,
                pad_size=np.asarray(batch["pad_size"][i]),
                down_ratio=cfg.MODEL.BACKBONE.DOWN_RATIO,
                save_path=os.path.join(output_dir,
                                       f"{int(batch['image_id'][i]):06d}.png"))
            count += 1
    return count


def inference(cfg, eval_step, state, dataset, output_dir: str,
              metrics=("R40",), logger: Optional[logging.Logger] = None,
              output_depth: Optional[str] = None, model=None,
              visualize: bool = False) -> Dict[str, float]:
    """Multi-host aware: each process decodes its contiguous dataset shard
    into the shared prediction directory, then process 0 evaluates
    (reference: engine/inference.py:86-121, comm.synchronize + rank gate)."""
    from ..utils import comm

    logger = logger or logging.getLogger("monoflex.inference")
    loader = make_test_loader(cfg, dataset, rank=comm.get_rank(),
                              world_size=comm.get_world_size(),
                              batch_size=max(1, cfg.TEST.IMS_PER_BATCH))
    pred_dir = os.path.join(output_dir, "data")
    stats = compute_on_dataset(eval_step, state, loader, pred_dir,
                               output_depth=output_depth, logger=logger)
    comm.synchronize("inference_done")
    if not comm.is_main_process():
        return stats
    if model is not None and (cfg.TEST.EVAL_DEPTH or cfg.TEST.EVAL_DIS_IOUS):
        loader_d = make_test_loader(cfg, dataset,
                                    batch_size=max(1, cfg.TEST.IMS_PER_BATCH))
        stats.update(run_diagnostics(cfg, model, state, loader_d, logger))
    if visualize:
        loader_v = make_test_loader(cfg, dataset,
                                    batch_size=max(1, cfg.TEST.IMS_PER_BATCH))
        n = visualize_predictions(cfg, eval_step, state, loader_v,
                                  os.path.join(output_dir, "vis"))
        logger.info(f"wrote {n} visualization images")

    label_dir = os.path.join(dataset.root, "label_2")
    split_file = os.path.join(dataset.root, "ImageSets", f"{dataset.split}.txt")
    if not os.path.isdir(label_dir):
        # label-less root (KITTI submission): the txts ARE the product.
        # Keyed on label availability, NOT the split name — a labeled
        # holdout that happens to be named "test" still gets AP.
        logger.info(f"no labels at {label_dir}; skipping AP "
                    f"(predictions in {pred_dir})")
        return stats
    results = {}
    for metric in metrics:
        text, ret = evaluate_python(label_dir, pred_dir, split_file,
                                    cfg.DATASETS.DETECT_CLASSES, metric=metric,
                                    difficulty_scale=float(
                                        cfg.TEST.AP_DIFFICULTY_SCALE))
        logger.info(f"metric = {metric}\n{text}")
        results.update(ret)
    results.update(stats)
    return results


def inference_all_depths(cfg, eval_step, state, dataset, output_dir: str,
                         logger: Optional[logging.Logger] = None) -> Dict[str, Dict]:
    """Sweep every depth-ensemble mode (reference: engine/inference.py:130-197)."""
    logger = logger or logging.getLogger("monoflex.inference")
    all_results = {}
    methods = list(cfg.TEST.EVAL_DEPTH_METHODS) or DEPTH_METHODS
    for method in methods:
        logger.info(f"depth method: {method}")
        sub_dir = os.path.join(output_dir, f"depth_{method}")
        all_results[method] = inference(cfg, eval_step, state, dataset, sub_dir,
                                        logger=logger, output_depth=method)
    return all_results
