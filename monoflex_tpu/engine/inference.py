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

DEPTH_METHODS = ["direct", "keypoints_center", "keypoints_02", "keypoints_13",
                 "keypoints_avg", "hard", "soft", "mean"]


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


def inference(cfg, eval_step, state, dataset, output_dir: str,
              metrics=("R40",), logger: Optional[logging.Logger] = None,
              output_depth: Optional[str] = None) -> Dict[str, float]:
    logger = logger or logging.getLogger("monoflex.inference")
    loader = make_test_loader(cfg, dataset, batch_size=max(1, cfg.TEST.IMS_PER_BATCH))
    pred_dir = os.path.join(output_dir, "data")
    stats = compute_on_dataset(eval_step, state, loader, pred_dir,
                               output_depth=output_depth, logger=logger)

    label_dir = os.path.join(dataset.root, "label_2")
    split_file = os.path.join(dataset.root, "ImageSets", f"{dataset.split}.txt")
    results = {}
    for metric in metrics:
        text, ret = evaluate_python(label_dir, pred_dir, split_file,
                                    cfg.DATASETS.DETECT_CLASSES, metric=metric)
        logger.info(f"metric = {metric}\n{text}")
        results.update(ret)
    results.update(stats)
    return results


def inference_all_depths(cfg, eval_step, state, dataset, output_dir: str,
                         logger: Optional[logging.Logger] = None) -> Dict[str, Dict]:
    """Sweep every depth-ensemble mode (reference: engine/inference.py:130-197)."""
    logger = logger or logging.getLogger("monoflex.inference")
    all_results = {}
    for method in DEPTH_METHODS:
        logger.info(f"depth method: {method}")
        sub_dir = os.path.join(output_dir, f"depth_{method}")
        all_results[method] = inference(cfg, eval_step, state, dataset, sub_dir,
                                        logger=logger, output_depth=method)
    return all_results
