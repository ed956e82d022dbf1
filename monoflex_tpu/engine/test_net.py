"""Test-split dispatch (reference: engine/test_net.py:9-35)."""

from __future__ import annotations

import logging
import os
from typing import Optional

from .inference import inference, inference_all_depths


def run_test(cfg, eval_step, state, dataset, eval_all_depths: bool = False,
             logger: Optional[logging.Logger] = None):
    output_dir = os.path.join(cfg.OUTPUT_DIR, "inference_test")
    if eval_all_depths:
        return inference_all_depths(cfg, eval_step, state, dataset, output_dir,
                                    logger=logger)
    return inference(cfg, eval_step, state, dataset, output_dir,
                     metrics=cfg.TEST.METRIC, logger=logger)
