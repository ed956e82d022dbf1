"""Detector shell: backbone -> predictor (reference: model/detector.py:11-38).

Pure function of (params, batch): training loss and inference decode live
outside the module (losses/, decode/) so one jitted train step and one jitted
predict step each trace this module exactly once.

TPU-first input path: the loader ships raw uint8 images (4x smaller
host->device transfer than f32) and normalization runs on-device inside the
jitted forward, fused by XLA into the stem conv (the reference normalizes on
the CPU in float32, data/transforms/transforms.py:14-30 — ~10 ms/img of host
work at KITTI resolution).  Pre-normalized float input still works, so CPU
tests and the multichip dryrun are unchanged.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .backbone.dla import build_backbone
from .heads.predictor import build_predictor


class MonoFlex(nn.Module):
    """KeypointDetector equivalent; returns the raw head maps."""

    backbone: nn.Module
    predictor: nn.Module
    pixel_mean: Sequence[float] = (0.485, 0.456, 0.406)
    pixel_std: Sequence[float] = (0.229, 0.224, 0.225)
    to_bgr: bool = False

    def __call__(self, images: jnp.ndarray, edge_indices: Optional[jnp.ndarray] = None,
                 edge_len: Optional[jnp.ndarray] = None, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        if images.dtype == jnp.uint8:
            x = images.astype(jnp.float32) / 255.0
            if self.to_bgr:
                x = x[..., ::-1]
            mean = jnp.asarray(self.pixel_mean, jnp.float32)
            std = jnp.asarray(self.pixel_std, jnp.float32)
            images = (x - mean) / std
        features = self.backbone(images, train=train)
        return self.predictor(features, edge_indices=edge_indices,
                              edge_len=edge_len, train=train)


def build_model(cfg) -> MonoFlex:
    from ..ops.dcn_pallas_v3 import set_dx_kernel

    set_dx_kernel(cfg.TPU.DCN_DX_KERNEL)
    return MonoFlex(backbone=build_backbone(cfg), predictor=build_predictor(cfg),
                    pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN),
                    pixel_std=tuple(cfg.INPUT.PIXEL_STD),
                    to_bgr=bool(cfg.INPUT.TO_BGR))
