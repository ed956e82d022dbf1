"""Detector shell: backbone -> predictor (reference: model/detector.py:11-38).

Pure function of (params, batch): training loss and inference decode live
outside the module (losses/, decode/) so one jitted train step and one jitted
predict step each trace this module exactly once.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from .backbone.dla import build_backbone
from .heads.predictor import build_predictor


class MonoFlex(nn.Module):
    """KeypointDetector equivalent; returns the raw head maps."""

    backbone: nn.Module
    predictor: nn.Module

    def __call__(self, images: jnp.ndarray, edge_indices: Optional[jnp.ndarray] = None,
                 edge_len: Optional[jnp.ndarray] = None, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        features = self.backbone(images, train=train)
        return self.predictor(features, edge_indices=edge_indices,
                              edge_len=edge_len, train=train)


def build_model(cfg) -> MonoFlex:
    return MonoFlex(backbone=build_backbone(cfg), predictor=build_predictor(cfg))
