"""Greedy box NMS over the fixed K decoded detections (jitted).

Covers the reference's TEST.USE_NMS post-filter ('2d' axis-aligned or '3d'
BEV; reference: config/defaults.py TEST.USE_NMS/NMS_THRESH).  Fixed-shape:
returns an updated validity mask rather than compacting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _iou_2d_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) xyxy -> (K, K) IoU."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    ix = jnp.clip(jnp.minimum(x2[:, None], x2[None]) - jnp.maximum(x1[:, None], x1[None]), 0)
    iy = jnp.clip(jnp.minimum(y2[:, None], y2[None]) - jnp.maximum(y1[:, None], y1[None]), 0)
    inter = ix * iy
    return inter / jnp.clip(area[:, None] + area[None] - inter, 1e-6, None)


def greedy_nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               classes: jnp.ndarray | None = None, iou_thresh: float = 0.5
               ) -> jnp.ndarray:
    """Per-image greedy NMS; returns the surviving-validity mask (K,).

    ``classes`` None -> class-agnostic (reference TEST.NMS_CLASS_AGNOSTIC).
    """
    K = boxes.shape[0]
    iou = _iou_2d_matrix(boxes)
    if classes is not None:
        same = classes[:, None] == classes[None, :]
        iou = jnp.where(same, iou, 0.0)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(i, keep):
        idx = order[i]
        higher = order[:K]
        # suppressed if any higher-ranked kept box overlaps enough
        rank_mask = jnp.arange(K) < i
        overlaps = iou[idx, higher] > iou_thresh
        suppressed = jnp.any(overlaps & rank_mask & keep[higher])
        return keep.at[idx].set(keep[idx] & ~suppressed)

    keep = valid.astype(bool)
    keep = jax.lax.fori_loop(0, K, body, keep)
    return keep


def apply_nms(result: jnp.ndarray, valid: jnp.ndarray, mode: str = "2d",
              iou_thresh: float = 0.5, class_agnostic: bool = False) -> jnp.ndarray:
    """result (B, K, 14) decode rows; returns updated valid (B, K)."""
    if mode == "3d":
        # BEV axis-aligned approximation over (x, z) extents
        x, z = result[..., 9], result[..., 11]
        w, l = result[..., 7], result[..., 8]
        boxes = jnp.stack([x - l / 2, z - w / 2, x + l / 2, z + w / 2], axis=-1)
    else:
        boxes = result[..., 2:6]
    scores = result[..., 13]
    classes = None if class_agnostic else result[..., 0]

    def per_image(b, s, v, c):
        return greedy_nms(b, s, v, c, iou_thresh)

    if classes is None:
        return jax.vmap(lambda b, s, v: greedy_nms(b, s, v, None, iou_thresh))(
            boxes, scores, valid)
    return jax.vmap(per_image)(boxes, scores, valid, classes)
