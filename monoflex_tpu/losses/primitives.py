"""Loss primitives, all mask-weighted and fixed-shape.

Ports of the reference loss functions (reference:
model/layers/focal_loss.py:29-55, model/layers/iou_loss.py:7-49,
model/head/depth_losses.py:31-73) re-expressed without boolean compaction:
every function takes explicit element weights/masks so the jitted loss graph
has static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sum(x * mask) / clamp(sum(mask), 1) — the reference's `.mean()` over
    boolean-compacted rows."""
    return jnp.sum(x * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def penalty_reduced_focal_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                               alpha: float = 2.0, beta: float = 4.0
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CenterNet penalty-reduced focal loss on an already-sigmoided heatmap.

    target==1 are positives, -1 are ignore pixels, otherwise gaussian-weighted
    negatives.  Returns (sum loss, num_positives); the caller divides
    (reference: model/layers/focal_loss.py:29-55).
    """
    positive = (target == 1.0).astype(prediction.dtype)
    negative = ((target < 1.0) & (target >= 0.0)).astype(prediction.dtype)
    negative_weights = jnp.power(1.0 - jnp.clip(target, 0.0, 1.0), beta)

    positive_loss = jnp.log(prediction) * jnp.power(1.0 - prediction, alpha) * positive
    negative_loss = (jnp.log(1.0 - prediction) * jnp.power(prediction, alpha)
                     * negative_weights * negative)
    num_positive = jnp.sum(positive)
    return -(jnp.sum(positive_loss) + jnp.sum(negative_loss)), num_positive


def iou_loss_2d(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "giou"
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FCOS-style (l, t, r, b) distance IoU losses, per-row.

    Returns (loss (N,), iou (N,)) (reference: model/layers/iou_loss.py:7-49).
    """
    pl, pt, pr, pb = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tl, tt, tr, tb = target[:, 0], target[:, 1], target[:, 2], target[:, 3]

    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)

    w_intersect = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    g_w_intersect = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    h_intersect = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    g_h_intersect = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac_union = g_w_intersect * g_h_intersect + 1e-7
    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect

    ious = (area_intersect + 1.0) / (area_union + 1.0)
    gious = ious - (ac_union - area_union) / ac_union
    if loss_type == "iou":
        losses = -jnp.log(jnp.clip(ious, 1e-7, None))
    elif loss_type == "linear_iou":
        losses = 1.0 - ious
    elif loss_type == "giou":
        losses = 1.0 - gious
    else:
        raise NotImplementedError(loss_type)
    return losses, ious


def berhu_loss(pred: jnp.ndarray, target: jnp.ndarray, c_factor: float = 0.2) -> jnp.ndarray:
    """Reverse-Huber: L1 below adaptive threshold c, scaled L2 above
    (reference: model/head/depth_losses.py:31-48)."""
    diff = jnp.abs(pred - target)
    c = jnp.clip(jnp.max(diff) * c_factor, 1e-4, None)
    large = (diff ** 2 + c ** 2) / (2.0 * c)
    return jnp.where(diff <= c, diff, large)


def inverse_sigmoid_loss(pred_offset: jnp.ndarray, target_depth: jnp.ndarray) -> jnp.ndarray:
    """L1 in the inverse-sigmoid-encoded depth space."""
    target_offset = jnp.log(1.0 / jnp.clip(target_depth, 1e-6, None) + 1e-12)
    return jnp.abs(pred_offset - target_offset)


def log_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(jnp.log(jnp.clip(pred, 1e-6, None)) - jnp.log(jnp.clip(target, 1e-6, None)))


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def multibin_orientation_loss(vector_ori: jnp.ndarray, gt_ori: jnp.ndarray,
                              mask: jnp.ndarray, num_bin: int = 4) -> jnp.ndarray:
    """Multibin loss: per-bin 2-way CE + L1 on normalized (sin, cos) for
    active bins (reference: model/head/detector_loss.py:495-517), vectorized
    over bins and mask-weighted over objects.

    vector_ori: (N, 4*num_bin); gt_ori: (N, 2*num_bin) = [cls x nb, offset x nb];
    mask: (N,) validity.
    """
    n = vector_ori.shape[0]
    logits = vector_ori[:, : num_bin * 2].reshape(n, num_bin, 2)
    gt_cls = gt_ori[:, :num_bin]
    gt_off = gt_ori[:, num_bin:]

    # CE over 2 classes, per bin; reference takes mean over (compacted) objects
    log_probs = jax.nn.log_softmax(logits, axis=2)
    ce = -jnp.take_along_axis(log_probs, gt_cls[..., None].astype(jnp.int32), axis=2)[..., 0]
    # per-bin mean over valid objects, then summed over bins / num_bin
    per_bin_mean = jnp.sum(ce * mask[:, None], axis=0) / jnp.clip(jnp.sum(mask), 1.0, None)
    cls_loss = jnp.sum(per_bin_mean)

    # regression on active bins: normalize the (sin, cos) pair, L1 to
    # (sin(offset), cos(offset)); normalization counts ALL active (bin, obj)
    sincos = vector_ori[:, num_bin * 2:].reshape(n, num_bin, 2)
    norm = jnp.linalg.norm(sincos, axis=2, keepdims=True).clip(1e-9)
    sincos = sincos / norm
    active = (gt_cls == 1.0).astype(vector_ori.dtype) * mask[:, None]
    reg = (jnp.abs(sincos[..., 0] - jnp.sin(gt_off))
           + jnp.abs(sincos[..., 1] - jnp.cos(gt_off)))
    reg_loss = jnp.sum(reg * active) / jnp.clip(jnp.sum(active), 1.0, None)

    return cls_loss / num_bin + reg_loss
