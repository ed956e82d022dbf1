"""On-device detection decoding (jitted post-processor).

Re-derivation of the reference post-processor (reference:
model/head/detector_infer.py:27-237): max-pool NMS -> class-aware top-k ->
per-peak decode of 2D box / dimensions / orientation / depth ensemble ->
back-projection to 3D -> uncertainty-guided confidence.

Fixed shapes: every image yields exactly K candidate rows plus a validity
mask (score >= threshold); the host-side KITTI writer filters.  The
reference's batch-1 python loop becomes one batched jit that also runs
multi-image (config 2 batches eval at 8).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import geometry_jax as GJ
from ..models.heads.key2channel import Key2Channel
from ..ops.image_ops import nms_hm, select_point_of_interest, select_topk

# output row layout (reference: detector_infer.py:232)
# [cls, alpha, x1, y1, x2, y2, h, w, l, x, y, z, roty, score]
RESULT_DIM = 14


class PostProcessor:
    def __init__(self, cfg):
        h = cfg.MODEL.HEAD
        self.k2c = Key2Channel(h.REGRESSION_HEADS, h.REGRESSION_CHANNELS)
        self.det_threshold = cfg.TEST.DETECTIONS_THRESHOLD
        self.max_detection = cfg.TEST.DETECTIONS_PER_IMG
        self.output_depth = h.OUTPUT_DEPTH
        self.pred_2d = cfg.TEST.PRED_2D
        self.uncertainty_as_conf = cfg.TEST.UNCERTAINTY_AS_CONFIDENCE
        self.use_nms = cfg.TEST.USE_NMS
        self.nms_thresh = cfg.TEST.NMS_THRESH
        self.nms_class_agnostic = cfg.TEST.NMS_CLASS_AGNOSTIC
        self.down_ratio = cfg.MODEL.BACKBONE.DOWN_RATIO
        self.num_bin = cfg.INPUT.ORIENTATION_BIN_SIZE
        self.depth_mode = h.DEPTH_MODE
        self.depth_range = tuple(h.DEPTH_RANGE)
        self.depth_ref = tuple(h.DEPTH_REFERENCE)
        self.dim_mean = jnp.asarray(h.DIMENSION_MEAN, dtype=jnp.float32)
        self.dim_std = jnp.asarray(h.DIMENSION_STD, dtype=jnp.float32)
        self.dim_mode = h.DIMENSION_REG

        self.pred_direct_depth = "depth" in self.k2c
        self.depth_with_uncertainty = "depth_uncertainty" in self.k2c
        self.regress_keypoints = "corner_offset" in self.k2c
        self.keypoint_depth_with_uncertainty = "corner_uncertainty" in self.k2c
        self.approx_topk = bool(getattr(cfg.TPU, "DECODE_APPROX_TOPK", False))

    def __call__(self, predictions: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                 output_depth: str | None = None) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
        """Returns (results (B, K, 14), valid (B, K) bool, extras dict)."""
        k2c = self.k2c
        K = self.max_detection
        heatmap = nms_hm(predictions["cls"])
        scores, flat_inds, clses, ys, xs = select_topk(
            heatmap, K, approx=self.approx_topk)                     # (B, K)
        B = scores.shape[0]
        N = B * K

        reg = predictions["reg"]
        poi = select_point_of_interest(reg, flat_inds).reshape(N, -1)

        scores = scores.reshape(N)
        clses = clses.reshape(N)
        points = jnp.stack([xs.reshape(N), ys.reshape(N)], axis=1)
        valid = scores >= self.det_threshold

        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
        calib_params = batch["calib_params"][batch_idx]
        pad_size = batch["pad_size"][batch_idx]
        img_size = batch["img_size"][batch_idx]

        pred_2d_reg = jax.nn.relu(poi[:, k2c("2d_dim")])
        pred_offset = poi[:, k2c("3d_offset")]
        pred_dim_offsets = poi[:, k2c("3d_dim")]
        pred_ori = jnp.concatenate([poi[:, k2c("ori_cls")], poi[:, k2c("ori_offset")]], axis=1)

        box2d = GJ.decode_box2d_fcos(points, pred_2d_reg, pad_size, img_size,
                                     self.down_ratio)
        dims = GJ.decode_dimension(clses, pred_dim_offsets, self.dim_mean, self.dim_std,
                                   mode=self.dim_mode[0], use_std=bool(self.dim_mode[2]))

        extras: Dict[str, jnp.ndarray] = {}
        direct_depth = None
        direct_unc = None
        if self.pred_direct_depth:
            direct_depth = GJ.decode_depth(poi[:, k2c("depth")][:, 0], self.depth_mode,
                                           self.depth_ref, self.depth_range)
        if self.depth_with_uncertainty:
            direct_unc = jnp.exp(poi[:, k2c("depth_uncertainty")][:, 0])

        kpt_depths = None
        kpt_unc = None
        if self.regress_keypoints:
            kpts = poi[:, k2c("corner_offset")].reshape(N, 10, 2)
            kpt_depths = GJ.decode_depth_from_keypoints(kpts, dims, calib_params,
                                                        self.down_ratio, self.depth_range)
            extras["keypoints"] = kpts.reshape(B, K, 10, 2)
        if self.keypoint_depth_with_uncertainty:
            kpt_unc = jnp.exp(poi[:, k2c("corner_uncertainty")])

        depth_sel = output_depth or self.output_depth
        est_err = None
        if depth_sel == "direct":
            depths = direct_depth
            if direct_unc is not None:
                est_err = direct_unc
        elif depth_sel.startswith("keypoints"):
            which = {"keypoints_avg": None, "keypoints_center": 0,
                     "keypoints_02": 1, "keypoints_13": 2}[depth_sel]
            if which is None:
                depths = kpt_depths.mean(axis=1)
                est_err = kpt_unc.mean(axis=1) if kpt_unc is not None else None
            else:
                depths = kpt_depths[:, which]
                est_err = kpt_unc[:, which] if kpt_unc is not None else None
        elif depth_sel == "oracle":
            # match each prediction to the nearest same-class GT 2D box; when
            # IoU > 0.5, pick the estimator whose depth is closest to the GT
            # depth, else fall back to the ensemble mean
            # (reference: detector_infer.py:239-278)
            comb_d = jnp.concatenate([direct_depth[:, None], kpt_depths], axis=1)
            comb_u = jnp.concatenate([direct_unc[:, None], kpt_unc], axis=1)
            M = batch["reg_mask"].shape[1]
            gt_boxes = batch["gt_bboxes"][batch_idx]          # (N, M, 4)
            gt_cls = batch["cls_ids"][batch_idx]
            gt_depth_all = batch["locations"][batch_idx][..., 2]
            gt_valid = batch["reg_mask"][batch_idx] > 0

            gt_centers = (gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2
            pred_center = (box2d[:, :2] + box2d[:, 2:]) / 2
            dist = jnp.sum((pred_center[:, None, :] - gt_centers) ** 2, axis=2)
            same_cls = (gt_cls == clses[:, None].astype(gt_cls.dtype)) & gt_valid
            dist = jnp.where(same_cls, dist, 9999.0)
            near = jnp.argmin(dist, axis=1)                   # (N,)
            near_box = jnp.take_along_axis(gt_boxes, near[:, None, None].repeat(4, 2), axis=1)[:, 0]
            # axis-aligned IoU pred vs matched GT
            ix = (jnp.minimum(box2d[:, 2], near_box[:, 2])
                  - jnp.maximum(box2d[:, 0], near_box[:, 0])).clip(0)
            iy = (jnp.minimum(box2d[:, 3], near_box[:, 3])
                  - jnp.maximum(box2d[:, 1], near_box[:, 1])).clip(0)
            inter = ix * iy
            area_p = ((box2d[:, 2] - box2d[:, 0]) * (box2d[:, 3] - box2d[:, 1])).clip(0)
            area_g = ((near_box[:, 2] - near_box[:, 0])
                      * (near_box[:, 3] - near_box[:, 1])).clip(0)
            iou2d = inter / jnp.clip(area_p + area_g - inter, 1e-6, None)
            matched = iou2d > 0.5
            near_depth = jnp.take_along_axis(gt_depth_all, near[:, None], axis=1)[:, 0]
            best = jnp.argmin(jnp.abs(comb_d - near_depth[:, None]), axis=1)
            oracle_d = jnp.take_along_axis(comb_d, best[:, None], axis=1)[:, 0]
            oracle_u = jnp.take_along_axis(comb_u, best[:, None], axis=1)[:, 0]
            depths = jnp.where(matched, oracle_d, comb_d.mean(axis=1))
            est_err = jnp.where(matched, oracle_u, comb_u.mean(axis=1))
        elif depth_sel in ("hard", "soft", "mean"):
            if self.pred_direct_depth and self.depth_with_uncertainty:
                comb_d = jnp.concatenate([direct_depth[:, None], kpt_depths], axis=1)
                comb_u = jnp.concatenate([direct_unc[:, None], kpt_unc], axis=1)
            else:
                comb_d, comb_u = kpt_depths, kpt_unc
            inv = 1.0 / comb_u
            if depth_sel == "hard":
                idx = jnp.argmax(inv, axis=1)
                depths = jnp.take_along_axis(comb_d, idx[:, None], axis=1)[:, 0]
                est_err = jnp.min(comb_u, axis=1)
            elif depth_sel == "soft":
                wgt = inv / jnp.sum(inv, axis=1, keepdims=True)
                depths = jnp.sum(comb_d * wgt, axis=1)
                est_err = jnp.sum(wgt * comb_u, axis=1)
            else:
                depths = comb_d.mean(axis=1)
                est_err = comb_u.mean(axis=1)
            extras["min_uncertainty"] = jnp.argmax(inv, axis=1)
        else:
            raise NotImplementedError(depth_sel)

        locations = GJ.decode_location(points, pred_offset, depths, calib_params,
                                       pad_size, self.down_ratio)
        rotys, alphas = GJ.decode_axes_orientation(pred_ori, locations, self.num_bin)

        # 3D-center y -> KITTI bottom-center y
        locations = locations.at[:, 1].add(dims[:, 1] / 2.0)
        # (l, h, w) -> (h, w, l)
        dims_hwl = jnp.roll(dims, shift=-1, axis=1)

        vis_scores = scores
        if self.uncertainty_as_conf and est_err is not None:
            conf = 1.0 - jnp.clip(est_err, 0.01, 1.0)
            scores = scores * conf
            extras["uncertainty_conf"] = conf.reshape(B, K)
            extras["estimated_depth_error"] = est_err.reshape(B, K)

        result = jnp.concatenate([
            clses[:, None], alphas[:, None], box2d, dims_hwl, locations,
            rotys[:, None], scores[:, None],
        ], axis=1).reshape(B, K, RESULT_DIM)
        extras["vis_scores"] = vis_scores.reshape(B, K)
        # for the visualizer (reference visualize_infer.py keypoint overlay +
        # heatmap panel): predicted feature-map centers and the raw heatmap
        extras["points"] = points.reshape(B, K, 2)
        extras["heatmap"] = predictions["cls"]
        valid = valid.reshape(B, K)
        if self.use_nms in ("2d", "3d") and self.nms_thresh > 0:
            from .nms import apply_nms

            valid = apply_nms(result, valid, mode=self.use_nms,
                              iou_thresh=self.nms_thresh,
                              class_agnostic=self.nms_class_agnostic)
        return result, valid, extras
