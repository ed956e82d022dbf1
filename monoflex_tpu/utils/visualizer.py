"""Prediction visualization (matplotlib).

Port of the reference's inference visualizer (reference:
engine/visualize_infer.py:23-247, utils/visualizer.py:310): 2D boxes,
projected 3D wireframes, class-colored BEV, and heatmap overlays, without the
cv2/detectron2 dependencies (pure matplotlib + numpy).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from ..config import ID_TYPE_CONVERSION
from ..core.geometry import Calibration, box3d_corners

CLASS_COLORS = {0: "tab:green", 1: "tab:cyan", 2: "tab:olive"}

# wireframe edges over the 8-corner box (bottom 0-3, top 4-7)
_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
              (4, 5), (5, 6), (6, 7), (7, 4),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_box2d(ax, box, color="tab:blue", lw=1.5):
    x1, y1, x2, y2 = box
    ax.plot([x1, x2, x2, x1, x1], [y1, y1, y2, y2, y1], color=color, linewidth=lw)


def draw_box3d_projection(ax, corners_2d: np.ndarray, color="tab:green", lw=1.5):
    for i, j in _BOX_EDGES:
        ax.plot([corners_2d[i, 0], corners_2d[j, 0]],
                [corners_2d[i, 1], corners_2d[j, 1]], color=color, linewidth=lw)


def draw_bev_box(ax, corners_3d: np.ndarray, color="tab:green", lw=1.5):
    bev = corners_3d[:4][:, [0, 2]]
    closed = np.vstack([bev, bev[:1]])
    ax.plot(closed[:, 0], closed[:, 1], color=color, linewidth=lw)


# 10 distinct colors for the 8 corner + bottom/top center keypoints
# (reference visualize_infer.py keypoint_colors)
KEYPOINT_COLORS = ["tab:blue", "tab:orange", "tab:green", "tab:red",
                   "tab:purple", "tab:brown", "tab:pink", "tab:gray",
                   "tab:olive", "tab:cyan"]
GT_COLOR = "tab:red"


def _gt_corners(dims_lhw: np.ndarray, loc: np.ndarray, roty: float) -> np.ndarray:
    """GT 3D corners from the encoded (l, h, w) dims + 3D-center location
    (the target encoder lifts KITTI bottom centers by h/2,
    target_encoder.py:179-181; box3d_corners wants the bottom center back —
    reference visualize_infer.py:216-234 does the same +h/2 shift)."""
    l, h, w = dims_lhw
    bottom = np.asarray(loc, dtype=np.float64).copy()
    bottom[1] += h / 2.0
    return box3d_corners(np.array([l, h, w]), bottom, float(roty))


def show_image_with_boxes(image: np.ndarray, results: np.ndarray,
                          valid: np.ndarray, calib: Calibration,
                          score_threshold: float = 0.4,
                          heatmap: Optional[np.ndarray] = None,
                          targets: Optional[Dict[str, np.ndarray]] = None,
                          keypoints: Optional[np.ndarray] = None,
                          centers: Optional[np.ndarray] = None,
                          pad_size: Optional[np.ndarray] = None,
                          down_ratio: int = 4,
                          save_path: Optional[str] = None):
    """Render detections with GT comparison, matching the reference's panel
    set (reference: engine/visualize_infer.py:148-247): image panel with
    predicted (class-colored) and ground-truth (red, dashed) 2D boxes + 3D
    wireframes + keypoint overlay; BEV panel with pred and GT footprints;
    optional predicted-heatmap panel.

    results: (K, 14) decode rows [cls alpha box2d(4) hwl xyz ry score].
    targets: per-image GT dict with reg_mask / gt_bboxes / dimensions (lhw) /
    locations / rotys (as encoded by data/target_encoder.py).
    keypoints: (K, 10, 2) predicted per-object keypoint offsets (feature px,
    relative to the predicted center); centers: (K, 2) predicted centers.
    Returns the matplotlib figure.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_panels = 3 if heatmap is not None else 2
    fig, axes = plt.subplots(1, n_panels, figsize=(7 * n_panels, 5))
    ax_img, ax_bev = axes[0], axes[1]

    img = image
    if img.dtype != np.uint8:
        lo, hi = img.min(), img.max()
        img = ((img - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
    ax_img.imshow(img)
    ax_img.set_axis_off()

    pad = np.zeros(2) if pad_size is None else np.asarray(pad_size)

    n_pred = 0
    for k, (row, ok) in enumerate(zip(results, valid)):
        if not ok or row[13] < score_threshold:
            continue
        n_pred += 1
        cls_id = int(row[0])
        color = CLASS_COLORS.get(cls_id, "tab:red")
        draw_box2d(ax_img, row[2:6], color=color)
        h, w, l = row[6:9]
        corners = box3d_corners(np.array([l, h, w]), row[9:12], float(row[12]))
        uv, depth = calib.project_rect_to_image(corners)
        if (depth > 0).all():
            draw_box3d_projection(ax_img, uv, color=color)
        draw_bev_box(ax_bev, corners, color=color)
        name = ID_TYPE_CONVERSION.get(cls_id, "?")
        ax_img.text(row[2], row[3] - 3, f"{name} {row[13]:.2f}", color=color, fontsize=8)
        if keypoints is not None and centers is not None:
            # feature-map offsets -> input px -> un-padded image px
            kp = (np.asarray(keypoints[k]) + np.asarray(centers[k])[None]) \
                * down_ratio - pad[None]
            for j in range(kp.shape[0]):
                ax_img.scatter(kp[j, 0], kp[j, 1], s=12,
                               color=KEYPOINT_COLORS[j % len(KEYPOINT_COLORS)],
                               zorder=5)

    n_gt = 0
    if targets is not None:
        mask = np.asarray(targets["reg_mask"]).astype(bool)
        n_gt = int(mask.sum())
        for i in np.nonzero(mask)[0]:
            draw_box2d(ax_img, np.asarray(targets["gt_bboxes"][i]),
                       color=GT_COLOR, lw=1.0)
            corners = _gt_corners(np.asarray(targets["dimensions"][i]),
                                  np.asarray(targets["locations"][i]),
                                  float(targets["rotys"][i]))
            uv, depth = calib.project_rect_to_image(corners)
            if (depth > 0).all():
                draw_box3d_projection(ax_img, uv, color=GT_COLOR, lw=0.8)
            draw_bev_box(ax_bev, corners, color=GT_COLOR, lw=0.8)
        ax_img.set_title(f"detections / gt objs: {n_pred} / {n_gt}")

    ax_bev.set_xlim(-40, 40)
    ax_bev.set_ylim(0, 80)
    ax_bev.set_aspect("equal")
    ax_bev.set_title("BEV (pred=class color, gt=red)")
    ax_bev.grid(alpha=0.3)

    if heatmap is not None:
        axes[2].imshow(heatmap.max(axis=-1), cmap="viridis")
        axes[2].set_title("heatmap")
        axes[2].set_axis_off()

    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
    return fig


def show_heatmap(heatmap: np.ndarray, save_path: Optional[str] = None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(heatmap.max(axis=-1), cmap="viridis")
    ax.set_axis_off()
    if save_path:
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
    return fig
