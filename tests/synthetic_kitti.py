"""Generate a tiny synthetic KITTI-format dataset on disk for tests."""

import math
import os

import numpy as np
from PIL import Image

P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 172.854, 0.2163791],
    [0.0, 0.0, 1.0, 0.002745884],
])
P3 = np.array([
    [721.5377, 0.0, 609.5593, -339.5242],
    [0.0, 721.5377, 172.854, 2.199936],
    [0.0, 0.0, 1.0, 0.002745884],
])
R0 = np.eye(3)
V2C = np.array([[0.0, -1.0, 0.0, 0.0], [0.0, 0.0, -1.0, -0.08], [1.0, 0.0, 0.0, -0.27]])

IMG_W, IMG_H = 1242, 375


def _label_line(cls, trunc, occ, box2d, h, w, l, t, ry):
    alpha = ry - math.atan2(t[0], t[2])
    while alpha > math.pi:
        alpha -= 2 * math.pi
    while alpha < -math.pi:
        alpha += 2 * math.pi
    return (f"{cls} {trunc:.2f} {occ} {alpha:.2f} "
            f"{box2d[0]:.2f} {box2d[1]:.2f} {box2d[2]:.2f} {box2d[3]:.2f} "
            f"{h:.2f} {w:.2f} {l:.2f} {t[0]:.2f} {t[1]:.2f} {t[2]:.2f} {ry:.2f}")


def project_box(P, t, h, w, l, ry, img_w=IMG_W, img_h=IMG_H):
    x_c = np.array([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2])
    y_c = np.array([0.0, 0, 0, 0, -h, -h, -h, -h])
    z_c = np.array([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2])
    c, s = math.cos(ry), math.sin(ry)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    corners = (R @ np.stack([x_c, y_c, z_c])).T + np.asarray(t)
    hom = np.hstack([corners, np.ones((8, 1))])
    uvz = hom @ P.T
    uv = uvz[:, :2] / uvz[:, 2:3]
    return np.array([
        max(uv[:, 0].min(), 0), max(uv[:, 1].min(), 0),
        min(uv[:, 0].max(), img_w - 1), min(uv[:, 1].max(), img_h - 1),
    ])


SCENES = {
    # frame 0: two cars + pedestrian, all inside
    "000000": [
        ("Car", 0.0, 0, 1.5, 1.6, 3.9, (2.0, 1.65, 15.0), 0.1),
        ("Car", 0.0, 1, 1.6, 1.7, 4.2, (-5.0, 1.7, 30.0), -1.2),
        ("Pedestrian", 0.0, 0, 1.8, 0.6, 0.8, (0.5, 1.6, 10.0), 0.5),
    ],
    # frame 1: truncated car (center projects off the left edge) + cyclist + van (ignored)
    "000001": [
        ("Car", 0.4, 0, 1.5, 1.7, 4.0, (-7.6, 1.7, 8.5), 0.0),
        ("Cyclist", 0.0, 0, 1.7, 0.6, 1.8, (3.0, 1.6, 20.0), -0.4),
        ("Van", 0.0, 0, 2.2, 1.9, 5.0, (1.0, 1.8, 25.0), 0.0),
    ],
    # frame 2: empty scene (DontCare only)
    "000002": [],
}


def make_synthetic_kitti(root: str, frames=None, seed: int = 0, scale: int = 1):
    """scale > 1 shrinks images and intrinsics by that factor (tiny fast sets)."""
    frames = frames or list(SCENES.keys())
    rng = np.random.RandomState(seed)
    for sub in ["image_2", "image_3", "label_2", "calib", "ImageSets"]:
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    img_w, img_h = IMG_W // scale, IMG_H // scale
    p2 = P2.copy()
    p3 = P3.copy()
    p2[:2] /= scale
    p3[:2] /= scale

    for frame in frames:
        img = (rng.rand(img_h, img_w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "image_2", frame + ".png"))
        Image.fromarray(img[:, ::-1]).save(os.path.join(root, "image_3", frame + ".png"))

        lines = []
        for cls, trunc, occ, h, w, l, t, ry in SCENES.get(frame, []):
            box2d = project_box(p2, t, h, w, l, ry, img_w, img_h)
            lines.append(_label_line(cls, trunc, occ, box2d, h, w, l, t, ry))
        lines.append("DontCare -1 -1 -10 100.0 150.0 120.0 180.0 -1 -1 -1 -1000 -1000 -1000 -10")
        with open(os.path.join(root, "label_2", frame + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

        def fmt(M):
            return " ".join(f"{v:.12e}" for v in np.asarray(M).reshape(-1))

        with open(os.path.join(root, "calib", frame + ".txt"), "w") as f:
            f.write(f"P0: {fmt(p2)}\nP1: {fmt(p2)}\nP2: {fmt(p2)}\nP3: {fmt(p3)}\n")
            f.write(f"R0_rect: {fmt(R0)}\nTr_velo_to_cam: {fmt(V2C)}\n")
            f.write(f"Tr_imu_to_velo: {fmt(V2C)}\n")

    for split in ["train", "val", "trainval", "test"]:
        with open(os.path.join(root, "ImageSets", split + ".txt"), "w") as f:
            f.write("\n".join(frames) + "\n")
    return root
