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


_CLASS_LOOK = {
    # (base RGB, dims mean (h, w, l), dims jitter)
    "Car": ((70, 90, 200), (1.55, 1.65, 3.9), 0.12),
    "Pedestrian": ((200, 80, 70), (1.75, 0.6, 0.8), 0.08),
    "Cyclist": ((80, 190, 90), (1.75, 0.6, 1.75), 0.08),
    "Van": ((150, 150, 60), (2.2, 1.9, 5.0), 0.1),
}


def _random_scene(rng, n_obj):
    """Random objects with class-dependent dims at plausible depths."""
    objs = []
    for _ in range(n_obj):
        cls = ["Car", "Car", "Car", "Pedestrian", "Cyclist"][rng.randint(5)]
        _, (mh, mw, ml), jit = _CLASS_LOOK[cls]
        h = mh * float(np.exp(rng.randn() * jit))
        w = mw * float(np.exp(rng.randn() * jit))
        l = ml * float(np.exp(rng.randn() * jit))
        z = float(rng.uniform(8.0, 45.0))
        x = float(rng.uniform(-0.55, 0.55) * z * 0.55)
        y = float(rng.uniform(1.4, 1.9))
        ry = float(rng.uniform(-math.pi, math.pi))
        objs.append((cls, 0.0, 0, h, w, l, (x, y, z), ry))
    # sort far -> near so nearer objects paint over farther ones
    objs.sort(key=lambda o: -o[6][2])
    return objs


def _render_scene(img, objs, p2, img_w, img_h, rng):
    """Paint each object as a class-colored shaded patch inside its projected
    2D box (enough visual signal for a conv net to learn appearance -> class,
    center, size; depth is learnable from apparent size)."""
    for cls, _, _, h, w, l, t, ry in objs:
        box = project_box(p2, t, h, w, l, ry, img_w, img_h)
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        if x2 - x1 < 2 or y2 - y1 < 2:
            continue
        color = np.array(_CLASS_LOOK[cls][0], dtype=np.float32)
        # darken with depth, add a light vertical gradient + border
        shade = np.clip(1.2 - t[2] / 60.0, 0.35, 1.0)
        patch = np.tile(color * shade, ((y2 - y1), (x2 - x1), 1))
        grad = np.linspace(0.85, 1.15, y2 - y1, dtype=np.float32)[:, None, None]
        patch = np.clip(patch * grad + rng.randn(*patch.shape) * 6.0, 0, 255)
        img[y1:y2, x1:x2] = patch.astype(np.uint8)
        img[y1:y2, x1:min(x1 + 1, img_w)] = 255
        img[y1:min(y1 + 1, img_h), x1:x2] = 255
    return img


def make_synthetic_kitti(root: str, frames=None, seed: int = 0, scale: int = 1,
                         n_random_frames: int = 0, render: bool = False):
    """scale > 1 shrinks images and intrinsics by that factor (tiny fast sets).

    n_random_frames > 0 appends randomized frames (2-6 objects each) after the
    3 fixed fixture frames; render=True paints class-colored patches at the
    projected boxes so models can actually LEARN from the set (used by the
    synthetic convergence run, tools/convergence_run.py)."""
    frames = frames or list(SCENES.keys())
    rng = np.random.RandomState(seed)
    scenes = dict(SCENES)
    for i in range(n_random_frames):
        name = f"{100 + i:06d}"
        scenes[name] = _random_scene(rng, 2 + rng.randint(5))
        frames = list(frames) + [name]
    for sub in ["image_2", "image_3", "label_2", "calib", "ImageSets"]:
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    img_w, img_h = IMG_W // scale, IMG_H // scale
    p2 = P2.copy()
    p3 = P3.copy()
    p2[:2] /= scale
    p3[:2] /= scale

    for frame in frames:
        if render:
            # muted gray road/sky backdrop + noise
            img = np.full((img_h, img_w, 3), 120, np.float32)
            img[: img_h // 2] += 40.0
            img = np.clip(img + rng.randn(img_h, img_w, 3) * 8.0, 0, 255).astype(np.uint8)
            img = _render_scene(img, scenes.get(frame, []), p2, img_w, img_h, rng)
        else:
            img = (rng.rand(img_h, img_w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "image_2", frame + ".png"))
        Image.fromarray(img[:, ::-1]).save(os.path.join(root, "image_3", frame + ".png"))

        lines = []
        for cls, trunc, occ, h, w, l, t, ry in scenes.get(frame, []):
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

    if n_random_frames > 0:
        # held-out val split: last 20% of the random frames (the 3 fixed
        # fixture frames always train)
        n_val = max(1, n_random_frames // 5)
        split_map = {"train": frames[:-n_val], "val": frames[-n_val:],
                     "trainval": frames, "test": frames[-n_val:]}
    else:
        split_map = {s: frames for s in ["train", "val", "trainval", "test"]}
    for split, names in split_map.items():
        with open(os.path.join(root, "ImageSets", split + ".txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    return root
