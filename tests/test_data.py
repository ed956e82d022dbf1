import math
import os

import numpy as np
import pytest

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.data.dataset import KITTIDataset
from monoflex_tpu.data.loader import (DataLoader, InferenceSampler,
                                      TrainingSampler, collate,
                                      make_test_loader, make_train_loader)
from synthetic_kitti import make_synthetic_kitti

RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    return make_synthetic_kitti(str(root))


@pytest.fixture(scope="module")
def cfg():
    c = get_cfg_defaults()
    c.merge_from_file(RUN_YAML)
    return c


def make_ds(cfg, root, **kw):
    return KITTIDataset(cfg, root, **kw)


def test_dataset_basic_shapes(cfg, kitti_root):
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (384, 1280, 3)
    assert s["hm"].shape == (96, 320, 3)
    assert s["cls_ids"].shape == (40,)
    assert s["keypoints"].shape == (40, 10, 3)
    assert s["orientations"].shape == (40, 8)
    assert s["edge_indices"].shape == ((320 + 96) * 2, 2)
    assert s["reg_mask"].sum() == 3  # two cars + pedestrian
    assert s["calib_params"].shape == (6,)


def test_heatmap_peaks_at_target_centers(cfg, kitti_root):
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    s = ds[0]
    for i in range(40):
        if s["reg_mask"][i]:
            cx, cy = s["target_centers"][i]
            cls = s["cls_ids"][i]
            assert s["hm"][cy, cx, cls] == 1.0


def test_ignored_classes_skipped(cfg, kitti_root):
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    s = ds[1]
    # Van and DontCare skipped; truncated Car + Cyclist remain
    assert s["reg_mask"].sum() == 2
    assert set(s["cls_ids"][s["reg_mask"] > 0].tolist()) == {0, 2}


def test_truncated_object_marked(cfg, kitti_root):
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    s = ds[1]
    valid = s["reg_mask"] > 0
    assert s["trunc_mask"][valid].sum() == 1  # the far-left car
    i = int(np.argmax(s["trunc_mask"]))
    # truncated center sits on the left boundary column of the valid region
    x_min = int(np.ceil(s["pad_size"][0] / 4))
    assert s["target_centers"][i][0] == x_min


def test_empty_scene(cfg, kitti_root):
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    s = ds[2]
    assert s["reg_mask"].sum() == 0
    assert s["hm"].max() == 0


def test_offsets_reconstruct_projection(cfg, kitti_root):
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    s = ds[0]
    calib = ds.get_calibration(0)
    for i in range(40):
        if not s["reg_mask"][i] or s["trunc_mask"][i]:
            continue
        center = s["target_centers"][i].astype(np.float64)
        proj_feat = center + s["offset_3D"][i]
        uv = proj_feat * 4 - s["pad_size"]
        locs = s["locations"][i]
        expect_uv, _ = calib.project_rect_to_image(locs.reshape(1, 3))
        np.testing.assert_allclose(uv, expect_uv[0], atol=1e-3)


def test_keypoints_match_corner_projection(cfg, kitti_root):
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    s = ds[0]
    calib = ds.get_calibration(0)
    objs = ds.filtrate_objects(ds.get_label_objects(0))
    i = 0
    obj = objs[0]
    corners = obj.generate_corners3d()
    uv, _ = calib.project_rect_to_image(corners)
    feat_uv = (uv + s["pad_size"].reshape(1, 2)) / 4
    expect = feat_uv - s["target_centers"][i].reshape(1, 2)
    np.testing.assert_allclose(s["keypoints"][i, :8, :2], expect, atol=1e-3)
    assert s["keypoints"][i, :, 2].all()  # fully visible object
    assert s["keypoints_depth_mask"][i].all()


def test_flip_consistency(cfg, kitti_root):
    # flipped sample must still satisfy offset reconstruction with its calib
    ds = make_ds(cfg, kitti_root, is_train=True, augment=True, seed=1)
    ds.augmentations[0].p = 1.0  # force flip
    s = ds[0]
    calib = ds.get_calibration(0)
    calib.flip_horizontally(1242)
    for i in range(40):
        if not s["reg_mask"][i] or s["trunc_mask"][i]:
            continue
        center = s["target_centers"][i].astype(np.float64)
        uv = (center + s["offset_3D"][i]) * 4 - s["pad_size"]
        locs = s["locations"][i]
        expect_uv, _ = calib.project_rect_to_image(locs.reshape(1, 3))
        np.testing.assert_allclose(uv, expect_uv[0], atol=1e-3)
    # flipped roty stays in range
    valid = s["reg_mask"] > 0
    assert np.all(np.abs(s["rotys"][valid]) <= math.pi)


def test_right_image_doubles_epoch(cfg, kitti_root):
    c = cfg.clone()
    c.DATASETS.USE_RIGHT_IMAGE = True
    ds = make_ds(c, kitti_root, is_train=True, augment=False)
    assert len(ds) == 6
    s = ds[3 + 0]  # right image of frame 0
    assert s["reg_mask"].sum() >= 1
    # right-camera P3 has a different b_x
    assert s["calib_params"][4] != ds[0]["calib_params"][4]


def test_edge_indices_walk_border(cfg, kitti_root):
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    s = ds[0]
    n = int(s["edge_len"]) + 1
    edges = s["edge_indices"][:n]
    x_min = int(np.ceil(s["pad_size"][0] / 4))
    y_min = int(np.ceil(s["pad_size"][1] / 4))
    x_max = int((s["pad_size"][0] + 1242 - 1) // 4)
    y_max = int((s["pad_size"][1] + 375 - 1) // 4)
    assert (edges[:, 0] >= x_min).all() and (edges[:, 0] <= x_max).all()
    assert (edges[:, 1] >= y_min).all() and (edges[:, 1] <= y_max).all()
    on_border = ((edges[:, 0] == x_min) | (edges[:, 0] == x_max)
                 | (edges[:, 1] == y_min) | (edges[:, 1] == y_max))
    assert on_border.all()
    # consecutive steps move by exactly one pixel (a chain, for the 1-D conv)
    steps = np.abs(np.diff(edges, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_samplers():
    s = TrainingSampler(10, seed=0, rank=0, world_size=2)
    it = iter(s)
    first = [next(it) for _ in range(10)]
    s2 = TrainingSampler(10, seed=0, rank=1, world_size=2)
    it2 = iter(s2)
    second = [next(it2) for _ in range(10)]
    assert set(first[:5]) | set(second[:5]) == set(range(10))

    inf = InferenceSampler(10, rank=1, world_size=3)
    all_idx = []
    for r in range(3):
        all_idx += InferenceSampler(10, rank=r, world_size=3).indices
    assert sorted(all_idx) == list(range(10))


def test_train_loader_batches(cfg, kitti_root):
    c = cfg.clone()
    c.SOLVER.IMS_PER_BATCH = 2
    c.DATALOADER.NUM_WORKERS = 2
    ds = make_ds(c, kitti_root, is_train=True, augment=False)
    loader = make_train_loader(c, ds)
    it = iter(loader)
    batch = next(it)
    assert batch["image"].shape == (2, 384, 1280, 3)
    assert batch["hm"].shape == (2, 96, 320, 3)
    batch2 = next(it)
    assert batch2["image"].shape == (2, 384, 1280, 3)


def test_test_loader_covers_all(cfg, kitti_root):
    c = cfg.clone()
    c.DATALOADER.NUM_WORKERS = 2
    ds = make_ds(c, kitti_root, is_train=False, augment=False)
    loader = make_test_loader(c, ds, batch_size=2)
    ids = []
    for batch in loader:
        # every batch is full-size; the final one is padded with image_id -1
        assert batch["image"].shape[0] == 2
        ids += batch["image_id"].tolist()
    assert sorted(i for i in ids if i >= 0) == [0, 1, 2]
    assert ids.count(-1) == 1


def test_repeat_factor_sampler():
    from monoflex_tpu.data.loader import RepeatFactorTrainingSampler

    cats = [[0], [0, 1], [1], [2], [0]]  # category 2 is rare
    rf = RepeatFactorTrainingSampler.repeat_factors_from_category_frequency(cats, 0.5)
    assert rf[3] > rf[0]  # rare-category image repeated more
    s = RepeatFactorTrainingSampler(rf, seed=0)
    it = iter(s)
    first_epoch = [next(it) for _ in range(20)]
    assert set(first_epoch) <= set(range(5))
    assert first_epoch.count(3) >= 1


def test_grouped_batch_sampler():
    from monoflex_tpu.data.loader import GroupedBatchSampler

    group_ids = [0, 1, 0, 1, 0, 1, 0, 1]
    batches = list(GroupedBatchSampler(range(8), group_ids, batch_size=2))
    for b in batches:
        gids = {group_ids[i] for i in b}
        assert len(gids) == 1
    flat = sorted(i for b in batches for i in b)
    assert flat == list(range(8))


def test_uint8_device_normalize_path(cfg, kitti_root):
    """TPU-first host pipeline: the loader ships raw uint8 (4x smaller
    transfer, ~10 ms/img less host work; normalization runs on-device in the
    jitted forward — models/detector.py); pre-normalized float is still
    supported for CPU paths (reference normalizes on host,
    data/transforms/transforms.py:14-30)."""
    ds = make_ds(cfg, kitti_root, is_train=True, augment=False)
    s = ds[0]
    assert s["image"].dtype == np.uint8

    cfg2 = cfg.clone()
    cfg2.INPUT.DEVICE_NORMALIZE = False
    ds2 = make_ds(cfg2, kitti_root, is_train=True, augment=False)
    s2 = ds2[0]
    assert s2["image"].dtype == np.float32
    # the two paths agree after on-host normalization of the uint8 image
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
    manual = (s["image"].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(manual, s2["image"], atol=1e-5)


def test_model_normalizes_uint8_like_float(cfg, kitti_root):
    """model(uint8 image) == model(pre-normalized float image)."""
    import jax
    import jax.numpy as jnp

    from monoflex_tpu.models.detector import build_model

    import tempfile

    cfg = cfg.clone()
    cfg.INPUT.HEIGHT_TRAIN = 96
    cfg.INPUT.WIDTH_TRAIN = 320
    small_root = make_synthetic_kitti(tempfile.mkdtemp(prefix="kitti_s4"), scale=4)
    ds = make_ds(cfg, small_root, is_train=True, augment=False)
    s = collate([ds[0]])
    img_u8 = jnp.asarray(s["image"])
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
    img_f32 = jnp.asarray((np.asarray(s["image"], np.float32) / 255.0 - mean) / std)

    model = build_model(cfg)
    ei, el = jnp.asarray(s["edge_indices"]), jnp.asarray(s["edge_len"])
    variables = model.init(jax.random.PRNGKey(0), img_u8, ei, el, train=False)
    out_u8 = model.apply(variables, img_u8, ei, el, train=False)
    out_f32 = model.apply(variables, img_f32, ei, el, train=False)
    np.testing.assert_allclose(np.asarray(out_u8["cls"]),
                               np.asarray(out_f32["cls"]), atol=1e-5)


def test_test_split_uses_test_resolution(cfg, tmp_path):
    # regression: the eval dataset sized its images by INPUT.*_TRAIN, so
    # --eval at a different test resolution fed the model mis-scaled inputs
    root = make_synthetic_kitti(str(tmp_path / "kitti4"), scale=4)
    c = cfg.clone()
    c.INPUT.HEIGHT_TRAIN, c.INPUT.WIDTH_TRAIN = 384, 1280
    c.INPUT.HEIGHT_TEST, c.INPUT.WIDTH_TEST = 96, 320
    ds = make_ds(c, root, is_train=False)
    assert ds[0]["image"].shape[:2] == (96, 320)
    tr = make_ds(c, root, is_train=True)
    assert tr[0]["image"].shape[:2] == (384, 1280)
