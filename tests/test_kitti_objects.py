import numpy as np

from monoflex_tpu.data.kitti_objects import Object3d, read_label


LINE = ("Car 0.10 1 -1.55 100.0 150.0 300.0 250.0 1.48 1.60 3.90 "
        "2.50 1.65 15.00 -1.39")


def test_object3d_parsing():
    obj = Object3d(LINE)
    assert obj.type == "Car"
    assert obj.truncation == 0.10
    assert obj.occlusion == 1
    np.testing.assert_allclose(obj.box2d, [100, 150, 300, 250])
    assert (obj.h, obj.w, obj.l) == (1.48, 1.60, 3.90)
    np.testing.assert_allclose(obj.t, [2.5, 1.65, 15.0])
    assert obj.ry == -1.39
    # alpha recomputed from geometry, wrapped
    assert abs(obj.alpha - (obj.ry - np.arctan2(2.5, 15.0))) < 1e-6


def test_difficulty_levels():
    # Easy: height>=40, trunc<=0.15, occ 0
    easy = Object3d("Car 0.0 0 0 0 0 50 45 1.5 1.6 3.9 0 1.6 20 0")
    assert easy.level_str == "Easy"
    # Moderate: occ 1
    mod = Object3d("Car 0.0 1 0 0 0 50 45 1.5 1.6 3.9 0 1.6 20 0")
    assert mod.level_str == "Moderate"
    # Hard: trunc 0.4
    hard = Object3d("Car 0.4 1 0 0 0 50 45 1.5 1.6 3.9 0 1.6 20 0")
    assert hard.level_str == "Hard"
    # Unknown: small box
    unk = Object3d("Car 0.0 0 0 0 0 20 15 1.5 1.6 3.9 0 1.6 20 0")
    assert unk.level == -1


def test_corners_match_dims():
    obj = Object3d(LINE)
    corners = obj.generate_corners3d()
    assert corners.shape == (8, 3)
    # spans equal the dims after rotation-invariant norm checks
    np.testing.assert_allclose(corners[:4, 1], obj.t[1], atol=1e-9)   # bottom
    np.testing.assert_allclose(corners[4:, 1], obj.t[1] - obj.h, atol=1e-6)


def test_read_label(tmp_path):
    p = tmp_path / "000000.txt"
    p.write_text(LINE + "\n" + LINE.replace("Car", "Pedestrian") + "\n")
    objs = read_label(str(p))
    assert len(objs) == 2
    assert objs[1].type == "Pedestrian"
