import numpy as np

from monoflex_tpu.core.geometry import Calibration
from monoflex_tpu.utils.visualizer import show_heatmap, show_image_with_boxes


def test_show_image_with_boxes(tmp_path):
    P = np.array([[721.5, 0, 609.6, 44.9], [0, 721.5, 172.9, 0.2], [0, 0, 1.0, 0.003]])
    calib = Calibration(P)
    image = (np.random.rand(375, 1242, 3) * 255).astype(np.uint8)
    results = np.zeros((2, 14), dtype=np.float32)
    results[0] = [0, 0.5, 100, 110, 300, 260, 1.5, 1.6, 3.9, 2.0, 1.6, 15.0, 0.7, 0.9]
    results[1] = [1, -0.2, 500, 150, 560, 280, 1.8, 0.6, 0.8, -1.0, 1.6, 10.0, 0.1, 0.8]
    valid = np.array([True, True])
    hm = np.random.rand(96, 320, 3).astype(np.float32)
    out = str(tmp_path / "vis.png")
    fig = show_image_with_boxes(image, results, valid, calib, 0.4, heatmap=hm,
                                save_path=out)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_show_heatmap(tmp_path):
    hm = np.random.rand(96, 320, 3).astype(np.float32)
    out = str(tmp_path / "hm.png")
    show_heatmap(hm, save_path=out)
    import os
    assert os.path.exists(out)
