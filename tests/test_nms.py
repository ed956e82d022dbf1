import jax.numpy as jnp
import numpy as np

from monoflex_tpu.decode.nms import apply_nms, greedy_nms


def test_greedy_nms_suppresses_overlaps():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.array([True, True, True])
    keep = greedy_nms(boxes, scores, valid, None, iou_thresh=0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_class_aware_keeps_cross_class():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8])
    valid = jnp.array([True, True])
    classes = jnp.array([0.0, 1.0])
    keep = greedy_nms(boxes, scores, valid, classes, iou_thresh=0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, True])


def test_invalid_stay_invalid():
    boxes = jnp.array([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8])
    valid = jnp.array([True, False])
    keep = greedy_nms(boxes, scores, valid, None)
    np.testing.assert_array_equal(np.asarray(keep), [True, False])


def test_apply_nms_batched():
    result = np.zeros((2, 3, 14), dtype=np.float32)
    result[0, 0, 2:6] = [0, 0, 10, 10]; result[0, 0, 13] = 0.9
    result[0, 1, 2:6] = [1, 1, 11, 11]; result[0, 1, 13] = 0.8
    result[0, 2, 2:6] = [30, 0, 40, 10]; result[0, 2, 13] = 0.7
    result[1, 0, 2:6] = [0, 0, 5, 5]; result[1, 0, 13] = 0.5
    valid = np.array([[True, True, True], [True, False, False]])
    keep = apply_nms(jnp.asarray(result), jnp.asarray(valid), "2d", 0.5, True)
    np.testing.assert_array_equal(np.asarray(keep),
                                  [[True, False, True], [True, False, False]])
