import jax.numpy as jnp
import numpy as np

from df3d.core import nms as NMS


def _make_boxes():
    # three clusters of overlapping boxes + one isolated
    base = np.array(
        [
            [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.2],   # cluster A best
            [0.2, 0.1, 0.0, 4.0, 2.0, 1.5, 0.25],  # overlaps A
            [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, -0.3], # cluster B best
            [10.1, 0.0, 0.0, 4.0, 2.0, 1.5, -0.3], # overlaps B
            [-10.0, 5.0, 0.0, 2.0, 2.0, 1.5, 0.0], # isolated
        ],
        dtype=np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.95, 0.5], dtype=np.float32)
    return jnp.asarray(base), jnp.asarray(scores)


def test_nms_bev_suppresses_overlaps():
    boxes, scores = _make_boxes()
    idx, mask = NMS.nms_bev(boxes, scores, thresh=0.3, pre_max_size=8, post_max_size=4)
    kept = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert kept == {3, 0, 4}  # best of each cluster + isolated


def test_nms_respects_valid_mask():
    boxes, scores = _make_boxes()
    valid = jnp.array([True, True, True, False, True])
    idx, mask = NMS.nms_bev(
        boxes, scores, thresh=0.3, pre_max_size=8, post_max_size=4, valid=valid
    )
    kept = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert kept == {0, 2, 4}


def test_nms_ordering_is_score_descending():
    boxes, scores = _make_boxes()
    idx, mask = NMS.nms_bev(boxes, scores, thresh=0.3, pre_max_size=8, post_max_size=4)
    kept = np.asarray(idx)[np.asarray(mask)]
    kept_scores = np.asarray(scores)[kept]
    assert np.all(np.diff(kept_scores) <= 0)


def test_circle_nms():
    centers = jnp.array([[0.0, 0.0], [0.5, 0.0], [5.0, 5.0]])
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, mask = NMS.nms_circle(centers, scores, min_radius=1.0, post_max_size=3)
    kept = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert kept == {0, 2}


def test_circle_nms_threshold_is_squared_distance():
    # reference circle_nms_jit compares squared distance to min_radius
    # directly: d2=2.25 > thresh=2.0 must survive (r**2=4 would suppress it)
    centers = jnp.array([[0.0, 0.0], [1.5, 0.0]])
    scores = jnp.array([0.9, 0.8])
    idx, mask = NMS.nms_circle(centers, scores, min_radius=2.0, post_max_size=2)
    kept = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert kept == {0, 1}


def test_nms_jits():
    import jax

    boxes, scores = _make_boxes()
    fn = jax.jit(
        lambda b, s: NMS.nms_bev(b, s, thresh=0.3, pre_max_size=8, post_max_size=4)
    )
    idx, mask = fn(boxes, scores)
    assert idx.shape == (4,) and mask.shape == (4,)
