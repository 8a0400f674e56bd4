"""KITTI eval golden tests: hand-built annos with known AP outcomes
(pattern from reference tests/test_metrics/test_kitti_eval.py)."""

import numpy as np

from df3d.data import kitti_eval as KE


def _gt(boxes, names=None, heights=50):
    n = len(boxes)
    return {
        "boxes_lidar": np.asarray(boxes, np.float32),
        "name": np.asarray(names if names is not None else ["Car"] * n),
        "bbox": np.tile(np.array([0, 0, 100, 0 + heights], np.float32), (n, 1)),
        "occluded": np.zeros(n),
        "truncated": np.zeros(n),
    }


def _det(boxes, scores, names=None):
    n = len(boxes)
    return {
        "boxes_lidar": np.asarray(boxes, np.float32),
        "score": np.asarray(scores, np.float32),
        "name": np.asarray(names if names is not None else ["Car"] * n),
    }


BOX = [10.0, 0.0, 0.0, 3.9, 1.6, 1.56, 0.0]
BOX2 = [30.0, 5.0, 0.0, 3.9, 1.6, 1.56, 0.5]


def test_perfect_detection_ap_high():
    # official R40 needs >= 40 valid gts to fill all recall slots
    gts = [_gt([BOX, BOX2])] * 30
    dets = [
        _det([BOX, BOX2], [0.9 - 0.001 * i, 0.8 - 0.001 * i]) for i in range(30)
    ]
    res = KE.evaluate_kitti(gts, dets)
    assert res["Car"]["3d"][1] > 95.0
    assert res["Car"]["bev"][1] > 95.0


def test_no_detections_ap_0():
    gts = [_gt([BOX])] * 2
    dets = [_det(np.zeros((0, 7)), [])] * 2
    res = KE.evaluate_kitti(gts, dets)
    assert res["Car"]["3d"][1] == 0.0


def test_false_positives_lower_ap():
    far = [50.0, -20.0, 0.0, 3.9, 1.6, 1.56, 0.0]
    gts = [_gt([BOX])] * 2
    # FP scored higher than the TP
    dets = [_det([far, BOX], [0.95, 0.6])] * 2
    res = KE.evaluate_kitti(gts, dets)
    assert 0.0 < res["Car"]["3d"][1] < 99.0


def test_neighbor_class_ignored_not_fp():
    gts = [_gt([BOX, BOX2], names=["Car", "Van"])] * 45
    dets = [_det([BOX, BOX2], [0.9 - 0.001 * i, 0.85]) for i in range(45)]
    res = KE.evaluate_kitti(gts, dets)
    # matching the Van gt is ignored (not FP), Car still near-perfect
    assert res["Car"]["3d"][1] > 95.0


def test_difficulty_buckets_by_bbox_height():
    # gt with 30px bbox height: excluded from easy (min 40), valid mod/hard
    gts = [_gt([BOX], heights=30)] * 45
    dets = [_det([BOX], [0.9 - 0.001 * i]) for i in range(45)]
    res = KE.evaluate_kitti(gts, dets)
    assert res["Car"]["3d"][0] == 0.0  # no valid easy gt
    assert res["Car"]["3d"][1] > 95.0


def test_rotated_iou_bev_numpy_matches_jax():
    import jax.numpy as jnp

    from df3d.core.iou import iou_bev

    rng = np.random.RandomState(0)
    boxes = np.stack(
        [
            rng.uniform(-5, 5, 6), rng.uniform(-5, 5, 6), np.zeros(6),
            rng.uniform(1, 4, 6), rng.uniform(1, 4, 6), np.ones(6),
            rng.uniform(-np.pi, np.pi, 6),
        ],
        axis=-1,
    ).astype(np.float32)
    got = KE.rotated_iou_bev(boxes, boxes)
    want = np.asarray(iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(got, want, atol=1e-4)
