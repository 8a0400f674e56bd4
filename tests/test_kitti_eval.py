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


def test_small_det_ignored_not_fp():
    """Official det-side ignoring: a det whose 2D bbox height is below the
    difficulty minimum is ignored — it neither matches for TP nor counts
    as FP."""
    far = [50.0, -20.0, 0.0, 3.9, 1.6, 1.56, 0.0]
    gts = [_gt([BOX])] * 45
    dets = []
    for i in range(45):
        d = _det([BOX, far], [0.9 - 0.001 * i, 0.95])
        # det 2D bboxes: first tall (valid), second tiny (height 10 < 25)
        d["bbox"] = np.array([[0, 0, 100, 50], [0, 0, 100, 10]], np.float32)
        dets.append(d)
    res = KE.evaluate_kitti(gts, dets)
    # the tiny far det outscores the TP but must not be an FP
    assert res["Car"]["3d"][1] > 95.0


def test_small_det_counts_as_fp_without_bbox():
    """Control for the test above: same far det with a tall bbox IS an FP."""
    far = [50.0, -20.0, 0.0, 3.9, 1.6, 1.56, 0.0]
    gts = [_gt([BOX])] * 45
    dets = []
    for i in range(45):
        d = _det([BOX, far], [0.9 - 0.001 * i, 0.95])
        d["bbox"] = np.array([[0, 0, 100, 50], [0, 0, 100, 50]], np.float32)
        dets.append(d)
    res = KE.evaluate_kitti(gts, dets)
    assert res["Car"]["3d"][1] < 60.0  # precision halved at every threshold


def test_dontcare_suppresses_fp_in_bbox_metric():
    gts, dets = [], []
    for i in range(45):
        g = _gt([BOX])
        g["name"] = np.asarray(["Car", "DontCare"])
        g["boxes_lidar"] = np.asarray([BOX, BOX2], np.float32)
        g["bbox"] = np.array([[0, 0, 100, 50], [200, 0, 300, 40]], np.float32)
        g["occluded"] = np.zeros(2)
        g["truncated"] = np.zeros(2)
        gts.append(g)
        d = _det([BOX, BOX2], [0.9 - 0.001 * i, 0.95])
        # second det falls inside the DontCare image region
        d["bbox"] = np.array([[0, 0, 100, 50], [210, 5, 290, 38]], np.float32)
        dets.append(d)
    res = KE.evaluate_kitti(gts, dets, metrics=("bbox",))
    assert res["Car"]["bbox"][1] > 95.0  # dc-covered det not an FP
    # without the DontCare region the same det is an FP
    for g in gts:
        g["name"] = np.asarray(["Car", "Tree"])
    res2 = KE.evaluate_kitti(gts, dets, metrics=("bbox",))
    assert res2["Car"]["bbox"][1] < 60.0


def test_get_thresholds_official_rule():
    # 4 tp scores over 8 gts: official keep rule
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    th = KE.get_thresholds(scores, num_gt=8)
    # every score creates a recall step of 1/8 = 0.125 > 1/40 spacing, so
    # all are kept
    assert th == [0.9, 0.8, 0.7, 0.6]
    # densely packed scores: 40 tps over 40 gts -> recall steps 0.025 == the
    # sample spacing; official rule keeps every score
    scores = np.linspace(0.99, 0.6, 40)
    th = KE.get_thresholds(scores.copy(), num_gt=40)
    assert len(th) == 40


def test_matching_pass_semantics():
    """Pass 1 (threshold collection) picks the HIGHEST-SCORE det over
    min_overlap; pass 2 (precision) picks the MAX-OVERLAP det and counts
    the other as FP."""
    overlaps = np.array([[0.75], [0.95]], np.float32)  # (nd, ng)
    scores = np.array([0.9, 0.5], np.float32)
    gt_status = np.array([0], np.int32)
    det_status = np.array([0, 0], np.int32)

    tp, fp, fn, tps, _ = KE.compute_statistics(
        overlaps, scores, gt_status, det_status, None,
        min_overlap=0.7, thresh=0.0, compute_fp=False,
    )
    assert tp == 1 and tps == [np.float32(0.9)]  # highest score wins pass 1

    tp, fp, fn, tps, _ = KE.compute_statistics(
        overlaps, scores, gt_status, det_status, None,
        min_overlap=0.7, thresh=0.0, compute_fp=True,
    )
    assert tp == 1 and tps == [np.float32(0.5)]  # max overlap wins pass 2
    assert fp == 1  # the unmatched higher-scored det is an FP
    assert fn == 0


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
