import numpy as np

from df3d.data.nuscenes_eval import evaluate_nuscenes

CLASSES = ("car", "pedestrian")


def _frame(boxes, names, scores=None, attrs=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 9)
    out = {
        "boxes": boxes,
        "names": np.asarray(names),
    }
    if scores is not None:
        out["scores"] = np.asarray(scores, np.float32)
    if attrs is not None:
        out["attrs"] = np.asarray(attrs, np.int32)
    return out


CAR = [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.0]
PED = [5.0, 5.0, 0.0, 0.7, 0.7, 1.7, 0.0, 0.0, 0.0]


def test_perfect_detections():
    gts = [_frame([CAR, PED], ["car", "pedestrian"], attrs=[1, 2])] * 10
    dets = [
        _frame([CAR, PED], ["car", "pedestrian"], [0.9, 0.8], attrs=[1, 2])
        for _ in range(10)
    ]
    res = evaluate_nuscenes(gts, dets, CLASSES)
    assert res["mAP"] > 0.95
    assert res["tp_errors"]["trans_err"] < 0.01
    assert res["tp_errors"]["attr_err"] < 1e-9
    assert res["NDS"] > 0.95


def test_no_attrs_gives_zero_attr_credit_not_full():
    gts = [_frame([CAR], ["car"])] * 10
    dets = [_frame([CAR], ["car"], [0.9])] * 10
    res = evaluate_nuscenes(gts, dets, ("car",))
    assert np.isnan(res["tp_errors"]["attr_err"])
    # NDS = (5*mAP + 4 satisfied TP terms + 0 attr credit) / 10 <= 0.9
    assert res["NDS"] <= 0.9 + 1e-9


def test_offset_detections_lower_ap_and_ate():
    off = np.asarray(CAR).copy()
    off[0] += 1.5  # 1.5m off: misses 0.5/1.0 thresholds, hits 2/4
    gts = [_frame([CAR], ["car"])] * 10
    dets = [_frame([off], ["car"], [0.9])] * 10
    res = evaluate_nuscenes(gts, dets, ("car",))
    assert 0.3 < res["mAP"] < 0.7  # 2 of 4 thresholds match
    assert 1.2 < res["tp_errors"]["trans_err"] < 1.8


def test_false_positives_reduce_precision():
    fp = np.asarray(CAR).copy()
    fp[:2] = [30.0, 20.0]  # inside the 50m car range
    gts = [_frame([CAR], ["car"])] * 10
    dets = [_frame([CAR, fp], ["car", "car"], [0.9, 0.95])] * 10
    res = evaluate_nuscenes(gts, dets, ("car",))
    assert res["mAP"] < 0.6


def test_class_range_filtering():
    far = np.asarray(CAR).copy()
    far[:2] = [45.0, 30.0]  # 54m from ego: outside the 50m car range
    gts = [_frame([CAR], ["car"])] * 10
    # a would-be FP outside the range must NOT hurt precision
    dets = [_frame([CAR, far], ["car", "car"], [0.9, 0.95])] * 10
    res = evaluate_nuscenes(gts, dets, ("car",))
    assert res["mAP"] > 0.95
    # a gt outside the range must not count as npos
    gts2 = [_frame([CAR, far], ["car", "car"])] * 10
    dets2 = [_frame([CAR], ["car"], [0.9])] * 10
    res2 = evaluate_nuscenes(gts2, dets2, ("car",))
    assert res2["mAP"] > 0.95


def test_absent_class_excluded_from_means():
    gts = [_frame([CAR], ["car"])] * 10
    dets = [_frame([CAR], ["car"], [0.9])] * 10
    res = evaluate_nuscenes(gts, dets, CLASSES)  # no pedestrian gt anywhere
    assert np.isnan(res["per_class"]["pedestrian"]["ap"])
    # mean over car only, not dragged down by the absent class
    assert res["mAP"] > 0.95


def test_velocity_error():
    slow = np.asarray(CAR).copy()
    slow[7:9] = [0.0, 0.0]  # gt has (1, 0)
    gts = [_frame([CAR], ["car"])] * 5
    dets = [_frame([slow], ["car"], [0.9])] * 5
    res = evaluate_nuscenes(gts, dets, ("car",))
    assert abs(res["tp_errors"]["vel_err"] - 1.0) < 1e-5


def test_nds_formula():
    gts = [_frame([CAR], ["car"])] * 5
    dets = [_frame([CAR], ["car"], [0.9])] * 5
    res = evaluate_nuscenes(gts, dets, ("car",))
    expect = (5 * res["mAP"] + sum(
        0.0 if np.isnan(res["tp_errors"][m]) else
        1 - min(1, res["tp_errors"][m]) for m in res["tp_errors"]
    )) / 10
    assert abs(res["NDS"] - expect) < 1e-9


def test_global_score_order_matching():
    """Devkit matches in global score order: a high-scored far-but-within-
    threshold det in frame A must not steal priority from a low-scored exact
    det in frame B (they're independent frames), but WITHIN a frame the
    higher-scored det takes the gt."""
    near = np.asarray(CAR).copy()
    near[0] += 1.8  # within 2m threshold
    gts = [_frame([CAR], ["car"])] * 4
    # higher-scored offset det + lower-scored exact det in the same frame:
    # offset one matches first (global order), exact one becomes FP @2m
    dets = [_frame([near, CAR], ["car", "car"], [0.95, 0.5])] * 4
    res = evaluate_nuscenes(gts, dets, ("car",))
    # ATE reflects the offset det being the match at the 2m threshold
    assert res["tp_errors"]["trans_err"] > 1.5
