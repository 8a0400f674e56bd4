import numpy as np

from df3d.data.nuscenes_eval import evaluate_nuscenes

CLASSES = ("car", "pedestrian")


def _frame(boxes, names, scores=None):
    out = {
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 9),
        "names": np.asarray(names),
    }
    if scores is not None:
        out["scores"] = np.asarray(scores, np.float32)
    return out


CAR = [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.0]
PED = [5.0, 5.0, 0.0, 0.7, 0.7, 1.7, 0.0, 0.0, 0.0]


def test_perfect_detections():
    gts = [_frame([CAR, PED], ["car", "pedestrian"])] * 10
    dets = [
        _frame([CAR, PED], ["car", "pedestrian"], [0.9, 0.8]) for _ in range(10)
    ]
    res = evaluate_nuscenes(gts, dets, CLASSES)
    assert res["mAP"] > 0.95
    assert res["tp_errors"]["trans_err"] < 0.01
    assert res["NDS"] > 0.95


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
    fp[:2] = [40.0, 40.0]
    gts = [_frame([CAR], ["car"])] * 10
    dets = [_frame([CAR, fp], ["car", "car"], [0.9, 0.95])] * 10
    res = evaluate_nuscenes(gts, dets, ("car",))
    assert res["mAP"] < 0.6


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
        1 - min(1, res["tp_errors"][m]) for m in res["tp_errors"]
    )) / 10
    assert abs(res["NDS"] - expect) < 1e-9
