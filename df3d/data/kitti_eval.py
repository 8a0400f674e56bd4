"""KITTI official-style evaluation (R40 AP), host-side numpy.

Behavioral equivalent of VoxelRCNN/pcdet/datasets/kitti/
kitti_object_eval_python/{eval.py,rotate_iou.py} minus the numba-CUDA
rotated IoU (replaced with a numpy polygon-clip identical in math to
df3d.core.iou). Implements:
  * difficulty buckets (bbox height / occlusion / truncation),
  * ignored-gt handling (difficulty fail or neighboring class),
  * two-pass greedy matching with 40-recall-point score thresholds,
  * metrics: 3D AP and BEV AP per class/difficulty.
"""

from __future__ import annotations

import numpy as np

DIFFICULTY = {  # min bbox height px, max occlusion, max truncation
    0: (40, 0, 0.15),
    1: (25, 1, 0.30),
    2: (25, 2, 0.50),
}
MIN_OVERLAP = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}
NEIGHBOR_CLASSES = {"Car": ("Van",), "Pedestrian": ("Person_sitting",)}
N_SAMPLE_PTS = 41


def _rect_corners(boxes):
    signs = np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32)
    local = 0.5 * signs[None] * boxes[:, None, 3:5]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    return np.stack([x, y], -1) + boxes[:, None, :2]


def _clip_poly(poly, a, b):
    out = []
    n = len(poly)
    d = b - a
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        sc = d[0] * (cur[1] - a[1]) - d[1] * (cur[0] - a[0])
        sn = d[0] * (nxt[1] - a[1]) - d[1] * (nxt[0] - a[0])
        if sc >= 0:
            out.append(cur)
        if (sc >= 0) != (sn >= 0):
            t = sc / (sc - sn + 1e-12)
            out.append(cur + t * (nxt - cur))
    return np.asarray(out)


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def rotated_iou_bev(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) rotated BEV IoU (numpy)."""
    ca, cb = _rect_corners(boxes_a), _rect_corners(boxes_b)
    out = np.zeros((len(boxes_a), len(boxes_b)), np.float32)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    for i in range(len(boxes_a)):
        for j in range(len(boxes_b)):
            poly = ca[i]
            for k in range(4):
                poly = _clip_poly(poly, cb[j][k], cb[j][(k + 1) % 4])
                if len(poly) == 0:
                    break
            inter = _poly_area(poly) if len(poly) >= 3 else 0.0
            union = area_a[i] + area_b[j] - inter
            out[i, j] = inter / max(union, 1e-9)
    return out


def iou_3d_np(boxes_a, boxes_b):
    bev = rotated_iou_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zo = np.maximum(
        np.minimum(za2[:, None], zb2[None]) - np.maximum(za1[:, None], zb1[None]),
        0.0,
    )
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    # bev holds IoU; recover intersection area: I = iou*(A+B)/(1+iou)
    inter_area = bev * (area_a[:, None] + area_b[None]) / (1 + bev)
    inter_vol = inter_area * zo
    vol_a = area_a * boxes_a[:, 5]
    vol_b = area_b * boxes_b[:, 5]
    return inter_vol / np.maximum(vol_a[:, None] + vol_b[None] - inter_vol, 1e-9)


def classify_gts(annos, cls: str, difficulty: int):
    """Per-frame gt status: 0 = evaluate, 1 = ignore, -1 = skip (other cls)."""
    min_h, max_occ, max_trunc = DIFFICULTY[difficulty]
    status = []
    for i, name in enumerate(annos["name"]):
        h = annos["bbox"][i][3] - annos["bbox"][i][1] if "bbox" in annos else 1e9
        occ = annos.get("occluded", np.zeros(len(annos["name"])))[i]
        trunc = annos.get("truncated", np.zeros(len(annos["name"])))[i]
        if name == cls:
            if occ > max_occ or trunc > max_trunc or h < min_h:
                status.append(1)
            else:
                status.append(0)
        elif name in NEIGHBOR_CLASSES.get(cls, ()):
            status.append(1)
        else:
            status.append(-1)
    return np.asarray(status, np.int32)


def _match_frame(iou, det_scores, gt_status, min_overlap, thresh):
    """Greedy official matching at a score threshold.

    Returns (tp, fp, fn, tp_scores)."""
    nd, ng = iou.shape[0], iou.shape[1]
    assigned_det = np.full(nd, False)
    tp = fp = fn = 0
    tp_scores = []
    ignored_det = np.full(nd, False)
    for j in range(ng):
        if gt_status[j] == -1:
            continue
        best_iou, best_d = 0.0, -1
        for d in range(nd):
            if assigned_det[d] or det_scores[d] < thresh:
                continue
            if iou[d, j] > best_iou and iou[d, j] >= min_overlap:
                best_iou, best_d = iou[d, j], d
        if best_d >= 0:
            assigned_det[best_d] = True
            if gt_status[j] == 0:
                tp += 1
                tp_scores.append(det_scores[best_d])
            else:
                ignored_det[best_d] = True
        elif gt_status[j] == 0:
            fn += 1
    for d in range(nd):
        if det_scores[d] >= thresh and not assigned_det[d]:
            fp += 1
    return tp, fp, fn, tp_scores


def eval_class(gt_annos, det_annos, cls: str, difficulty: int,
               metric: str = "3d"):
    """-> dict(ap=R40 AP %, precision curve, recall thresholds)."""
    min_ov = MIN_OVERLAP[cls]
    ious, statuses, scores_all = [], [], []
    total_valid_gt = 0
    for gt, det in zip(gt_annos, det_annos):
        status = classify_gts(gt, cls, difficulty)
        det_mask = det["name"] == cls if "name" in det else np.ones(
            len(det["boxes_lidar"]), bool
        )
        det_boxes = det["boxes_lidar"][det_mask]
        det_scores = det["score"][det_mask]
        gt_boxes = gt["boxes_lidar"]
        if metric == "3d":
            iou = iou_3d_np(det_boxes, gt_boxes) if len(det_boxes) and len(gt_boxes) else np.zeros((len(det_boxes), len(gt_boxes)), np.float32)
        else:
            iou = rotated_iou_bev(det_boxes, gt_boxes) if len(det_boxes) and len(gt_boxes) else np.zeros((len(det_boxes), len(gt_boxes)), np.float32)
        ious.append(iou)
        statuses.append(status)
        scores_all.append(det_scores)
        total_valid_gt += int((status == 0).sum())

    if total_valid_gt == 0:
        return {"ap": 0.0, "precision": np.zeros(N_SAMPLE_PTS), "thresholds": []}

    # pass 1: all TP scores at threshold 0
    tp_scores = []
    for iou, st, sc in zip(ious, statuses, scores_all):
        _, _, _, tps = _match_frame(iou, sc, st, min_ov, -1e9)
        tp_scores.extend(tps)
    tp_scores = np.sort(tp_scores)[::-1]

    # recall-position thresholds
    thresholds = []
    cur_recall = 0.0
    for i, s in enumerate(tp_scores):
        r = (i + 1) / total_valid_gt
        if i < len(tp_scores) - 1:
            r_next = (i + 2) / total_valid_gt
        else:
            r_next = r
        if (r - cur_recall) >= (r_next - r) or r_next == r:
            thresholds.append(s)
            cur_recall += 1.0 / (N_SAMPLE_PTS - 1)
        if len(thresholds) >= N_SAMPLE_PTS:
            break

    precision = np.zeros(N_SAMPLE_PTS)
    for ti, th in enumerate(thresholds):
        tp = fp = fn = 0
        for iou, st, sc in zip(ious, statuses, scores_all):
            t, f, n, _ = _match_frame(iou, sc, st, min_ov, th)
            tp += t
            fp += f
            fn += n
        precision[ti] = tp / max(tp + fp, 1)
    # right-max smoothing
    for i in range(N_SAMPLE_PTS - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])

    # R40: average precision at 40 points (skip the first)
    ap = precision[1:].sum() / 40.0 * 100.0
    return {"ap": ap, "precision": precision, "thresholds": thresholds}


def evaluate_kitti(gt_annos, det_annos, classes=("Car",), metrics=("3d", "bev")):
    """-> {class: {metric: [AP easy, AP moderate, AP hard]}}"""
    out = {}
    for cls in classes:
        out[cls] = {}
        for metric in metrics:
            out[cls][metric] = [
                eval_class(gt_annos, det_annos, cls, d, metric)["ap"]
                for d in (0, 1, 2)
            ]
    return out
