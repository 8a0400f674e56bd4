"""Anchor-based RPN head (KITTI / Voxel R-CNN first stage).

Behavioral equivalents (fresh code):
  * AnchorGenerator            — VoxelRCNN/pcdet/models/dense_heads/
                                 target_assigner/anchor_generator.py
  * AxisAlignedTargetAssigner  — .../axis_aligned_target_assigner.py
  * AnchorHeadSingle + losses  — anchor_head_single.py:7, anchor_head_template.py:11
    (focal cls, smooth-L1 with sin-difference heading, direction bins)

TPU shape discipline: anchors are a static (A, 7) array; target assignment
is a dense (A x M) IoU computed with iou_nearest_bev (what the reference
uses for KITTI cars); everything jits.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from df3d.core import nms as NMS
from df3d.core.box_coders import ResidualCoder
from df3d.core.boxes import limit_period
from df3d.core.iou import iou_nearest_bev
from df3d.models.losses import sigmoid_focal_loss, weighted_smooth_l1


@dataclasses.dataclass(frozen=True)
class AnchorClassCfg:
    name: str
    size: tuple          # (dx, dy, dz)
    bottom_height: float
    matched_threshold: float
    unmatched_threshold: float
    rotations: tuple = (0.0, 1.5707963)


def generate_anchors(
    grid_size_xy: tuple, pc_range, classes: Sequence[AnchorClassCfg],
    align_center: bool = False,
) -> np.ndarray:
    """-> (ny, nx, num_classes, num_rot, 7) float32; callers flatten to
    (A, 7) in location-major (y, x, cls, rot) order — the SAME order the
    1x1-conv head's channel flattening produces (pcdet cats per-class
    anchors along the per-location axis before .view(-1, 7), so predictions
    and anchors line up anchor-for-anchor even with multiple classes)."""
    nx, ny = grid_size_xy
    all_anchors = []
    for cfg in classes:
        if align_center:
            x_stride = (pc_range[3] - pc_range[0]) / nx
            y_stride = (pc_range[4] - pc_range[1]) / ny
            x_off, y_off = x_stride / 2, y_stride / 2
        else:
            x_stride = (pc_range[3] - pc_range[0]) / (nx - 1)
            y_stride = (pc_range[4] - pc_range[1]) / (ny - 1)
            x_off, y_off = 0.0, 0.0
        xs = pc_range[0] + x_off + np.arange(nx) * x_stride
        ys = pc_range[1] + y_off + np.arange(ny) * y_stride
        z = cfg.bottom_height + cfg.size[2] / 2  # anchor z is box center
        xx, yy, rr = np.meshgrid(xs, ys, np.asarray(cfg.rotations), indexing="ij")
        a = np.stack(
            [
                xx, yy, np.full_like(xx, z),
                np.full_like(xx, cfg.size[0]),
                np.full_like(xx, cfg.size[1]),
                np.full_like(xx, cfg.size[2]),
                rr,
            ],
            axis=-1,
        )  # (nx, ny, R, 7)
        all_anchors.append(a.transpose(1, 0, 2, 3))  # -> (ny, nx, R, 7)
    return np.stack(all_anchors, axis=2).astype(np.float32)


def assign_anchor_targets(
    anchors: jax.Array,        # (A, 7) for ONE class
    gt_boxes: jax.Array,       # (M, 7)
    gt_mask: jax.Array,        # (M,) bool: valid AND of this class
    matched_thr: float,
    unmatched_thr: float,
    coder: ResidualCoder,
):
    """Per-class assignment (axis_aligned_target_assigner.py semantics):
    labels: 1 pos / 0 neg / -1 ignore; force-match best anchor per gt.
    Returns (labels (A,), reg_targets (A, code), matched_gt_idx (A,))."""
    a = anchors.shape[0]
    iou = iou_nearest_bev(anchors, gt_boxes)  # (A, M)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)

    best_gt_iou = iou.max(axis=1)
    best_gt_idx = iou.argmax(axis=1)

    labels = jnp.full((a,), -1, jnp.int32)
    labels = jnp.where(best_gt_iou < unmatched_thr, 0, labels)
    labels = jnp.where(best_gt_iou >= matched_thr, 1, labels)

    # force-match: the best anchor for each gt becomes positive
    anchor_best_for_gt = jnp.where(
        gt_mask, iou.argmax(axis=0), a
    )  # (M,) anchor idx or A
    force = jnp.zeros((a + 1,), bool).at[anchor_best_for_gt].set(
        gt_mask, mode="drop"
    )[:a]
    has_iou = best_gt_iou > 0
    labels = jnp.where(force & has_iou, 1, labels)

    reg_targets = coder.encode(gt_boxes[best_gt_idx], anchors)
    reg_targets = reg_targets * (labels == 1)[:, None]
    return labels, reg_targets, best_gt_idx


def add_sin_difference(pred_rot, target_rot):
    """sin(a - b) factorization used for the heading channel."""
    return jnp.sin(pred_rot) * jnp.cos(target_rot), jnp.cos(pred_rot) * jnp.sin(target_rot)


class AnchorHeadSingle(nn.Module):
    """1x1 conv heads over the BEV map (anchor_head_single.py)."""

    num_classes: int
    num_anchors_per_loc: int  # classes * rotations
    code_size: int = 7
    use_dir: bool = True
    num_dir_bins: int = 2

    @nn.compact
    def __call__(self, bev: jax.Array):
        """bev (B, H, W, C) -> cls (B, H*W*A, ncls), box (B, H*W*A, code),
        dir (B, H*W*A, bins)."""
        b = bev.shape[0]
        n = self.num_anchors_per_loc
        cls = nn.Conv(n * self.num_classes, (1, 1),
                      bias_init=nn.initializers.constant(-np.log(99.0)),
                      name="conv_cls")(bev)
        box = nn.Conv(n * self.code_size, (1, 1), name="conv_box")(bev)
        out_dir = None
        if self.use_dir:
            out_dir = nn.Conv(n * self.num_dir_bins, (1, 1), name="conv_dir")(bev)
            out_dir = out_dir.reshape(b, -1, self.num_dir_bins)
        return (
            cls.reshape(b, -1, self.num_classes),
            box.reshape(b, -1, self.code_size),
            out_dir,
        )


def anchor_head_loss(
    cls_preds, box_preds, dir_preds,
    labels, reg_targets, anchors,
    gt_classes_per_anchor,
    num_classes: int,
    dir_offset: float = 0.78539,
    code_weights=(1.0,) * 7,
    cls_weight: float = 1.0, loc_weight: float = 2.0, dir_weight: float = 0.2,
):
    """anchor_head_template.py get_loss semantics. All inputs batched (B, A, ...):
    labels in {-1, 0, 1}; gt_classes_per_anchor in [0, ncls) for positives."""
    pos = (labels == 1).astype(jnp.float32)
    neg = (labels == 0).astype(jnp.float32)
    num_pos = jnp.maximum(pos.sum(axis=1, keepdims=True), 1.0)

    # classification: one-hot of (class+1) with background dropped
    cls_t = jnp.where(labels == 1, gt_classes_per_anchor + 1, 0)
    one_hot = jax.nn.one_hot(cls_t, num_classes + 1)[..., 1:]
    cls_w = (pos + neg) / num_pos
    cls_loss = sigmoid_focal_loss(cls_preds, one_hot, cls_w).sum() / labels.shape[0]

    # regression with sin-difference on heading
    reg_w = pos / num_pos
    p_sin, t_sin = add_sin_difference(box_preds[..., 6], reg_targets[..., 6])
    p = box_preds.at[..., 6].set(p_sin)
    t = reg_targets.at[..., 6].set(t_sin)
    loc_loss = weighted_smooth_l1(
        p, t, reg_w, code_weights=code_weights
    ).sum() / labels.shape[0]

    total = cls_weight * cls_loss + loc_weight * loc_loss
    logs = {"rpn_cls_loss": cls_loss, "rpn_loc_loss": loc_loss}

    if dir_preds is not None:
        rot_gt = reg_targets[..., 6] + anchors[None, :, 6]
        dir_t = jnp.floor(
            limit_period(rot_gt - dir_offset, 0.0, 2 * jnp.pi) / jnp.pi
        ).astype(jnp.int32)
        dir_t = jnp.clip(dir_t, 0, 1)
        dir_onehot = jax.nn.one_hot(dir_t, dir_preds.shape[-1])
        ce = -(dir_onehot * jax.nn.log_softmax(dir_preds)).sum(-1)
        dir_loss = (ce * reg_w).sum() / labels.shape[0]
        total = total + dir_weight * dir_loss
        logs["rpn_dir_loss"] = dir_loss

    logs["rpn_loss"] = total
    return total, logs


def anchor_head_decode(
    cls_preds, box_preds, dir_preds, anchors, coder: ResidualCoder,
    dir_offset: float = 0.78539, dir_limit_offset: float = 0.0,
):
    """generate_predicted_boxes: decode residuals at every anchor + snap
    heading to the predicted direction bin. Returns (scores (B,A,ncls)
    sigmoid, boxes (B,A,7))."""
    boxes = coder.decode(box_preds, anchors[None])
    if dir_preds is not None:
        dir_bin = dir_preds.argmax(-1)
        period = jnp.pi
        rot = limit_period(boxes[..., 6] - dir_offset, dir_limit_offset, period)
        boxes = boxes.at[..., 6].set(rot + dir_offset + period * dir_bin)
    return jax.nn.sigmoid(cls_preds), boxes
