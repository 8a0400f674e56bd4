"""Voxel R-CNN detector (KITTI two-stage), TPU-native end-to-end.

Behavioral equivalent of VoxelRCNN/pcdet/models/detectors/voxel_rcnn.py:4-36
over detector3d_template.py:14-411 module topology:
MeanVFE (fused in voxelizer) -> VoxelBackBone8x -> HeightCompression ->
BaseBEVBackbone -> AnchorHeadSingle -> proposal NMS -> VoxelRCNNHead.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from df3d.core import nms as NMS
from df3d.core.box_coders import ResidualCoder
from df3d.models.backbones_3d import VoxelBackBone8x
from df3d.models.heads.anchor_head import (
    AnchorClassCfg, AnchorHeadSingle, anchor_head_decode, anchor_head_loss,
    assign_anchor_targets, generate_anchors,
)
from df3d.models.heads.voxelrcnn_head import (
    VoxelRCNNHead, VoxelRCNNHeadCfg, decode_rcnn_boxes, rcnn_loss,
    sample_rois_for_training,
)
from df3d.models.necks import BEVBackbone
from df3d.ops.sparse import SparseTensor

KITTI_CAR = AnchorClassCfg(
    name="Car", size=(3.9, 1.6, 1.56), bottom_height=-1.78,
    matched_threshold=0.6, unmatched_threshold=0.45,
)


@dataclasses.dataclass(frozen=True)
class VoxelRCNNConfig:
    pc_range: tuple = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    voxel_size: tuple = (0.05, 0.05, 0.1)
    grid_size: tuple = (40, 1600, 1408)  # (Z, Y, X)
    max_voxels: int = 16_000
    max_points_per_voxel: int = 5
    num_point_features: int = 4
    stage_caps: tuple = (16_000, 12_000, 8_000, 4_000)
    anchor_classes: tuple = (KITTI_CAR,)
    out_size_factor: int = 8
    # proposal cfg (pcdet NMS_CONFIG train/test)
    train_pre_nms: int = 1024   # reference 9000 -> topk cap
    train_post_nms: int = 512
    train_nms_thresh: float = 0.8
    test_pre_nms: int = 1024
    test_post_nms: int = 100
    test_nms_thresh: float = 0.7
    rcnn: VoxelRCNNHeadCfg = VoxelRCNNHeadCfg()
    # final nms
    score_thresh: float = 0.3
    final_nms_thresh: float = 0.1
    final_max_boxes: int = 100

    @property
    def sparse_shape(self):
        z, y, x = self.grid_size
        return (z + 1, y, x)

    @property
    def bev_size_xy(self):
        return (self.grid_size[2] // self.out_size_factor,
                self.grid_size[1] // self.out_size_factor)


class VoxelRCNN(nn.Module):
    cfg: VoxelRCNNConfig
    fusion_hook: Optional[Callable] = None

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train: bool,
                 fusion_kwargs=None, packed_table=None):
        cfg = self.cfg
        # coords come from ops/voxelize.py -> key-sorted rows, padding last
        st = SparseTensor(voxel_features, voxel_coords, cfg.sparse_shape,
                          rows_sorted=True, packed_table=packed_table,
                          packed_table_grid=(
                              None if packed_table is None
                              else tuple(cfg.sparse_shape)))
        caps = tuple(min(c, voxel_features.shape[1]) for c in cfg.stage_caps)
        bev, ms = VoxelBackBone8x(
            cfg.num_point_features, caps, fusion_hook=self.fusion_hook,
            name="backbone",
        )(st, train, fusion_kwargs)
        bev = BEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(64, 128),
            upsample_strides=(1, 2), num_upsample_filters=(128, 128),
            name="neck",
        )(bev, train)
        n_rot = len(cfg.anchor_classes[0].rotations)
        cls, box, dirp = AnchorHeadSingle(
            num_classes=len(cfg.anchor_classes),
            num_anchors_per_loc=len(cfg.anchor_classes) * n_rot,
            name="dense_head",
        )(bev)
        return {"cls": cls, "box": box, "dir": dirp, "ms": ms}


def build_anchors(cfg: VoxelRCNNConfig) -> jnp.ndarray:
    a = generate_anchors(cfg.bev_size_xy, cfg.pc_range, cfg.anchor_classes)
    return jnp.asarray(a.reshape(-1, 7))


def anchor_class_ids(cfg: VoxelRCNNConfig) -> jnp.ndarray:
    """class id of every flattened anchor (location-major (y, x, cls, rot)
    order, matching generate_anchors and the conv-channel flattening)."""
    n_loc = cfg.bev_size_xy[0] * cfg.bev_size_xy[1]
    n_rot = len(cfg.anchor_classes[0].rotations)
    per_loc = np.repeat(np.arange(len(cfg.anchor_classes)), n_rot)
    return jnp.asarray(np.tile(per_loc, n_loc))


def proposal_layer(cfg: VoxelRCNNConfig, preds, anchors, train: bool):
    """Decode anchors + NMS -> fixed-size proposals (B, R, 7) + scores + mask."""
    coder = ResidualCoder()
    scores, boxes = anchor_head_decode(
        preds["cls"], preds["box"], preds["dir"], anchors, coder
    )
    score = scores.max(-1)
    pre = cfg.train_pre_nms if train else cfg.test_pre_nms
    post = cfg.train_post_nms if train else cfg.test_post_nms
    thresh = cfg.train_nms_thresh if train else cfg.test_nms_thresh

    def one(boxes_s, score_s):
        idx, mask = NMS.nms_bev(boxes_s, score_s, thresh, pre, post)
        return boxes_s[idx], score_s[idx] * mask, mask

    return jax.vmap(one)(boxes, score)


def voxel_rcnn_post_processing(cfg: VoxelRCNNConfig, rois, roi_scores,
                               roi_mask, rcnn_cls, rcnn_reg):
    """Final-stage post-processing (pcdet detector3d_template.py
    post_processing, VoxelRCNN test config): refine proposals with the RCNN
    regression, score with sigmoid(rcnn_cls) (class-agnostic IoU-guided
    score), rotated NMS, score threshold.

    rois (B, R, 7); rcnn_cls (B, R, 1); rcnn_reg (B, R, 7).
    Returns dict boxes (B, F, 7), scores (B, F), labels (B, F), valid
    (B, F) with F = cfg.final_max_boxes.
    """
    boxes = decode_rcnn_boxes(rois, rcnn_reg)
    scores = jax.nn.sigmoid(rcnn_cls[..., 0]) * roi_mask

    def one(b, s):
        idx, keep = NMS.nms_bev(
            b, s, cfg.final_nms_thresh, b.shape[0], cfg.final_max_boxes
        )
        return b[idx], s[idx] * keep, keep

    fb, fs, keep = jax.vmap(one)(boxes, scores)
    valid = keep & (fs > cfg.score_thresh)
    # single-class (Car) unless multi-class anchors are configured; the
    # class-agnostic head carries no per-class logits, so the label is the
    # proposal's anchor class (0 for the car-only target config)
    labels = jnp.zeros(fs.shape, jnp.int32)
    return {"boxes": fb, "scores": fs, "labels": labels, "valid": valid}


def voxel_rcnn_train_losses(
    cfg: VoxelRCNNConfig, preds, rcnn_out, targets_rpn, rcnn_targets,
):
    rpn_total, rpn_logs = anchor_head_loss(
        preds["cls"], preds["box"], preds["dir"],
        targets_rpn["labels"], targets_rpn["reg_targets"],
        targets_rpn["anchors"], targets_rpn["gt_classes_per_anchor"],
        num_classes=len(cfg.anchor_classes),
    )
    rcnn_total, rcnn_logs = rcnn_loss(
        rcnn_out["cls"], rcnn_out["reg"], rcnn_targets, cfg.rcnn
    )
    total = rpn_total + rcnn_total
    return total, {**rpn_logs, **rcnn_logs, "loss": total}


def assign_rpn_targets(cfg: VoxelRCNNConfig, anchors, gt_boxes, gt_classes, gt_valid):
    """Batched multi-class anchor assignment. gt (B, M, 7)."""
    cls_ids = anchor_class_ids(cfg)
    coder = ResidualCoder()

    def one(gt_b, gt_cls_b, gt_valid_b):
        labels_all = jnp.zeros((anchors.shape[0],), jnp.int32)
        regs_all = jnp.zeros((anchors.shape[0], 7))
        gtc_all = jnp.zeros((anchors.shape[0],), jnp.int32)
        for ci, ccfg in enumerate(cfg.anchor_classes):
            sel = cls_ids == ci  # static mask over anchors
            labels, regs, gidx = assign_anchor_targets(
                anchors, gt_b, gt_valid_b & (gt_cls_b == ci),
                ccfg.matched_threshold, ccfg.unmatched_threshold, coder,
            )
            labels_all = jnp.where(sel, labels, labels_all)
            regs_all = jnp.where(sel[:, None], regs, regs_all)
            gtc_all = jnp.where(sel, ci, gtc_all)
        return labels_all, regs_all, gtc_all

    labels, regs, gtc = jax.vmap(one)(gt_boxes, gt_classes, gt_valid)
    return {
        "labels": labels, "reg_targets": regs, "anchors": anchors,
        "gt_classes_per_anchor": gtc,
    }
