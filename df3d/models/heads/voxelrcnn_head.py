"""Voxel R-CNN second-stage head.

Behavioral equivalents (fresh code):
  * VoxelRCNNHead.roi_grid_pool — VoxelRCNN/pcdet/models/roi_heads/
    voxelrcnn_head.py:8-300 (voxel_query neighbor aggregation over
    x_conv2/3/4, pre-MLP, max-pool, shared FC, cls-as-IoU + reg branches)
  * ProposalTargetLayer — roi_heads/target_assigner/proposal_target_layer.py
    (128 ROIs, fg/bg sampling, IoU-score cls targets)
  * RoIHeadTemplate losses — roi_head_template.py (BCE on IoU targets,
    smooth-L1 on canonical residuals + corner regularization)

TPU shape discipline: proposals and sampled ROIs are fixed-size with masks;
sampling uses a provided PRNG key (the reference uses torch RNG).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.core.box_coders import ResidualCoder
from df3d.core.boxes import boxes_to_corners_3d
from df3d.core.iou import iou_3d
from df3d.models.losses import weighted_smooth_l1
from df3d.ops.roi_ops import collect_local_voxels, grid_ball_query, roi_grid_points

CODER = ResidualCoder()


@dataclasses.dataclass(frozen=True)
class RoIPoolScaleCfg:
    feature_key: str      # 'conv2' | 'conv3' | 'conv4'
    downsample: int       # 2 / 4 / 8
    radius: float         # POOL_RADIUS
    nsample: int = 16
    mlp: tuple = (32, 32)


@dataclasses.dataclass(frozen=True)
class VoxelRCNNHeadCfg:
    grid_size: int = 6
    scales: tuple = (
        RoIPoolScaleCfg("conv2", 2, 0.4),
        RoIPoolScaleCfg("conv3", 4, 0.8),
        RoIPoolScaleCfg("conv4", 8, 1.6),
    )
    max_local: int = 256      # stage-1 cap of voxels near a ROI
    coarse_radius: float = 4.0
    shared_fc: tuple = (256, 256)
    cls_fc: tuple = (256, 256)
    reg_fc: tuple = (256, 256)
    # proposal target layer
    roi_per_image: int = 128
    fg_ratio: float = 0.5
    reg_fg_thresh: float = 0.55
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    # losses
    cls_weight: float = 1.0
    reg_weight: float = 1.0
    corner_weight: float = 1.0
    code_weights: tuple = (1.0,) * 7


class VoxelRCNNHead(nn.Module):
    """pcdet-faithful compute graph (voxelrcnn_head.py + pointnet2_stack/
    voxel_pool_modules.py NeighborVoxelSAModuleMSG): per scale,
    mlp_in (Linear no-bias + BN) on voxel features; neighbors grouped around
    ROI grid points; mlp_pos (Linear no-bias + BN) on relative xyz; ADD +
    relu + max-pool; mlp_out (Linear no-bias + BN + relu). FC stacks are
    Linear(no bias) + BN + relu; final pred layers carry bias. This exact
    structure lets published .pth checkpoints import weight-for-weight."""

    cfg: VoxelRCNNHeadCfg
    voxel_size: tuple
    pc_range: tuple

    @nn.compact
    def __call__(self, rois, roi_mask, ms_features, train: bool):
        """rois (B, R, 7); ms_features: dict of SparseTensor per scale key.
        Returns (cls (B, R, 1), reg (B, R, 7))."""
        from df3d.models.layers import MaskedBatchNorm

        c = self.cfg

        def bn(name, x, mask):
            return MaskedBatchNorm(name=name)(x, mask, train)

        pooled = []
        for s in c.scales:
            st = ms_features[s.feature_key]
            from df3d.core.calib import voxel_centers_from_coords

            # mlps_in: Linear(no bias) + BN on voxel features
            feats = nn.Dense(s.mlp[0], use_bias=False,
                             name=f"{s.feature_key}_mlp_in")(st.features)
            feats = bn(f"{s.feature_key}_bn_in", feats, st.valid)

            def pool_one(rois_s, feats_s, coords_s, valid_s):
                xyz = voxel_centers_from_coords(
                    coords_s, self.voxel_size, self.pc_range, s.downsample
                )
                grid = roi_grid_points(rois_s, c.grid_size)  # (R, G, 3)
                lidx, lmask = collect_local_voxels(
                    rois_s[:, :3], xyz, valid_s, c.coarse_radius, c.max_local
                )
                nidx, nmask = grid_ball_query(
                    grid, xyz, lidx, lmask, s.radius, s.nsample
                )  # (R, G, K)
                n_feat = feats_s[nidx]  # (R, G, K, C)
                rel = xyz[nidx] - grid[:, :, None, :]
                return n_feat, rel, nmask

            n_feat, rel, nmask = jax.vmap(pool_one)(
                rois, feats, st.coords, st.valid
            )  # (B, R, G, K, C), (B, R, G, K, 3)
            # mlps_pos: Linear(no bias) + BN on relative xyz, ADDed
            pos = nn.Dense(s.mlp[0], use_bias=False,
                           name=f"{s.feature_key}_mlp_pos")(rel)
            pos = bn(f"{s.feature_key}_bn_pos", pos, nmask)
            h = nn.relu(n_feat + pos)
            h = jnp.where(nmask[..., None], h, -1e9)
            h = h.max(axis=3)  # max-pool over neighbors -> (B, R, G, C)
            h = jnp.where(h <= -1e8, 0.0, h)
            # mlps_out: Linear(no bias) + BN + relu
            h = nn.Dense(s.mlp[1], use_bias=False,
                         name=f"{s.feature_key}_mlp_out")(h)
            gmask = jnp.broadcast_to(
                roi_mask[:, :, None], h.shape[:-1]).astype(bool)
            h = nn.relu(bn(f"{s.feature_key}_bn_out", h, gmask))
            pooled.append(h)

        feat = jnp.concatenate(pooled, axis=-1)  # (B, R, G, sumC)
        b, r = feat.shape[:2]
        feat = feat.reshape(b, r, -1)  # flatten (grid, C) grid-major

        rmask = roi_mask.astype(bool)
        h = feat
        for i, ch in enumerate(c.shared_fc):
            h = nn.Dense(ch, use_bias=False, name=f"shared_fc{i}")(h)
            h = nn.relu(bn(f"shared_bn{i}", h, rmask))
        shared = h

        hc = shared
        for i, ch in enumerate(c.cls_fc):
            hc = nn.Dense(ch, use_bias=False, name=f"cls_fc{i}")(hc)
            hc = nn.relu(bn(f"cls_bn{i}", hc, rmask))
        cls = nn.Dense(1, name="cls_pred")(hc)

        hr = shared
        for i, ch in enumerate(c.reg_fc):
            hr = nn.Dense(ch, use_bias=False, name=f"reg_fc{i}")(hr)
            hr = nn.relu(bn(f"reg_bn{i}", hr, rmask))
        reg = nn.Dense(7, name="reg_pred")(hr)

        cls = cls * roi_mask[..., None]
        reg = reg * roi_mask[..., None]
        return cls, reg


def sample_rois_for_training(
    rng: jax.Array,
    rois: jax.Array,       # (R0, 7) proposals (single sample)
    roi_scores: jax.Array, # (R0,)
    roi_mask: jax.Array,   # (R0,)
    gt_boxes: jax.Array,   # (M, 7)
    gt_valid: jax.Array,   # (M,)
    cfg: VoxelRCNNHeadCfg,
):
    """ProposalTargetLayer: pick roi_per_image ROIs with ~fg_ratio positives.

    Returns dict(rois, roi_labels(iou-based cls target), reg_valid,
    gt_of_roi, mask).
    """
    iou = iou_3d(rois, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & roi_mask[:, None], iou, -1.0)
    max_iou = iou.max(axis=1)
    gt_idx = iou.argmax(axis=1)

    n_fg = int(cfg.roi_per_image * cfg.fg_ratio)
    n_bg = cfg.roi_per_image - n_fg

    noise = jax.random.uniform(rng, max_iou.shape) * 1e-3
    fg_score = jnp.where(max_iou >= cfg.reg_fg_thresh, max_iou + noise, -1.0)
    bg_score = jnp.where(
        (max_iou < cfg.reg_fg_thresh) & roi_mask, 1.0 - max_iou + noise, -1.0
    )
    _, fg_sel = jax.lax.top_k(fg_score, n_fg)
    _, bg_sel = jax.lax.top_k(bg_score, n_bg)
    sel = jnp.concatenate([fg_sel, bg_sel])
    sel_valid = jnp.concatenate(
        [fg_score[fg_sel] > 0, bg_score[bg_sel] > 0]
    )

    s_iou = max_iou[sel]
    # cls target: 0 below bg_thresh, 1 above fg_thresh, linear in between
    cls_t = jnp.clip(
        (s_iou - cfg.cls_bg_thresh) / (cfg.cls_fg_thresh - cfg.cls_bg_thresh),
        0.0, 1.0,
    )
    return {
        "rois": rois[sel],
        "roi_scores": roi_scores[sel],
        "cls_targets": cls_t,
        "reg_valid": (s_iou >= cfg.reg_fg_thresh) & sel_valid,
        "gt_of_roi": gt_boxes[gt_idx[sel]],
        "mask": sel_valid,
    }


def canonical_reg_targets(rois, gt_of_roi):
    """Encode gt in the ROI canonical frame (roi_head_template.py
    assign_targets:113-133), INCLUDING the opposite-orientation flip: when
    the ROI is anti-aligned with its gt (heading delta in (pi/2, 3pi/2)),
    the gt heading is flipped by pi so the regression target stays in
    [-pi/2, pi/2]. Boxes are rectangular, so a pi flip is geometrically
    identical — without it an anti-aligned eval proposal gets a ~pi target
    the head never learns (r5: a 57-degree heading error on the golden
    fixture traced to exactly this), and pcdet clamps the residual too."""
    rois_anchor = rois.at[..., 0:3].set(0.0).at[..., 6].set(0.0)
    rel = gt_of_roi.at[..., 0:3].add(-rois[..., 0:3])
    # rotate into roi frame
    from df3d.core.boxes import rotate_points_along_z

    xyz = rotate_points_along_z(rel[..., None, 0:3], -rois[..., 6])[..., 0, :]
    h = jnp.mod(rel[..., 6] - rois[..., 6], 2 * jnp.pi)  # [0, 2pi)
    opposite = (h > jnp.pi * 0.5) & (h < jnp.pi * 1.5)
    h = jnp.where(opposite, jnp.mod(h + jnp.pi, 2 * jnp.pi), h)
    h = jnp.where(h > jnp.pi, h - 2 * jnp.pi, h)  # (-pi/2, pi/2)
    heading = jnp.clip(h, -jnp.pi / 2, jnp.pi / 2)
    local_gt = rel.at[..., 0:3].set(xyz).at[..., 6].set(heading)
    return CODER.encode(local_gt, rois_anchor)


def decode_rcnn_boxes(rois, reg_preds):
    """Inverse of canonical_reg_targets: local residual -> world box."""
    rois_anchor = rois.at[..., 0:3].set(0.0).at[..., 6].set(0.0)
    local = CODER.decode(reg_preds, rois_anchor)
    from df3d.core.boxes import rotate_points_along_z

    xyz = rotate_points_along_z(local[..., None, 0:3], rois[..., 6])[..., 0, :]
    out = local.at[..., 0:3].set(xyz + rois[..., 0:3])
    return out.at[..., 6].add(rois[..., 6])


def rcnn_loss(cls_preds, reg_preds, targets, cfg: VoxelRCNNHeadCfg):
    """BCE on IoU cls targets + smooth-L1 on canonical residuals + corner loss."""
    mask = targets["mask"].astype(jnp.float32)
    cls = cls_preds[..., 0]
    bce = (
        jnp.maximum(cls, 0) - cls * targets["cls_targets"]
        + jnp.log1p(jnp.exp(-jnp.abs(cls)))
    )
    cls_loss = (bce * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    reg_t = canonical_reg_targets(targets["rois"], targets["gt_of_roi"])
    reg_m = targets["reg_valid"].astype(jnp.float32)
    loc = weighted_smooth_l1(
        reg_preds, reg_t, reg_m, code_weights=cfg.code_weights
    ).sum() / jnp.maximum(reg_m.sum(), 1.0)

    # corner regularization on decoded boxes vs gt
    dec = decode_rcnn_boxes(targets["rois"], reg_preds)
    c_pred = boxes_to_corners_3d(dec)
    gt = targets["gt_of_roi"]
    gt_flip = gt.at[..., 6].add(jnp.pi)
    cd = jnp.minimum(
        jnp.linalg.norm(c_pred - boxes_to_corners_3d(gt), axis=-1),
        jnp.linalg.norm(c_pred - boxes_to_corners_3d(gt_flip), axis=-1),
    ).mean(-1)
    # huber on corner distance (pcdet corner loss)
    delta = 1.0
    corner = jnp.where(cd < delta, 0.5 * cd**2 / delta, cd - 0.5 * delta)
    corner_loss = (corner * reg_m).sum() / jnp.maximum(reg_m.sum(), 1.0)

    total = (
        cfg.cls_weight * cls_loss
        + cfg.reg_weight * loc
        + cfg.corner_weight * corner_loss
    )
    return total, {
        "rcnn_cls_loss": cls_loss, "rcnn_reg_loss": loc,
        "rcnn_corner_loss": corner_loss, "rcnn_loss": total,
    }
