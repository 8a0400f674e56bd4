"""Aux training objective assembly for fused 3D-DF models.

Wires the aux seg / consistency losses (df3d.models.fusion.aux_losses)
into a training-loss term the way the reference's fused configs do
(VoxelRCNN aux_seg_loss.py usage inside the fused backbones):

  * a small seg head over the first image-branch scale predicts FG;
  * the FG target is rendered from the gt boxes projected to the image;
  * a consistency term ties voxel features to the image features sampled
    at their projections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.core.boxes import boxes_to_corners_3d
from df3d.core.calib import project_to_image
from .aux_losses import aux_consistency_loss, aux_img_segment_loss


class AuxSegHead(nn.Module):
    """1-channel FG logit map over an image feature scale."""

    @nn.compact
    def __call__(self, feat):
        h = nn.Conv(feat.shape[-1], (3, 3), padding=1)(feat)
        h = nn.relu(h)
        return nn.Conv(1, (1, 1))(h)


def render_fg_from_gt3d(gt_boxes, gt_valid, proj, feat_hw, image_hw):
    """(B, M, 7+) boxes + (B, 3, 4) projection -> (B, Hf, Wf) FG masks at
    the feature-map resolution via projected 3D corners."""
    hf, wf = feat_hw
    h, w = image_hw
    corners = boxes_to_corners_3d(gt_boxes[..., :7])  # (B, M, 8, 3)

    def one(corners_s, valid_s, proj_s):
        uv, depth = project_to_image(proj_s, corners_s.reshape(-1, 3))
        uv = uv.reshape(-1, 8, 2)
        depth = depth.reshape(-1, 8)
        x1 = uv[..., 0].min(-1) / w * wf
        x2 = uv[..., 0].max(-1) / w * wf
        y1 = uv[..., 1].min(-1) / h * hf
        y2 = uv[..., 1].max(-1) / h * hf
        ok = valid_s & (depth.min(-1) > 0.1)
        ys = jnp.arange(hf)[:, None]
        xs = jnp.arange(wf)[None, :]

        def box_mask(args):
            bx1, by1, bx2, by2, o = args
            return ((xs >= bx1) & (xs <= bx2) & (ys >= by1) & (ys <= by2) & o)

        masks = jax.vmap(lambda a, b, c, d, o: box_mask((a, b, c, d, o)))(
            x1, y1, x2, y2, ok
        )
        return masks.any(0).astype(jnp.float32)

    return jax.vmap(one)(corners, gt_valid, proj)


def fused_aux_losses(
    seg_logits,            # (B, Hf, Wf, 1)
    gt_boxes, gt_valid,    # (B, M, 7+), (B, M)
    proj,                  # (B, 3, 4)
    image_hw,
    voxel_feats=None, image_feats_at_voxels=None, voxel_mask=None,
    seg_weight: float = 1.0, consistency_weight: float = 0.1,
):
    hf, wf = seg_logits.shape[1:3]
    fg = render_fg_from_gt3d(gt_boxes, gt_valid, proj, (hf, wf), image_hw)
    total = seg_weight * aux_img_segment_loss(seg_logits, fg)
    logs = {"aux_seg_loss": total}
    if voxel_feats is not None:
        c = consistency_weight * aux_consistency_loss(
            voxel_feats, image_feats_at_voxels, voxel_mask
        )
        logs["aux_consistency_loss"] = c
        total = total + c
    logs["aux_loss"] = total
    return total, logs
