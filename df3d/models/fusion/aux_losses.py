"""Auxiliary fusion losses: image foreground segmentation + camera/LiDAR
feature consistency.

Equivalents of VoxelRCNN/pcdet/models/backbones_3d/SemanticSeg/
aux_seg_loss.py (AuxImgSegmentLoss:20 — focal loss on an image FG mask
rendered from projected 2D gt boxes; AuxConsistencyLoss:181 — L2 between
voxel features and the image features sampled at their projections) and
CenterPoint/det3d/models/model_utils/segloss.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def render_fg_mask_from_boxes2d(boxes2d, valid, image_hw):
    """boxes2d (M, 4) xyxy pixels -> (H, W) binary foreground mask."""
    h, w = image_hw
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]

    def one(box, ok):
        inside = (
            (xs >= box[0]) & (xs <= box[2]) & (ys >= box[1]) & (ys <= box[3])
        )
        return inside & ok

    masks = jax.vmap(one)(boxes2d, valid)
    return masks.any(axis=0).astype(jnp.float32)


def aux_img_segment_loss(seg_logits, fg_mask, alpha=0.25, gamma=2.0):
    """Focal BCE between predicted FG logit map (B, H, W, 1) and rendered
    fg masks (B, H, W)."""
    p = jax.nn.sigmoid(seg_logits[..., 0])
    t = fg_mask
    pt = t * p + (1 - t) * (1 - p)
    alpha_w = t * alpha + (1 - t) * (1 - alpha)
    loss = -alpha_w * (1 - pt) ** gamma * jnp.log(jnp.clip(pt, 1e-6, 1.0))
    return loss.mean()


def aux_consistency_loss(voxel_feats, image_feats_at_voxels, mask):
    """L2 consistency between (projected) voxel features and image features
    sampled at their projections; both (B, N, C), mask (B, N)."""
    d = jnp.square(voxel_feats - image_feats_at_voxels).sum(-1)
    return (d * mask).sum() / jnp.maximum(mask.sum(), 1.0)
