"""Point heads (PV-RCNN auxiliary keypoint supervision).

Equivalent of pcdet point_head_simple.py (PointHeadSimple): an MLP over
keypoint features predicting foreground probability, supervised by
point-in-gt-box labels; the predicted score re-weights keypoint features
(Predicted Keypoint Weighting) before the ROI head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.core.boxes import enlarge_box3d, points_in_boxes


class PointHeadSimple(nn.Module):
    hidden: tuple = (256, 256)

    @nn.compact
    def __call__(self, point_feats: jax.Array):
        """point_feats (B, K, C) -> fg logits (B, K)."""
        h = point_feats
        for i, ch in enumerate(self.hidden):
            h = nn.Dense(ch, name=f"fc{i}")(h)
            h = nn.relu(h)
        return nn.Dense(1, name="cls")(h)[..., 0]


def point_fg_labels(keypoints, gt_boxes, gt_valid, extra_width=(0.2, 0.2, 0.2)):
    """Foreground labels: keypoint inside an (enlarged) gt box.
    keypoints (B, K, 3); gt (B, M, 7+) -> (B, K) float."""
    def one(kp, boxes, bvalid):
        big = enlarge_box3d(boxes[:, :7], extra_width)
        inb = points_in_boxes(kp, big)
        return (inb & bvalid[None, :]).any(-1)

    return jax.vmap(one)(keypoints, gt_boxes, gt_valid).astype(jnp.float32)


def point_cls_loss(logits, labels, valid=None):
    """Focal BCE averaged over (valid) keypoints (pcdet point seg loss)."""
    p = jax.nn.sigmoid(logits)
    pt = labels * p + (1 - labels) * (1 - p)
    alpha_w = labels * 0.25 + (1 - labels) * 0.75
    bce = (
        jnp.maximum(logits, 0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    loss = alpha_w * (1 - pt) ** 2 * bce
    if valid is not None:
        return (loss * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    return loss.mean()
