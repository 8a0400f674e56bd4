"""Detection losses, pure JAX.

Semantics match the reference implementations (fresh code):
  * fast_focal_loss / reg_l1_loss — CenterPoint/det3d/models/losses/
    centernet_loss.py:6-53 (CornerNet focal with gaussian-weighted negatives,
    masked L1 at peak indices)
  * sigmoid_focal_loss / weighted_smooth_l1 — VoxelRCNN/pcdet/utils/
    loss_utils.py (SigmoidFocalClassificationLoss, WeightedSmoothL1Loss)
  * gaussian_focal_loss — mmdet GaussianFocalLoss used by TransFusionHead
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clamped_sigmoid(x: jax.Array, eps: float = 1e-4) -> jax.Array:
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)


def fast_focal_loss(
    pred: jax.Array,      # (B, H*W, C) probabilities (already sigmoided)
    target: jax.Array,    # (B, H*W, C) gaussian heatmap
    ind: jax.Array,       # (B, M) flat peak indices
    mask: jax.Array,      # (B, M) bool
    cat: jax.Array,       # (B, M) class ids
) -> jax.Array:
    neg = jnp.log(1 - pred) * pred**2 * (1 - target) ** 4
    neg_loss = neg.sum()

    pos_pred = jnp.take_along_axis(
        jnp.take_along_axis(pred, ind[..., None], axis=1),  # (B, M, C)
        cat[..., None], axis=2,
    )[..., 0]  # (B, M)
    num_pos = mask.sum().astype(pred.dtype)
    pos_loss = (jnp.log(pos_pred) * (1 - pos_pred) ** 2 * mask).sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_l1_loss(
    pred_map: jax.Array,  # (B, H*W, C) regression map
    ind: jax.Array,       # (B, M)
    mask: jax.Array,      # (B, M) bool
    target: jax.Array,    # (B, M, C)
) -> jax.Array:
    """Masked L1 at peaks, per-channel sum / num_pos -> (C,)."""
    pred = jnp.take_along_axis(pred_map, ind[..., None], axis=1)  # (B, M, C)
    m = mask.astype(pred.dtype)[..., None]
    loss = jnp.abs(pred * m - target * m) / (m.sum() + 1e-4)
    return loss.sum(axis=(0, 1))


def sigmoid_focal_loss(
    logits: jax.Array, targets: jax.Array, weights: jax.Array,
    alpha: float = 0.25, gamma: float = 2.0,
) -> jax.Array:
    """Per-element focal loss x weights (pcdet SigmoidFocalClassificationLoss).

    targets are one-hot {0,1}; weights broadcast over the class dim.
    """
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1 - p) + (1 - targets) * p
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = alpha_w * pt**gamma * bce
    return loss * weights[..., None] if weights.ndim == loss.ndim - 1 else loss * weights


def weighted_smooth_l1(
    pred: jax.Array, target: jax.Array, weights: jax.Array,
    beta: float = 1.0 / 9.0, code_weights=None,
) -> jax.Array:
    """Per-element smooth-L1 x weights (pcdet WeightedSmoothL1Loss)."""
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights)
    n = jnp.abs(diff)
    loss = jnp.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)
    return loss * weights[..., None] if weights.ndim == loss.ndim - 1 else loss * weights


def gaussian_focal_loss(
    pred: jax.Array, target: jax.Array, alpha: float = 2.0, gamma: float = 4.0,
) -> jax.Array:
    """mmdet GaussianFocalLoss (per-element): pos where target==1."""
    eps = 1e-12
    pos_w = (target == 1).astype(pred.dtype)
    neg_w = (1 - target) ** gamma
    pos = -jnp.log(pred + eps) * (1 - pred) ** alpha * pos_w
    neg = -jnp.log(1 - pred + eps) * pred**alpha * neg_w * (1 - pos_w)
    return pos + neg


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.abs(pred - target)
