"""Device-side NMS with static shapes.

Replaces the reference bitmask CUDA NMS (VoxelRCNN/pcdet/ops/iou3d_nms
`nms_gpu`, CenterPoint rotate_nms_pcdet, TransFusion/mmdet3d/ops/iou3d) and
the numba circle NMS (CenterPoint/det3d/core/utils/circle_nms_jit.py).

Everything returns fixed-size index buffers + validity masks so downstream
stays jittable. Greedy suppression is a fori_loop over the (sorted)
candidate list using a precomputed pairwise IoU matrix computed in row
chunks to bound memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou import iou_bev_chunked

_NEG_INF = -1e9


def _greedy_suppress(mat: jax.Array, thresh: float) -> jax.Array:
    """Greedy NMS over candidates already sorted by descending score.

    mat: (K, K) pairwise overlap metric. Returns bool keep (K,).
    """
    k = mat.shape[0]

    def body(i, keep):
        keep_i = keep[i]
        suppress = (mat[i] > thresh) & (jnp.arange(k) > i) & keep_i
        return keep & ~suppress

    keep = jnp.ones((k,), bool)
    return jax.lax.fori_loop(0, k, body, keep)


def nms_bev(
    boxes: jax.Array,
    scores: jax.Array,
    thresh: float,
    pre_max_size: int,
    post_max_size: int,
    valid: jax.Array | None = None,
    chunk: int = 256,
):
    """Rotated BEV NMS.

    boxes (N,7), scores (N,) -> (indices (post_max_size,), mask (post_max_size,)).
    Indices point into the ORIGINAL boxes array; mask marks real detections.
    `valid` masks out padding rows of the input.
    """
    scores = jnp.where(valid, scores, _NEG_INF) if valid is not None else scores
    k = min(pre_max_size, boxes.shape[0])
    if k > chunk:
        k = (k // chunk) * chunk  # round down so the chunked IoU tiles evenly
    top_scores, order = jax.lax.top_k(scores, k)
    cand = boxes[order]
    cand_valid = top_scores > _NEG_INF / 2

    if k % chunk == 0 and k > chunk:
        mat = iou_bev_chunked(cand, cand, chunk=chunk)
    else:
        from .iou import iou_bev

        mat = iou_bev(cand, cand)
    keep = _greedy_suppress(mat, thresh) & cand_valid

    # stable-select kept candidates into the first post_max_size slots
    rank = jnp.cumsum(keep) - 1
    pos = jnp.where(keep, rank, post_max_size)
    out_idx = jnp.full((post_max_size,), 0, jnp.int32)
    out_idx = out_idx.at[pos].set(order.astype(jnp.int32), mode="drop")
    out_mask = jnp.arange(post_max_size) < keep.sum()
    return out_idx, out_mask


def nms_circle(
    centers: jax.Array,
    scores: jax.Array,
    min_radius: float,
    post_max_size: int,
    valid: jax.Array | None = None,
):
    """Circle NMS: suppress by center L2^2 distance (CenterPoint alt path).

    centers (N,2), scores (N,) -> (indices, mask) of size post_max_size.

    `min_radius` is the SQUARED-distance threshold, matching the reference
    circle_nms (CenterPoint/det3d/core/utils/circle_nms_jit.py: `dist =
    (x1-x2)**2 + (y1-y2)**2 ... dist <= thresh` with the config's per-class
    min_radius passed directly as `thresh`). Config values like 4/12/0.85
    port over unchanged.
    """
    scores = jnp.where(valid, scores, _NEG_INF) if valid is not None else scores
    order = jnp.argsort(-scores)
    cand = centers[order]
    d2 = jnp.sum((cand[:, None, :] - cand[None, :, :]) ** 2, axis=-1)
    # circle NMS keeps i if no higher-scored kept j within radius
    closeness = jnp.where(d2 <= min_radius, 1.0, 0.0)
    keep = _greedy_suppress(closeness, 0.5) & (scores[order] > _NEG_INF / 2)
    rank = jnp.cumsum(keep) - 1
    pos = jnp.where(keep, rank, post_max_size)
    out_idx = jnp.zeros((post_max_size,), jnp.int32)
    out_idx = out_idx.at[pos].set(order.astype(jnp.int32), mode="drop")
    out_mask = jnp.arange(post_max_size) < keep.sum()
    return out_idx, out_mask


def class_agnostic_nms(
    box_scores: jax.Array,
    box_preds: jax.Array,
    score_thresh: float | None,
    nms_thresh: float,
    pre_max_size: int,
    post_max_size: int,
):
    """pcdet model_nms_utils.class_agnostic_nms equivalent: score threshold,
    then rotated NMS. Returns (indices, mask, scores_out)."""
    valid = (
        box_scores >= score_thresh
        if score_thresh is not None
        else jnp.ones_like(box_scores, bool)
    )
    idx, mask = nms_bev(
        box_preds, box_scores, nms_thresh, pre_max_size, post_max_size, valid=valid
    )
    return idx, mask, box_scores[idx] * mask
