"""Rotated-box IoU, pure JAX (vectorized polygon clipping).

TPU-native replacement for the reference CUDA rotated-overlap kernels
(VoxelRCNN/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu `boxes_overlap_bev`,
TransFusion/mmdet3d/ops/iou3d/src/iou3d_kernel.cu). Intersection of two
rotated BEV rectangles via Sutherland–Hodgman clipping with static-size
vertex buffers (4 clip planes, <=8 vertices), fully vectorized — no
data-dependent shapes, so it jits and tiles cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import boxes_bev_corners

_MAXV = 8  # convex quad clipped by 4 half-planes has <= 8 vertices
_EPS = 1e-8


def _clip_by_halfplane(poly, count, a, b):
    """Clip polygon (poly (_MAXV,2), count scalar) by half-plane left of a->b.

    Returns new (poly, count). Vertices at slots >= count are ignored.
    """
    idx = jnp.arange(_MAXV)
    valid = idx < count
    nxt_idx = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = poly
    nxt = poly[nxt_idx]

    d = b - a
    side_cur = d[0] * (cur[:, 1] - a[1]) - d[1] * (cur[:, 0] - a[0])
    side_nxt = d[0] * (nxt[:, 1] - a[1]) - d[1] * (nxt[:, 0] - a[0])
    in_cur = side_cur >= 0
    in_nxt = side_nxt >= 0

    t = side_cur / jnp.where(
        jnp.abs(side_cur - side_nxt) < _EPS, _EPS, side_cur - side_nxt
    )
    inter = cur + t[:, None] * (nxt - cur)

    emit_cur = in_cur & valid
    emit_int = (in_cur ^ in_nxt) & valid

    # slot positions via exclusive cumsum of emitted counts
    counts = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    offs = jnp.cumsum(counts) - counts
    pos_cur = jnp.where(emit_cur, offs, _MAXV)  # _MAXV -> dropped by scatter
    pos_int = jnp.where(emit_int, offs + emit_cur.astype(jnp.int32), _MAXV)

    out = jnp.zeros_like(poly)
    out = out.at[pos_cur].set(cur, mode="drop")
    out = out.at[pos_int].set(inter, mode="drop")
    return out, counts.sum()


def _poly_area(poly, count):
    """Shoelace area of the first `count` CCW vertices."""
    idx = jnp.arange(_MAXV)
    valid = idx < count
    nxt = poly[jnp.where(idx + 1 >= count, 0, idx + 1)]
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def _rect_intersection_area(corners_a, corners_b):
    """Intersection area of two CCW rectangles, each (4, 2)."""
    poly = jnp.zeros((_MAXV, 2), corners_a.dtype).at[:4].set(corners_a)
    count = jnp.int32(4)
    for k in range(4):
        a = corners_b[k]
        b = corners_b[(k + 1) % 4]
        poly, count = _clip_by_halfplane(poly, count, a, b)
    return _poly_area(poly, count)


def overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise rotated BEV intersection area. (N,7),(M,7) -> (N,M)."""
    ca = boxes_bev_corners(boxes_a)  # (N,4,2)
    cb = boxes_bev_corners(boxes_b)  # (M,4,2)
    fn = jax.vmap(jax.vmap(_rect_intersection_area, (None, 0)), (0, None))
    return fn(ca, cb)


def iou_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise rotated BEV IoU. (N,7),(M,7) -> (N,M)."""
    inter = overlap_bev(boxes_a, boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def iou_3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise 3D IoU (gravity-center z). (N,7),(M,7) -> (N,M).

    Matches reference iou3d_nms_utils.boxes_iou3d_gpu semantics.
    """
    inter_bev = overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - 0.5 * boxes_a[:, 5]
    za2 = boxes_a[:, 2] + 0.5 * boxes_a[:, 5]
    zb1 = boxes_b[:, 2] - 0.5 * boxes_b[:, 5]
    zb2 = boxes_b[:, 2] + 0.5 * boxes_b[:, 5]
    overlap_h = jnp.maximum(
        jnp.minimum(za2[:, None], zb2[None, :])
        - jnp.maximum(za1[:, None], zb1[None, :]),
        0.0,
    )
    inter = inter_bev * overlap_h
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    union = vol_a[:, None] + vol_b[None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def iou_nearest_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Axis-aligned BEV IoU after snapping heading to the nearest multiple of
    pi/2 (reference box_utils.boxes3d_nearest_bev_iou, used by the pcdet
    anchor target assigner). (N,7),(M,7) -> (N,M)."""

    def to_aabb(boxes):
        # if heading is closer to +-pi/2, swap dx/dy
        rot = jnp.abs(jnp.sin(boxes[:, 6]))  # ~1 when near +-pi/2
        swap = rot > jnp.sqrt(0.5)
        dx = jnp.where(swap, boxes[:, 4], boxes[:, 3])
        dy = jnp.where(swap, boxes[:, 3], boxes[:, 4])
        return jnp.stack(
            [
                boxes[:, 0] - dx / 2, boxes[:, 1] - dy / 2,
                boxes[:, 0] + dx / 2, boxes[:, 1] + dy / 2,
            ],
            axis=-1,
        )

    aa, bb = to_aabb(boxes_a), to_aabb(boxes_b)
    lt = jnp.maximum(aa[:, None, :2], bb[None, :, :2])
    rb = jnp.minimum(aa[:, None, 2:], bb[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (aa[:, 2] - aa[:, 0]) * (aa[:, 3] - aa[:, 1])
    area_b = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, _EPS)


def iou_bev_chunked(boxes_a: jax.Array, boxes_b: jax.Array, chunk: int = 256) -> jax.Array:
    """Row-chunked pairwise rotated BEV IoU to bound peak memory for large N.

    boxes_a (N,7) with N % chunk == 0 (pad first), boxes_b (M,7) -> (N,M).
    """
    n = boxes_a.shape[0]
    assert n % chunk == 0, f"pad N={n} to a multiple of {chunk}"
    rows = boxes_a.reshape(n // chunk, chunk, boxes_a.shape[-1])
    return jax.lax.map(lambda r: iou_bev(r, boxes_b), rows).reshape(n, -1)
