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


def _rect_intersection_area_clip(corners_a, corners_b):
    """Intersection area via Sutherland-Hodgman clipping (reference
    implementation; uses scatters — kept for cross-validation in tests)."""
    poly = jnp.zeros((_MAXV, 2), corners_a.dtype).at[:4].set(corners_a)
    count = jnp.int32(4)
    for k in range(4):
        a = corners_b[k]
        b = corners_b[(k + 1) % 4]
        poly, count = _clip_by_halfplane(poly, count, a, b)
    return _poly_area(poly, count)


def _point_in_quad(pts, quad):
    """pts (..., 2) inside CCW quad (4, 2) -> bool (...,).

    Uses signed DISTANCE to each edge with a small metric tolerance so
    exactly-coincident boxes (corners on the boundary) stay robust under
    f32 noise — near-duplicate boxes must score IoU ~1 for NMS."""
    inside = True
    for k in range(4):
        a = quad[k]
        d = quad[(k + 1) % 4] - a
        cross = d[0] * (pts[..., 1] - a[1]) - d[1] * (pts[..., 0] - a[0])
        dist = cross / jnp.maximum(jnp.sqrt(d[0] ** 2 + d[1] ** 2), _EPS)
        inside = inside & (dist >= -1e-4)
    return inside


def _edge_clip_contribution(p0, p1, quad, tol):
    """Green's-theorem contribution of edge p0->p1 clipped to inside `quad`.

    The edge portion inside the convex quad is a parametric interval
    [t_lo, t_hi] found by clipping against the 4 half-planes (branch-free).
    Its boundary-integral contribution to the intersection area is
    0.5 * cross(q(t_lo), q(t_hi)). p0/p1 (..., 2); quad (4, 2).
    """
    d = p1 - p0
    t_lo = jnp.zeros(p0.shape[:-1])
    t_hi = jnp.ones(p0.shape[:-1])
    inside_all = True
    for k in range(4):
        a = quad[k]
        e = quad[(k + 1) % 4] - a
        inv_len = jax.lax.rsqrt(jnp.maximum(e[0] ** 2 + e[1] ** 2, _EPS))
        # signed DISTANCE f(t) = c0 + t*(c1-c0); inside iff f >= -tol.
        # Normalizing by |e| makes tol a metric distance, so coincident
        # boundaries stay robust to f32 rounding at large coordinates.
        c0 = (e[0] * (p0[..., 1] - a[1]) - e[1] * (p0[..., 0] - a[0])) * inv_len
        c1 = (e[0] * (p1[..., 1] - a[1]) - e[1] * (p1[..., 0] - a[0])) * inv_len
        slope = c1 - c0
        tc = -(c0 + tol) / jnp.where(jnp.abs(slope) < _EPS, _EPS, slope)
        # slope > 0: constraint activates below tc (entry); slope < 0: exit
        t_lo = jnp.where(slope > 0, jnp.maximum(t_lo, tc), t_lo)
        t_hi = jnp.where(slope < 0, jnp.minimum(t_hi, tc), t_hi)
        # parallel edge: inside only if c >= -tol everywhere
        inside_all = inside_all & jnp.where(
            jnp.abs(slope) < _EPS, c0 >= -tol, True
        )
    ok = inside_all & (t_hi > t_lo)
    q0 = p0 + t_lo[..., None] * d
    q1 = p0 + t_hi[..., None] * d
    contrib = 0.5 * (q0[..., 0] * q1[..., 1] - q1[..., 0] * q0[..., 1])
    return jnp.where(ok, contrib, 0.0)


def _rect_intersection_area(corners_a, corners_b):
    """Intersection area of two CCW rectangles, each (4, 2).

    Branch-free Green's-theorem formulation: the boundary of A∩B consists of
    sub-segments of A's edges inside B and of B's edges inside A; each
    sub-segment is found by parametric clipping against 4 half-planes and
    contributes 0.5*cross(start, end) to the shoelace sum. No sorts, no
    scatters — pure VPU math, which is what makes the (K x K) NMS IoU matrix
    cheap on TPU. Coincident boundaries are counted once via an asymmetric
    tolerance (A edges inclusive, B edges exclusive).
    """
    a0 = corners_a
    a1 = jnp.roll(corners_a, -1, axis=0)
    b0 = corners_b
    b1 = jnp.roll(corners_b, -1, axis=0)
    tol = 1e-4  # meters; must exceed f32 cross-product noise at ~100 m coords
    area = (
        _edge_clip_contribution(a0, a1, corners_b, tol).sum()
        + _edge_clip_contribution(b0, b1, corners_a, -tol).sum()
    )
    return jnp.maximum(area, 0.0)


def _rect_intersection_area_sortbased(corners_a, corners_b):
    """Intersection area of two CCW rectangles, each (4, 2).

    Alternative scatter-free formulation (same math as the reference CUDA
    kernel iou3d_nms_kernel.cu box_overlap): collect the 16 edge-pair
    intersection points + 8 contained corners with validity masks, sort by
    angle around the valid-point centroid, shoelace. Kept for
    cross-validation.
    """
    # edge-pair intersections: A edge k = a0->a1, B edge m = b0->b1
    a0 = corners_a                       # (4, 2)
    a1 = jnp.roll(corners_a, -1, axis=0)
    b0 = corners_b
    b1 = jnp.roll(corners_b, -1, axis=0)

    r = (a1 - a0)[:, None, :]            # (4, 1, 2)
    s = (b1 - b0)[None, :, :]            # (1, 4, 2)
    qp = b0[None, :, :] - a0[:, None, :]  # (4, 4, 2)
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    denom = jnp.where(jnp.abs(rxs) < _EPS, _EPS, rxs)
    t = qpxs / denom
    u = qpxr / denom
    inter_ok = (
        (jnp.abs(rxs) > _EPS)
        & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    )
    inter_pts = a0[:, None, :] + t[..., None] * r  # (4, 4, 2)

    # contained corners
    a_in_b = _point_in_quad(corners_a, corners_b)  # (4,)
    b_in_a = _point_in_quad(corners_b, corners_a)  # (4,)

    pts = jnp.concatenate(
        [inter_pts.reshape(16, 2), corners_a, corners_b], axis=0
    )  # (24, 2)
    ok = jnp.concatenate([inter_ok.reshape(16), a_in_b, b_in_a])

    num = jnp.maximum(ok.sum(), 1)
    centroid = jnp.where(ok[:, None], pts, 0.0).sum(0) / num
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(ok, ang, 1e9)  # invalid points sort last
    order = jnp.argsort(ang)
    sp = pts[order]
    sok = ok[order]

    # shoelace over the valid ring: next valid vertex is the next slot,
    # wrapping to slot 0 (valid slots are contiguous after the sort)
    idx = jnp.arange(24)
    nxt = jnp.where(idx + 1 >= ok.sum(), 0, idx + 1)
    nx = sp[nxt]
    cross = sp[:, 0] * nx[:, 1] - nx[:, 0] * sp[:, 1]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(sok, cross, 0.0)))
    return jnp.where(ok.sum() >= 3, area, 0.0)


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
    The chunk loop is unrolled in Python (static trip count) — a lax.map
    here changed fusion enough to flip boundary-tolerance decisions for
    coincident boxes on some backends.
    """
    n = boxes_a.shape[0]
    assert n % chunk == 0, f"pad N={n} to a multiple of {chunk}"
    outs = [
        iou_bev(boxes_a[i * chunk:(i + 1) * chunk], boxes_b)
        for i in range(n // chunk)
    ]
    return jnp.concatenate(outs, axis=0)
