import jax.numpy as jnp
import numpy as np

from df3d.core import iou as IOU


def _mc_rect_iou(box_a, box_b, n=400_000, seed=0):
    """Monte-Carlo rotated BEV IoU reference (independent of the impl)."""

    def inside(pts, box):
        rel = pts - box[:2]
        c, s = np.cos(-box[6]), np.sin(-box[6])
        lx = rel[:, 0] * c - rel[:, 1] * s
        ly = rel[:, 0] * s + rel[:, 1] * c
        return (np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)

    rng = np.random.RandomState(seed)
    lo = np.minimum(box_a[:2] - box_a[3:5].max(), box_b[:2] - box_b[3:5].max())
    hi = np.maximum(box_a[:2] + box_a[3:5].max(), box_b[:2] + box_b[3:5].max())
    pts = rng.uniform(lo, hi, (n, 2))
    ina, inb = inside(pts, box_a), inside(pts, box_b)
    inter = (ina & inb).mean()
    union = (ina | inb).mean()
    return inter / max(union, 1e-9)


def test_identical_boxes():
    boxes = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.7]])
    got = np.asarray(IOU.iou_bev(boxes, boxes))
    np.testing.assert_allclose(got, [[1.0]], atol=1e-5)
    got3d = np.asarray(IOU.iou_3d(boxes, boxes))
    np.testing.assert_allclose(got3d, [[1.0]], atol=1e-5)


def test_disjoint_boxes():
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[10.0, 0.0, 0.0, 2.0, 2.0, 2.0, 1.0]])
    assert float(IOU.iou_bev(a, b)[0, 0]) == 0.0


def test_axis_aligned_analytic():
    a = jnp.array([[0.0, 0.0, 0.0, 4.0, 4.0, 2.0, 0.0]])
    b = jnp.array([[2.0, 2.0, 0.0, 4.0, 4.0, 2.0, 0.0]])
    # inter = 2x2=4, union = 16+16-4=28
    np.testing.assert_allclose(float(IOU.iou_bev(a, b)[0, 0]), 4 / 28, atol=1e-5)


def test_rotated_vs_monte_carlo():
    rng = np.random.RandomState(42)
    boxes_a = np.stack(
        [
            rng.uniform(-2, 2, 8), rng.uniform(-2, 2, 8), np.zeros(8),
            rng.uniform(1, 5, 8), rng.uniform(1, 5, 8), np.ones(8),
            rng.uniform(-np.pi, np.pi, 8),
        ],
        axis=-1,
    ).astype(np.float32)
    boxes_b = np.stack(
        [
            rng.uniform(-2, 2, 8), rng.uniform(-2, 2, 8), np.zeros(8),
            rng.uniform(1, 5, 8), rng.uniform(1, 5, 8), np.ones(8),
            rng.uniform(-np.pi, np.pi, 8),
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(IOU.iou_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(8):
        ref = _mc_rect_iou(boxes_a[i], boxes_b[i], seed=i)
        assert abs(got[i, i] - ref) < 0.015, (i, got[i, i], ref)


def test_z_overlap_3d():
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    # bev inter = 4, z overlap = 1 -> inter=4; vols 8+8-4=12
    np.testing.assert_allclose(float(IOU.iou_3d(a, b)[0, 0]), 4 / 12, atol=1e-5)


def test_nearest_bev_iou_snaps_heading():
    a = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.05]])
    b = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 2 - 0.05]])
    # a snaps to 0 (4x2 box), b snaps to pi/2 (2x4 box): inter=2x2=4, union=12
    np.testing.assert_allclose(
        float(IOU.iou_nearest_bev(a, b)[0, 0]), 4 / 12, atol=1e-5
    )


def test_chunked_matches_direct():
    rng = np.random.RandomState(1)
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(-5, 5, 512), rng.uniform(-5, 5, 512), np.zeros(512),
                rng.uniform(1, 4, 512), rng.uniform(1, 4, 512), np.ones(512),
                rng.uniform(-np.pi, np.pi, 512),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    direct = np.asarray(IOU.iou_bev(boxes[:32], boxes[:64]))
    chunked = np.asarray(IOU.iou_bev_chunked(boxes, boxes[:64], chunk=256))
    np.testing.assert_allclose(chunked[:32], direct, atol=1e-5)


def test_scatterless_matches_clipping_impl():
    """The production (scatter-free) intersection must match the
    Sutherland-Hodgman reference implementation."""
    import jax

    from df3d.core.boxes import boxes_bev_corners
    from df3d.core.iou import _rect_intersection_area, _rect_intersection_area_clip

    rng = np.random.RandomState(7)
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(-3, 3, 64), rng.uniform(-3, 3, 64), np.zeros(64),
                rng.uniform(0.5, 5, 64), rng.uniform(0.5, 5, 64), np.ones(64),
                rng.uniform(-np.pi, np.pi, 64),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    ca = boxes_bev_corners(boxes[:32])
    cb = boxes_bev_corners(boxes[32:])
    fast = jax.vmap(_rect_intersection_area)(ca, cb)
    ref = jax.vmap(_rect_intersection_area_clip)(ca, cb)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-3)
