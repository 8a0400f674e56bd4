"""Double-flip test-time augmentation (det3d CenterPoint TTA).

Equivalent of the reference's double_flip path
(CenterPoint/det3d/models/bbox_heads/center_head.py:327-423 and
Point2ImageProjection double-flip handling): each sample is evaluated as
[identity, flip-y, flip-x, flip-both]; head maps are un-flipped and
averaged before decoding. On TPU this is just a batch-dim x4 reshape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_points_double_flip(points: jax.Array) -> jax.Array:
    """(B, P, F) -> (B*4, P, F) with [id, flip_y, flip_x, flip_both].

    flip_y negates y; flip_x negates x (matching det3d naming where
    'double_flip' flips along both BEV axes)."""
    p0 = points
    py = points.at[..., 1].multiply(-1.0)
    px = points.at[..., 0].multiply(-1.0)
    pxy = points.at[..., 0].multiply(-1.0).at[..., 1].multiply(-1.0)
    return jnp.concatenate(
        [p0[:, None], py[:, None], px[:, None], pxy[:, None]], axis=1
    ).reshape(-1, *points.shape[1:])


def expand_proj_double_flip(proj: jax.Array) -> jax.Array:
    """(B, [n_cam,] 3, 4) -> (B*4, [n_cam,] 3, 4): compose the lidar-frame
    reflection into the lidar->image matrices so the FLIPPED points project
    onto the UNCHANGED camera images — P' @ (F @ x) == P @ x with F the
    per-variant reflection. This is how fused models ride the det3d
    double-flip TTA (the reference tracks pcd_*_flip in img_metas and
    un-flips inside the projection, mmdet3d loading.py/point_fusion):
    variant order matches expand_points_double_flip."""
    mats = []
    for sx, sy in ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)):
        f = jnp.diag(jnp.asarray([sx, sy, 1.0, 1.0], proj.dtype))
        mats.append(proj @ f)
    return jnp.stack(mats, axis=1).reshape(-1, *proj.shape[1:])


def expand_images_double_flip(images: jax.Array) -> jax.Array:
    """(B, ...) -> (B*4, ...): images are IDENTICAL across the four lidar
    flip variants (the cameras never move); repeat sample-major to align
    with expand_points_double_flip's layout."""
    return jnp.repeat(images, 4, axis=0)


def merge_center_head_maps(preds: list[dict]) -> list[dict]:
    """Un-flip and average CenterHead maps predicted on a (B*4, H, W, C)
    batch -> (B, H, W, C) per task. Maps are channel-last."""
    merged = []
    for task in preds:
        out = {}
        for name, m in task.items():
            b4 = m.shape[0]
            m = m.reshape(b4 // 4, 4, *m.shape[1:])
            m0 = m[:, 0]
            # flip_y: BEV y axis is the H dim; un-flip rows
            m1 = m[:, 1, ::-1, :]
            m2 = m[:, 2, :, ::-1]
            m3 = m[:, 3, ::-1, ::-1]
            if name == "reg":
                m1 = m1.at[..., 1].multiply(-1.0)
                m2 = m2.at[..., 0].multiply(-1.0)
                m3 = m3.at[..., 0].multiply(-1.0).at[..., 1].multiply(-1.0)
            elif name == "rot":  # (sin, cos)
                m1 = m1.at[..., 0].multiply(-1.0)  # sin(-r) for y flip
                m2 = m2.at[..., 0].multiply(-1.0).at[..., 1].multiply(-1.0)
                m3 = m3.at[..., 1].multiply(-1.0)
            elif name == "vel":
                m1 = m1.at[..., 1].multiply(-1.0)
                m2 = m2.at[..., 0].multiply(-1.0)
                m3 = m3.at[..., 0].multiply(-1.0).at[..., 1].multiply(-1.0)
            out[name] = (m0 + m1 + m2 + m3) / 4.0
        merged.append(out)
    return merged
