"""3D box geometry, pure JAX.

Internal box convention (everywhere in df3d): 7-dof
``(cx, cy, cz, dx, dy, dz, heading)`` with ``cz`` the gravity center and
``heading`` the CCW rotation around +z in radians (x-forward at heading 0).
Optionally trailing dims (velocity vx, vy) ride along untouched.

This matches the OpenPCDet convention used throughout the reference
(see reference VoxelRCNN/pcdet/utils/box_utils.py and
CenterPoint/det3d/core/bbox/box_np_ops.py for the equivalent torch/numpy
routines). Converters for bottom-center conventions live here too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rotation_matrix_z(angle: jax.Array) -> jax.Array:
    """Batched 3x3 rotation matrices around +z. angle: (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    rot = jnp.stack(
        [c, -s, zero, s, c, zero, zero, zero, one], axis=-1
    ).reshape(*angle.shape, 3, 3)
    return rot


def rotate_points_along_z(points: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate points CCW around +z.

    points: (..., N, 3+F)   angle: (...,) broadcastable batch of angles.
    Equivalent of reference common_utils.rotate_points_along_z
    (VoxelRCNN/pcdet/utils/common_utils.py).
    """
    rot = rotation_matrix_z(angle)  # (..., 3, 3)
    xyz = points[..., :3]
    # row-vector convention: p' = p @ R^T  <=> (R @ p^T)^T
    rotated = jnp.einsum("...ij,...nj->...ni", rot, xyz)
    return jnp.concatenate([rotated, points[..., 3:]], axis=-1)


# numpy (not jnp): a module-level jnp array would initialize the default
# jax backend at import time (dials the remote TPU relay on this image)
_CORNER_SIGNS = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
)  # (8, 3) order matches pcdet boxes_to_corners_3d


def boxes_to_corners_3d(boxes: jax.Array) -> jax.Array:
    """(..., 7) -> (..., 8, 3) corner points.

    Corner order matches reference box_utils.boxes_to_corners_3d: 4 bottom
    corners then 4 top, starting at (+x, +y).
    """
    dims = boxes[..., 3:6]
    corners = 0.5 * dims[..., None, :] * _CORNER_SIGNS  # (..., 8, 3)
    corners = rotate_points_along_z(corners, boxes[..., 6])
    return corners + boxes[..., None, :3]


def boxes_bev_corners(boxes: jax.Array) -> jax.Array:
    """(..., 7) -> (..., 4, 2) BEV rectangle corners (CCW)."""
    dx, dy = boxes[..., 3], boxes[..., 4]
    signs = jnp.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    local = 0.5 * signs * jnp.stack([dx, dy], axis=-1)[..., None, :]
    c, s = jnp.cos(boxes[..., 6]), jnp.sin(boxes[..., 6])
    x = local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
    y = local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
    return jnp.stack([x, y], axis=-1) + boxes[..., None, :2]


def points_in_boxes(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """Point-in-rotated-box test. points (N, 3), boxes (M, 7) -> bool (N, M).

    TPU-native replacement for the reference roiaware_pool3d CUDA
    points-in-box kernel (VoxelRCNN/pcdet/ops/roiaware_pool3d): translate to
    box frame, rotate by -heading, axis-aligned test.
    """
    rel = points[:, None, :3] - boxes[None, :, :3]  # (N, M, 3)
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    lx = rel[..., 0] * c[None] - rel[..., 1] * s[None]
    ly = rel[..., 0] * s[None] + rel[..., 1] * c[None]
    lz = rel[..., 2]
    half = 0.5 * boxes[:, 3:6]  # (M, 3)
    return (
        (jnp.abs(lx) <= half[None, :, 0])
        & (jnp.abs(ly) <= half[None, :, 1])
        & (jnp.abs(lz) <= half[None, :, 2])
    )


def mask_boxes_outside_range(boxes: jax.Array, limit_range, min_num_corners: int = 1) -> jax.Array:
    """bool (N,): keep boxes with >= min_num_corners BEV corners in range.

    Mirrors reference box_utils.mask_boxes_outside_range_numpy.
    """
    limit = jnp.asarray(limit_range, jnp.float32)
    corners = boxes_bev_corners(boxes)  # (N, 4, 2)
    inside = (
        (corners[..., 0] >= limit[0]) & (corners[..., 0] <= limit[3])
        & (corners[..., 1] >= limit[1]) & (corners[..., 1] <= limit[4])
    )
    return inside.sum(axis=-1) >= min_num_corners


def mask_points_by_range(points: jax.Array, limit_range) -> jax.Array:
    limit = jnp.asarray(limit_range, jnp.float32)
    return (
        (points[..., 0] >= limit[0]) & (points[..., 0] <= limit[3])
        & (points[..., 1] >= limit[1]) & (points[..., 1] <= limit[4])
        & (points[..., 2] >= limit[2]) & (points[..., 2] <= limit[5])
    )


def limit_period(val: jax.Array, offset: float = 0.5, period: float = jnp.pi) -> jax.Array:
    """Wrap angle into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period


def boxes3d_lidar_to_bottom_center(boxes: jax.Array) -> jax.Array:
    """Gravity-center z -> bottom-center z (mmdet3d LiDARInstance3DBoxes store)."""
    return boxes.at[..., 2].add(-0.5 * boxes[..., 5])


def boxes3d_bottom_center_to_lidar(boxes: jax.Array) -> jax.Array:
    return boxes.at[..., 2].add(0.5 * boxes[..., 5])


def enlarge_box3d(boxes: jax.Array, extra_width) -> jax.Array:
    """Grow dims by extra_width (dx, dy, dz); used by gt-sampling collision
    tests and ROI pooling (reference box_utils.enlarge_box3d)."""
    extra = jnp.asarray(extra_width, jnp.float32)
    return boxes.at[..., 3:6].add(extra)
