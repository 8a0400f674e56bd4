"""ROI grid pooling ops (Voxel R-CNN second stage).

Replaces pcdet's voxel_query CUDA op + dense voxel2pinds hash grid
(VoxelRCNN/pcdet/ops/pointnet2/pointnet2_stack/voxel_query_gpu.cu,
voxel_query_utils.py, used by voxelrcnn_head.py roi_grid_pool:106-191).

TPU design — two-stage neighbor search instead of a dense hash grid:
  1. per ROI, collect the L nearest voxels within a coarse radius of the ROI
     center (one small k-NN per ROI);
  2. exact ball query of the 6x6x6 ROI grid points against only those L
     local voxels (216 x L distances per ROI).
This bounds memory at (R, G, L) instead of (R*G, N) and keeps everything
dense matmul/top-k work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from df3d.core.boxes import rotate_points_along_z

_BIG = 1e10


def roi_grid_points(rois: jax.Array, grid_size: int) -> jax.Array:
    """Dense grid points inside each ROI (voxelrcnn_head get_global_grid_points_of_roi).

    rois (R, 7) -> (R, grid_size^3, 3) world-frame points.
    """
    g = grid_size
    idx = jnp.stack(
        jnp.meshgrid(jnp.arange(g), jnp.arange(g), jnp.arange(g), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3).astype(jnp.float32)  # (G, 3) in x,y,z order
    local = (idx + 0.5) / g - 0.5  # [-0.5, 0.5)
    pts = local[None] * rois[:, None, 3:6]  # (R, G, 3)
    pts = rotate_points_along_z(pts, rois[:, 6])
    return pts + rois[:, None, :3]


def collect_local_voxels(
    roi_centers: jax.Array,   # (R, 3)
    voxel_xyz: jax.Array,     # (N, 3)
    voxel_valid: jax.Array,   # (N,)
    coarse_radius: float,
    max_local: int,
):
    """Stage 1: per ROI, indices of the up-to-max_local nearest voxels within
    coarse_radius. Returns (idx (R, L), mask (R, L))."""
    d2 = jnp.sum((roi_centers[:, None] - voxel_xyz[None]) ** 2, axis=-1)
    d2 = jnp.where(voxel_valid[None], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, max_local)
    mask = -neg <= coarse_radius * coarse_radius
    return idx.astype(jnp.int32), mask


def grid_ball_query(
    grid_pts: jax.Array,     # (R, G, 3)
    voxel_xyz: jax.Array,    # (N, 3)
    local_idx: jax.Array,    # (R, L)
    local_mask: jax.Array,   # (R, L)
    radius: float,
    nsample: int,
):
    """Stage 2: first-nsample (by local order) neighbors within radius.

    Returns (idx (R, G, nsample) into the FULL voxel array, mask)."""
    local_xyz = voxel_xyz[local_idx]  # (R, L, 3)
    d2 = jnp.sum(
        (grid_pts[:, :, None, :] - local_xyz[:, None, :, :]) ** 2, axis=-1
    )  # (R, G, L)
    within = (d2 <= radius * radius) & local_mask[:, None, :]
    l = local_xyz.shape[1]
    rank = jnp.where(within, jnp.arange(l)[None, None, :], l)
    neg, sel = jax.lax.top_k(-rank, nsample)  # first-nsample by local order
    found = -neg < l
    sel = jnp.where(found, sel, sel[..., :1])
    idx = jnp.take_along_axis(
        local_idx[:, None, :].repeat(grid_pts.shape[1], 1), sel, axis=-1
    )
    return idx.astype(jnp.int32), found


def points_in_rois(points: jax.Array, rois: jax.Array) -> jax.Array:
    """(N, 3) x (R, 7) -> bool (N, R) (roipoint_pool3d membership test)."""
    from df3d.core.boxes import points_in_boxes

    return points_in_boxes(points, rois)
