"""Camera calibration / projection chains, pure JAX (device-resident).

Replaces the reference's host-side projection math — pcdet
calibration_kitti.py (which round-trips to CPU numpy every training step,
spconv_backbone.py:717-718) and the nuScenes quaternion chains
(det3d point_to_image_projection.py, mmdet3d point_fusion.py:551-643).
Here every transform is a precomputed 4x4 (or 3x4) matrix carried in the
batch, so projection stays on device and inside jit.

Augmentation inverse: world-space augs (flip/rot/scale) are recorded by the
pipeline as `noise_*` scalars; `augmented_lidar_to_raw` undoes them before
projecting, mirroring spconv_backbone.py:702-715.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_homogeneous(points: jax.Array) -> jax.Array:
    """(..., N, 3) -> (..., N, 4)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def transform_points(mat: jax.Array, points: jax.Array) -> jax.Array:
    """Apply 4x4 (or batched ...x4x4) transform to (..., N, 3) points."""
    pts = to_homogeneous(points)
    out = jnp.einsum("...ij,...nj->...ni", mat, pts)
    return out[..., :3]


def project_to_image(proj: jax.Array, points: jax.Array):
    """Project (..., N, 3) lidar/cam-frame points with (..., 3, 4) or
    (..., 4, 4) projection matrix; returns ((..., N, 2) pixel uv,
    (..., N) depth)."""
    pts = to_homogeneous(points)
    cam = jnp.einsum("...ij,...nj->...ni", proj[..., :3, :4], pts)
    depth = cam[..., 2]
    uv = cam[..., :2] / jnp.maximum(jnp.abs(depth[..., None]), 1e-6) * jnp.sign(
        depth[..., None]
    )
    return uv, depth


def augmented_lidar_to_raw(
    points: jax.Array,
    noise_rot: jax.Array | None = None,
    noise_scale: jax.Array | None = None,
    flip_x: jax.Array | None = None,
    flip_y: jax.Array | None = None,
) -> jax.Array:
    """Undo world augmentations so points line up with the un-augmented
    camera frame. The pipeline applies flip -> rotation -> scaling
    (p' = s * R * F * p), so the inverse runs scale-undo, rotation-undo,
    flip-undo — the same order as reference spconv_backbone.py:702-715.
    Scalars broadcast per-sample.
    """
    xyz = points[..., :3]
    if noise_scale is not None:
        xyz = xyz / jnp.maximum(noise_scale, 1e-6)
    if noise_rot is not None:
        c, s = jnp.cos(-noise_rot), jnp.sin(-noise_rot)
        x = xyz[..., 0] * c - xyz[..., 1] * s
        y = xyz[..., 0] * s + xyz[..., 1] * c
        xyz = jnp.stack([x, y, xyz[..., 2]], axis=-1)
    if flip_x is not None:  # random_world_flip along x axis: y was negated
        xyz = xyz.at[..., 1].multiply(jnp.where(flip_x, -1.0, 1.0))
    if flip_y is not None:  # flip along y axis: x was negated
        xyz = xyz.at[..., 0].multiply(jnp.where(flip_y, -1.0, 1.0))
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def kitti_projection_matrix(P2: jax.Array, R0: jax.Array, V2C: jax.Array) -> jax.Array:
    """Compose KITTI calib into one lidar->image 3x4 (calibration_kitti.py
    lidar_to_img chain: x_img = P2 @ R0_ext @ V2C_ext @ x_lidar)."""
    r0 = jnp.eye(4).at[:3, :3].set(R0)
    v2c = jnp.eye(4).at[:3, :4].set(V2C)
    p2 = jnp.eye(4).at[:3, :4].set(P2)
    return (p2 @ r0 @ v2c)[:3]


def voxel_centers_from_coords(
    coords_zyx: jax.Array,
    voxel_size,
    pc_range,
    downsample: int = 1,
) -> jax.Array:
    """Sparse (N, 3) int voxel coords (z, y, x) at a given stride -> metric
    center xyz. Mirrors det3d grid_to_lidar (point_to_image_projection.py:43)
    and mmdet3d coor2pts (sparse_encoder.py:309)."""
    vs = jnp.asarray(voxel_size, jnp.float32) * downsample
    origin = jnp.asarray(pc_range[:3], jnp.float32)
    xyz_idx = coords_zyx[..., ::-1].astype(jnp.float32)  # z,y,x -> x,y,z
    return xyz_idx * vs + origin + 0.5 * vs
