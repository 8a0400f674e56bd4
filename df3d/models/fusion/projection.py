"""Voxel <-> image projection utilities for the fusion layers, on device.

Equivalents of:
  * pcdet point_fusion projection with aug-inverse
    (VoxelRCNN/pcdet/models/backbones_3d/spconv_backbone.py:692-756)
  * det3d Point2ImageProjection (CenterPoint/det3d/models/fusion/
    point_to_image_projection.py:17-231: grid_to_lidar, lidar->cam->image,
    in-frustum masks)
  * pts2img feature splat (attentions.py:192-214)
  * grid-sample image gather (mmdet3d point_fusion.point_sample)

All static shapes; invalid voxels masked, never dropped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from df3d.core.calib import (
    augmented_lidar_to_raw, project_to_image, voxel_centers_from_coords,
)


def project_voxels_to_image(
    coords_zyx: jax.Array,   # (B, N, 3) int voxel coords at this stride
    valid: jax.Array,        # (B, N)
    proj: jax.Array,         # (B, 3, 4) or (B, n_cam, 3, 4) lidar->img
    image_shape: tuple,      # (H, W) of the ORIGINAL image
    voxel_size, pc_range, downsample: int,
    noise_rot=None, noise_scale=None, flip_x=None, flip_y=None,
):
    """Returns (uv_norm (..., N, 2) in [0,1], depth (..., N), mask (..., N)).

    If proj has a camera axis, outputs broadcast to (B, n_cam, N, ...).
    """
    centers = voxel_centers_from_coords(coords_zyx, voxel_size, pc_range, downsample)
    centers = augmented_lidar_to_raw(
        centers,
        noise_rot=_col(noise_rot), noise_scale=_col(noise_scale),
        flip_x=_col(flip_x), flip_y=_col(flip_y),
    )
    h, w = image_shape
    if proj.ndim == 4:  # multi-camera: (B, n_cam, 3, 4)
        centers = centers[:, None]  # (B, 1, N, 3)
        valid = valid[:, None]
    uv, depth = project_to_image(proj, centers)
    uv_norm = uv / jnp.asarray([w, h], jnp.float32)
    in_img = (
        (uv_norm[..., 0] >= 0.0) & (uv_norm[..., 0] < 1.0)
        & (uv_norm[..., 1] >= 0.0) & (uv_norm[..., 1] < 1.0)
        & (depth > 0.1) & valid
    )
    return uv_norm, depth, in_img


def _col(x):
    """Broadcast per-sample scalars over the voxel axis."""
    return None if x is None else x[:, None]


def sample_image_features(
    img_feats: jax.Array,  # (B, H, W, C)
    uv_norm: jax.Array,    # (B, N, 2) normalized [0,1]
    mask: jax.Array,       # (B, N)
) -> jax.Array:
    """Bilinear sample (grid_sample align_corners=False, zeros padding)
    -> (B, N, C)."""
    b, h, w, c = img_feats.shape
    px = uv_norm[..., 0] * w - 0.5
    py = uv_norm[..., 1] * h - 0.5
    x0, y0 = jnp.floor(px), jnp.floor(py)
    dx, dy = px - x0, py - y0

    out = 0.0
    for cx, cy, cw in (
        (x0, y0, (1 - dx) * (1 - dy)),
        (x0 + 1, y0, dx * (1 - dy)),
        (x0, y0 + 1, (1 - dx) * dy),
        (x0 + 1, y0 + 1, dx * dy),
    ):
        inb = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        xi = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
        flat = yi * w + xi
        g = jax.vmap(lambda v, i: v[i])(img_feats.reshape(b, h * w, c), flat)
        out = out + g * (cw * inb)[..., None]
    return out * mask[..., None]


def splat_to_image(
    uv_norm: jax.Array,   # (B, N, 2)
    feats: jax.Array,     # (B, N, C)
    mask: jax.Array,      # (B, N)
    out_shape: tuple,     # (H, W)
) -> jax.Array:
    """Nearest-pixel scatter of voxel features onto an image grid
    (attentions.pts2img: last write wins; padded rows dropped) -> (B,H,W,C)."""
    h, w = out_shape
    c = feats.shape[-1]
    xi = (uv_norm[..., 0] * w).astype(jnp.int32)
    yi = (uv_norm[..., 1] * h).astype(jnp.int32)
    ok = mask & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    flat = jnp.where(ok, yi * w + xi, h * w)

    def one(fi, ff):
        grid = jnp.zeros((h * w + 1, c), ff.dtype)
        return grid.at[fi].set(ff, mode="drop")[: h * w].reshape(h, w, c)

    return jax.vmap(one)(flat, feats)
