"""Voxel/pillar feature encoders.

Equivalents of the reference VFE family (SURVEY §2.8):
  * MeanVFE / VoxelFeatureExtractorV3 / HardSimpleVFE — mean over points per
    voxel; in df3d this is FUSED into the device voxelizer
    (df3d.ops.voxelize mean pooling), `mean_vfe` is provided for parity.
  * PillarVFE / PillarFeatureNet — per-point augmented features
    (xyz, intensity, cluster offset, center offset) -> linear+BN+ReLU ->
    max-pool per pillar (pcdet pillar_vfe.py, mmdet3d pillar_encoder.py).
  * PointPillarScatter — pillars -> dense BEV canvas
    (mmdet3d middle_encoders/pillar_scatter.py:101).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.models.layers import MaskedBatchNorm


def mean_vfe(point_feats: jax.Array, num_points: jax.Array) -> jax.Array:
    """(V, P, F) raw per-voxel points + (V,) counts -> (V, F) mean."""
    mask = jnp.arange(point_feats.shape[1])[None, :] < num_points[:, None]
    s = jnp.where(mask[..., None], point_feats, 0.0).sum(axis=1)
    return s / jnp.maximum(num_points[:, None], 1)


class PillarVFE(nn.Module):
    """points-per-pillar (B, V, P, F raw) -> pillar features (B, V, C).

    Augments each point with cluster-mean offset and pillar-center offset
    (use_absolute_xyz + with_distance=False default), then a PFN layer.
    """

    num_filters: int = 64
    voxel_size: tuple = (0.16, 0.16, 4.0)
    pc_range: tuple = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)

    @nn.compact
    def __call__(self, points, num_points, coords, train: bool):
        """points (B, V, P, F); num_points (B, V); coords (B, V, 3) zyx."""
        b, v, p, f = points.shape
        mask = jnp.arange(p)[None, None, :] < num_points[..., None]

        xyz = points[..., :3]
        cnt = jnp.maximum(num_points, 1)[..., None, None]
        mean = jnp.where(mask[..., None], xyz, 0.0).sum(2, keepdims=True) / cnt
        f_cluster = xyz - mean

        cx = (coords[..., 2:3].astype(jnp.float32) + 0.5) * self.voxel_size[0] + self.pc_range[0]
        cy = (coords[..., 1:2].astype(jnp.float32) + 0.5) * self.voxel_size[1] + self.pc_range[1]
        f_center = jnp.stack(
            [xyz[..., 0] - cx[..., None, 0], xyz[..., 1] - cy[..., None, 0]],
            axis=-1,
        )

        feats = jnp.concatenate([points, f_cluster, f_center], axis=-1)
        feats = jnp.where(mask[..., None], feats, 0.0)

        h = nn.Dense(self.num_filters, use_bias=False, name="pfn_linear")(feats)
        h = MaskedBatchNorm(name="pfn_bn")(
            h.reshape(b, v * p, -1), mask.reshape(b, v * p), train
        ).reshape(b, v, p, -1)
        h = nn.relu(h)
        h = jnp.where(mask[..., None], h, -1e9)
        h = h.max(axis=2)
        return jnp.where(num_points[..., None] > 0, h, 0.0)


def pillar_scatter(pillar_feats, coords, grid_yx):
    """(B, V, C) + (B, V, 3) zyx coords -> dense BEV (B, H, W, C)."""
    hh, ww = grid_yx
    b, v, c = pillar_feats.shape
    valid = coords[..., 0] >= 0
    flat = jnp.where(valid, coords[..., 1] * ww + coords[..., 2], hh * ww)

    def one(f, i):
        canvas = jnp.zeros((hh * ww + 1, c), f.dtype)
        return canvas.at[i].set(f, mode="drop")[: hh * ww].reshape(hh, ww, c)

    return jax.vmap(one)(pillar_feats, flat)
