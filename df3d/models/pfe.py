"""Point feature encoders: PV-RCNN VoxelSetAbstraction.

Behavioral equivalent of VoxelRCNN/pcdet/models/backbones_3d/pfe/
voxel_set_abstraction.py:1-411: FPS keypoints from the raw cloud, aggregate
(a) raw-point features, (b) multi-scale sparse-voxel features (ball query +
shared MLP + max pool, the pointnet2_stack SA layers), and (c) the BEV map
bilinearly sampled at keypoint locations; concat -> keypoint features for
the PV-RCNN head.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.core.calib import voxel_centers_from_coords
from df3d.ops.pointops import ball_query, furthest_point_sample


@dataclasses.dataclass(frozen=True)
class VSAScaleCfg:
    feature_key: str
    downsample: int
    radius: float
    nsample: int = 16
    mlp: tuple = (32, 32)


@dataclasses.dataclass(frozen=True)
class VSAConfig:
    num_keypoints: int = 2048
    raw_radius: float = 0.4
    raw_nsample: int = 16
    raw_mlp: tuple = (16, 16)
    scales: tuple = (
        VSAScaleCfg("conv1", 1, 0.4),
        VSAScaleCfg("conv2", 2, 0.8),
        VSAScaleCfg("conv3", 4, 1.2),
        VSAScaleCfg("conv4", 8, 2.4),
    )
    bev_stride: int = 8
    out_channels: int = 128


class VoxelSetAbstraction(nn.Module):
    cfg: VSAConfig
    voxel_size: tuple
    pc_range: tuple

    @nn.compact
    def __call__(self, points, points_valid, ms_features, bev, train: bool):
        """points (B, P, 3+F); ms_features dict of SparseTensor; bev
        (B, H, W, C). Returns (keypoints (B, K, 3), feats (B, K, C_out))."""
        c = self.cfg

        def sample_kp(xyz, valid):
            idx = furthest_point_sample(xyz, valid, c.num_keypoints)
            return xyz[idx]

        keypoints = jax.vmap(sample_kp)(points[..., :3], points_valid)

        gathered = []

        # (a) raw points
        def raw_group(kp, xyz, feats, valid):
            idx, mask = ball_query(kp, xyz, valid, c.raw_radius, c.raw_nsample)
            rel = xyz[idx] - kp[:, None]
            return jnp.concatenate([rel, feats[idx]], -1), mask

        g, m = jax.vmap(raw_group)(
            keypoints, points[..., :3], points[..., 3:], points_valid
        )
        h = nn.Dense(c.raw_mlp[0], name="raw_mlp0")(g)
        h = nn.relu(h)
        h = nn.Dense(c.raw_mlp[1], name="raw_mlp1")(h)
        h = jnp.where(m[..., None], h, -1e9).max(axis=2)
        gathered.append(jnp.where(jnp.isfinite(h), h, 0.0))

        # (b) sparse voxel scales
        for s in c.scales:
            st = ms_features[s.feature_key]

            def vox_group(kp, coords, feats, valid):
                xyz = voxel_centers_from_coords(
                    coords, self.voxel_size, self.pc_range, s.downsample
                )
                idx, mask = ball_query(kp, xyz, valid, s.radius, s.nsample)
                rel = xyz[idx] - kp[:, None]
                return jnp.concatenate([rel, feats[idx]], -1), mask

            g, m = jax.vmap(vox_group)(
                keypoints, st.coords, st.features, st.valid
            )
            h = nn.Dense(s.mlp[0], name=f"{s.feature_key}_mlp0")(g)
            h = nn.relu(h)
            h = nn.Dense(s.mlp[1], name=f"{s.feature_key}_mlp1")(h)
            h = jnp.where(m[..., None], h, -1e9).max(axis=2)
            gathered.append(jnp.where(h <= -1e8, 0.0, h))

        # (c) BEV bilinear sample at keypoints
        bh, bw = bev.shape[1:3]
        px = (keypoints[..., 0] - self.pc_range[0]) / (
            self.voxel_size[0] * c.bev_stride
        )
        py = (keypoints[..., 1] - self.pc_range[1]) / (
            self.voxel_size[1] * c.bev_stride
        )
        from df3d.models.fusion.projection import sample_image_features

        uv = jnp.stack([px / bw, py / bh], -1)
        bev_feats = sample_image_features(
            bev, uv, jnp.ones(keypoints.shape[:2], bool)
        )
        gathered.append(bev_feats)

        out = jnp.concatenate(gathered, axis=-1)
        out = nn.Dense(c.out_channels, name="vsa_out")(out)
        return keypoints, nn.relu(out)
