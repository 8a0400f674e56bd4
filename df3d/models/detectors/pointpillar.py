"""PointPillars detector (pcdet PointPillar / mmdet3d pillar configs).

Part of the host frameworks' model surface (pcdet
models/detectors/pointpillar.py, pillar VFE family SURVEY §2.8): pillar
voxelization (Z collapsed) -> PillarVFE -> scatter to BEV canvas ->
BEVBackbone -> AnchorHeadSingle. Shares the anchor target/loss/decode code
with Voxel R-CNN's RPN.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.models.heads.anchor_head import AnchorClassCfg, AnchorHeadSingle
from df3d.models.necks import BEVBackbone
from df3d.models.vfe import PillarVFE, pillar_scatter

KITTI_CAR_PILLAR = AnchorClassCfg(
    name="Car", size=(3.9, 1.6, 1.56), bottom_height=-1.78,
    matched_threshold=0.6, unmatched_threshold=0.45,
)


@dataclasses.dataclass(frozen=True)
class PointPillarConfig:
    pc_range: tuple = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    voxel_size: tuple = (0.16, 0.16, 4.0)
    grid_size: tuple = (1, 496, 432)   # (Z=1, Y, X)
    max_voxels: int = 16_000
    max_points_per_voxel: int = 32
    num_point_features: int = 4
    pillar_channels: int = 64
    anchor_classes: tuple = (KITTI_CAR_PILLAR,)
    out_size_factor: int = 2

    @property
    def bev_size_xy(self):
        return (self.grid_size[2] // self.out_size_factor,
                self.grid_size[1] // self.out_size_factor)


class PointPillars(nn.Module):
    cfg: PointPillarConfig

    @nn.compact
    def __call__(self, voxel_points, num_points, coords, train: bool):
        """voxel_points (B, V, P, F) raw per-pillar points; num_points
        (B, V); coords (B, V, 3) zyx with z==0."""
        cfg = self.cfg
        pillars = PillarVFE(
            cfg.pillar_channels, cfg.voxel_size, cfg.pc_range, name="vfe"
        )(voxel_points, num_points, coords, train)
        bev = pillar_scatter(pillars, coords, cfg.grid_size[1:])
        bev = BEVBackbone(
            layer_nums=(3, 5, 5), layer_strides=(2, 2, 2),
            num_filters=(64, 128, 256), upsample_strides=(1, 2, 4),
            num_upsample_filters=(128, 128, 128), name="neck",
        )(bev, train)
        n_rot = len(cfg.anchor_classes[0].rotations)
        cls, box, dirp = AnchorHeadSingle(
            num_classes=len(cfg.anchor_classes),
            num_anchors_per_loc=len(cfg.anchor_classes) * n_rot,
            name="dense_head",
        )(bev)
        return {"cls": cls, "box": box, "dir": dirp}
