"""TransFusion detector (nuScenes), TPU-native.

Behavioral equivalent of TransFusion/mmdet3d/models/detectors/
transfusion.py:18-227 over mvx_two_stage.py: GPU voxelize (device-side
here) -> HardSimpleVFE (fused in voxelizer) -> SparseEncoder(Fusion) ->
SECOND + SECONDFPN (BEVBackbone) -> TransFusionHead. The -L variant is
LiDAR-only; the fused variant injects the ACTR fusion hook at stride 8
(SparseEncoderFusion fusion_pos=[3]).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.models.backbones_3d import SparseEncoder
from df3d.models.heads.transfusion_head import (
    TransFusionHead, TransFusionHeadCfg, transfusion_get_bboxes,
    transfusion_targets_and_loss,
)
from df3d.models.necks import BEVBackbone
from df3d.ops.sparse import SparseTensor


@dataclasses.dataclass(frozen=True)
class TransFusionConfig:
    pc_range: tuple = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    voxel_size: tuple = (0.075, 0.075, 0.2)
    grid_size: tuple = (40, 1440, 1440)
    max_voxels: int = 120_000
    max_points_per_voxel: int = 10
    num_point_features: int = 5
    stage_caps: tuple = (120_000, 90_000, 60_000, 30_000)
    # stage-4 dense-grid tail (see SpMiddleResNetFHD.dense_tail): at
    # (6,180,180)x128 the MXU dense conv beats the sparse gather floor and
    # the down4/conv_out plans vanish, with exact uncapped spconv dilation.
    dense_tail: bool = True
    head: TransFusionHeadCfg = TransFusionHeadCfg()

    @property
    def sparse_shape(self):
        z, y, x = self.grid_size
        return (z + 1, y, x)


class TransFusionL(nn.Module):
    cfg: TransFusionConfig
    fusion_hook: Optional[Callable] = None

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train: bool,
                 fusion_kwargs=None, packed_table=None):
        cfg = self.cfg
        # coords come from ops/voxelize.py -> key-sorted rows, padding last
        st = SparseTensor(voxel_features, voxel_coords, cfg.sparse_shape,
                          rows_sorted=True, packed_table=packed_table,
                          packed_table_grid=(
                              None if packed_table is None
                              else tuple(cfg.sparse_shape)))
        caps = tuple(min(c, voxel_features.shape[1]) for c in cfg.stage_caps)
        bev, ms = SparseEncoder(
            cfg.num_point_features, caps, fusion_hook=self.fusion_hook,
            dense_tail=cfg.dense_tail, name="middle_encoder",
        )(st, train, fusion_kwargs)
        bev = BEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(256, 256),
            name="pts_backbone",
        )(bev, train)
        preds = TransFusionHead(cfg.head, name="bbox_head")(bev, train)
        return preds, ms


def transfusion_loss(cfg: TransFusionConfig, preds, gt_boxes, gt_classes, gt_valid):
    return transfusion_targets_and_loss(
        cfg.head, preds, gt_boxes, gt_classes, gt_valid
    )


def transfusion_predict(cfg: TransFusionConfig, preds):
    return transfusion_get_bboxes(cfg.head, preds)
