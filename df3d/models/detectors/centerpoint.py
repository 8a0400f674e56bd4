"""CenterPoint detector (VoxelNet), TPU-native end-to-end.

Behavioral equivalent of CenterPoint/det3d/models/detectors/voxelnet.py:10-101
(reader -> SpMiddleResNetFHD -> RPN -> CenterHead). The reader (mean VFE,
det3d VoxelFeatureExtractorV3) is fused into the device-side voxelizer
(df3d.ops.voxelize), so the model consumes voxel features + coords directly.

Static-shape contract: voxels padded to max_voxels with coords == -1; the
sparse backbone carries per-stage caps. Everything jits single- or
multi-chip (batch sharded over the data mesh axis).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.models.backbones_3d import SpMiddleResNetFHD
from df3d.models.heads.center_head import (
    CenterHead, center_head_loss, center_head_predict, center_head_targets,
)
from df3d.models.necks import BEVBackbone
from df3d.ops.sparse import SparseTensor


@dataclasses.dataclass(frozen=True)
class CenterPointConfig:
    # geometry
    pc_range: tuple = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    voxel_size: tuple = (0.075, 0.075, 0.2)
    grid_size: tuple = (40, 1440, 1440)  # (Z, Y, X)
    max_voxels: int = 120_000  # per sample (train; det3d cfg 120k/160k)
    max_points_per_voxel: int = 10
    num_point_features: int = 5
    # backbone caps after each downsample stage (per sample)
    stage_caps: tuple = (120_000, 90_000, 60_000, 30_000)
    # stage-4 dense-grid tail (see SpMiddleResNetFHD.dense_tail): faster on
    # the MXU and removes the down4/extra cap truncation entirely.
    # dense_from=3 also runs stage 3 dense (down3/subm3 plans vanish);
    # profitable with bf16 dense compute (ops.dense3d.set_compute_dtype).
    dense_tail: bool = True
    dense_from: int = 4
    # head
    tasks: tuple = (1, 2, 2, 1, 2, 2)  # nuScenes 6-task split
    dcn_head: bool = False  # DCNSepHead deformable adaption (det3d)
    out_size_factor: int = 8
    code_weights: tuple = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0)
    loc_weight: float = 0.25
    max_objs: int = 500
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    # test cfg (det3d nusc_centerpoint test_cfg)
    post_center_range: tuple = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    score_threshold: float = 0.1
    nms_pre_max_size: int = 1024
    nms_post_max_size: int = 83
    nms_iou_threshold: float = 0.2

    @property
    def sparse_shape(self):
        # det3d adds +1 z slot (scn.py sparse_shape = grid[::-1] + [1,0,0])
        z, y, x = self.grid_size
        return (z + 1, y, x)

    @property
    def bev_size(self):
        return (self.grid_size[1] // self.out_size_factor,
                self.grid_size[2] // self.out_size_factor)


class CenterPoint(nn.Module):
    cfg: CenterPointConfig
    fusion_hook: Optional[Callable] = None

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train: bool,
                 fusion_kwargs=None, packed_table=None):
        """voxel_features (B, V, F); voxel_coords (B, V, 3) (z, y, x) with
        -1 padding rows. packed_table: optional word-rank table from
        voxelize(method="bitrank", table_cells=prod(sparse_shape)) — lets
        the stage-1 subm plan skip its pack_keys build."""
        # coords come from ops/voxelize.py -> key-sorted rows, padding last
        st = SparseTensor(voxel_features, voxel_coords, self.cfg.sparse_shape,
                          rows_sorted=True, packed_table=packed_table,
                          packed_table_grid=(
                              None if packed_table is None
                              else tuple(self.cfg.sparse_shape)))
        caps = tuple(min(c, voxel_features.shape[1]) for c in self.cfg.stage_caps)
        bev, ms = SpMiddleResNetFHD(
            self.cfg.num_point_features, caps, fusion_hook=self.fusion_hook,
            dense_tail=self.cfg.dense_tail, dense_from=self.cfg.dense_from,
            name="backbone"
        )(st, train, fusion_kwargs)
        bev = BEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(256, 256),
            name="neck",
        )(bev, train)
        preds = CenterHead(
            self.cfg.tasks, dcn_head=self.cfg.dcn_head, name="head"
        )(bev, train)
        return preds, ms


def centerpoint_loss(cfg: CenterPointConfig, preds, gt_boxes, gt_classes, gt_valid):
    """gt_boxes (B, M, 9) df3d 9-dof; gt_classes (B, M) global ids."""
    targets = center_head_targets(
        gt_boxes, gt_classes, gt_valid, cfg.tasks, cfg.bev_size,
        cfg.voxel_size[:2], cfg.pc_range[:2], cfg.out_size_factor,
        cfg.gaussian_overlap, cfg.min_radius, cfg.max_objs,
    )
    return center_head_loss(preds, targets, cfg.code_weights, cfg.loc_weight)


def centerpoint_predict(cfg: CenterPointConfig, preds):
    return center_head_predict(
        preds, cfg.voxel_size[:2], cfg.pc_range[:2], cfg.out_size_factor,
        cfg.post_center_range, cfg.score_threshold, cfg.nms_iou_threshold,
        cfg.nms_pre_max_size, cfg.nms_post_max_size,
    )
