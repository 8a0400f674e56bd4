"""PV-RCNN detector (pcdet family surface).

Equivalent of pcdet models/detectors/pv_rcnn.py over the shared template:
VoxelBackBone8x -> BEV neck -> AnchorHeadSingle (RPN) + VoxelSetAbstraction
keypoints (pfe) -> PointHeadSimple (keypoint FG weighting) -> keypoint-based
ROI grid pooling head. Shares all anchor/proposal/RCNN machinery with
Voxel R-CNN; the ROI stage pools KEYPOINT features (ball query around ROI
grid points) instead of sparse-voxel features.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.models.heads.anchor_head import AnchorHeadSingle
from df3d.models.heads.point_head import PointHeadSimple
from df3d.models.necks import BEVBackbone
from df3d.models.pfe import VSAConfig, VoxelSetAbstraction
from df3d.ops.roi_ops import grid_ball_query, roi_grid_points, collect_local_voxels
from df3d.ops.sparse import SparseTensor

from .voxel_rcnn import VoxelRCNNConfig


@dataclasses.dataclass(frozen=True)
class PVRCNNConfig:
    base: VoxelRCNNConfig = VoxelRCNNConfig()
    vsa: VSAConfig = VSAConfig()
    roi_grid_size: int = 6
    roi_radius: float = 0.8
    roi_nsample: int = 16
    roi_max_local: int = 256


class PVRCNN(nn.Module):
    cfg: PVRCNNConfig

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, points, points_valid,
                 train: bool, packed_table=None):
        cfg = self.cfg.base
        from df3d.models.backbones_3d import VoxelBackBone8x

        # coords come from ops/voxelize.py -> key-sorted rows, padding last
        st = SparseTensor(voxel_features, voxel_coords, cfg.sparse_shape,
                          rows_sorted=True, packed_table=packed_table,
                          packed_table_grid=(
                              None if packed_table is None
                              else tuple(cfg.sparse_shape)))
        caps = tuple(min(c, voxel_features.shape[1]) for c in cfg.stage_caps)
        bev, ms = VoxelBackBone8x(cfg.num_point_features, caps, name="backbone")(
            st, train
        )
        bev = BEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(64, 128),
            upsample_strides=(1, 2), num_upsample_filters=(128, 128),
            name="neck",
        )(bev, train)
        n_rot = len(cfg.anchor_classes[0].rotations)
        cls, box, dirp = AnchorHeadSingle(
            num_classes=len(cfg.anchor_classes),
            num_anchors_per_loc=len(cfg.anchor_classes) * n_rot,
            name="dense_head",
        )(bev)

        keypoints, kp_feats = VoxelSetAbstraction(
            self.cfg.vsa, cfg.voxel_size, cfg.pc_range, name="pfe"
        )(points, points_valid, ms, bev, train)
        fg_logits = PointHeadSimple(name="point_head")(kp_feats)
        # predicted keypoint weighting (PV-RCNN PKW)
        kp_feats = kp_feats * jax.nn.sigmoid(fg_logits)[..., None]

        return {
            "cls": cls, "box": box, "dir": dirp, "ms": ms,
            "keypoints": keypoints, "kp_feats": kp_feats,
            "point_fg_logits": fg_logits,
        }


class PVRCNNRoIHead(nn.Module):
    """Keypoint-feature ROI grid pooling + cls/reg branches."""

    cfg: PVRCNNConfig

    @nn.compact
    def __call__(self, rois, roi_mask, keypoints, kp_feats, train: bool):
        c = self.cfg

        def pool_one(rois_s, kp_s, feats_s):
            grid = roi_grid_points(rois_s, c.roi_grid_size)
            lidx, lmask = collect_local_voxels(
                rois_s[:, :3], kp_s, jnp.ones(kp_s.shape[0], bool), 4.0,
                c.roi_max_local,
            )
            nidx, nmask = grid_ball_query(
                grid, kp_s, lidx, lmask, c.roi_radius, c.roi_nsample
            )
            rel = kp_s[nidx] - grid[:, :, None, :]
            return jnp.concatenate([rel, feats_s[nidx]], -1), nmask

        grouped, nmask = jax.vmap(pool_one)(rois, keypoints, kp_feats)
        h = nn.Dense(64, name="pool_mlp")(grouped)
        h = nn.relu(h)
        h = jnp.where(nmask[..., None], h, -1e9).max(axis=3)
        h = jnp.where(h <= -1e8, 0.0, h)
        b, r = h.shape[:2]
        h = h.reshape(b, r, -1)
        for i, ch in enumerate((256, 256)):
            h = nn.Dense(ch, name=f"shared_fc{i}")(h)
            h = nn.relu(h)
        cls = nn.Dense(1, name="cls_pred")(h) * roi_mask[..., None]
        reg = nn.Dense(7, name="reg_pred")(h) * roi_mask[..., None]
        return cls, reg
