"""3D-Dual-Fusion camera+LiDAR detectors (the paper's full models).

Assembles: image branch (SemDeepLabV3 / ResNet-FPN) + fusion hook
(MVX + ACTR + IFAT) + host LiDAR detector. Equivalents of:
  * VoxelRCNN + 3D-DF  — cfg voxel_rcnn_car_mm_mvx+actrv2_hybrid_ifat.yaml
    over VoxelBackBone8xFusion (spconv_backbone.py:436-929)
  * CenterPoint + 3D-DF — VoxelNetFusion (voxelnet.py:104-188) with
    VoxelWithPointProjection (6 cams)
  * TransFusion + 3D-DF — TransFusionDetector with SparseEncoderFusion
    (sparse_encoder.py:207-448), frozen ResNet50+FPN image branch
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.models.fusion.actr import ACTRConfig
from df3d.models.fusion.hooks import (
    ACTRFusionSpec, make_actr_fusion_hook, make_multicam_actr_fusion_hook,
)
from df3d.models.image.resnet import ResNetFPN, SemDeepLabV3

from .centerpoint import CenterPoint, CenterPointConfig
from .transfusion import TransFusionConfig, TransFusionL
from .voxel_rcnn import VoxelRCNN, VoxelRCNNConfig


@dataclasses.dataclass(frozen=True)
class FusedConfig:
    image_shape: tuple = (375, 1242)     # KITTI default
    # 'deeplabv3' | 'resnet_fpn' | 'swin' (Swin-T + FPN, the README.md:37
    # TransFusion-L+3D-DF image branch) | 'dla' | 'regnet'
    image_branch: str = "deeplabv3"
    # ResNet stage depths of the camera backbone (default R50, matching the
    # reference's deeplabv3_resnet50 / R50+FPN). Smoke/CI configs shrink
    # this — XLA:CPU SPMD compile of the full R50 train graph costs minutes
    image_layers: tuple = (3, 4, 6, 3)
    # Swin branch: per-stage block depths + embed dim (Swin-Tiny defaults);
    # smoke configs shrink these the way image_layers shrinks ResNet
    swin_depths: tuple = (2, 2, 6, 2)
    swin_dim: int = 96
    n_levels: int = 3
    num_cams: int = 1
    freeze_image_branch: bool = True
    actr: ACTRConfig = ACTRConfig()
    mvx_early: bool = True
    use_ifat: bool = True
    fusion_downsample: int = 8
    # aux image-FG seg head over the first image scale (ref SemanticSeg/
    # aux_seg_loss.py AuxImgSegmentLoss:20); logits surface via
    # sow("intermediates", "aux_seg_logits") for make_fused_train_step
    with_aux_seg: bool = False


class ImageBranch(nn.Module):
    """Camera feature extractor shared by the fused models. Returns a list
    of n_levels channel-last maps (per camera folded into batch for
    multi-cam)."""

    cfg: FusedConfig

    @nn.compact
    def __call__(self, images: jax.Array, train: bool):
        train = train and not self.cfg.freeze_image_branch
        if self.cfg.image_branch == "deeplabv3":
            feats = SemDeepLabV3(
                backbone_layers=self.cfg.image_layers, name="sem",
            )(images, train)
            return [feats["layer1"], feats["layer2"], feats["layer3"]][: self.cfg.n_levels]
        if self.cfg.image_branch == "resnet_fpn":
            feats = ResNetFPN(
                layers=self.cfg.image_layers, name="img")(images, train)
            return feats[: self.cfg.n_levels]
        if self.cfg.image_branch == "swin":
            # Swin-T stages at strides 4/8/16/32 + mmdet-style FPN (the
            # README.md:37 TransFusion-L + 3D-DF Swin-Tiny variant; upstream
            # ships no config, so this follows mmdet Swin+FPN conventions)
            from df3d.models.image.resnet import FPN
            from df3d.models.image.swin import SwinTransformer

            stages = SwinTransformer(
                embed_dim=self.cfg.swin_dim, depths=self.cfg.swin_depths,
                name="swin")(images, train)
            feats = FPN(name="swin_fpn")(stages)
            return feats[: self.cfg.n_levels]
        if self.cfg.image_branch == "dla":
            from df3d.models.image.dla import DLA
            from df3d.models.image.resnet import FPN

            stages = DLA(name="dla")(images, train)
            feats = FPN(name="dla_fpn")(stages)
            return feats[: self.cfg.n_levels]
        if self.cfg.image_branch == "regnet":
            from df3d.models.image.regnet import RegNet
            from df3d.models.image.resnet import FPN

            stages = RegNet(name="regnet")(images, train)
            feats = FPN(name="regnet_fpn")(stages)
            return feats[: self.cfg.n_levels]
        raise ValueError(
            f"unknown image_branch {self.cfg.image_branch!r}; expected "
            "'deeplabv3' | 'resnet_fpn' | 'swin' | 'dla' | 'regnet'")


class VoxelRCNN3DDF(nn.Module):
    """Voxel R-CNN + MVX@1 + ACTRv2-hybrid@8 + IFAT (KITTI)."""

    cfg: VoxelRCNNConfig
    fused: FusedConfig

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, images, proj, train: bool,
                 noise_rot=None, noise_scale=None, flip_x=None, flip_y=None):
        image_feats = ImageBranch(self.fused, name="image_branch")(images, train)
        if self.fused.freeze_image_branch:
            image_feats = [jax.lax.stop_gradient(f) for f in image_feats]
        if self.fused.with_aux_seg:
            from df3d.models.fusion.aux_heads import AuxSegHead

            self.sow("intermediates", "aux_seg_logits",
                     AuxSegHead(name="aux_seg")(image_feats[0]))
        spec = ACTRFusionSpec(
            actr=self.fused.actr, downsample=self.fused.fusion_downsample,
            use_ifat=self.fused.use_ifat, mvx_early=self.fused.mvx_early,
        )
        hook = make_actr_fusion_hook(
            spec, self.cfg.voxel_size, self.cfg.pc_range, self.fused.image_shape
        )
        model = VoxelRCNN(self.cfg, fusion_hook=hook, name="detector")
        return model(
            voxel_features, voxel_coords, train,
            fusion_kwargs=dict(
                image_feats=image_feats, proj=proj, noise_rot=noise_rot,
                noise_scale=noise_scale, flip_x=flip_x, flip_y=flip_y,
            ),
        )


class CenterPoint3DDF(nn.Module):
    """CenterPoint + PFAT(=ACTR) 6-cam fusion + IFAT (nuScenes)."""

    cfg: CenterPointConfig
    fused: FusedConfig

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, images, proj, train: bool):
        """images (B, n_cam, H, W, 3); proj (B, n_cam, 3, 4)."""
        b, nc = images.shape[:2]
        flat = images.reshape(b * nc, *images.shape[2:])
        feats = ImageBranch(self.fused, name="image_branch")(flat, train)
        if self.fused.freeze_image_branch:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        if self.fused.with_aux_seg:
            from df3d.models.fusion.aux_heads import AuxSegHead

            self.sow("intermediates", "aux_seg_logits",
                     AuxSegHead(name="aux_seg")(feats[0]))
        feats = [f.reshape(b, nc, *f.shape[1:]) for f in feats]
        spec = ACTRFusionSpec(
            actr=self.fused.actr, downsample=self.fused.fusion_downsample,
            use_ifat=self.fused.use_ifat,
        )
        hook = make_multicam_actr_fusion_hook(
            spec, self.cfg.voxel_size, self.cfg.pc_range,
            self.fused.image_shape, nc,
        )
        model = CenterPoint(self.cfg, fusion_hook=hook, name="detector")
        return model(
            voxel_features, voxel_coords, train,
            fusion_kwargs=dict(image_feats=feats, proj=proj),
        )


class TransFusion3DDF(nn.Module):
    """TransFusion-L + ACTR fusion at SparseEncoder pos 3 (nuScenes)."""

    cfg: TransFusionConfig
    fused: FusedConfig

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, images, proj, train: bool,
                 packed_table=None):
        b, nc = images.shape[:2]
        flat = images.reshape(b * nc, *images.shape[2:])
        feats = ImageBranch(self.fused, name="image_branch")(flat, train)
        if self.fused.freeze_image_branch:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        if self.fused.with_aux_seg:
            from df3d.models.fusion.aux_heads import AuxSegHead

            self.sow("intermediates", "aux_seg_logits",
                     AuxSegHead(name="aux_seg")(feats[0]))
        feats = [f.reshape(b, nc, *f.shape[1:]) for f in feats]
        spec = ACTRFusionSpec(
            actr=self.fused.actr, downsample=self.fused.fusion_downsample,
            use_ifat=self.fused.use_ifat,
        )
        hook = make_multicam_actr_fusion_hook(
            spec, self.cfg.voxel_size, self.cfg.pc_range,
            self.fused.image_shape, nc,
        )
        model = TransFusionL(self.cfg, fusion_hook=hook, name="detector")
        return model(
            voxel_features, voxel_coords, train,
            fusion_kwargs=dict(image_feats=feats, proj=proj),
            packed_table=packed_table,
        )
