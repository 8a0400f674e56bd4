"""Named presets for the five BASELINE.json target configs.

| preset                    | reference config |
|---------------------------|------------------|
| voxel_rcnn_car_kitti      | VoxelRCNN tools/cfgs/kitti_models/voxel_rcnn_car.yaml |
| voxel_rcnn_3ddf_kitti     | ...voxel_rcnn_car_mm_mvx+actrv2_hybrid_ifat.yaml |
| centerpoint_nusc          | CenterPoint configs/nusc/voxelnet/nusc_centerpoint_voxelnet_0075voxel_fix_bn_z.py |
| centerpoint_3ddf_nusc     | ...0075voxel_fix_bn_z_multimodal_pfat_hybrid7_ifat.py |
| transfusion_l_nusc        | TransFusion configs/transfusion_nusc_voxel_L.py |
| transfusion_3ddf_nusc     | TransFusion configs/transfusion_nusc_voxel_F.py |
"""

from __future__ import annotations

from df3d.models.detectors.centerpoint import CenterPointConfig
from df3d.models.detectors.transfusion import TransFusionConfig
from df3d.models.detectors.voxel_rcnn import VoxelRCNNConfig
from df3d.models.fusion.actr import ACTRConfig
from df3d.models.heads.transfusion_head import TransFusionHeadCfg


def _centerpoint() -> CenterPointConfig:
    return CenterPointConfig()


def _centerpoint_3ddf():
    # model config identical on the LiDAR path; fusion cfg rides alongside
    return {
        "lidar": CenterPointConfig(),
        "actr": ACTRConfig(
            d_model=128, n_levels=3, num_layers=1, q_method="gating",
            attn_layer="BiGateSum1D_2", model_name="ACTRv2",
        ),
        "max_ne_voxel": 26000,
        "num_cams": 6,
        # 6-cam nuScenes operating point (det3d multimodal config)
        "image_shape": (448, 800),
    }


def _transfusion_l() -> TransFusionConfig:
    return TransFusionConfig()


def _transfusion_3ddf():
    return {
        "lidar": TransFusionConfig(),
        "actr": ACTRConfig(
            d_model=128, n_levels=1, num_layers=2, q_method="sum",
            attn_layer="BiGateSum1D_2", model_name="ACTRv2", hybrid=True,
        ),
        "max_ne_voxel": 26000,
        "num_cams": 6,
        "image_shape": (448, 800),
    }


def _transfusion_3ddf_swin():
    """TransFusion-L + 3D-DF with a Swin-Tiny(+FPN) image branch — the
    reference README.md:37 row (70.6 mAP / 72.9 NDS, config marked TBD
    upstream, so the image branch follows mmdet Swin-T + FPN conventions;
    everything else matches transfusion_3ddf_nusc)."""
    cfg = _transfusion_3ddf()
    cfg["image_branch"] = "swin"
    return cfg


def _voxel_rcnn() -> VoxelRCNNConfig:
    return VoxelRCNNConfig()


def _voxel_rcnn_3ddf():
    return {
        "lidar": VoxelRCNNConfig(),
        "actr": ACTRConfig(
            d_model=64, n_levels=3, num_layers=1, q_method="gating",
            attn_layer="BiGateSum1D_2", model_name="ACTRv2",
        ),
        "max_ne_voxel": 13000,
        # KITTI operating point: 375x1242 frames pad to 384x1280 (reference
        # voxel_rcnn_car_mm_mvx+actrv2_hybrid_ifat.yaml), NOT the nuScenes
        # 448x800 — resizing KITTI to 448x800 would crush rows to 242 with
        # ~46% dead padding
        "image_shape": (384, 1280),
    }


def _centerpoint_tiny():
    """Tiny config for smoke runs / CI (compiles in seconds)."""
    return CenterPointConfig(
        pc_range=(-25.6, -25.6, -2.4, 25.6, 25.6, 2.4),
        voxel_size=(0.4, 0.4, 0.2),
        grid_size=(24, 128, 128),
        max_voxels=2048,
        num_point_features=5,
        stage_caps=(2048, 1024, 512, 256),
        max_objs=32,
        post_center_range=(-30.0, -30.0, -4.0, 30.0, 30.0, 4.0),
        nms_pre_max_size=128,
        nms_post_max_size=16,
    )


PRESETS = {
    "voxel_rcnn_car_kitti": _voxel_rcnn,
    "centerpoint_tiny_smoke": _centerpoint_tiny,
    "voxel_rcnn_3ddf_kitti": _voxel_rcnn_3ddf,
    "centerpoint_nusc": _centerpoint,
    "centerpoint_3ddf_nusc": _centerpoint_3ddf,
    "transfusion_l_nusc": _transfusion_l,
    "transfusion_3ddf_nusc": _transfusion_3ddf,
    "transfusion_3ddf_swin_nusc": _transfusion_3ddf_swin,
}


def get_preset(name: str):
    if name not in PRESETS:
        raise KeyError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        )
    return PRESETS[name]()
