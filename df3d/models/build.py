"""Shared detector/template builder for the train and eval CLIs.

The model-template construction decides checkpoint compatibility (param
tree shape, image branch, aux heads) — it must be ONE implementation so
tools/train.py and tools/test.py can never drift apart (r3 review
finding). Mirrors the reference's builder split: pcdet
`build_network` (VoxelRCNN/pcdet/models/__init__.py), det3d
`build_detector`, mmdet3d `build_model`.
"""

from __future__ import annotations

from types import SimpleNamespace


def preset_image_shape(preset, override=None) -> tuple:
    """Fused presets carry their operating-point image shape (KITTI
    384x1280, nuScenes 448x800); an explicit CLI override wins."""
    if override:
        return tuple(override)
    if isinstance(preset, dict) and "image_shape" in preset:
        return tuple(preset["image_shape"])
    return (448, 800)


def build_detector(preset, tx, *, image_shape=None, with_aux_seg=False,
                   example_points=4096, seed=0):
    """Build the model template + initialized TrainState for any preset.

    Returns a namespace with: state, model, head (VoxelRCNN only, else
    None), lidar_cfg, fcfg (None unless fused), family ('centerpoint' |
    'transfusion' | 'voxelrcnn'), fused (bool), num_cams, image_shape
    (None unless fused).
    """
    import jax
    import jax.numpy as jnp

    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig,
    )
    from df3d.models.detectors.fused import (
        CenterPoint3DDF, FusedConfig, TransFusion3DDF, VoxelRCNN3DDF,
    )
    from df3d.models.detectors.transfusion import (
        TransFusionConfig, TransFusionL,
    )
    from df3d.models.detectors.voxel_rcnn import VoxelRCNN, VoxelRCNNConfig
    from df3d.models.heads.voxelrcnn_head import VoxelRCNNHead
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.trainer import TrainState

    rng = jax.random.PRNGKey(seed)
    fused = isinstance(preset, dict)
    lidar_cfg = preset["lidar"] if fused else preset

    example_pts = jnp.zeros(
        (1, example_points, lidar_cfg.num_point_features))
    res = voxelize_batch(
        example_pts, jnp.ones(example_pts.shape[:2], bool),
        lidar_cfg.voxel_size, lidar_cfg.pc_range, lidar_cfg.grid_size,
        lidar_cfg.max_voxels, lidar_cfg.max_points_per_voxel,
    )

    fcfg = None
    num_cams = 1
    fwd_extra = ()
    if fused:
        num_cams = preset.get("num_cams", 1)
        image_shape = preset_image_shape(preset, image_shape)
        fcfg = FusedConfig(
            image_shape=image_shape, actr=preset["actr"],
            n_levels=preset["actr"].n_levels, num_cams=num_cams,
            image_branch=preset.get(
                "image_branch",
                "resnet_fpn"
                if isinstance(lidar_cfg, TransFusionConfig) else "deeplabv3"),
            # smoke/golden configs shrink the camera backbone (full R50
            # SPMD train graphs take minutes to compile on XLA:CPU)
            image_layers=tuple(preset.get(
                "image_layers", FusedConfig.image_layers)),
            swin_depths=tuple(preset.get(
                "swin_depths", FusedConfig.swin_depths)),
            swin_dim=int(preset.get("swin_dim", FusedConfig.swin_dim)),
            with_aux_seg=with_aux_seg,
        )
        images = jnp.zeros((1, num_cams, *image_shape, 3))
        proj = jnp.zeros((1, num_cams, 3, 4))
        if num_cams == 1:  # single-cam KITTI models take (B, H, W, 3)
            images, proj = images[:, 0], proj[:, 0]
        fwd_extra = (images, proj)
    else:
        image_shape = None

    if isinstance(lidar_cfg, VoxelRCNNConfig):
        model = (VoxelRCNN3DDF(lidar_cfg, fcfg) if fused
                 else VoxelRCNN(lidar_cfg))
        v_rpn = model.init(
            rng, res.features, res.coords, *fwd_extra, train=False)
        head = VoxelRCNNHead(
            lidar_cfg.rcnn, lidar_cfg.voxel_size, lidar_cfg.pc_range)
        preds = model.apply(
            v_rpn, res.features, res.coords, *fwd_extra, train=False)
        rois = jnp.zeros(
            (1, lidar_cfg.rcnn.roi_per_image, 7)).at[..., 3:6].set(1.0)
        v_rcnn = head.init(
            jax.random.PRNGKey(1), rois,
            jnp.ones((1, lidar_cfg.rcnn.roi_per_image), bool), preds["ms"],
            train=False,
        )
        state = TrainState.create(
            apply_fn=model.apply,
            params={"rpn": v_rpn["params"], "rcnn": v_rcnn["params"]},
            tx=tx,
            batch_stats={"rpn": v_rpn["batch_stats"],
                         "rcnn": v_rcnn["batch_stats"]},
        )
        family = "voxelrcnn"
    else:
        if isinstance(lidar_cfg, CenterPointConfig):
            model = (CenterPoint3DDF(lidar_cfg, fcfg) if fused
                     else CenterPoint(lidar_cfg))
            family = "centerpoint"
        elif isinstance(lidar_cfg, TransFusionConfig):
            model = (TransFusion3DDF(lidar_cfg, fcfg) if fused
                     else TransFusionL(lidar_cfg))
            family = "transfusion"
        else:
            raise SystemExit(f"unsupported preset type {type(lidar_cfg)}")
        head = None
        variables = model.init(
            rng, res.features, res.coords, *fwd_extra, train=False)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx,
            batch_stats=variables["batch_stats"],
        )

    return SimpleNamespace(
        state=state, model=model, head=head, lidar_cfg=lidar_cfg, fcfg=fcfg,
        family=family, fused=fused, num_cams=num_cams,
        image_shape=image_shape,
    )


__all__ = ["build_detector", "preset_image_shape"]
