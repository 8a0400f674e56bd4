"""Fused (camera+LiDAR) model smoke tests on tiny shapes: image branch ->
IFAT -> ACTR hook -> detector, single-cam (KITTI) and multi-cam (nuScenes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from df3d.models.detectors.centerpoint import CenterPointConfig
from df3d.models.detectors.fused import (
    CenterPoint3DDF, FusedConfig, VoxelRCNN3DDF,
)
from df3d.models.detectors.voxel_rcnn import VoxelRCNNConfig
from df3d.models.fusion.actr import ACTRConfig
from df3d.ops.voxelize import voxelize_batch

TINY_ACTR = ACTRConfig(
    d_model=16, n_heads=2, n_points=2, n_levels=2, num_layers=1,
    dim_feedforward=32, lt_npoint=8, lt_nsample=4, model_name="ACTR",
)


def _points(rng, b, n, xr=(-15, 15)):
    return jnp.asarray(
        np.concatenate(
            [rng.uniform(*xr, (b, n, 1)), rng.uniform(-15, 15, (b, n, 1)),
             rng.uniform(-1.8, 1.8, (b, n, 1)), rng.uniform(0, 1, (b, n, 1))],
            axis=-1,
        ).astype(np.float32)
    )


def test_voxel_rcnn_3ddf_forward():
    rng = np.random.RandomState(0)
    cfg = VoxelRCNNConfig(
        pc_range=(0.0, -16.0, -2.4, 32.0, 16.0, 2.4),
        voxel_size=(0.5, 0.5, 0.2), grid_size=(24, 64, 64),
        max_voxels=256, num_point_features=4,
        stage_caps=(256, 192, 128, 96),
    )
    fused = FusedConfig(
        image_shape=(64, 96), image_branch="deeplabv3", n_levels=2,
        actr=TINY_ACTR, fusion_downsample=8,
    )
    res = voxelize_batch(
        _points(rng, 1, 300, xr=(0, 31)), jnp.ones((1, 300), bool),
        cfg.voxel_size, cfg.pc_range, cfg.grid_size, cfg.max_voxels,
    )
    images = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    # simple pinhole-ish projection x-forward
    proj = jnp.asarray(
        np.array([[[30, -30, 0, 48 * 1], [0, -10, -30, 32 * 1], [1, 0, 0, 0]]],
                 np.float32)
    )
    model = VoxelRCNN3DDF(cfg, fused)
    vs = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, images, proj,
        train=False,
    )
    preds = model.apply(vs, res.features, res.coords, images, proj, train=False)
    assert np.isfinite(np.asarray(preds["cls"])).all()
    # fusion params exist
    flat = jax.tree_util.tree_flatten_with_path(vs["params"])[0]
    names = {"/".join(str(k) for k in p) for p, _ in flat}
    assert any("actr" in n for n in names)
    assert any("ifat" in n for n in names)
    assert any("mvx_proj" in n for n in names)
    assert any("image_branch" in n for n in names)


def test_centerpoint_3ddf_multicam_forward():
    rng = np.random.RandomState(1)
    cfg = CenterPointConfig(
        pc_range=(-16.0, -16.0, -2.4, 16.0, 16.0, 2.4),
        voxel_size=(0.5, 0.5, 0.2), grid_size=(24, 64, 64),
        max_voxels=256, num_point_features=4,
        stage_caps=(256, 192, 128, 96), tasks=(1, 2),
        max_objs=8, nms_pre_max_size=64, nms_post_max_size=8,
    )
    fused = FusedConfig(
        image_shape=(48, 64), image_branch="deeplabv3", n_levels=2,
        num_cams=2, actr=TINY_ACTR, fusion_downsample=8,
    )
    res = voxelize_batch(
        _points(rng, 1, 300), jnp.ones((1, 300), bool),
        cfg.voxel_size, cfg.pc_range, cfg.grid_size, cfg.max_voxels,
    )
    images = jnp.asarray(rng.rand(1, 2, 48, 64, 3).astype(np.float32))
    proj = jnp.asarray(rng.randn(1, 2, 3, 4).astype(np.float32))
    model = CenterPoint3DDF(cfg, fused)
    vs = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, images, proj,
        train=False,
    )
    preds, ms = model.apply(
        vs, res.features, res.coords, images, proj, train=False
    )
    assert len(preds) == 2
    assert np.isfinite(np.asarray(preds[0]["hm"])).all()
