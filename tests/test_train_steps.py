"""Train-step factories for all three detector families run one step with
finite, decreasing-capable losses (the unified replacement for the three
reference trainers)."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.train.schedules import adam_onecycle


def _points(rng, b=1, p=300, xr=(-15, 15)):
    return jnp.asarray(
        np.concatenate(
            [rng.uniform(*xr, (b, p, 1)), rng.uniform(-15, 15, (b, p, 1)),
             rng.uniform(-1.8, 1.8, (b, p, 1)), rng.uniform(0, 1, (b, p, 1))],
            -1,
        ).astype(np.float32)
    )


def test_transfusion_train_step():
    from flax.training import train_state as ts

    from df3d.models.detectors.transfusion import TransFusionConfig, TransFusionL
    from df3d.models.heads.transfusion_head import TransFusionHeadCfg
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.trainer import TrainState, make_transfusion_train_step

    cfg = TransFusionConfig(
        pc_range=(-16.0, -16.0, -2.4, 16.0, 16.0, 2.4),
        voxel_size=(0.5, 0.5, 0.2), grid_size=(24, 64, 64),
        max_voxels=256, num_point_features=4,
        stage_caps=(256, 192, 128, 96),
        head=TransFusionHeadCfg(
            num_classes=3, num_proposals=8, hidden_channel=16, num_heads=2,
            ffn_channel=32, small_classes=(2,), bev_size=(8, 8),
            voxel_size=(0.5, 0.5), pc_range=(-16.0, -16.0),
        ),
    )
    rng = np.random.RandomState(0)
    batch = {
        "points": _points(rng), "points_valid": jnp.ones((1, 300), bool),
        "gt_boxes": jnp.asarray(
            np.array([[[0, 0, 0, 4, 2, 1.5, 0.3, 0, 0]]], np.float32)
        ),
        "gt_classes": jnp.zeros((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    res = voxelize_batch(
        batch["points"], batch["points_valid"], cfg.voxel_size, cfg.pc_range,
        cfg.grid_size, cfg.max_voxels, cfg.max_points_per_voxel,
    )
    model = TransFusionL(cfg)
    variables = model.init(jax.random.PRNGKey(0), res.features, res.coords, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=adam_onecycle(1e-3, 10), batch_stats=variables["batch_stats"],
    )
    step = make_transfusion_train_step(model, cfg)
    state, logs = step(state, batch)
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["tf_matched"]) >= 1


def test_voxelrcnn_train_step():
    from df3d.models.detectors.voxel_rcnn import VoxelRCNN, VoxelRCNNConfig
    from df3d.models.heads.voxelrcnn_head import (
        RoIPoolScaleCfg, VoxelRCNNHead, VoxelRCNNHeadCfg,
    )
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.trainer import TrainState, make_voxelrcnn_train_step

    cfg = VoxelRCNNConfig(
        pc_range=(0.0, -16.0, -2.4, 32.0, 16.0, 2.4),
        voxel_size=(0.5, 0.5, 0.2), grid_size=(24, 64, 64),
        max_voxels=256, num_point_features=4, stage_caps=(256, 192, 128, 96),
        train_pre_nms=64, train_post_nms=16,
        rcnn=VoxelRCNNHeadCfg(
            grid_size=3,
            scales=(RoIPoolScaleCfg("conv3", 4, 1.6, nsample=4),),
            max_local=32, roi_per_image=8,
        ),
    )
    rng = np.random.RandomState(1)
    batch = {
        "points": _points(rng, xr=(0, 31)),
        "points_valid": jnp.ones((1, 300), bool),
        "gt_boxes": jnp.asarray(
            np.array([[[8, 0, -0.5, 3.9, 1.6, 1.56, 0.2, 0, 0]]], np.float32)
        ),
        "gt_classes": jnp.zeros((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    res = voxelize_batch(
        batch["points"], batch["points_valid"], cfg.voxel_size, cfg.pc_range,
        cfg.grid_size, cfg.max_voxels, cfg.max_points_per_voxel,
    )
    model = VoxelRCNN(cfg)
    v_rpn = model.init(jax.random.PRNGKey(0), res.features, res.coords, train=False)
    head = VoxelRCNNHead(cfg.rcnn, cfg.voxel_size, cfg.pc_range)
    preds = model.apply(v_rpn, res.features, res.coords, train=False)
    rois = jnp.zeros((1, cfg.rcnn.roi_per_image, 7)).at[..., 3:6].set(1.0)
    v_rcnn = head.init(
        jax.random.PRNGKey(1), rois, jnp.ones((1, cfg.rcnn.roi_per_image), bool),
        preds["ms"], train=False,
    )
    params = {"rpn": v_rpn["params"], "rcnn": v_rcnn["params"]}
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=adam_onecycle(1e-3, 10),
        batch_stats={"rpn": v_rpn["batch_stats"],
                     "rcnn": v_rcnn["batch_stats"]},
    )
    step = make_voxelrcnn_train_step(model, head, cfg)
    state, logs = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["loss"]))
    assert "rcnn_loss" in logs and "rpn_loss" in logs
