"""Fused 3D-DF models are trainable: gradients flow through the ACTR fusion
hook, IFAT gate, image branch (frozen), and into the detector losses."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.detectors.fused import FusedConfig, VoxelRCNN3DDF
from df3d.models.detectors.voxel_rcnn import (
    VoxelRCNNConfig, assign_rpn_targets, build_anchors,
)
from df3d.models.fusion.actr import ACTRConfig
from df3d.models.heads.anchor_head import anchor_head_loss
from df3d.ops.voxelize import voxelize_batch

CFG = VoxelRCNNConfig(
    pc_range=(0.0, -16.0, -2.4, 32.0, 16.0, 2.4),
    voxel_size=(0.5, 0.5, 0.2),
    grid_size=(24, 64, 64),
    max_voxels=256,
    num_point_features=4,
    stage_caps=(256, 192, 128, 96),
)
FUSED = FusedConfig(
    image_shape=(64, 96), n_levels=2,
    actr=ACTRConfig(
        d_model=16, n_heads=2, n_points=2, n_levels=2, num_layers=1,
        dim_feedforward=32, lt_npoint=8, lt_nsample=4,
    ),
)


def test_fused_voxelrcnn_rpn_gradients():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 31, (1, 300, 1)), rng.uniform(-15, 15, (1, 300, 1)),
             rng.uniform(-1.8, 1.8, (1, 300, 1)), rng.uniform(0, 1, (1, 300, 1))],
            -1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        pts, jnp.ones((1, 300), bool), CFG.voxel_size, CFG.pc_range,
        CFG.grid_size, CFG.max_voxels, 5,
    )
    images = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    proj = jnp.asarray(
        np.array([[[30, -30, 0, 48], [0, -10, -30, 32], [1, 0, 0, 0]]], np.float32)
    )
    model = VoxelRCNN3DDF(CFG, FUSED)
    vs = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, images, proj,
        train=False,
    )
    anchors = build_anchors(CFG)
    gt = jnp.asarray(np.array([[[8.0, 0.0, -0.5, 3.9, 1.6, 1.56, 0.2]]], np.float32))
    targets = assign_rpn_targets(
        CFG, anchors, gt, jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool)
    )

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            res.features, res.coords, images, proj, train=True,
            mutable=["batch_stats"],
        )
        total, _ = anchor_head_loss(
            preds["cls"], preds["box"], preds["dir"], targets["labels"],
            targets["reg_targets"], anchors, targets["gt_classes_per_anchor"],
            num_classes=1,
        )
        return total

    loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
    assert np.isfinite(float(loss))

    def gsum(subtree):
        return float(
            sum(jnp.abs(g).sum() for g in jax.tree_util.tree_leaves(subtree))
        )

    # fusion modules receive gradient
    det = grads["detector"]["backbone"]
    assert gsum(det["actr"]) > 0
    assert gsum(det["ifat"]) > 0
    assert gsum(det["mvx_proj"]) > 0
    # frozen image branch: zero gradient (stop_gradient)
    assert gsum(grads["image_branch"]) == 0.0


def test_fused_voxelrcnn_full_train_step_with_aux():
    """Fused VoxelRCNN two-stage train step with aux=True (r3 review: the
    CLI's --aux-loss was a silent no-op for this family): aux seg +
    consistency losses appear in the logs and gradients reach the
    AuxSegHead params."""
    from df3d.models.heads.voxelrcnn_head import (
        RoIPoolScaleCfg, VoxelRCNNHead, VoxelRCNNHeadCfg,
    )
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import TrainState, make_voxelrcnn_train_step

    import dataclasses

    cfg = dataclasses.replace(
        CFG,
        train_pre_nms=64, train_post_nms=16,
        rcnn=VoxelRCNNHeadCfg(
            grid_size=2,
            scales=(RoIPoolScaleCfg("conv2", 2, 0.8, nsample=4),),
            max_local=16, roi_per_image=8,
        ),
    )
    fcfg = dataclasses.replace(FUSED, with_aux_seg=True)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(np.concatenate(
        [rng.uniform(0, 31, (1, 300, 1)), rng.uniform(-15, 15, (1, 300, 1)),
         rng.uniform(-1.8, 1.8, (1, 300, 1)), rng.uniform(0, 1, (1, 300, 1))],
        -1).astype(np.float32))
    res = voxelize_batch(
        pts, jnp.ones((1, 300), bool), cfg.voxel_size, cfg.pc_range,
        cfg.grid_size, cfg.max_voxels, 5)
    images = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    proj = jnp.asarray(np.array(
        [[[30, -30, 0, 48], [0, -10, -30, 32], [1, 0, 0, 0]]], np.float32))

    model = VoxelRCNN3DDF(cfg, fcfg)
    v_rpn = model.init(jax.random.PRNGKey(0), res.features, res.coords,
                       images, proj, train=False)
    head = VoxelRCNNHead(cfg.rcnn, cfg.voxel_size, cfg.pc_range)
    preds = model.apply(v_rpn, res.features, res.coords, images, proj,
                        train=False)
    rois = jnp.zeros((1, cfg.rcnn.roi_per_image, 7)).at[..., 3:6].set(1.0)
    v_rcnn = head.init(jax.random.PRNGKey(1), rois,
                       jnp.ones((1, cfg.rcnn.roi_per_image), bool),
                       preds["ms"], train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params={"rpn": v_rpn["params"], "rcnn": v_rcnn["params"]},
        tx=adam_onecycle(1e-3, 4),
        batch_stats={"rpn": v_rpn["batch_stats"],
                     "rcnn": v_rcnn["batch_stats"]})

    step = make_voxelrcnn_train_step(
        model, head, cfg, fused=True, aux=True, image_hw=(64, 96))
    batch = {
        "points": pts, "points_valid": jnp.ones((1, 300), bool),
        "images": images, "proj": proj,
        "gt_boxes": jnp.asarray(
            np.array([[[8.0, 0.0, -0.5, 3.9, 1.6, 1.56, 0.2]]], np.float32)),
        "gt_classes": jnp.zeros((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    before = state.params
    state2, logs = jax.jit(step)(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(logs["loss"]))
    assert any("aux" in k for k in logs), sorted(logs)
    # the AuxSegHead's params specifically must move
    flat_b = jax.tree_util.tree_flatten_with_path(before["rpn"])[0]
    flat_a = jax.tree_util.tree_flatten_with_path(state2.params["rpn"])[0]
    aux_delta = sum(
        float(jnp.abs(a - b).sum())
        for (pb, b), (pa, a) in zip(flat_b, flat_a)
        if any("aux_seg" in str(k) for k in pb))
    assert aux_delta > 0
