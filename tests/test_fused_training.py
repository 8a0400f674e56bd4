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
