"""Voxel R-CNN tiny end-to-end: backbone -> anchor RPN -> proposals ->
ROI grid pool -> RCNN head -> losses."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from df3d.models.detectors.voxel_rcnn import (
    KITTI_CAR, VoxelRCNN, VoxelRCNNConfig, assign_rpn_targets, build_anchors,
    proposal_layer, voxel_rcnn_train_losses,
)
from df3d.models.heads.voxelrcnn_head import (
    VoxelRCNNHead, VoxelRCNNHeadCfg, RoIPoolScaleCfg, sample_rois_for_training,
)
from df3d.ops.voxelize import voxelize_batch

TINY = VoxelRCNNConfig(
    pc_range=(0.0, -16.0, -2.4, 32.0, 16.0, 2.4),
    voxel_size=(0.5, 0.5, 0.2),
    grid_size=(24, 64, 64),
    max_voxels=512,
    num_point_features=4,
    stage_caps=(512, 384, 256, 128),
    train_pre_nms=128, train_post_nms=32, test_pre_nms=128, test_post_nms=16,
    rcnn=VoxelRCNNHeadCfg(
        grid_size=4,
        scales=(
            RoIPoolScaleCfg("conv2", 2, 0.8, nsample=8),
            RoIPoolScaleCfg("conv3", 4, 1.6, nsample=8),
        ),
        max_local=64,
        roi_per_image=16,
    ),
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    points = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 31, (2, 500, 1)), rng.uniform(-15, 15, (2, 500, 1)),
             rng.uniform(-1.8, 1.8, (2, 500, 1)), rng.uniform(0, 1, (2, 500, 1))],
            axis=-1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        points, jnp.ones((2, 500), bool), TINY.voxel_size, TINY.pc_range,
        TINY.grid_size, TINY.max_voxels, TINY.max_points_per_voxel,
    )
    model = VoxelRCNN(TINY)
    variables = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, train=False
    )
    return model, variables, res.features, res.coords


def test_rpn_forward_and_proposals(setup):
    model, variables, feats, coords = setup
    preds = model.apply(variables, feats, coords, train=False)
    anchors = build_anchors(TINY)
    assert preds["cls"].shape[1] == anchors.shape[0]
    rois, roi_scores, roi_mask = proposal_layer(TINY, preds, anchors, train=False)
    assert rois.shape == (2, TINY.test_post_nms, 7)
    assert np.isfinite(np.asarray(rois)).all()


def test_rcnn_head_and_losses(setup):
    model, variables, feats, coords = setup
    preds = model.apply(variables, feats, coords, train=True,
                        mutable=["batch_stats"])[0]
    anchors = build_anchors(TINY)
    gt = jnp.asarray(
        np.array([[[8.0, 0.0, -0.5, 3.9, 1.6, 1.56, 0.2]]] * 2, np.float32)
    )
    gt_cls = jnp.zeros((2, 1), jnp.int32)
    gt_valid = jnp.ones((2, 1), bool)

    rpn_targets = assign_rpn_targets(TINY, anchors, gt, gt_cls, gt_valid)
    assert int((rpn_targets["labels"] == 1).sum()) >= 2  # force-match per sample

    rois, roi_scores, roi_mask = proposal_layer(TINY, preds, anchors, train=True)
    rcnn_targets = jax.vmap(
        lambda r, s, m, g, gv, key: sample_rois_for_training(
            key, r, s, m, g, gv, TINY.rcnn
        )
    )(rois, roi_scores, roi_mask, gt, gt_valid,
      jax.random.split(jax.random.PRNGKey(1), 2))
    assert rcnn_targets["rois"].shape == (2, TINY.rcnn.roi_per_image, 7)

    head = VoxelRCNNHead(TINY.rcnn, TINY.voxel_size, TINY.pc_range)
    # rebuild multi-scale features for the head
    _, ms = None, None
    # reuse the backbone's ms output via a fresh apply
    from df3d.models.backbones_3d import VoxelBackBone8x
    from df3d.ops.sparse import SparseTensor

    st = SparseTensor(feats, coords, TINY.sparse_shape)
    bb = VoxelBackBone8x(TINY.num_point_features, TINY.stage_caps)
    bvars = bb.init(jax.random.PRNGKey(2), st, False)
    _, ms = bb.apply(bvars, st, False)

    hvars = head.init(
        jax.random.PRNGKey(3), rcnn_targets["rois"], rcnn_targets["mask"], ms,
        train=False,
    )
    cls, reg = head.apply(
        hvars, rcnn_targets["rois"], rcnn_targets["mask"], ms, train=False
    )
    assert cls.shape == (2, TINY.rcnn.roi_per_image, 1)
    assert reg.shape == (2, TINY.rcnn.roi_per_image, 7)

    total, logs = voxel_rcnn_train_losses(
        TINY, preds, {"cls": cls, "reg": reg}, rpn_targets, rcnn_targets
    )
    assert np.isfinite(float(total)) and float(total) > 0
    assert "rcnn_corner_loss" in logs
