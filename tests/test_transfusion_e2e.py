"""TransFusion-L tiny end-to-end: SparseEncoder -> SECOND/FPN -> head ->
Hungarian loss + decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from df3d.models.detectors.transfusion import (
    TransFusionConfig, TransFusionL, transfusion_loss, transfusion_predict,
)
from df3d.models.heads.transfusion_head import TransFusionHeadCfg
from df3d.ops.voxelize import voxelize_batch

TINY = TransFusionConfig(
    pc_range=(-16.0, -16.0, -2.4, 16.0, 16.0, 2.4),
    voxel_size=(0.5, 0.5, 0.2),
    grid_size=(24, 64, 64),
    max_voxels=512,
    num_point_features=4,
    stage_caps=(1024, 512, 256, 128),
    head=TransFusionHeadCfg(
        num_classes=3,
        num_proposals=16,
        hidden_channel=32,
        num_heads=4,
        ffn_channel=64,
        small_classes=(2,),
        bev_size=(8, 8),
        out_size_factor=8,
        voxel_size=(0.5, 0.5),
        pc_range=(-16.0, -16.0),
    ),
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    points = jnp.asarray(
        np.concatenate(
            [rng.uniform(-15, 15, (2, 500, 2)), rng.uniform(-1.8, 1.8, (2, 500, 1)),
             rng.uniform(0, 1, (2, 500, 1))], axis=-1
        ).astype(np.float32)
    )
    res = voxelize_batch(
        points, jnp.ones((2, 500), bool), TINY.voxel_size, TINY.pc_range,
        TINY.grid_size, TINY.max_voxels,
    )
    model = TransFusionL(TINY)
    variables = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, train=False
    )
    return model, variables, res.features, res.coords


def test_forward_shapes(setup):
    model, variables, feats, coords = setup
    preds, ms = model.apply(variables, feats, coords, train=False)
    p = TINY.head.num_proposals
    assert preds["center"].shape == (2, p, 2)
    assert preds["dim"].shape == (2, p, 3)
    assert preds["cls"].shape == (2, p, 3)
    assert preds["dense_heatmap"].shape == (2, 8, 8, 3)
    assert preds["query_labels"].shape == (2, p)


def test_loss_with_hungarian(setup):
    model, variables, feats, coords = setup
    preds, _ = model.apply(variables, feats, coords, train=False)
    gt = jnp.asarray(
        np.array(
            [[[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3, 0.0, 0.0],
              [5.0, 5.0, 0.0, 2.0, 2.0, 2.0, -0.5, 1.0, 0.0]]] * 2,
            np.float32,
        )
    )
    gt_cls = jnp.array([[0, 2]] * 2)
    gt_valid = jnp.array([[True, True]] * 2)
    total, logs = transfusion_loss(TINY, preds, gt, gt_cls, gt_valid)
    assert np.isfinite(float(total)) and float(total) > 0
    assert int(logs["tf_matched"]) == 4  # every valid gt matched (2 per sample)


def test_loss_differentiable(setup):
    model, variables, feats, coords = setup
    gt = jnp.asarray(
        np.array([[[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3, 0.0, 0.0]]] * 2, np.float32)
    )
    gt_cls = jnp.zeros((2, 1), jnp.int32)
    gt_valid = jnp.ones((2, 1), bool)

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, coords, train=True, mutable=["batch_stats"],
        )[0]
        return transfusion_loss(TINY, preds, gt, gt_cls, gt_valid)[0]

    g = jax.grad(loss_fn)(variables["params"])
    gnorm = jax.tree_util.tree_reduce(lambda a, x: a + jnp.abs(x).sum(), g, 0.0)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_predict(setup):
    model, variables, feats, coords = setup
    preds, _ = model.apply(variables, feats, coords, train=False)
    out = transfusion_predict(TINY, preds)
    p = TINY.head.num_proposals
    assert out["boxes"].shape == (2, p, 9)
    assert out["scores"].shape == (2, p)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    assert np.all(np.asarray(out["scores"]) >= 0)
