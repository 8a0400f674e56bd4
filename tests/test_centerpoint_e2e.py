"""End-to-end CenterPoint smoke test on tiny shapes: voxelize -> sparse
backbone -> RPN -> CenterHead -> loss & predict, under jit.

Mirrors the reference's config-driven forward smoke tests
(TransFusion/tests/test_models/test_forward.py pattern: fabricate inputs,
assert shapes and finite losses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from df3d.models.detectors.centerpoint import (
    CenterPoint, CenterPointConfig, centerpoint_loss, centerpoint_predict,
)
from df3d.ops.voxelize import voxelize_batch

TINY = CenterPointConfig(
    pc_range=(-16.0, -16.0, -2.4, 16.0, 16.0, 2.4),
    voxel_size=(0.5, 0.5, 0.2),
    grid_size=(24, 64, 64),
    max_voxels=512,
    num_point_features=4,
    stage_caps=(1024, 512, 256, 128),
    tasks=(1, 2),
    out_size_factor=8,
    code_weights=(1.0,) * 6 + (0.2, 0.2, 1.0, 1.0),
    max_objs=16,
    post_center_range=(-20.0, -20.0, -4.0, 20.0, 20.0, 4.0),
    nms_pre_max_size=64,
    nms_post_max_size=8,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    points = jnp.asarray(
        np.concatenate(
            [rng.uniform(-15, 15, (2, 600, 2)), rng.uniform(-1.8, 1.8, (2, 600, 1)),
             rng.uniform(0, 1, (2, 600, 1))], axis=-1
        ).astype(np.float32)
    )
    valid = jnp.ones((2, 600), bool)
    res = voxelize_batch(
        points, valid, TINY.voxel_size, TINY.pc_range, TINY.grid_size,
        TINY.max_voxels, TINY.max_points_per_voxel,
    )
    feats, coords = res.features, res.coords
    model = CenterPoint(TINY)
    variables = model.init(jax.random.PRNGKey(0), feats, coords, train=False)
    return model, variables, feats, coords


def test_forward_shapes(setup):
    model, variables, feats, coords = setup
    preds, ms = model.apply(variables, feats, coords, train=False)
    assert len(preds) == 2  # tasks
    b, h, w, _ = preds[0]["hm"].shape
    assert (b, h, w) == (2, 8, 8)
    assert preds[0]["hm"].shape[-1] == 1 and preds[1]["hm"].shape[-1] == 2
    assert preds[0]["reg"].shape[-1] == 2
    assert preds[0]["dim"].shape[-1] == 3
    assert set(ms.keys()) == {"conv1", "conv2", "conv3", "conv4"}


def test_loss_finite_and_differentiable(setup):
    model, variables, feats, coords = setup
    gt = jnp.array(
        [[[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3, 0.0, 0.0],
          [5.0, 5.0, 0.0, 2.0, 2.0, 2.0, 0.0, 1.0, 0.0]]] * 2
    )
    gt_cls = jnp.array([[0, 2]] * 2)
    gt_valid = jnp.ones((2, 2), bool)

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, coords, train=True,
            mutable=["batch_stats"],
        )[0]
        total, logs = centerpoint_loss(TINY, preds, gt, gt_cls, gt_valid)
        return total, logs

    (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert float(total) > 0
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), grads, 0.0
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_predict_static_shapes(setup):
    model, variables, feats, coords = setup
    preds, _ = model.apply(variables, feats, coords, train=False)
    out = jax.jit(lambda p: centerpoint_predict(TINY, p))(preds)
    k = 2 * TINY.nms_post_max_size  # tasks * post_max
    assert out["boxes"].shape == (2, k, 9)
    assert out["scores"].shape == (2, k)
    assert out["labels"].shape == (2, k)
    assert out["valid"].shape == (2, k)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_tta_double_flip_eval_step(setup):
    """make_centerpoint_eval_step(tta='double_flip') must run under jit and
    decode the same number of boxes per sample as the plain step (flip
    merge averages maps; shapes/structure unchanged)."""
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        create_centerpoint_state, make_centerpoint_eval_step,
    )

    rng = np.random.RandomState(3)
    points = jnp.asarray(
        np.concatenate(
            [rng.uniform(-15, 15, (1, 400, 2)),
             rng.uniform(-1.8, 1.8, (1, 400, 1)),
             rng.uniform(0, 1, (1, 400, 1))], axis=-1
        ).astype(np.float32)
    )
    batch = {"points": points, "points_valid": jnp.ones((1, 400), bool)}
    _, state = create_centerpoint_state(
        TINY, jax.random.PRNGKey(0), adam_onecycle(1e-3, 1), points,
    )
    model = CenterPoint(TINY)
    plain = jax.jit(make_centerpoint_eval_step(model, TINY))(state, batch)
    tta = jax.jit(
        make_centerpoint_eval_step(model, TINY, tta="double_flip")
    )(state, batch)
    assert tta["boxes"].shape == plain["boxes"].shape  # (B, ...) not B*4
    assert np.isfinite(np.asarray(tta["boxes"])).all()
    assert np.asarray(tta["scores"]).max() <= 1.0


def test_bf16_neck_head_close_to_f32():
    """set_compute_dtype_2d(bf16): same params, eval-mode neck+head outputs
    stay within bf16 tolerance of the f32 path (heatmap sigmoid scale)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from df3d.models import layers as L
    from df3d.models.heads.center_head import CenterHead
    from df3d.models.necks import BEVBackbone

    class NeckHead(L.nn.Module):
        @L.nn.compact
        def __call__(self, x, train):
            x = BEVBackbone(
                layer_nums=(2, 2), layer_strides=(1, 2),
                num_filters=(32, 64), upsample_strides=(1, 2),
                num_upsample_filters=(64, 64), name="neck",
            )(x, train)
            return CenterHead((1, 2), name="head")(x, train)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 32, 48).astype(np.float32))
    m = NeckHead()
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    ref = m.apply(vs, x, train=False)
    try:
        L.set_compute_dtype_2d(jnp.bfloat16)
        got = m.apply(vs, x, train=False)
    finally:
        L.set_compute_dtype_2d(None)
    for t, (r, g) in enumerate(zip(ref, got)):
        for k in r:
            rr, gg = np.asarray(r[k]), np.asarray(g[k])
            assert gg.dtype == np.float32  # final convs stay f32
            scale = max(np.abs(rr).max(), 1.0)
            assert np.abs(rr - gg).max() / scale < 0.1, (t, k)
