"""Fusion-core module tests: gates, position encodings, LocalTransformer,
ACTR forward smoke (the paper's module on tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.fusion.actr import ACTR, ACTRConfig
from df3d.models.fusion.gates import GATES
from df3d.models.fusion.ifat import IFATGate
from df3d.models.fusion.pointformer import LocalTransformer
from df3d.models.fusion.position_encoding import (
    position_embedding_sine_2d, position_embedding_sine_depth,
    position_embedding_sine_sparse,
)


def test_gates_shapes_and_math():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
    for name, cls in GATES.items():
        m = cls()
        vs = m.init(jax.random.PRNGKey(0), a, b)
        oa, ob = m.apply(vs, a, b)
        assert oa.shape == a.shape and ob.shape == b.shape

    # verify BiGateSum1D_2 math against a manual numpy computation
    m = GATES["BiGateSum1D_2"]()
    vs = m.init(jax.random.PRNGKey(1), a, b)
    oa, ob = m.apply(vs, a, b)
    pa = vs["params"]["a_gate"]
    pb = vs["params"]["b_gate"]
    fused = np.asarray(a + b)
    ga = 1 / (1 + np.exp(-(fused @ np.asarray(pa["kernel"]) + np.asarray(pa["bias"]))))
    gb = 1 / (1 + np.exp(-(fused @ np.asarray(pb["kernel"]) + np.asarray(pb["bias"]))))
    np.testing.assert_allclose(np.asarray(oa), np.asarray(a) + np.asarray(b) * ga, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(b) + np.asarray(a) * gb, atol=1e-5)


def test_position_encodings():
    pe2 = position_embedding_sine_2d(8, 12, 64)
    assert pe2.shape == (8, 12, 128)
    coords = jnp.asarray(np.random.RandomState(0).rand(2, 10, 2).astype(np.float32))
    pes = position_embedding_sine_sparse(coords, 32)
    assert pes.shape == (2, 10, 64)
    ped = position_embedding_sine_depth(jnp.linspace(0, 60, 10), 64)
    assert ped.shape == (10, 64)
    assert np.isfinite(np.asarray(ped)).all()


def test_local_transformer_shapes_and_mask():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.uniform(-10, 10, (2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    valid = jnp.ones((2, 64), bool).at[:, 48:].set(False)
    m = LocalTransformer(npoint=16, radius=3.0, nsample=8, d_model=32, num_layers=1)
    vs = m.init(jax.random.PRNGKey(0), xyz, feats, valid)
    out = m.apply(vs, xyz, feats, valid)
    assert out.shape == (2, 64, 32)
    # invalid rows stay zero
    assert np.abs(np.asarray(out)[:, 48:]).max() == 0.0


def test_actr_forward_smoke():
    rng = np.random.RandomState(2)
    cfg = ACTRConfig(
        d_model=32, n_heads=4, n_points=2, n_levels=2, num_layers=1,
        dim_feedforward=64, lt_npoint=8, lt_nsample=4,
    )
    b, q = 2, 24
    q_feat = jnp.asarray(rng.randn(b, q, 16).astype(np.float32))
    q_i_feat = jnp.asarray(rng.randn(b, q, 12).astype(np.float32))
    ref = jnp.asarray(rng.rand(b, q, 2).astype(np.float32))
    lidar_grid = jnp.asarray(rng.uniform(0, 50, (b, q, 3)).astype(np.float32))
    mask = jnp.ones((b, q), bool).at[:, 20:].set(False)
    i_feats = [
        jnp.asarray(rng.randn(b, 8, 12, 24).astype(np.float32)),
        jnp.asarray(rng.randn(b, 4, 6, 24).astype(np.float32)),
    ]
    m = ACTR(cfg)
    vs = m.init(
        jax.random.PRNGKey(0), q_feat, q_i_feat, ref, lidar_grid, mask, i_feats
    )
    out = m.apply(vs, q_feat, q_i_feat, ref, lidar_grid, mask, i_feats)
    assert out.shape == (b, q, 32)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)[:, 20:]).max() == 0.0  # masked queries


def test_actr_gradients_flow():
    rng = np.random.RandomState(3)
    cfg = ACTRConfig(
        d_model=16, n_heads=2, n_points=2, n_levels=1, num_layers=1,
        dim_feedforward=32, model_name="ACTR",  # no LT for speed
    )
    b, q = 1, 8
    q_feat = jnp.asarray(rng.randn(b, q, 8).astype(np.float32))
    q_i_feat = jnp.asarray(rng.randn(b, q, 8).astype(np.float32))
    ref = jnp.asarray(rng.rand(b, q, 2).astype(np.float32))
    grid = jnp.asarray(rng.uniform(0, 50, (b, q, 3)).astype(np.float32))
    mask = jnp.ones((b, q), bool)
    i_feats = [jnp.asarray(rng.randn(b, 6, 8, 8).astype(np.float32))]
    m = ACTR(cfg)
    vs = m.init(jax.random.PRNGKey(0), q_feat, q_i_feat, ref, grid, mask, i_feats)

    def loss(params, img):
        return m.apply({"params": params}, q_feat, q_i_feat, ref, grid, mask, [img]).sum()

    g_params, g_img = jax.grad(loss, argnums=(0, 1))(vs["params"], i_feats[0])
    assert float(jnp.abs(g_img).sum()) > 0  # gradient reaches image features


def test_ifat_gate():
    rng = np.random.RandomState(4)
    img = [jnp.asarray(rng.randn(2, 8, 12, 16).astype(np.float32))]
    vox = [jnp.asarray(rng.randn(2, 20, 16).astype(np.float32))]
    uv = [jnp.asarray(rng.rand(2, 20, 2).astype(np.float32))]
    mask = [jnp.ones((2, 20), bool)]
    m = IFATGate(num_scales=1)
    vs = m.init(jax.random.PRNGKey(0), img, vox, uv, mask)
    out = m.apply(vs, img, vox, uv, mask, mutable=["batch_stats"])[0]
    assert out[0].shape == img[0].shape
    # output is img * sigmoid(gate): bounded by |img|
    assert np.all(np.abs(np.asarray(out[0])) <= np.abs(np.asarray(img[0])) + 1e-6)


def test_ifat_variants():
    import jax

    from df3d.models.fusion.ifat import IFAT_GATES

    rng = np.random.RandomState(5)
    img = [jnp.asarray(rng.randn(1, 8, 12, 16).astype(np.float32))]
    vox = [jnp.asarray(rng.randn(1, 20, 16).astype(np.float32))]
    xyz = [jnp.asarray(rng.randn(1, 20, 3).astype(np.float32))]
    uv = [jnp.asarray(rng.rand(1, 20, 2).astype(np.float32))]
    mask = [jnp.ones((1, 20), bool)]

    for name, cls in IFAT_GATES.items():
        m = cls(num_scales=1)
        if name == "BasicGateXYZ":
            args = (img, vox, xyz, uv, mask)
        elif name == "MultiVoxelPatchGate":
            args = (img, vox, uv, mask)
        else:
            args = (img, vox, uv, mask)
        vs = m.init(jax.random.PRNGKey(0), *args)
        out = m.apply(vs, *args, mutable=["batch_stats"])[0]
        assert out[0].shape == img[0].shape, name
        assert np.all(
            np.abs(np.asarray(out[0])) <= np.abs(np.asarray(img[0])) + 1e-6
        ), name


def test_actr_exact_ops_path():
    """ACTRConfig.exact_ops=True (checkpoint-parity mode, ADVICE r2) runs
    the exact FPS (chunks=1) + exact ball query through the ACTRv2
    LocalTransformer and produces finite, mask-respecting output."""
    rng = np.random.RandomState(5)
    cfg = ACTRConfig(
        d_model=32, n_heads=4, n_points=2, n_levels=2, num_layers=1,
        dim_feedforward=64, lt_npoint=8, lt_nsample=4,
        model_name="ACTRv2", exact_ops=True,
    )
    b, q = 1, 24
    q_feat = jnp.asarray(rng.randn(b, q, 16).astype(np.float32))
    q_i_feat = jnp.asarray(rng.randn(b, q, 12).astype(np.float32))
    ref = jnp.asarray(rng.rand(b, q, 2).astype(np.float32))
    lidar_grid = jnp.asarray(rng.uniform(0, 50, (b, q, 3)).astype(np.float32))
    mask = jnp.ones((b, q), bool).at[:, 20:].set(False)
    i_feats = [
        jnp.asarray(rng.randn(b, 8, 12, 24).astype(np.float32)),
        jnp.asarray(rng.randn(b, 4, 6, 24).astype(np.float32)),
    ]
    m = ACTR(cfg)
    vs = m.init(
        jax.random.PRNGKey(0), q_feat, q_i_feat, ref, lidar_grid, mask,
        i_feats)
    out = m.apply(vs, q_feat, q_i_feat, ref, lidar_grid, mask, i_feats)
    assert out.shape == (b, q, 32)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)[:, 20:]).max() == 0.0
