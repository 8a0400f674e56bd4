import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.focal_conv import FocalSparseConv, focal_conv_importance_loss
from df3d.models.fusion.pointformer_extra import (
    GlobalTransformer, LinformerEncoderLayer, LocalGlobalTransformer,
)
from df3d.ops.sparse import SparseTensor, build_subm_plan


def _sparse(rng, b=1, n=48, pad=64, shape=(8, 16, 16), c=8):
    coords, feats = [], []
    for _ in range(b):
        sites = set()
        while len(sites) < n:
            sites.add(tuple(rng.randint(0, s) for s in shape))
        cs = np.array(sorted(sites), np.int32)
        coords.append(np.concatenate([cs, -np.ones((pad - n, 3), np.int32)]))
        feats.append(
            np.concatenate(
                [rng.randn(n, c).astype(np.float32), np.zeros((pad - n, c), np.float32)]
            )
        )
    return SparseTensor(jnp.asarray(np.stack(feats)), jnp.asarray(np.stack(coords)), shape)


def test_focal_sparse_conv_prunes():
    rng = np.random.RandomState(0)
    st = _sparse(rng)
    plan = build_subm_plan(st, 3)
    m = FocalSparseConv(out_channels=16, keep_ratio=0.5)
    vs = m.init(jax.random.PRNGKey(0), st, plan, train=False)
    (out, imp), _ = m.apply(vs, st, plan, train=False, mutable=["batch_stats"])
    kept = int(np.asarray(out.valid).sum())
    assert 0 < kept <= 33  # ~half of 64 slots (48 valid)
    assert imp.shape == (1, 64)

    gt = jnp.asarray(np.array([[[2.0, 2.0, 1.0, 2.0, 2.0, 2.0, 0.0]]], np.float32))
    loss = focal_conv_importance_loss(
        imp, st, gt, jnp.ones((1, 1), bool), (0.5, 0.5, 0.5), (0, 0, 0, 8, 8, 4)
    )
    assert np.isfinite(float(loss))


def test_global_and_linformer_shapes():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.uniform(-5, 5, (2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    valid = jnp.ones((2, 64), bool).at[:, 50:].set(False)

    g = GlobalTransformer(npoint=16, d_model=32)
    vs = g.init(jax.random.PRNGKey(0), xyz, feats, valid)
    out = g.apply(vs, xyz, feats, valid)
    assert out.shape == (2, 64, 32)
    assert np.abs(np.asarray(out)[:, 50:]).max() == 0.0

    lin = LinformerEncoderLayer(d_model=32, proj_k=8)
    vs = lin.init(jax.random.PRNGKey(0), feats, valid)
    out = lin.apply(vs, feats, valid)
    assert out.shape == (2, 64, 32)

    lg = LocalGlobalTransformer(
        npoint_local=16, npoint_global=8, radius=3.0, nsample=4, d_model=32
    )
    vs = lg.init(jax.random.PRNGKey(0), xyz, feats, valid)
    out = lg.apply(vs, xyz, feats, valid)
    assert out.shape == (2, 64, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_basic_down_block_shapes():
    from df3d.models.fusion.pointformer_extra import BasicDownBlock

    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.uniform(-5, 5, (2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
    valid = jnp.ones((2, 64), bool).at[:, 48:].set(False)

    blk = BasicDownBlock(npoint=16, radius=3.0, nsample=4, d_model=32,
                         d_out=48, num_layers=1)
    vs = blk.init(jax.random.PRNGKey(0), xyz, feats, valid)
    new_xyz, out, fps_idx = blk.apply(vs, xyz, feats, valid)
    assert new_xyz.shape == (2, 16, 3)
    assert out.shape == (2, 16, 48)
    assert fps_idx.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_iactrv2_shapes_and_scatter():
    from df3d.models.fusion.actr import ACTRConfig
    from df3d.models.fusion.iactr import IACTRv2

    rng = np.random.RandomState(3)
    cfg = ACTRConfig(
        d_model=16, n_heads=2, n_points=2, n_levels=2, num_layers=1,
        dim_feedforward=32, pos_encode_method="image_coor",
    )
    i_feats = [jnp.asarray(rng.randn(1, 8, 12, 24).astype(np.float32)),
               jnp.asarray(rng.randn(1, 4, 6, 24).astype(np.float32))]
    # splat maps: a handful of hit pixels per level
    p0 = np.zeros((1, 8, 12, 24), np.float32)
    p0[0, 2, 3] = 1.0
    p0[0, 5, 7] = 2.0
    p1 = np.zeros((1, 4, 6, 24), np.float32)
    p1[0, 1, 2] = 1.5
    p_feats = [jnp.asarray(p0), jnp.asarray(p1)]

    mod = IACTRv2(cfg, max_ne=8)
    vs = mod.init(jax.random.PRNGKey(0), i_feats, p_feats)
    outs = mod.apply(vs, i_feats, p_feats)
    assert outs[0].shape == (1, 8, 12, 16)
    assert outs[1].shape == (1, 4, 6, 16)
    o0 = np.asarray(outs[0])
    # enhanced only at splat-hit pixels; zeros elsewhere
    assert np.abs(o0[0, 2, 3]).max() > 0
    assert np.abs(o0[0, 5, 7]).max() > 0
    hit = np.zeros((8, 12), bool)
    hit[2, 3] = hit[5, 7] = True
    assert np.abs(o0[0][~hit]).max() == 0.0
