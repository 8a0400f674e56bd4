import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.tta import expand_points_double_flip, merge_center_head_maps
from df3d.models.vfe import PillarVFE, mean_vfe, pillar_scatter


def test_mean_vfe():
    pts = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    counts = jnp.asarray([2, 0])
    out = np.asarray(mean_vfe(pts, counts))
    np.testing.assert_allclose(out[0], pts[0, :2].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[1], 0.0)


def test_pillar_vfe_and_scatter():
    rng = np.random.RandomState(0)
    b, v, p, f = 2, 16, 8, 4
    pts = jnp.asarray(rng.randn(b, v, p, f).astype(np.float32))
    counts = jnp.asarray(rng.randint(0, p, (b, v)))
    coords = jnp.asarray(
        np.stack(
            [np.zeros((b, v)), rng.randint(0, 8, (b, v)), rng.randint(0, 8, (b, v))],
            axis=-1,
        ).astype(np.int32)
    )
    m = PillarVFE(num_filters=16, voxel_size=(0.5, 0.5, 4.0), pc_range=(0, -2, -3, 4, 2, 1))
    vs = m.init(jax.random.PRNGKey(0), pts, counts, coords, train=False)
    out = m.apply(vs, pts, counts, coords, train=False)
    assert out.shape == (b, v, 16)
    empty = np.asarray(counts) == 0
    assert np.abs(np.asarray(out)[empty]).max() == 0.0

    bev = pillar_scatter(out, coords, (8, 8))
    assert bev.shape == (b, 8, 8, 16)


def test_double_flip_expand_and_merge():
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 10, 4).astype(np.float32))
    ex = expand_points_double_flip(pts)
    assert ex.shape == (8, 10, 4)
    np.testing.assert_allclose(np.asarray(ex[1][:, 1]), -np.asarray(pts[0][:, 1]))
    np.testing.assert_allclose(np.asarray(ex[2][:, 0]), -np.asarray(pts[0][:, 0]))

    # merging identical un-flipped maps returns the original
    hm = jnp.asarray(rng.rand(1, 6, 6, 2).astype(np.float32))
    maps = {
        "hm": jnp.concatenate([hm, hm[:, ::-1], hm[:, :, ::-1], hm[:, ::-1, ::-1]]),
    }
    merged = merge_center_head_maps([maps])[0]
    np.testing.assert_allclose(np.asarray(merged["hm"]), np.asarray(hm), atol=1e-6)


def test_vsa_smoke():
    from df3d.models.pfe import VSAConfig, VSAScaleCfg, VoxelSetAbstraction
    from df3d.ops.sparse import SparseTensor

    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.uniform(-8, 8, (1, 128, 5)).astype(np.float32))
    valid = jnp.ones((1, 128), bool)
    coords = jnp.asarray(rng.randint(0, 16, (1, 64, 3)).astype(np.int32))
    feats = jnp.asarray(rng.randn(1, 64, 8).astype(np.float32))
    ms = {"conv1": SparseTensor(feats, coords, (16, 32, 32))}
    bev = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    cfg = VSAConfig(
        num_keypoints=32, scales=(VSAScaleCfg("conv1", 1, 1.0, nsample=4),),
        out_channels=32,
    )
    m = VoxelSetAbstraction(cfg, (0.5, 0.5, 0.5), (-8, -8, -4, 8, 8, 4))
    vs = m.init(jax.random.PRNGKey(0), pts, valid, ms, bev, train=False)
    kp, f = m.apply(vs, pts, valid, ms, bev, train=False)
    assert kp.shape == (1, 32, 3)
    assert f.shape == (1, 32, 32)
    assert np.isfinite(np.asarray(f)).all()
