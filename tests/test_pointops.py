import jax.numpy as jnp
import numpy as np

from df3d.ops import pointops as P


def test_fps_spreads_points():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-10, 10, (100, 3)).astype(np.float32))
    valid = jnp.ones(100, bool)
    idx = np.asarray(P.furthest_point_sample(xyz, valid, 8))
    assert len(set(idx.tolist())) == 8  # all distinct
    # fps picks extremes: min pairwise distance among samples is large
    pts = np.asarray(xyz)[idx]
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 2.0


def test_fps_ignores_invalid():
    xyz = jnp.asarray(
        np.concatenate([np.zeros((5, 3)), np.full((5, 3), 100.0)]).astype(np.float32)
    )
    valid = jnp.asarray([True] * 5 + [False] * 5)
    idx = np.asarray(P.furthest_point_sample(xyz, valid, 4))
    assert np.all(idx < 5)


def test_ball_query_matches_bruteforce():
    rng = np.random.RandomState(1)
    xyz = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    centers = rng.uniform(-5, 5, (8, 3)).astype(np.float32)
    valid = np.ones(64, bool)
    valid[50:] = False
    idx, mask = P.ball_query(
        jnp.asarray(centers), jnp.asarray(xyz), jnp.asarray(valid), 2.0, 16
    )
    idx, mask = np.asarray(idx), np.asarray(mask)
    for s in range(8):
        want = [
            i for i in range(64)
            if valid[i] and np.sum((xyz[i] - centers[s]) ** 2) <= 4.0
        ][:16]
        got = idx[s][mask[s]].tolist()
        assert got == want


def test_knn():
    xyz = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0], [5, 0, 0]], np.float32))
    q = jnp.asarray(np.array([[0.4, 0, 0]], np.float32))
    idx, d2 = P.knn(q, xyz, jnp.ones(3, bool), 2)
    assert np.asarray(idx)[0].tolist() == [0, 1]


def test_three_nn_interpolate_exact_at_support():
    rng = np.random.RandomState(2)
    support = jnp.asarray(rng.uniform(-5, 5, (32, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(32, 4).astype(np.float32))
    out = P.three_nn_interpolate(support[:5], support, jnp.ones(32, bool), feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats[:5]), atol=1e-3)
