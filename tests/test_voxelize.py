import jax.numpy as jnp
import numpy as np

from df3d.ops import voxelize as V


def _np_voxelize_mean(points, voxel_size, pc_range, grid, max_points):
    """Independent numpy reference: mean of first max_points per voxel."""
    vs = np.asarray(voxel_size)
    org = np.asarray(pc_range[:3])
    out = {}
    for p in points:
        c = np.floor((p[:3] - org) / vs).astype(int)[::-1]  # zyx
        if np.any(c < 0) or np.any(c >= np.asarray(grid)):
            continue
        key = tuple(c)
        out.setdefault(key, [])
        if len(out[key]) < max_points:
            out[key].append(p)
    return {k: np.mean(np.stack(v), axis=0) for k, v in out.items()}


def test_voxelize_matches_numpy_reference():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-4, 4, (200, 4)).astype(np.float32)
    vs, rng_box, grid = (0.5, 0.5, 0.5), (-4, -4, -4, 4, 4, 4), (16, 16, 16)
    res = V.voxelize(
        jnp.asarray(pts), jnp.ones(200, bool), vs, rng_box, grid,
        max_voxels=256, max_points_per_voxel=5,
    )
    ref = _np_voxelize_mean(pts, vs, rng_box, grid, max_points=5)
    n = int(res.num_voxels)
    assert n == len(ref)
    coords = np.asarray(res.coords)[:n]
    feats = np.asarray(res.features)[:n]
    for c, f in zip(coords, feats):
        np.testing.assert_allclose(f, ref[tuple(c)], atol=1e-4)


def test_voxelize_cap_and_padding():
    # 20 identical points -> one voxel, capped at 3 points
    pts = np.tile(np.array([[0.1, 0.1, 0.1, 7.0]], np.float32), (20, 1))
    valid = np.ones(20, bool)
    valid[10:] = False
    res = V.voxelize(
        jnp.asarray(pts), jnp.asarray(valid), (1, 1, 1), (-2, -2, -2, 2, 2, 2),
        (4, 4, 4), max_voxels=8, max_points_per_voxel=3,
    )
    assert int(res.num_voxels) == 1
    assert int(res.num_points[0]) == 3
    np.testing.assert_allclose(np.asarray(res.features[0]), pts[0], atol=1e-5)
    assert np.all(np.asarray(res.coords[1:]) == -1)
    # dropped points (beyond cap or invalid) have voxel id -1
    pv = np.asarray(res.point_voxel_id)
    assert (pv == 0).sum() == 3 and (pv == -1).sum() == 17


def test_voxelize_batch_shapes():
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 100, 4)).astype(np.float32))
    valid = jnp.ones((2, 100), bool)
    res = V.voxelize_batch(
        pts, valid, (0.5, 0.5, 0.5), (-4, -4, -4, 4, 4, 4), (16, 16, 16),
        max_voxels=128,
    )
    assert res.features.shape == (2, 128, 4)
    assert res.coords.shape == (2, 128, 3)
    nv = np.asarray(res.num_voxels)
    assert np.all(nv > 0)
    coords = np.asarray(res.coords)
    for b in range(2):
        assert np.all(coords[b, : nv[b]] >= 0)
        assert np.all(coords[b, nv[b]:] == -1)


def test_voxelize_jits():
    import jax

    fn = jax.jit(
        lambda p, v: V.voxelize(
            p, v, (0.5, 0.5, 0.5), (-4, -4, -4, 4, 4, 4), (16, 16, 16),
            max_voxels=64,
        )
    )
    res = fn(jnp.zeros((50, 4)), jnp.ones(50, bool))
    assert res.features.shape == (64, 4)


def test_voxelize_bitrank_matches_sort_without_cap():
    # with max_points high enough that no voxel hits the cap, the bitrank
    # path must agree with the sort path on every output (incl. the free
    # per-point voxel ids)
    rng = np.random.RandomState(2)
    pts = rng.uniform(-4, 4, (300, 5)).astype(np.float32)
    valid = np.ones(300, bool)
    valid[250:] = False
    args = ((0.5, 0.5, 0.5), (-4, -4, -4, 4, 4, 4), (16, 16, 16))
    a = V.voxelize(jnp.asarray(pts), jnp.asarray(valid), *args,
                   max_voxels=256, max_points_per_voxel=64)
    b = V.voxelize(jnp.asarray(pts), jnp.asarray(valid), *args,
                   max_voxels=256, max_points_per_voxel=64,
                   method="bitrank")
    assert int(a.num_voxels) == int(b.num_voxels)
    np.testing.assert_array_equal(np.asarray(a.coords), np.asarray(b.coords))
    np.testing.assert_array_equal(np.asarray(a.num_points),
                                  np.asarray(b.num_points))
    np.testing.assert_allclose(np.asarray(a.features),
                               np.asarray(b.features), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.point_voxel_id),
                                  np.asarray(b.point_voxel_id))
    assert b.packed_table is not None


def test_voxelize_bitrank_overflow_and_table_cells():
    # voxel cap smaller than occupancy: lowest-key voxels kept (same policy
    # as the sort path); table_cells extends the packed table to a larger
    # downstream grid without changing any output
    rng = np.random.RandomState(3)
    pts = rng.uniform(-4, 4, (400, 4)).astype(np.float32)
    args = ((0.5, 0.5, 0.5), (-4, -4, -4, 4, 4, 4), (16, 16, 16))
    a = V.voxelize(jnp.asarray(pts), jnp.ones(400, bool), *args,
                   max_voxels=32, max_points_per_voxel=64)
    b = V.voxelize(jnp.asarray(pts), jnp.ones(400, bool), *args,
                   max_voxels=32, max_points_per_voxel=64, method="bitrank",
                   table_cells=17 * 16 * 16)
    np.testing.assert_array_equal(np.asarray(a.coords), np.asarray(b.coords))
    np.testing.assert_allclose(np.asarray(a.features),
                               np.asarray(b.features), atol=1e-5)
    from df3d.ops import keytable
    assert b.packed_table.shape == (keytable.num_blocks(17 * 16 * 16), 16)
    # dropped points (overflowed voxels) are -1 in both
    np.testing.assert_array_equal(np.asarray(a.point_voxel_id),
                                  np.asarray(b.point_voxel_id))


def test_voxelize_bitrank_uncapped_mean_semantics():
    # bitrank has no max_points cap: 5 points in one voxel all contribute
    pts = np.array([[0.1, 0.1, 0.1, v] for v in (1.0, 2.0, 3.0, 4.0, 5.0)],
                   np.float32)
    res = V.voxelize(
        jnp.asarray(pts), jnp.ones(5, bool), (1, 1, 1), (-2, -2, -2, 2, 2, 2),
        (4, 4, 4), max_voxels=8, max_points_per_voxel=2, method="bitrank",
    )
    assert int(res.num_voxels) == 1
    assert int(res.num_points[0]) == 5  # uncapped count
    assert abs(float(res.features[0, 3]) - 3.0) < 1e-6  # mean of ALL points
