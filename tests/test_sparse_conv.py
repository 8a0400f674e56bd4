"""Sparse conv numerics vs dense lax.conv golden reference.

Mirrors the reference's own testing pattern (its CUDA ops ship a slow
reference impl + agreement check); here the golden model is XLA's dense 3D
convolution on the densified sparse tensor.
"""

import jax
import jax.numpy as jnp
import numpy as np

import df3d.ops.sparse as _sp
from df3d.ops import keytable
from df3d.ops.sparse import (
    SparseTensor, apply_sparse_conv, build_conv_plan, build_subm_plan,
)


def _keys_of(coords, shape):
    """(N, 3) zyx coords -> flat keys (padding rows get 0, masked by the
    valid flag the caller passes alongside)."""
    z, y, x = shape
    c = jnp.maximum(coords, 0)
    return (c[:, 0] * y + c[:, 1]) * x + c[:, 2]


def _random_sparse(rng, batch=2, shape=(8, 12, 12), n=64, cin=5, pad_to=96,
                   rows_sorted=False):
    """Per-sample random occupancy: (B, pad_to) rows, n valid. Coords are
    emitted key-sorted, so rows_sorted=True is a valid claim here."""
    all_coords, all_feats = [], []
    for _ in range(batch):
        sites = set()
        while len(sites) < n:
            sites.add(tuple(rng.randint(0, s) for s in shape))
        coords = np.array(sorted(sites), np.int32)
        feats = rng.randn(n, cin).astype(np.float32)
        pad = pad_to - n
        all_coords.append(np.concatenate([coords, -np.ones((pad, 3), np.int32)]))
        all_feats.append(np.concatenate([feats, np.zeros((pad, cin), np.float32)]))
    return SparseTensor(
        jnp.asarray(np.stack(all_feats)), jnp.asarray(np.stack(all_coords)),
        shape, rows_sorted=rows_sorted,
    )


def _dense_conv(dense, weights, ksize, stride, pad):
    """dense (B, Z, Y, X, C); weights (K, Cin, Cout) row-major zyx taps."""
    kz, ky, kx = ksize
    w = weights.reshape(kz, ky, kx, weights.shape[-2], weights.shape[-1])
    return jax.lax.conv_general_dilated(
        dense, w, window_strides=(stride,) * 3,
        padding=[(pad, pad)] * 3,
        dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
    )


def _check_against_dense(st_or_coords, got, ref):
    coords = np.asarray(st_or_coords)
    got = np.asarray(got)
    ref = np.asarray(ref)
    for b in range(coords.shape[0]):
        for i, (z, y, x) in enumerate(coords[b]):
            if z < 0:
                continue
            np.testing.assert_allclose(got[b, i], ref[b, z, y, x], atol=1e-4)


def test_subm_conv_matches_dense_at_input_sites():
    rng = np.random.RandomState(0)
    st = _random_sparse(rng)
    w = jnp.asarray(rng.randn(27, 5, 7).astype(np.float32) * 0.1)
    plan = build_subm_plan(st, 3)
    out = apply_sparse_conv(st.features, plan, w)
    ref = _dense_conv(st.to_dense(), w, (3, 3, 3), 1, 1)
    _check_against_dense(st.coords, out, ref)
    # padding rows produce zeros (gather hits the zero pad row)
    got = np.asarray(out)
    pad_mask = np.asarray(st.coords)[..., 0] < 0
    assert np.abs(got[pad_mask]).max() == 0.0


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(1)
    st = _random_sparse(rng, shape=(8, 12, 12), n=80, pad_to=96)
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.1)
    plan = build_conv_plan(st, 3, 2, 1, max_out=160)
    out = apply_sparse_conv(st.features, plan, w)
    ref = np.asarray(_dense_conv(st.to_dense(), w, (3, 3, 3), 2, 1))
    assert plan.out_spatial_shape == (4, 6, 6)
    _check_against_dense(plan.out_coords, out, ref)
    # every nonzero dense output site must be covered by the plan
    oc = np.asarray(plan.out_coords)
    for b in range(2):
        nz = np.argwhere(np.abs(ref[b]).sum(-1) > 1e-6)
        covered = {tuple(c) for c in oc[b] if c[0] >= 0}
        for site in nz:
            assert tuple(site) in covered


def test_asymmetric_kernel_stride():
    """conv taps like the backbones' final (3,1,1) stride (2,1,1) layer."""
    rng = np.random.RandomState(2)
    st = _random_sparse(rng, shape=(7, 8, 8), n=48, pad_to=64)
    w = jnp.asarray(rng.randn(3, 5, 4).astype(np.float32) * 0.1)
    plan = build_conv_plan(st, (3, 1, 1), (2, 1, 1), (0, 0, 0), max_out=64)
    out = apply_sparse_conv(st.features, plan, w)
    wf = w.reshape(3, 1, 1, 5, 4)
    ref = jax.lax.conv_general_dilated(
        st.to_dense(), wf, window_strides=(2, 1, 1), padding=[(0, 0)] * 3,
        dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
    )
    _check_against_dense(plan.out_coords, out, ref)


def test_plan_reuse_is_pure_function_of_coords():
    rng = np.random.RandomState(3)
    st = _random_sparse(rng)
    p1 = build_subm_plan(st, 3)
    p2 = build_subm_plan(st.with_features(st.features * 2), 3)
    np.testing.assert_array_equal(np.asarray(p1.gather_idx), np.asarray(p2.gather_idx))


def test_to_dense_round_trip():
    rng = np.random.RandomState(4)
    st = _random_sparse(rng, n=32, pad_to=48)
    dense = np.asarray(st.to_dense())
    coords = np.asarray(st.coords)
    feats = np.asarray(st.features)
    for b in range(2):
        for i, (z, y, x) in enumerate(coords[b]):
            if z < 0:
                continue
            np.testing.assert_allclose(dense[b, z, y, x], feats[b, i])
    np.testing.assert_allclose(
        dense.sum(), feats[coords[..., 0] >= 0].sum(), rtol=1e-5
    )


def test_batch_independence():
    """Conv of a batch == conv of each sample alone (no cross-sample leaks)."""
    rng = np.random.RandomState(5)
    st = _random_sparse(rng, batch=2, n=40, pad_to=48)
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.1)
    plan = build_subm_plan(st, 3)
    out = np.asarray(apply_sparse_conv(st.features, plan, w))
    for b in range(2):
        solo = SparseTensor(st.features[b:b+1], st.coords[b:b+1], st.spatial_shape)
        plan_b = build_subm_plan(solo, 3)
        out_b = np.asarray(apply_sparse_conv(solo.features, plan_b, w))[0]
        np.testing.assert_allclose(out[b], out_b, atol=1e-5)


def test_sort_path_matches_dense_path(monkeypatch):
    """Force the searchsorted fallback and compare against the dense-table
    strategy (both rulebook lookups must agree)."""
    import df3d.ops.sparse as S

    rng = np.random.RandomState(7)
    st = _random_sparse(rng, shape=(8, 12, 12), n=64, pad_to=96)
    plan_dense = build_subm_plan(st, 3)
    conv_dense = build_conv_plan(st, 3, 2, 1, max_out=160)
    monkeypatch.setattr(S, "_TABLE_BUDGET", 0)
    plan_sort = build_subm_plan(st, 3)
    conv_sort = build_conv_plan(st, 3, 2, 1, max_out=160)
    np.testing.assert_array_equal(
        np.asarray(plan_dense.gather_idx), np.asarray(plan_sort.gather_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(conv_dense.out_coords), np.asarray(conv_sort.out_coords)
    )
    np.testing.assert_array_equal(
        np.asarray(conv_dense.gather_idx), np.asarray(conv_sort.gather_idx)
    )


def test_conv_plan_cap_overflow_truncates_by_key_order():
    """When unique outputs exceed max_out, the lowest linearized keys are
    kept and the rest dropped (documented static-cap behavior)."""
    rng = np.random.RandomState(9)
    st = _random_sparse(rng, batch=1, shape=(8, 12, 12), n=80, pad_to=96)
    full = build_conv_plan(st, 3, 2, 1, max_out=256)
    n_unique = int((np.asarray(full.out_coords)[0, :, 0] >= 0).sum())
    assert n_unique > 16
    small = build_conv_plan(st, 3, 2, 1, max_out=16)
    oc_small = np.asarray(small.out_coords)[0]
    oc_full = np.asarray(full.out_coords)[0][:16]
    np.testing.assert_array_equal(oc_small, oc_full)  # prefix preserved


def test_sorted_rows_plan_matches_unsorted():
    """rows_sorted=True (rank == row fast path) must produce the identical
    plan as the argsort-mapped path on the same (already sorted) coords."""
    rng = np.random.RandomState(11)
    st = _random_sparse(rng, rows_sorted=False)
    st_sorted = _random_sparse(np.random.RandomState(11), rows_sorted=True)
    p_u = build_subm_plan(st, 3)
    p_s = build_subm_plan(st_sorted, 3)
    np.testing.assert_array_equal(
        np.asarray(p_u.gather_idx), np.asarray(p_s.gather_idx))
    c_u = build_conv_plan(st, 3, 2, 1, max_out=160)
    c_s = build_conv_plan(st_sorted, 3, 2, 1, max_out=160)
    np.testing.assert_array_equal(
        np.asarray(c_u.gather_idx), np.asarray(c_s.gather_idx))
    np.testing.assert_array_equal(
        np.asarray(c_u.out_coords), np.asarray(c_s.out_coords))


def test_unsorted_rows_construction_still_correct():
    """Manually shuffled (unsorted) rows with rows_sorted=False must still
    produce a correct subm conv (argsort rank->row mapping)."""
    rng = np.random.RandomState(14)
    st = _random_sparse(rng, batch=1, n=48, pad_to=64)
    perm = rng.permutation(64)
    st_shuf = SparseTensor(
        st.features[:, perm], st.coords[:, perm], st.spatial_shape
    )
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.1)
    plan = build_subm_plan(st_shuf, 3)
    out = apply_sparse_conv(st_shuf.features, plan, w)
    ref = _dense_conv(st_shuf.to_dense(), w, (3, 3, 3), 1, 1)
    _check_against_dense(st_shuf.coords, out, ref)


def test_voxelize_cap_overflow():
    """More occupied voxels than max_voxels: first-by-key kept, counts clamp."""
    from df3d.ops import voxelize as V

    rng = np.random.RandomState(10)
    pts = jnp.asarray(rng.uniform(-4, 4, (500, 4)).astype(np.float32))
    res = V.voxelize(
        pts, jnp.ones(500, bool), (0.5, 0.5, 0.5), (-4, -4, -4, 4, 4, 4),
        (16, 16, 16), max_voxels=32, max_points_per_voxel=5,
    )
    assert int(res.num_voxels) == 32
    coords = np.asarray(res.coords)
    assert np.all(coords[:, 0] >= 0)  # all slots filled
    # dropped points flagged -1
    assert (np.asarray(res.point_voxel_id) == -1).sum() > 0


def test_true_occupancy_and_overflow_observable():
    """Strided plans report TRUE dilated occupancy before the cap
    (spconv never truncates; overflow = true_occ - N_out must be
    measurable), and behave gracefully at 2x overflow: all slots filled
    with the lowest-key prefix of the full output set."""
    rng = np.random.RandomState(31)
    st = _random_sparse(rng, batch=1, shape=(8, 12, 12), n=80, pad_to=96,
                        rows_sorted=True)
    full = build_conv_plan(st, 3, 2, 1, max_out=512)
    n_true = int((np.asarray(full.out_coords)[0, :, 0] >= 0).sum())
    assert int(full.true_occ[0]) == n_true

    half = build_conv_plan(st, 3, 2, 1, max_out=n_true // 2)
    assert int(half.true_occ[0]) == n_true  # still reports the TRUE count
    oc = np.asarray(half.out_coords)[0]
    assert (oc[:, 0] >= 0).all()  # every slot used at overflow
    np.testing.assert_array_equal(oc, np.asarray(full.out_coords)[0][: len(oc)])


def test_backbone_sows_cap_overflow():
    """Backbones expose per-downsample cap overflow via the intermediates
    collection (fetch with mutable=['intermediates'])."""
    import jax

    from df3d.models.backbones_3d import VoxelBackBone8x

    rng = np.random.RandomState(32)
    st = _random_sparse(rng, batch=1, shape=(33, 24, 24), n=256, pad_to=256,
                        cin=4, rows_sorted=True)
    bb = VoxelBackBone8x(4, (256, 32, 24, 16))  # tight caps -> overflow
    vars_ = bb.init(jax.random.PRNGKey(0), st, False)
    (_, _), aux = bb.apply(vars_, st, False, mutable=["intermediates"])
    inter = aux["intermediates"]
    assert "cap_overflow_down2" in inter
    over = int(inter["cap_overflow_down2"][0][0])
    assert over > 0  # 256 sites dilate past the 32 cap


def test_compute_dtype_min_channels_gate():
    """set_compute_dtype(bf16, min_channels=64): small-channel convs stay
    exactly f32 (v5e 16-ch rows would regress in bf16 — probe 18 C), wide
    convs convert but stay within bf16 tolerance of the f32 result."""
    rng = np.random.RandomState(11)
    st_small = _random_sparse(rng, cin=5)
    w_small = jnp.asarray(rng.randn(27, 5, 7).astype(np.float32) * 0.1)
    plan_small = build_subm_plan(st_small, 3)
    st_wide = _random_sparse(rng, cin=64)
    w_wide = jnp.asarray(rng.randn(27, 64, 64).astype(np.float32) * 0.05)
    plan_wide = build_subm_plan(st_wide, 3)

    ref_small = apply_sparse_conv(st_small.features, plan_small, w_small)
    ref_wide = apply_sparse_conv(st_wide.features, plan_wide, w_wide)
    _sp.set_compute_dtype(jnp.bfloat16, min_channels=64)
    try:
        got_small = apply_sparse_conv(st_small.features, plan_small, w_small)
        got_wide = apply_sparse_conv(st_wide.features, plan_wide, w_wide)
    finally:
        _sp.set_compute_dtype(None)

    # below the gate: bit-identical f32 (no conversion happened)
    np.testing.assert_array_equal(np.asarray(got_small), np.asarray(ref_small))
    # at/above the gate: converted (bf16 out) and numerically close
    assert got_wide.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_wide, np.float32), np.asarray(ref_wide),
        rtol=0.05, atol=0.15,
    )


def test_packed_table_reuse_matches_rebuild():
    # a producer-supplied packed table (e.g. the bitrank voxelizer's; r5:
    # strided plans no longer emit one — the mini-rank table replaced the
    # pack_occupancy that produced it for free) attached to a SparseTensor
    # must give the subm plan EXACTLY the same gather indices as a
    # from-scratch pack_keys build — including when the cap truncates
    # (ranks beyond the row cap clamp to the miss row)
    rng = np.random.RandomState(7)
    st = _random_sparse(rng, batch=2, shape=(8, 12, 12), n=64, cin=5,
                        rows_sorted=True)
    for max_out in (96, 20):  # no-overflow and hard-overflow
        plan = build_conv_plan(st, 3, 2, 1, max_out=max_out)
        assert plan.out_packed is None  # r5: by design (see build_conv_plan)
        oz, oy, ox = plan.out_spatial_shape
        cells = oz * oy * ox
        # synthesize the producer table from the TRUE (uncapped) occupancy,
        # exactly like the bitrank voxelizer would over this grid
        full = build_conv_plan(st, 3, 2, 1, max_out=256)
        feats = jnp.zeros((2, max_out, 4))
        packed = jnp.stack([
            keytable.pack_keys(
                _keys_of(full.out_coords[b], (oz, oy, ox)),
                full.out_coords[b, :, 0] >= 0, cells)
            for b in range(2)])
        out_with = SparseTensor(
            feats, plan.out_coords[:, :max_out], plan.out_spatial_shape,
            rows_sorted=True, packed_table=packed,
            packed_table_grid=tuple(plan.out_spatial_shape))
        out_without = SparseTensor(
            feats, plan.out_coords[:, :max_out], plan.out_spatial_shape,
            rows_sorted=True)
        p_with = build_subm_plan(out_with, 3)
        p_without = build_subm_plan(out_without, 3)
        np.testing.assert_array_equal(
            np.asarray(p_with.gather_idx), np.asarray(p_without.gather_idx))


def test_packed_table_reuse_toggle_and_mismatch_fallback():
    rng = np.random.RandomState(8)
    st = _random_sparse(rng, batch=1, shape=(6, 10, 10), n=48, cin=3,
                        rows_sorted=True)
    plan = build_conv_plan(st, 3, 2, 1, max_out=64)
    out = SparseTensor(
        jnp.zeros((1, 64, 3)), plan.out_coords, plan.out_spatial_shape,
        rows_sorted=True, packed_table=plan.out_packed,
        packed_table_grid=tuple(plan.out_spatial_shape))
    ref = build_subm_plan(out, 3).gather_idx
    # toggle off -> rebuild path, same answer
    _sp.set_plan_table_reuse(False)
    try:
        alt = build_subm_plan(out, 3).gather_idx
    finally:
        _sp.set_plan_table_reuse(True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(alt))
    # a table built over a DIFFERENT grid is ignored, not used — including
    # a same-cell-count (Z, Y, X) refactorization, which a block-count or
    # cell-count guard would have accepted (ADVICE r3)
    oz, oy, ox = plan.out_spatial_shape
    for bad_grid in ((3, 8, 56), (oz, ox, oy)):
        bad = SparseTensor(
            jnp.zeros((1, 64, 3)), plan.out_coords, plan.out_spatial_shape,
            rows_sorted=True, packed_table=plan.out_packed,
            packed_table_grid=bad_grid)
        np.testing.assert_array_equal(
            np.asarray(build_subm_plan(bad, 3).gather_idx), np.asarray(ref))


def test_voxelize_bitrank_table_feeds_subm_plan():
    # end-to-end: bitrank voxelize -> SparseTensor with packed_table ->
    # subm conv matches the dense conv at input sites
    from df3d.ops.voxelize import voxelize

    rng = np.random.RandomState(9)
    pts = rng.uniform(-4, 4, (200, 4)).astype(np.float32)
    grid = (16, 16, 16)
    res = voxelize(jnp.asarray(pts), jnp.ones(200, bool), (0.5, 0.5, 0.5),
                   (-4, -4, -4, 4, 4, 4), grid, max_voxels=128,
                   method="bitrank", table_cells=17 * 16 * 16)
    # voxelize() is per-sample; add the batch dim to everything
    st = SparseTensor(res.features[None], res.coords[None], (17, 16, 16),
                      rows_sorted=True, packed_table=res.packed_table[None],
                      packed_table_grid=(17, 16, 16))
    plan = build_subm_plan(st, 3)
    w = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32))
    got = apply_sparse_conv(st.features, plan, w)
    ref = _dense_conv(st.to_dense(), w, (3, 3, 3), 1, 1)
    _check_against_dense(st.coords, got, ref)


def test_subm_bwd_gather_matches_autodiff():
    """The symmetric-plan custom vjp (r5: dx via a gather with reversed-
    transposed taps, dW via re-gather) must match autodiff through the
    plain gather formulation — values AND both gradients."""
    rng = np.random.RandomState(11)
    st = _random_sparse(rng, rows_sorted=True)
    plan = build_subm_plan(st, 3)
    w = jnp.asarray(rng.randn(27, 5, 7).astype(np.float32) * 0.2)
    feats = st.features
    tgt = jnp.asarray(rng.randn(2, feats.shape[1], 7).astype(np.float32))

    def loss(f, w_):
        out = apply_sparse_conv(f, plan, w_)
        return ((out - tgt) ** 2).sum()

    _sp.set_subm_bwd_gather(True)
    try:
        v1, (df1, dw1) = jax.value_and_grad(loss, argnums=(0, 1))(feats, w)
    finally:
        _sp.set_subm_bwd_gather(False)
    try:
        v0, (df0, dw0) = jax.value_and_grad(loss, argnums=(0, 1))(feats, w)
    finally:
        _sp.set_subm_bwd_gather(True)

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(df1), np.asarray(df0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw0),
                               rtol=1e-4, atol=1e-4)
