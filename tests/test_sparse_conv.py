"""Sparse conv numerics vs dense lax.conv golden reference.

Mirrors the reference's own testing pattern (its CUDA ops ship a slow
reference impl + agreement check); here the golden model is XLA's dense 3D
convolution on the densified sparse tensor.
"""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.ops.sparse import (
    SparseTensor, apply_sparse_conv, build_conv_plan, build_subm_plan,
)


def _random_sparse(rng, batch=2, shape=(8, 12, 12), n=64, cin=5, pad_to=96):
    coords = set()
    while len(coords) < n:
        b = rng.randint(batch)
        c = tuple(rng.randint(0, s) for s in shape)
        coords.add((b,) + c)
    coords = np.array(sorted(coords), np.int32)
    feats = rng.randn(n, cin).astype(np.float32)
    pad = pad_to - n
    coords = np.concatenate([coords, -np.ones((pad, 4), np.int32)])
    feats = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    return SparseTensor(jnp.asarray(feats), jnp.asarray(coords), shape, batch)


def _dense_conv(dense, weights, ksize, stride, pad):
    """dense (B, Z, Y, X, C); weights (K, Cin, Cout) row-major zyx taps."""
    kz, ky, kx = ksize
    w = weights.reshape(kz, ky, kx, weights.shape[-2], weights.shape[-1])
    return jax.lax.conv_general_dilated(
        dense, w, window_strides=(stride,) * 3,
        padding=[(pad, pad)] * 3,
        dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
    )


def test_subm_conv_matches_dense_at_input_sites():
    rng = np.random.RandomState(0)
    st = _random_sparse(rng)
    w = jnp.asarray(rng.randn(27, 5, 7).astype(np.float32) * 0.1)
    plan = build_subm_plan(st, 3)
    out = apply_sparse_conv(st.features, plan, w)

    dense = st.to_dense()
    ref = _dense_conv(dense, w, (3, 3, 3), 1, 1)
    coords = np.asarray(st.coords)
    got = np.asarray(out)
    ref = np.asarray(ref)
    for i, (b, z, y, x) in enumerate(coords):
        if b < 0:
            continue
        np.testing.assert_allclose(got[i], ref[b, z, y, x], atol=1e-4)
    # subm: padding rows produce zeros (gather hits the zero pad row)
    assert np.abs(got[coords[:, 0] < 0]).max() == 0.0


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(1)
    st = _random_sparse(rng, shape=(8, 12, 12), n=80, pad_to=96)
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.1)
    plan = build_conv_plan(st, 3, 2, 1, max_out=96)
    out = apply_sparse_conv(st.features, plan, w)

    dense = st.to_dense()
    ref = np.asarray(_dense_conv(dense, w, (3, 3, 3), 2, 1))
    assert plan.out_spatial_shape == (4, 6, 6)
    oc = np.asarray(plan.out_coords)
    got = np.asarray(out)
    n_valid = (oc[:, 0] >= 0).sum()
    assert n_valid > 0
    for i, (b, z, y, x) in enumerate(oc):
        if b < 0:
            continue
        np.testing.assert_allclose(got[i], ref[b, z, y, x], atol=1e-4)
    # every nonzero dense output site must be covered by the plan
    nz = np.argwhere(np.abs(ref).sum(-1) > 1e-6)
    covered = {tuple(c) for c in oc if c[0] >= 0}
    for site in nz:
        assert tuple(site) in covered


def test_asymmetric_kernel_stride():
    """conv taps like the backbones' final (3,1,1) stride (2,1,1) layer."""
    rng = np.random.RandomState(2)
    st = _random_sparse(rng, shape=(7, 8, 8), n=48, pad_to=64)
    w = jnp.asarray(rng.randn(3, 5, 4).astype(np.float32) * 0.1)
    plan = build_conv_plan(st, (3, 1, 1), (2, 1, 1), (0, 0, 0), max_out=64)
    out = apply_sparse_conv(st.features, plan, w)
    dense = st.to_dense()
    wf = w.reshape(3, 1, 1, 5, 4)
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            dense, wf, window_strides=(2, 1, 1), padding=[(0, 0)] * 3,
            dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
        )
    )
    oc = np.asarray(plan.out_coords)
    got = np.asarray(out)
    for i, (b, z, y, x) in enumerate(oc):
        if b < 0:
            continue
        np.testing.assert_allclose(got[i], ref[b, z, y, x], atol=1e-4)


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
    for i, (b, z, y, x) in enumerate(coords):
        if b < 0:
            continue
        np.testing.assert_allclose(dense[b, z, y, x], feats[i])
    assert dense.sum() != 0
    # total mass conserved
    np.testing.assert_allclose(
        dense.sum(), feats[coords[:, 0] >= 0].sum(), rtol=1e-5
    )
