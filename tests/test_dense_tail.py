"""Dense stage-4 tail (ops/dense3d.py) equivalence vs the sparse path.

The dense tail must be numerically identical to the sparse backbone
whenever the sparse caps don't bind (same params, same BN stats), and
strictly MORE faithful when they do (dense = exact uncapped spconv
dilation, reference indice.cc semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.backbones_3d import SpMiddleResNetFHD
from df3d.ops.dense3d import (
    DenseConvSpec, DenseTensor, dense_conv, densify, sparsify,
)
from df3d.ops.sparse import SparseTensor, apply_sparse_conv, build_conv_plan


def _random_st(rng, batch=2, shape=(8, 16, 16), n=70, cin=5, pad_to=96):
    all_coords, all_feats = [], []
    for _ in range(batch):
        sites = set()
        while len(sites) < n:
            sites.add(tuple(rng.randint(0, s) for s in shape))
        coords = np.array(sorted(sites), np.int32)
        feats = rng.randn(n, cin).astype(np.float32)
        pad = pad_to - n
        all_coords.append(
            np.concatenate([coords, -np.ones((pad, 3), np.int32)]))
        all_feats.append(
            np.concatenate([feats, np.zeros((pad, cin), np.float32)]))
    return SparseTensor(
        jnp.asarray(np.stack(all_feats)), jnp.asarray(np.stack(all_coords)),
        shape, rows_sorted=True,
    )


def test_densify_sparsify_roundtrip():
    rng = np.random.RandomState(0)
    st = _random_st(rng)
    dt = densify(st)
    assert dt.features.shape == (2, 8, 16, 16, 5)
    assert int(dt.mask.sum()) == 140  # 70 x 2
    st2 = sparsify(dt, 96)
    # same rows (both key-sorted, padding last)
    np.testing.assert_array_equal(
        np.asarray(st.coords), np.asarray(st2.coords))
    np.testing.assert_allclose(
        np.asarray(st.features), np.asarray(st2.features), atol=1e-6)


def test_dense_strided_conv_matches_sparse_plan():
    """dense_conv(subm=False) == sparse strided conv at every planned
    output site, and its mask == the plan's (uncapped) output set."""
    rng = np.random.RandomState(1)
    st = _random_st(rng)
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.1)
    plan = build_conv_plan(st, 3, 2, 1, max_out=200)
    sparse_out = np.asarray(apply_sparse_conv(st.features, plan, w))
    d_out = dense_conv(densify(st), w, 3, 2, 1, subm=False)
    dn = np.asarray(d_out.features)
    dm = np.asarray(d_out.mask)
    oc = np.asarray(plan.out_coords)
    for b in range(2):
        n_mask = 0
        for i, (z, y, x) in enumerate(oc[b]):
            if z < 0:
                continue
            np.testing.assert_allclose(
                sparse_out[b, i], dn[b, z, y, x], atol=1e-4)
            assert dm[b, z, y, x]
            n_mask += 1
        assert dm[b].sum() == n_mask  # same active set (uncapped)


def test_dense_subm_conv_masks_to_input_sites():
    rng = np.random.RandomState(2)
    st = _random_st(rng)
    w = jnp.asarray(rng.randn(27, 5, 5).astype(np.float32) * 0.1)
    dt = densify(st)
    out = dense_conv(dt, w, 3, 1, 1, subm=True)
    np.testing.assert_array_equal(
        np.asarray(out.mask), np.asarray(dt.mask))
    # inactive cells exactly zero
    inact = ~np.asarray(dt.mask)
    assert np.abs(np.asarray(out.features)[inact]).max() == 0.0


def test_backbone_dense_tail_matches_sparse():
    """Full SpMiddleResNetFHD: dense_tail=True vs False with the SAME
    params -> identical BEV (caps big enough not to bind)."""
    rng = np.random.RandomState(3)
    st = _random_st(rng, shape=(25, 32, 32), n=90, pad_to=128)
    caps = (128, 128, 128, 128)

    m_sp = SpMiddleResNetFHD(5, caps, dense_tail=False)
    m_dn = SpMiddleResNetFHD(5, caps, dense_tail=True)
    vs = m_sp.init(jax.random.PRNGKey(0), st, train=False)
    bev_sp, ms_sp = m_sp.apply(vs, st, train=False)
    bev_dn, ms_dn = m_dn.apply(vs, st, train=False)
    assert bev_sp.shape == bev_dn.shape
    np.testing.assert_allclose(
        np.asarray(bev_sp), np.asarray(bev_dn), atol=2e-4)
    # conv3 (shared sparse stage) identical
    np.testing.assert_allclose(
        np.asarray(ms_sp["conv3"].features),
        np.asarray(ms_dn["conv3"].features), atol=1e-5)


def test_backbone_dense_tail_train_step_gradients():
    """Gradients flow through the dense tail and masked BN stats update."""
    rng = np.random.RandomState(4)
    st = _random_st(rng, shape=(25, 32, 32), n=90, pad_to=128)
    m = SpMiddleResNetFHD(5, (128, 128, 128, 128), dense_tail=True)
    vs = m.init(jax.random.PRNGKey(0), st, train=False)

    def loss(params):
        (bev, _), upd = m.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            st, train=True, mutable=["batch_stats"])
        return jnp.square(bev).mean(), upd

    (l, upd), g = jax.value_and_grad(loss, has_aux=True)(vs["params"])
    assert np.isfinite(float(l))
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert gsum > 0
    # stage-4 conv kernels specifically
    assert float(jnp.abs(
        jax.tree_util.tree_leaves(g["res4a"])[0]).sum()) > 0


def test_backbone_dense_from3_matches_sparse():
    """dense_from=3 (stages 3+4 dense) vs fully sparse with the SAME
    params -> identical BEV; stage-3 mask == sparse stage-3 active set."""
    rng = np.random.RandomState(7)
    # caps sized so sparse dilation NEVER binds (stage-3 grid is only
    # 7*8*8=448 cells; down2 of 60 inputs dilates to <=480): the sparse
    # path is then exact and must match the dense one bit-for-bit.
    st = _random_st(rng, shape=(25, 32, 32), n=60, pad_to=64)
    caps = (64, 512, 512, 512)

    m_sp = SpMiddleResNetFHD(5, caps, dense_tail=False)
    m_dn = SpMiddleResNetFHD(5, caps, dense_tail=True, dense_from=3)
    vs = m_sp.init(jax.random.PRNGKey(0), st, train=False)
    bev_sp, ms_sp = m_sp.apply(vs, st, train=False)
    bev_dn, ms_dn = m_dn.apply(vs, st, train=False)
    assert bev_sp.shape == bev_dn.shape
    np.testing.assert_allclose(
        np.asarray(bev_sp), np.asarray(bev_dn), atol=2e-4)
    # conv3 is a DenseTensor; its active set matches the sparse conv3 rows
    assert isinstance(ms_dn["conv3"], DenseTensor)
    sp3 = ms_sp["conv3"]
    n_sp3 = int(np.asarray(sp3.valid).sum())
    assert int(np.asarray(ms_dn["conv3"].mask).sum()) == n_sp3


def test_sparse_encoder_dense_tail_matches_sparse():
    """TransFusion's SparseEncoder: dense_tail=True vs False with the SAME
    params -> identical BEV (caps big enough not to bind)."""
    from df3d.models.backbones_3d import SparseEncoder

    rng = np.random.RandomState(6)
    st = _random_st(rng, shape=(25, 32, 32), n=90, pad_to=128)
    caps = (128, 128, 128, 128)

    m_sp = SparseEncoder(5, caps, dense_tail=False)
    m_dn = SparseEncoder(5, caps, dense_tail=True)
    vs = m_sp.init(jax.random.PRNGKey(0), st, train=False)
    bev_sp, ms_sp = m_sp.apply(vs, st, train=False)
    bev_dn, ms_dn = m_dn.apply(vs, st, train=False)
    assert bev_sp.shape == bev_dn.shape
    np.testing.assert_allclose(
        np.asarray(bev_sp), np.asarray(bev_dn), atol=2e-4)
    # stage-2 (shared sparse stage) identical
    np.testing.assert_allclose(
        np.asarray(ms_sp["conv2"].features),
        np.asarray(ms_dn["conv2"].features), atol=1e-5)


def test_dense_tail_cap_truncation_is_observable():
    """r5 hybrid tail: down4 runs SPARSELY (mini-rank plan) before the
    dense residual blocks, so a binding n4 cap truncates stage-4 sites
    exactly like the sparse path — but NEVER silently: the overflow is
    sown as cap_overflow_down4 (same observability contract as every
    other strided stage). [The r3 dense-from-down4 form kept all sites at
    the cost of densifying the 16x larger stage-3 grid — probe 12 measured
    that at +6 ms/frame and the hybrid replaced it.]"""
    rng = np.random.RandomState(5)
    st = _random_st(rng, shape=(25, 32, 32), n=90, pad_to=128)
    caps_tight = (128, 128, 128, 8)  # n4 << true stage-4 occupancy

    m_dn = SpMiddleResNetFHD(5, caps_tight, dense_tail=True)
    vs = m_dn.init(jax.random.PRNGKey(0), st, train=False)
    (bev_dn, ms_dn), inter = m_dn.apply(
        vs, st, train=False, mutable=["intermediates"])
    per_sample = np.asarray(ms_dn["conv4"].mask).sum(
        axis=tuple(range(1, ms_dn["conv4"].mask.ndim)))
    assert (per_sample == 8).all(), per_sample  # capped like the sparse path
    flat = jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
    overflow = {
        "/".join(str(k) for k in p): int(np.asarray(v).reshape(-1)[0])
        for p, v in flat if "down4" in "/".join(str(k) for k in p)
    }
    assert overflow and all(v > 0 for v in overflow.values()), overflow


def test_sparsify_overflow_keeps_lowest_keys():
    """Overflow rows must go to the drop slot, not overwrite the last kept
    row (r3 review finding): with cap < active cells, sparsify keeps
    exactly the cap-many LOWEST-key sites."""
    rng = np.random.RandomState(3)
    st = _random_st(rng)
    dt = densify(st)
    cap = 40  # < 70 active per sample
    st2 = sparsify(dt, cap)
    z, y, x = dt.spatial_shape
    for bi in range(dt.batch_size):
        m = np.asarray(dt.mask[bi]).reshape(-1)
        keys_sorted = np.sort(np.nonzero(m)[0])
        kept = keys_sorted[:cap]
        got = np.asarray(st2.coords[bi])
        got_keys = got[:, 0] * y * x + got[:, 1] * x + got[:, 2]
        assert (got[:, 0] >= 0).all()  # cap fully used, no padding rows
        np.testing.assert_array_equal(np.sort(got_keys), kept)
