"""Pallas fused gather-GEMM conv v2 (interpret mode) vs the XLA tap-scan."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.ops.sparse import (
    SparseTensor, apply_sparse_conv, build_subm_plan,
)


def _random_sparse(rng, batch=2, shape=(6, 10, 10), n=40, pad=64, cin=8):
    coords, feats = [], []
    for _ in range(batch):
        sites = set()
        while len(sites) < n:
            sites.add(tuple(rng.randint(0, s) for s in shape))
        cs = np.array(sorted(sites), np.int32)
        coords.append(np.concatenate([cs, -np.ones((pad - n, 3), np.int32)]))
        feats.append(np.concatenate(
            [rng.randn(n, cin).astype(np.float32), np.zeros((pad - n, cin), np.float32)]
        ))
    return SparseTensor(
        jnp.asarray(np.stack(feats)), jnp.asarray(np.stack(coords)), shape
    )


def test_pallas_conv_v2_matches_xla():
    """v2 whole-table kernel (the only Mosaic-lowerable gather form):
    interpret numerics vs the XLA tap-scan, fwd + bwd."""
    from df3d.ops.pallas.sparse_conv_kernel import apply_sparse_conv_pallas_v2

    rng = np.random.RandomState(2)
    st = _random_sparse(rng)
    plan = build_subm_plan(st, 3)
    w = jnp.asarray(rng.randn(27, 8, 16).astype(np.float32) * 0.1)
    want = np.asarray(apply_sparse_conv(st.features, plan, w))
    got = np.asarray(
        apply_sparse_conv_pallas_v2(st.features, plan.gather_idx, w,
                                    interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)

    def f_pallas(f, w):
        return apply_sparse_conv_pallas_v2(
            f, plan.gather_idx, w, None, True).sum()

    def f_xla(f, w):
        return apply_sparse_conv(f, plan, w).sum()

    gp = jax.grad(f_pallas, argnums=(0, 1))(st.features, w)
    gx = jax.grad(f_xla, argnums=(0, 1))(st.features, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_conv_v2_lowers_for_tpu():
    """The v2 kernel passes pallas->Mosaic lowering (where the r1 kernel
    raised 'Unsupported gather') at backbone stage shapes, via
    cross-platform export on CPU."""
    from jax import export

    from df3d.ops.pallas.sparse_conv_kernel import apply_sparse_conv_pallas_v2

    for (n, cin, cout, dt) in [
        (4096, 16, 16, None), (4096, 32, 32, jnp.bfloat16),
    ]:
        f = jnp.zeros((1, n, cin), jnp.float32)
        idx = jnp.zeros((1, 27, n), jnp.int32)
        w = jnp.zeros((27, cin, cout), jnp.float32)
        export.export(
            jax.jit(lambda f, i, w: apply_sparse_conv_pallas_v2(f, i, w, dt)),
            platforms=["tpu"],
        )(f, idx, w)


def test_pallas_v2_routing_switch():
    """set_pallas_conv(True) routes apply_sparse_conv through the v2
    kernel (interpret on CPU) and matches the XLA path."""
    from df3d.ops import sparse as sp
    from df3d.ops.pallas import sparse_conv_kernel as K

    rng = np.random.RandomState(3)
    st = _random_sparse(rng, batch=1)
    plan = build_subm_plan(st, 3)
    w = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32) * 0.1)
    want = np.asarray(apply_sparse_conv(st.features, plan, w))
    orig = K.apply_sparse_conv_pallas_v2

    def interp(f, i, w, table_dtype=None, interpret=False):
        return orig(f, i, w, table_dtype, True)

    try:
        K.apply_sparse_conv_pallas_v2 = interp
        sp.set_pallas_conv(True)
        got = np.asarray(apply_sparse_conv(st.features, plan, w))
    finally:
        sp.set_pallas_conv(False)
        K.apply_sparse_conv_pallas_v2 = orig
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_plan_idx2d_prepadded_matches():
    """With the pallas route enabled, plans carry a pre-padded (B, K, N+1)
    idx2d (one flat->2D retiling per plan); the kernel fed with it must
    match the XLA conv after slicing off the pad queries. Covers subm
    (N_out == N_in) and strided (N_out < N_in) plans."""
    from df3d.ops import sparse as sp
    from df3d.ops.pallas.sparse_conv_kernel import apply_sparse_conv_pallas_v2
    from df3d.ops.sparse import build_conv_plan

    rng = np.random.RandomState(4)
    st = _random_sparse(rng)
    n_in = st.features.shape[1]
    sp.set_pallas_conv(True)
    try:
        subm = build_subm_plan(st, 3)
        down = build_conv_plan(st, 3, 2, 1, max_out=n_in // 2)
    finally:
        sp.set_pallas_conv(False)
    for plan in (subm, down):
        k = plan.num_taps
        n_out = plan.num_out_rows
        assert plan.idx2d is not None
        assert plan.idx2d.shape == (st.batch_size, k, n_in + 1)
        np.testing.assert_array_equal(
            np.asarray(plan.idx2d[:, :, :n_out]),
            np.asarray(plan.gather_idx.reshape(st.batch_size, k, n_out)))
        assert (np.asarray(plan.idx2d[:, :, n_out:]) == n_in).all()
        w = jnp.asarray(
            rng.randn(k, 8, 16).astype(np.float32) * 0.1)
        want = np.asarray(apply_sparse_conv(
            st.features, plan, w, force_xla=True))
        got = np.asarray(apply_sparse_conv_pallas_v2(
            st.features, plan.idx2d, w, interpret=True))[:, :n_out]
        np.testing.assert_allclose(got, want, atol=1e-4)
