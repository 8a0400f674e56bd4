"""Device-side auction assignment vs scipy's Hungarian optimum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from df3d.ops.assign import auction_assign


def _total_cost(cost, matched):
    tot, cnt = 0.0, 0
    for i, j in enumerate(matched):
        if j >= 0:
            tot += cost[i, j]
            cnt += 1
    return tot, cnt


@pytest.mark.parametrize("p,m,nvalid", [(20, 12, 12), (50, 30, 17),
                                        (200, 128, 40), (8, 8, 8)])
def test_auction_matches_scipy_optimum(p, m, nvalid):
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(p + m)
    cost = rng.randn(p, m).astype(np.float32) * 3.0
    valid = np.zeros(m, bool)
    valid[rng.choice(m, nvalid, replace=False)] = True

    matched = np.asarray(auction_assign(jnp.asarray(cost),
                                        jnp.asarray(valid)))
    # every valid column assigned exactly once, to a distinct row
    assigned_cols = matched[matched >= 0]
    assert len(assigned_cols) == nvalid
    assert len(set(assigned_cols.tolist())) == nvalid
    assert valid[assigned_cols].all()

    cols = np.nonzero(valid)[0]
    r, cidx = linear_sum_assignment(cost[:, cols])
    ref_total = cost[r, cols[cidx]].sum()
    got_total, cnt = _total_cost(cost, matched)
    assert cnt == nvalid
    # auction epsilon bound: within a tiny tolerance of the true optimum
    assert got_total <= ref_total + 1e-2 * max(1.0, abs(ref_total))


def test_auction_nvalid_exceeds_rows_optimal_subset():
    # n_valid > P: the square embedding must drop the globally worst excess
    # columns, matching scipy's optimal-subset semantics (round-4 fix)
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(7)
    p, m = 6, 14
    cost = rng.randn(p, m).astype(np.float32) * 3.0
    valid = np.ones(m, bool)
    matched = np.asarray(auction_assign(jnp.asarray(cost),
                                        jnp.asarray(valid)))
    assert (matched >= 0).sum() == p
    r, c = linear_sum_assignment(cost)
    ref = cost[r, c].sum()
    got = cost[np.arange(p), matched].sum()
    assert abs(got - ref) <= 1e-2 * max(1.0, abs(ref))


def test_auction_large_cost_offset():
    # a big common offset must not inflate the epsilon tolerance (ADVICE r3)
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(11)
    p, m = 30, 20
    cost = (rng.randn(p, m) * 2.0 + 5000.0).astype(np.float32)
    valid = np.ones(m, bool)
    matched = np.asarray(auction_assign(jnp.asarray(cost),
                                        jnp.asarray(valid)))
    r, c = linear_sum_assignment(cost)
    ref = cost[r, c].sum()
    got = cost[matched >= 0, matched[matched >= 0]].sum()
    assert (matched >= 0).sum() == m
    # tolerance on the SPREAD, not the offset-inflated magnitude
    assert abs(got - ref) <= 0.05


def test_auction_no_valid_columns():
    cost = jnp.asarray(np.random.RandomState(0).randn(10, 6), jnp.float32)
    matched = np.asarray(auction_assign(cost, jnp.zeros(6, bool)))
    assert (matched == -1).all()


def test_auction_under_vmap_and_jit():
    rng = np.random.RandomState(3)
    cost = jnp.asarray(rng.randn(4, 30, 16).astype(np.float32))
    valid = jnp.asarray(rng.rand(4, 16) > 0.3)
    matched = jax.jit(jax.vmap(auction_assign))(cost, valid)
    assert matched.shape == (4, 30)
    m = np.asarray(matched)
    v = np.asarray(valid)
    for b in range(4):
        got = m[b][m[b] >= 0]
        assert len(set(got.tolist())) == len(got)
        assert v[b][got].all()
        assert len(got) == v[b].sum()


def test_head_assign_method_switch():
    from df3d.models.heads import transfusion_head as th

    rng = np.random.RandomState(5)
    cost = jnp.asarray(rng.randn(40, 20).astype(np.float32))
    valid = jnp.asarray(np.arange(20) < 9)
    ref = np.asarray(th.hungarian_match(cost, valid))  # host scipy
    th.set_assign_method("auction")
    try:
        got = np.asarray(th.hungarian_match(cost, valid))
    finally:
        th.set_assign_method("host")
    c = np.asarray(cost)
    assert abs(c[ref >= 0, ref[ref >= 0]].sum()
               - c[got >= 0, got[got >= 0]].sum()) < 1e-2
