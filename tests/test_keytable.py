"""Unit tests for the word-granular rank table (df3d/ops/keytable.py)."""

import numpy as np

import jax.numpy as jnp

from df3d.ops import keytable


def _ref_rank(keys_sorted, q):
    """Reference: rank among present keys, or -1 if absent."""
    pos = np.searchsorted(keys_sorted, q)
    if pos < len(keys_sorted) and keys_sorted[pos] == q:
        return pos
    return -1


def test_pack_keys_lookup_random():
    rng = np.random.RandomState(0)
    cells = 5000
    keys = np.unique(rng.randint(0, cells, 300)).astype(np.int32)
    n = 400
    pad = n - len(keys)
    keys_arr = np.concatenate([keys, np.zeros(pad, np.int32)])
    valid = np.concatenate([np.ones(len(keys), bool), np.zeros(pad, bool)])

    packed = keytable.pack_keys(
        jnp.asarray(keys_arr), jnp.asarray(valid), cells)
    assert packed.shape == (keytable.num_blocks(cells), 16)

    q = rng.randint(0, cells, 1000).astype(np.int32)
    q_ok = rng.rand(1000) > 0.1
    got = np.asarray(keytable.lookup(
        packed, jnp.asarray(q), jnp.asarray(q_ok), n))
    for i in range(1000):
        want = _ref_rank(keys, q[i]) if q_ok[i] else -1
        assert got[i] == (want if want >= 0 else n), (i, q[i], got[i], want)


def test_pack_occupancy_matches_pack_keys():
    rng = np.random.RandomState(1)
    cells = 4097  # non-multiple of 32
    keys = np.unique(rng.randint(0, cells, 500)).astype(np.int32)
    valid = np.ones(len(keys), bool)
    p1 = keytable.pack_keys(jnp.asarray(keys), jnp.asarray(valid), cells)
    occ = np.zeros(cells, bool)
    occ[keys] = True
    p2 = keytable.pack_occupancy(jnp.asarray(occ), cells)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


def test_word_boundaries_and_edges():
    # keys straddling 32-cell word boundaries, queries at bits 0 and 31
    cells = 32 * 8
    keys = np.array([0, 31, 32, 33, 63, 64, 255], np.int32)
    n = len(keys)
    packed = keytable.pack_keys(
        jnp.asarray(keys), jnp.ones(n, bool), cells)
    q = np.array([0, 1, 31, 32, 33, 62, 63, 64, 65, 254, 255], np.int32)
    got = np.asarray(keytable.lookup(
        packed, jnp.asarray(q), jnp.ones(len(q), bool), n))
    for i, qq in enumerate(q):
        want = _ref_rank(keys, qq)
        assert got[i] == (want if want >= 0 else n), (qq, got[i], want)


def test_invalid_queries_and_padding_keys():
    cells = 1000
    keys = np.array([5, 10, 999, 0, 0], np.int32)  # last two are padding
    valid = np.array([True, True, True, False, False])
    packed = keytable.pack_keys(jnp.asarray(keys), jnp.asarray(valid), cells)
    q = np.array([5, 10, 999, 0, 500], np.int32)
    q_ok = np.array([True, True, True, False, True])
    got = np.asarray(keytable.lookup(
        packed, jnp.asarray(q), jnp.asarray(q_ok), 5))
    np.testing.assert_array_equal(got, [0, 1, 2, 5, 5])


def test_mini_table_matches_lookup():
    """pack_mini/lookup_mini (r5): bit-exact vs the 448-cell word-rank
    lookup on random occupancy, including masked queries, misses, and a
    cell count not divisible by 16."""
    rng = np.random.RandomState(3)
    cells = 4003  # deliberately not a multiple of 16
    occ = rng.rand(cells) < 0.03
    packed = keytable.pack_occupancy(jnp.asarray(occ), cells)
    mini = keytable.pack_mini(jnp.asarray(occ), cells)
    assert mini.shape == ((cells + 15) // 16, 2)

    q = rng.randint(0, cells, 500).astype(np.int32)
    q_ok = rng.rand(500) > 0.4
    miss = 10_000
    want = np.asarray(keytable.lookup(
        packed, jnp.asarray(q), jnp.asarray(q_ok), miss))
    got = np.asarray(keytable.lookup_mini(
        mini, jnp.asarray(q), jnp.asarray(q_ok), miss))
    np.testing.assert_array_equal(got, want)
    # ranks agree with a numpy reference on hits
    cum = np.cumsum(occ) - occ
    for i in range(500):
        if q_ok[i] and occ[q[i]]:
            assert got[i] == cum[q[i]], (i, q[i])
        else:
            assert got[i] == miss
