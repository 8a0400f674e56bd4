#!/usr/bin/env python
"""Probe set 2: XLA sorted-gather/scatter fast paths, memset/scatter/sort
floors. Diagnoses whether the 13ns/row gather cost is lowering-bound or
memory-bound (contiguous-index control)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from df3d.ops.sparse import SparseTensor, build_subm_plan
    from df3d.ops.voxelize import voxelize_batch

    GRID = (41, 1440, 1440)
    PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    VOX = (0.075, 0.075, 0.2)
    N = 120_000
    C = 16
    CELLS = GRID[0] * GRID[1] * GRID[2]

    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-54, 54, (1, 260_000, 2)),
         rng.uniform(-5, 3, (1, 260_000, 1)),
         rng.uniform(0, 1, (1, 260_000, 2))], -1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)

    def force(o):
        leaves = [l for l in jax.tree_util.tree_leaves(o) if hasattr(l, "astype")]
        return float(jnp.stack([l.astype(jnp.float32).sum() for l in leaves]).sum())

    def timeit(name, fn, *args, n=5):
        t0c = time.perf_counter()
        out = fn(*args)
        force(out)
        t1c = time.perf_counter()
        t0 = time.perf_counter()
        for _ in range(n):
            force(fn(*args))
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.2f} ms   (compile+first {t1c-t0c:.1f} s)",
              flush=True)
        return out

    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, N, 10))(points, valid)
    feats = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    feats = jnp.where(res.coords[..., :1] >= 0, feats, 0.0)
    st = SparseTensor(feats, res.coords, GRID)
    plan = jax.jit(lambda s: build_subm_plan(s, 3))(st)
    idx_taps = plan.gather_idx[0].T  # (27, N), each row sorted (monotonic)
    keys = st.keys()[0]
    kvalid = st.valid[0]

    # --- gather variants ----------------------------------------------------
    def gather_rows(table, idx, sorted_flag):
        # table (N+1, C); idx (M,) -> (M, C) via lax.gather
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return jax.lax.gather(
            table, idx[:, None], dnums, slice_sizes=(1, table.shape[1]),
            indices_are_sorted=sorted_flag, mode="clip")

    table16 = jnp.concatenate([feats[0], jnp.zeros((1, C))], 0)

    def conv_taps_sorted(table, idxs, flag):
        outs = 0.0
        for k in range(27):
            outs = outs + gather_rows(table, idxs[k], flag).sum()
        return outs

    timeit("gather27_unsorted_flag", jax.jit(
        lambda t, i: conv_taps_sorted(t, i, False)), table16, idx_taps)
    timeit("gather27_sorted_flag", jax.jit(
        lambda t, i: conv_taps_sorted(t, i, True)), table16, idx_taps)

    # contiguous-index control: same gather count, idx = iota (per tap)
    iota_idx = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (27, 1))
    timeit("gather27_contiguous_iota", jax.jit(
        lambda t, i: conv_taps_sorted(t, i, True)), table16, iota_idx)

    # plain dynamic_slice control (no gather at all): 27 slices + sum
    def slices27(table):
        acc = 0.0
        for k in range(27):
            acc = acc + jax.lax.dynamic_slice(table, (k, 0), (N, C)).sum()
        return acc
    table_big = jnp.concatenate([table16, jnp.zeros((32, C))], 0)
    timeit("slice27_control", jax.jit(slices27), table_big)

    # wide-row control: same #rows, C=128 (is cost per row or per byte?)
    table128 = jnp.concatenate(
        [jnp.asarray(rng.randn(N, 128).astype(np.float32)),
         jnp.zeros((1, 128))], 0)
    timeit("gather27_rows_c128", jax.jit(
        lambda t, i: conv_taps_sorted(t, i, True)), table128, idx_taps)

    # --- scatter / memset floors -------------------------------------------
    ar = jnp.arange(N, dtype=jnp.int32)
    safe_keys = jnp.where(kvalid, keys, CELLS + 1)

    timeit("memset_85M", jax.jit(
        lambda: jnp.full((CELLS + 1,), N, jnp.int32)))

    def table_scatter(k):
        t = jnp.full((CELLS + 1,), N, jnp.int32)
        return t.at[k].set(ar, mode="drop", indices_are_sorted=True,
                           unique_indices=True)
    timeit("table_build_sorted_unique", jax.jit(table_scatter), safe_keys)

    def table_scatter_plain(k):
        t = jnp.full((CELLS + 1,), N, jnp.int32)
        return t.at[k].set(ar, mode="drop")
    timeit("table_build_plain", jax.jit(table_scatter_plain), safe_keys)

    # lookup gather from the 85M table, sorted vs not (3.24M queries)
    table_rows = table_scatter(safe_keys)

    def lookup(table, q, flag):
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(table, q[:, None], dnums, (1,),
                              indices_are_sorted=flag, mode="clip")

    # per-tap sorted queries
    offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), -1).reshape(-1, 3)
    deltas = jnp.asarray(
        (offs[:, 0] * GRID[1] + offs[:, 1]) * GRID[2] + offs[:, 2], jnp.int32)

    def lookup27(table, k, flag):
        acc = 0
        for t in range(27):
            q = jnp.clip(k + deltas[t], 0, CELLS)
            acc = acc + lookup(table, q, flag).sum()
        return acc
    timeit("lookup27_85M_sorted", jax.jit(
        lambda t, k: lookup27(t, k, True)), table_rows, safe_keys)
    timeit("lookup27_85M_unsorted_flag", jax.jit(
        lambda t, k: lookup27(t, k, False)), table_rows, safe_keys)

    # --- sort / cumsum floors ----------------------------------------------
    raw_keys = jnp.asarray(rng.randint(0, CELLS, 260_000, np.int32))
    timeit("sort_260k_i32", jax.jit(jnp.sort), raw_keys)
    timeit("argsort_260k_i32", jax.jit(jnp.argsort), raw_keys)
    occ = jnp.zeros((CELLS,), jnp.uint8).at[safe_keys].set(
        1, mode="drop")
    timeit("cumsum_85M_u8_to_i32", jax.jit(
        lambda o: jnp.cumsum(o.astype(jnp.int32))), occ)

    # segment-sum style sorted scatter-add (voxelize inner op) control
    seg = jnp.sort(jnp.asarray(rng.randint(0, N, 260_000, np.int32)))
    vals = jnp.asarray(rng.randn(260_000, 5).astype(np.float32))
    timeit("segsum_260k_sorted", jax.jit(
        lambda s, v: jax.ops.segment_sum(v, s, num_segments=N,
                                         indices_are_sorted=True)), seg, vals)


if __name__ == "__main__":
    main()
