#!/usr/bin/env python
"""Probe set 3: RTT-amortized timings. The relay costs ~30ms per dispatch+
fetch, so every op is timed as an in-graph fori_loop chain of `iters`
applications with a runtime data dependency (defeats CSE/hoisting);
per-op time = (T_chain - RTT) / iters."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from df3d.ops import sparse as sp
    from df3d.ops.sparse import SparseTensor, build_conv_plan, build_subm_plan
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
        return float(jnp.stack(
            [l.astype(jnp.float32).sum() for l in leaves]).sum())

    RTT = [0.0]

    def timeit(name, fn, *args, n=5, iters=1):
        t0c = time.perf_counter()
        out = fn(*args)
        force(out)
        t1c = time.perf_counter()
        t0 = time.perf_counter()
        for _ in range(n):
            force(fn(*args))
        dt = (time.perf_counter() - t0) / n
        per = (dt - RTT[0]) / iters
        print(f"{name}: {per*1e3:.2f} ms/op  (wall {dt*1e3:.1f} ms, "
              f"compile {t1c-t0c:.1f} s)", flush=True)
        return out

    # RTT floor
    t0 = time.perf_counter()
    x = jnp.float32(0.0)
    f = jax.jit(lambda v: v + 1.0)
    force(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        force(f(x))
    RTT[0] = (time.perf_counter() - t0) / 20
    print(f"RTT (scalar dispatch+fetch): {RTT[0]*1e3:.2f} ms", flush=True)

    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, N, 10))(points, valid)
    feats = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    feats = jnp.where(res.coords[..., :1] >= 0, feats, 0.0)
    st = SparseTensor(feats, res.coords, GRID)
    plan = jax.jit(lambda s: build_subm_plan(s, 3))(st)
    wk = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)

    IT = 8

    def rt_zero(s):
        # runtime-known zero the compiler cannot fold
        return jnp.where(s > 1e30, 1, 0).astype(jnp.int32)

    # --- conv variants, chained ------------------------------------------
    def conv_take_chain(feats, plan, w):
        def body(i, f):
            o = sp.apply_sparse_conv(f, plan, w)
            return o * (0.1 / 27.0) + f * 0.5
        return jax.lax.fori_loop(0, IT, body, feats)

    timeit("conv_take_along (chain)", jax.jit(conv_take_chain),
           feats, plan, wk, iters=IT)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

    def conv_laxgather(f, plan, w):
        padded = jnp.concatenate([f[0], jnp.zeros((1, C), f.dtype)], 0)
        acc = jnp.zeros((N, C), jnp.float32)
        for k in range(27):
            g = jax.lax.gather(
                padded, plan.gather_idx[0, :, k][:, None], dnums,
                slice_sizes=(1, C), indices_are_sorted=True, mode="clip")
            acc = acc + jnp.einsum("nc,cd->nd", g, w[k],
                                   preferred_element_type=jnp.float32)
        return acc[None]

    def conv_lax_chain(feats, plan, w):
        def body(i, f):
            o = conv_laxgather(f, plan, w)
            return o * (0.1 / 27.0) + f * 0.5
        return jax.lax.fori_loop(0, IT, body, feats)

    timeit("conv_lax_gather27 (chain)", jax.jit(conv_lax_chain),
           feats, plan, wk, iters=IT)

    def conv_lax_one(f, plan, w):
        padded = jnp.concatenate([f[0], jnp.zeros((1, C), f.dtype)], 0)
        idx = plan.gather_idx[0].T.reshape(-1)  # (27*N,) tap-major
        g = jax.lax.gather(
            padded, idx[:, None], dnums, slice_sizes=(1, C),
            indices_are_sorted=False, mode="clip").reshape(27, N, C)
        out = jnp.einsum("knc,kcd->nd", g, w,
                         preferred_element_type=jnp.float32)
        return out[None]

    def conv_lax1_chain(feats, plan, w):
        def body(i, f):
            o = conv_lax_one(f, plan, w)
            return o * (0.1 / 27.0) + f * 0.5
        return jax.lax.fori_loop(0, IT, body, feats)

    timeit("conv_lax_gather_single (chain)", jax.jit(conv_lax1_chain),
           feats, plan, wk, iters=IT)

    # --- plan builds, chained --------------------------------------------
    def subm_chain(st_):
        def body(i, carry):
            c, s = carry
            stp = SparseTensor(st_.features, c, GRID)
            p = build_subm_plan(stp, 3)
            s2 = p.gather_idx[0, 0, 0]
            return (c + rt_zero(s2.astype(jnp.float32)), s2)
        return jax.lax.fori_loop(0, IT, body, (st_.coords, jnp.int32(0)))

    timeit("subm_plan (chain)", jax.jit(subm_chain), st, iters=IT)

    def down_chain(st_):
        def body(i, carry):
            c, s = carry
            stp = SparseTensor(st_.features, c, GRID)
            p = build_conv_plan(stp, 3, 2, 1, max_out=90_000)
            s2 = p.gather_idx[0, 0, 0]
            return (c + rt_zero(s2.astype(jnp.float32)), s2)
        return jax.lax.fori_loop(0, IT, body, (st_.coords, jnp.int32(0)))

    timeit("down_plan (chain)", jax.jit(down_chain), st, iters=IT)

    def vox_chain(p, v):
        def body(i, carry):
            pp, s = carry
            r = voxelize_batch(pp, v, VOX, PC_RANGE, GRID, N, 10)
            s2 = r.features[0, 0, 0]
            return (pp + jnp.where(s2 > 1e30, 1.0, 0.0), s2)
        return jax.lax.fori_loop(0, IT, body, (p, jnp.float32(0)))

    timeit("voxelize (chain)", jax.jit(vox_chain), points, valid, iters=IT)

    # --- dense-table pieces, chained --------------------------------------
    keys = st.keys()[0]
    kvalid = st.valid[0]
    safe_keys = jnp.where(kvalid, keys, CELLS + 1)
    ar = jnp.arange(N, dtype=jnp.int32)

    def table_chain(k):
        def body(i, carry):
            kk, s = carry
            t = jnp.full((CELLS + 1,), N, jnp.int32)
            t = t.at[kk].set(ar, mode="drop", indices_are_sorted=True,
                             unique_indices=True)
            s2 = t[12345]
            return (kk + rt_zero(s2.astype(jnp.float32)), s2)
        return jax.lax.fori_loop(0, IT, body, (k, jnp.int32(0)))

    timeit("dense_table_build (chain)", jax.jit(table_chain), safe_keys,
           iters=IT)

    offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), -1).reshape(-1, 3)
    deltas = jnp.asarray(
        (offs[:, 0] * GRID[1] + offs[:, 1]) * GRID[2] + offs[:, 2], jnp.int32)
    table_rows = jnp.full((CELLS + 1,), N, jnp.int32).at[safe_keys].set(
        ar, mode="drop", indices_are_sorted=True, unique_indices=True)
    dnums0 = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))

    def lookup_chain(t, k):
        def body(i, carry):
            kk, s = carry
            acc = jnp.int32(0)
            for tap in range(27):
                q = jnp.clip(kk + deltas[tap], 0, CELLS)
                r = jax.lax.gather(t, q[:, None], dnums0, (1,),
                                   indices_are_sorted=True, mode="clip")
                acc = acc + r[5000]
            return (kk + rt_zero(acc.astype(jnp.float32)), acc)
        return jax.lax.fori_loop(0, IT, body, (k, jnp.int32(0)))

    timeit("lookup27_85M (chain)", jax.jit(lookup_chain), table_rows,
           safe_keys, iters=IT)

    # --- full forward, chained --------------------------------------------
    from df3d.models.detectors.centerpoint import CenterPoint, CenterPointConfig

    cfg = CenterPointConfig(
        max_voxels=120_000, stage_caps=(120_000, 90_000, 55_000, 30_000))
    model = CenterPoint(cfg)
    variables = jax.jit(
        lambda f, c: model.init(jax.random.PRNGKey(0), f, c, train=False)
    )(res.features, res.coords)

    def fwd_chain(v, f, c):
        def body(i, carry):
            ff, s = carry
            preds, _ = model.apply(v, ff, c, train=False)
            s2 = preds[0]["hm"].sum()
            return (ff + jnp.where(s2 > 1e30, 1.0, 0.0), s2)
        return jax.lax.fori_loop(0, 3, body, (f, jnp.float32(0)))

    timeit("forward full (chain x3)", jax.jit(fwd_chain),
           variables, res.features, res.coords, n=3, iters=3)


if __name__ == "__main__":
    main()
