"""Probe 10: full in-model breakdown at CenterPoint 0.075 scale with the
new keytable plans (rows_sorted=True everywhere, as the detectors now run).
voxelize | subm1..4 | down2..4+extra | conv stage costs | predict."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from df3d.ops.sparse import (
        SparseTensor, apply_sparse_conv, build_conv_plan, build_subm_plan,
    )
    from df3d.ops.voxelize import voxelize_batch

    GRID = (40, 1440, 1440)
    PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    VOX = (0.075, 0.075, 0.2)
    N = 120_000
    IT = 8

    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-54, 54, (1, 260_000, 2)),
         rng.uniform(-5, 3, (1, 260_000, 1)),
         rng.uniform(0, 1, (1, 260_000, 2))], -1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)

    RTT = [0.0]

    def timeit(name, fn, *args, iters=IT):
        t0c = time.perf_counter()
        out = float(fn(*args))
        t1c = time.perf_counter()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per = (best - RTT[0]) / iters
        print(f"{name:36s} {per*1e3:7.2f} ms  (compile {t1c-t0c:.0f}s)",
              flush=True)

    f = jax.jit(lambda v: v + 1.0)
    float(f(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(f(jnp.float32(0)))
    RTT[0] = (time.perf_counter() - t0) / 20
    print(f"RTT: {RTT[0]*1e3:.2f} ms", flush=True)

    def rt0(s):
        return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)

    # voxelize timing (perturb points)
    def vox_chain(p0):
        def body(i, carry):
            p, s = carry
            r = voxelize_batch(p, valid, VOX, PC_RANGE, GRID, N, 10)
            s2 = r.features.sum()
            return (p + s2 * 1e-38, s2)
        return jax.lax.fori_loop(0, IT, body, (p0, jnp.float32(0)))[1]

    timeit("voxelize 260k->120k", jax.jit(vox_chain), points)

    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, N, 10))(points, valid)
    st1 = SparseTensor(jnp.zeros((1, N, 16), jnp.float32), res.coords, GRID,
                       rows_sorted=True)

    def chainplans(st):
        d2 = build_conv_plan(st, 3, 2, 1, max_out=90_000)
        st2 = SparseTensor(jnp.zeros((1, 90_000, 32)), d2.out_coords,
                           d2.out_spatial_shape, rows_sorted=True)
        d3 = build_conv_plan(st2, 3, 2, 1, max_out=55_000)
        st3 = SparseTensor(jnp.zeros((1, 55_000, 64)), d3.out_coords,
                           d3.out_spatial_shape, rows_sorted=True)
        d4 = build_conv_plan(st3, 3, 2, (0, 1, 1), max_out=30_000)
        st4 = SparseTensor(jnp.zeros((1, 30_000, 128)), d4.out_coords,
                           d4.out_spatial_shape, rows_sorted=True)
        return st2, st3, st4

    st2, st3, st4 = jax.jit(chainplans)(st1)
    for s, name in ((st1, "st1"), (st2, "st2"), (st3, "st3"), (st4, "st4")):
        print(f"  {name}: {int(s.valid.sum())} voxels, {s.spatial_shape}",
              flush=True)

    def subm_chain(st_):
        grid = st_.spatial_shape

        def run(coords):
            def body(i, carry):
                c, s = carry
                p = build_subm_plan(
                    SparseTensor(st_.features, c, grid, rows_sorted=True), 3)
                s2 = p.gather_idx[0, 0]
                return (c + rt0(s2.astype(jnp.float32)), s2)
            return jax.lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
        return jax.jit(run)

    def down_chain(st_, mo, pad=1):
        grid = st_.spatial_shape

        def run(coords):
            def body(i, carry):
                c, s = carry
                p = build_conv_plan(
                    SparseTensor(st_.features, c, grid, rows_sorted=True),
                    3, 2, pad, max_out=mo)
                s2 = p.gather_idx[0, 0]
                return (c + rt0(s2.astype(jnp.float32)), s2)
            return jax.lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
        return jax.jit(run)

    timeit("subm_plan st1 (120k)", subm_chain(st1), st1.coords)
    timeit("subm_plan st2 (90k)", subm_chain(st2), st2.coords)
    timeit("subm_plan st3 (55k)", subm_chain(st3), st3.coords)
    timeit("subm_plan st4 (30k)", subm_chain(st4), st4.coords)
    timeit("down_plan st1->st2", down_chain(st1, 90_000), st1.coords)
    timeit("down_plan st2->st3", down_chain(st2, 55_000), st2.coords)
    timeit("down_plan st3->st4", down_chain(st3, 30_000, (0, 1, 1)),
           st3.coords)

    def conv_chain(st_, cin):
        plan = jax.jit(lambda s: build_subm_plan(s, 3))(st_)
        w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.1)
        feats = jnp.asarray(
            rng.randn(1, st_.num_rows, cin).astype(np.float32))

        def run(f0):
            def body(i, fx):
                o = apply_sparse_conv(fx, plan, w)
                return o * (0.1 / 27.0) + fx * 0.5
            return jax.lax.fori_loop(0, IT, body, f0).sum()
        return jax.jit(run), feats

    for s, cin, name in ((st1, 16, "st1x16"), (st2, 32, "st2x32"),
                         (st3, 64, "st3x64"), (st4, 128, "st4x128")):
        fn, feats = conv_chain(s, cin)
        timeit(f"conv {name}", fn, feats)


if __name__ == "__main__":
    main()
