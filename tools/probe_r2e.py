#!/usr/bin/env python
"""Probe set 5: per-stage plan/conv costs at true stage shapes + dense
BEV neck/head f32 vs bf16 (is XLA using a slow f32 conv path?)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from df3d.ops.sparse import (
        SparseTensor, apply_sparse_conv, build_conv_plan, build_subm_plan,
    )
    from df3d.ops.voxelize import voxelize_batch

    GRID = (41, 1440, 1440)
    PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    VOX = (0.075, 0.075, 0.2)
    N = 120_000

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

    def timeit(name, fn, *args, n=4, iters=1):
        t0c = time.perf_counter()
        out = fn(*args)
        force(out)
        t1c = time.perf_counter()
        t0 = time.perf_counter()
        for _ in range(n):
            force(fn(*args))
        dt = (time.perf_counter() - t0) / n
        per = (dt - RTT[0]) / iters
        print(f"{name}: {per*1e3:.2f} ms/op  (compile {t1c-t0c:.1f} s)",
              flush=True)
        return out

    x0 = jnp.float32(0.0)
    f = jax.jit(lambda v: v + 1.0)
    force(f(x0))
    t0 = time.perf_counter()
    for _ in range(20):
        force(f(x0))
    RTT[0] = (time.perf_counter() - t0) / 20
    print(f"RTT: {RTT[0]*1e3:.2f} ms", flush=True)

    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, N, 10))(points, valid)
    st1 = SparseTensor(
        jnp.zeros((1, N, 16), jnp.float32), res.coords, GRID)

    # build the true downstream coord sets once
    def chainplans(st):
        d2 = build_conv_plan(st, 3, 2, 1, max_out=90_000)
        st2 = SparseTensor(
            jnp.zeros((1, 90_000, 32)), d2.out_coords, d2.out_spatial_shape)
        d3 = build_conv_plan(st2, 3, 2, 1, max_out=55_000)
        st3 = SparseTensor(
            jnp.zeros((1, 55_000, 64)), d3.out_coords, d3.out_spatial_shape)
        d4 = build_conv_plan(st3, 3, 2, (0, 1, 1), max_out=30_000)
        st4 = SparseTensor(
            jnp.zeros((1, 30_000, 128)), d4.out_coords, d4.out_spatial_shape)
        return st2, st3, st4

    st2, st3, st4 = jax.jit(chainplans)(st1)
    for s, name in ((st2, "st2"), (st3, "st3"), (st4, "st4")):
        nv = int(s.valid.sum())
        print(f"  {name}: {nv} voxels, shape {s.spatial_shape}", flush=True)

    IT = 8

    def rt_zero(s):
        return jnp.where(s > 1e30, 1, 0).astype(jnp.int32)

    def subm_chain(st_):
        grid = st_.spatial_shape

        def run(coords):
            def body(i, carry):
                c, s = carry
                p = build_subm_plan(SparseTensor(st_.features, c, grid), 3)
                s2 = p.gather_idx[0, 0, 0]
                return (c + rt_zero(s2.astype(jnp.float32)), s2)
            return jax.lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))
        return jax.jit(run)

    def down_chain(st_, mo, pad=1):
        grid = st_.spatial_shape

        def run(coords):
            def body(i, carry):
                c, s = carry
                p = build_conv_plan(
                    SparseTensor(st_.features, c, grid), 3, 2, pad, max_out=mo)
                s2 = p.gather_idx[0, 0, 0]
                return (c + rt_zero(s2.astype(jnp.float32)), s2)
            return jax.lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))
        return jax.jit(run)

    timeit("subm_plan st2 (90k, 10.9M cells)", subm_chain(st2), st2.coords,
           iters=IT)
    timeit("subm_plan st3 (55k, 1.4M cells)", subm_chain(st3), st3.coords,
           iters=IT)
    timeit("subm_plan st4 (30k)", subm_chain(st4), st4.coords, iters=IT)
    timeit("down_plan st2->st3", down_chain(st2, 55_000), st2.coords, iters=IT)
    timeit("down_plan st3->st4", down_chain(st3, 30_000, (0, 1, 1)),
           st3.coords, iters=IT)

    # convs at stage shapes
    def conv_chain(st_, cin):
        plan = jax.jit(lambda s: build_subm_plan(s, 3))(st_)
        w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.1)
        feats = jnp.asarray(rng.randn(1, st_.num_rows, cin).astype(np.float32))

        def run(f0):
            def body(i, f):
                o = apply_sparse_conv(f, plan, w)
                return o * (0.1 / 27.0) + f * 0.5
            return jax.lax.fori_loop(0, IT, body, f0)
        return jax.jit(run), feats

    for s, cin, name in ((st2, 32, "st2x32"), (st3, 64, "st3x64"),
                         (st4, 128, "st4x128")):
        fn, feats = conv_chain(s, cin)
        timeit(f"conv {name}", fn, feats, iters=IT)

    # dense neck+head f32 vs bf16
    from df3d.models.necks import BEVBackbone
    from df3d.models.heads.center_head import CenterHead

    bev0 = jnp.asarray(rng.randn(1, 180, 180, 256).astype(np.float32))
    neck = BEVBackbone(layer_nums=(5, 5), layer_strides=(1, 2),
                       num_filters=(128, 256), upsample_strides=(1, 2),
                       num_upsample_filters=(256, 256))
    nv = neck.init(jax.random.PRNGKey(0), bev0, False)
    head = CenterHead((1, 2, 2, 1, 2, 2))
    neck_out = neck.apply(nv, bev0, False)
    hv = head.init(jax.random.PRNGKey(0), neck_out, False)

    def neck_chain(v, b0):
        def body(i, b):
            o = neck.apply(v, b, False)
            return b * 0.5 + o[..., :256] * 0.1
        return jax.lax.fori_loop(0, IT, body, b0)

    timeit("neck f32", jax.jit(neck_chain), nv, bev0, iters=IT)
    nv16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, nv)
    timeit("neck bf16", jax.jit(neck_chain), nv16,
           bev0.astype(jnp.bfloat16), iters=IT)

    def head_chain(v, b0):
        def body(i, b):
            outs = head.apply(v, b, False)
            return b * 0.5 + outs[0]["reg"].sum() * 1e-9
        return jax.lax.fori_loop(0, IT, body, b0)

    timeit("head f32", jax.jit(head_chain), hv, neck_out, iters=IT)
    hv16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, hv)
    timeit("head bf16", jax.jit(head_chain), hv16,
           neck_out.astype(jnp.bfloat16), iters=IT)


if __name__ == "__main__":
    main()
