#!/usr/bin/env python
"""Probe set 4: verify the round-2 optimizations on the real chip
(sym-half subm plan, scatter-based down plan, single-lax.gather conv,
task-stacked NMS). RTT-amortized chained timings."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from df3d.ops.sparse import SparseTensor, build_conv_plan, build_subm_plan
    from df3d.ops.sparse import apply_sparse_conv
    from df3d.ops.voxelize import voxelize_batch

    GRID = (41, 1440, 1440)
    PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    VOX = (0.075, 0.075, 0.2)
    N = 120_000
    C = 16

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

    x = jnp.float32(0.0)
    f = jax.jit(lambda v: v + 1.0)
    force(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        force(f(x))
    RTT[0] = (time.perf_counter() - t0) / 20
    print(f"RTT: {RTT[0]*1e3:.2f} ms", flush=True)

    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, N, 10))(points, valid)
    feats = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    feats = jnp.where(res.coords[..., :1] >= 0, feats, 0.0)
    st = SparseTensor(feats, res.coords, GRID)
    plan = jax.jit(lambda s: build_subm_plan(s, 3))(st)
    wk = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    IT = 8

    def rt_zero(s):
        return jnp.where(s > 1e30, 1, 0).astype(jnp.int32)

    def subm_chain(st_):
        def body(i, carry):
            c, s = carry
            p = build_subm_plan(SparseTensor(st_.features, c, GRID), 3)
            s2 = p.gather_idx[0, 0, 0]
            return (c + rt_zero(s2.astype(jnp.float32)), s2)
        return jax.lax.fori_loop(0, IT, body, (st_.coords, jnp.int32(0)))

    timeit("subm_plan NEW (chain)", jax.jit(subm_chain), st, iters=IT)

    def down_chain(st_):
        def body(i, carry):
            c, s = carry
            p = build_conv_plan(
                SparseTensor(st_.features, c, GRID), 3, 2, 1, max_out=90_000)
            s2 = p.gather_idx[0, 0, 0]
            return (c + rt_zero(s2.astype(jnp.float32)), s2)
        return jax.lax.fori_loop(0, IT, body, (st_.coords, jnp.int32(0)))

    timeit("down_plan NEW (chain)", jax.jit(down_chain), st, iters=IT)

    def conv_chain(feats, plan, w):
        def body(i, f):
            o = apply_sparse_conv(f, plan, w)
            return o * (0.1 / 27.0) + f * 0.5
        return jax.lax.fori_loop(0, IT, body, feats)

    timeit("conv NEW (chain)", jax.jit(conv_chain), feats, plan, wk, iters=IT)

    # ---- full model pieces -------------------------------------------------
    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )

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

    timeit("forward NEW (chain x3)", jax.jit(fwd_chain),
           variables, res.features, res.coords, n=3, iters=3)

    preds = jax.jit(lambda v, f, c: model.apply(v, f, c, train=False)[0])(
        variables, res.features, res.coords)

    def pred_chain(pr):
        def body(i, carry):
            p0, s = carry
            out = centerpoint_predict(cfg, p0)
            s2 = out["scores"].sum()
            bump = jnp.where(s2 > 1e30, 1.0, 0.0)
            p0 = [{k: v + bump for k, v in t.items()} for t in p0]
            return (p0, s2)
        return jax.lax.fori_loop(0, 4, body, (pr, jnp.float32(0)))

    timeit("predict NEW (chain x4)", jax.jit(pred_chain), preds, n=3, iters=4)

    # end-to-end single jit (bench configuration)
    def e2e(v, p, vl):
        r = voxelize_batch(p, vl, VOX, PC_RANGE, GRID, N, 10)
        pr, _ = model.apply(v, r.features, r.coords, train=False)
        return centerpoint_predict(cfg, pr)

    timeit("e2e bench graph", jax.jit(e2e), variables, points, valid, n=5)


if __name__ == "__main__":
    main()
