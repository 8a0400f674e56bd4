"""Round-5 probe 5: full fresh cost breakdown of the CenterPoint frame at
fitted caps (bench headline config) so the next optimization targets the
real top item. probe 1/4 established: vox 7.4, subm plans 10.6/6.7/~3/~1.5,
down plans 20.2/11.2/3.3 (rank lookup ~10 ms at st1->2 is intrinsic).
Remaining unmeasured this round: conv bodies per stage (f32 and bf16>=32ch
serving config), BEV neck + CenterHead, and centerpoint_predict.

Chains follow CLAUDE.md methodology; conv chains feed outputs back as
inputs (runtime-zero mixing) to defeat CSE.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

IT = 8
CAPS = (102_400, 73_728, 27_648, 10_240)
GRID = (40, 1440, 1440)
PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOX = (0.075, 0.075, 0.2)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops import sparse as sp
    from df3d.ops.sparse import (
        SparseTensor, apply_sparse_conv, build_conv_plan, build_subm_plan,
    )
    from df3d.ops.voxelize import voxelize_batch

    cache_dir = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from df3d.utils.synth import make_raycast_frame

    rng = np.random.RandomState(100)
    pts = make_raycast_frame(rng, 260_000)
    points = jnp.asarray(pts[None])
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
        print(f"{name:46s} {per*1e3:7.2f} ms  (compile {t1c-t0c:.0f}s)",
              flush=True)
        return per

    f = jax.jit(lambda v: v + 1.0)
    float(f(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(f(jnp.float32(0)))
    RTT[0] = (time.perf_counter() - t0) / 20
    print(f"RTT: {RTT[0]*1e3:.2f} ms", flush=True)

    cfg = CenterPointConfig(max_voxels=CAPS[0], stage_caps=CAPS)
    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, CAPS[0], 10))(points, valid)

    st1 = SparseTensor(jnp.zeros((1, CAPS[0], 16), jnp.float32), res.coords,
                       cfg.sparse_shape, rows_sorted=True)

    def chainplans(st):
        d2 = build_conv_plan(st, 3, 2, 1, max_out=CAPS[1])
        st2 = SparseTensor(jnp.zeros((1, CAPS[1], 32)), d2.out_coords,
                           d2.out_spatial_shape, rows_sorted=True)
        d3 = build_conv_plan(st2, 3, 2, 1, max_out=CAPS[2])
        st3 = SparseTensor(jnp.zeros((1, CAPS[2], 64)), d3.out_coords,
                           d3.out_spatial_shape, rows_sorted=True)
        d4 = build_conv_plan(st3, 3, 2, (0, 1, 1), max_out=CAPS[3])
        st4 = SparseTensor(jnp.zeros((1, CAPS[3], 128)), d4.out_coords,
                           d4.out_spatial_shape, rows_sorted=True)
        return (d2, d3, d4), (st2, st3, st4)

    (d2, d3, d4), (st2, st3, st4) = jax.jit(chainplans)(st1)

    def subm_conv_chain(st_, cin, dtype):
        plan = jax.jit(lambda s: build_subm_plan(s, 3))(st_)
        w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.1)
        feats = jnp.asarray(
            rng.randn(1, st_.num_rows, cin).astype(np.float32))
        if dtype is not None:
            w = w.astype(dtype)
            feats = feats.astype(dtype)

        def run(f0):
            def body(i, fx):
                o = apply_sparse_conv(fx, plan, w)
                return o * jnp.asarray(0.1 / 27.0, o.dtype) + fx * jnp.asarray(0.5, fx.dtype)
            return lax.fori_loop(0, IT, body, f0).sum().astype(jnp.float32)
        return jax.jit(run), feats

    def down_conv_chain(st_in, plan, cin, cout, dtype):
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        feats = jnp.asarray(
            rng.randn(1, st_in.num_rows, cin).astype(np.float32))
        back = jnp.asarray(
            rng.randn(cout, cin).astype(np.float32) * 0.1)
        if dtype is not None:
            w = w.astype(dtype)
            feats = feats.astype(dtype)
            back = back.astype(dtype)

        def run(f0):
            def body(i, fx):
                o = apply_sparse_conv(fx, plan, w)  # (1, N_out, cout)
                # mix back to input shape with a cheap dense matmul
                mixed = (o[:, : st_in.num_rows // 1] @ back)
                pad = st_in.num_rows - mixed.shape[1]
                mixed = jnp.pad(mixed, ((0, 0), (0, pad), (0, 0)))
                return fx * jnp.asarray(0.5, fx.dtype) + mixed * jnp.asarray(
                    0.01, fx.dtype)
            return lax.fori_loop(0, IT, body, f0).sum().astype(jnp.float32)
        return jax.jit(run), feats

    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        for st_, cin, nm in ((st1, 16, "st1x16"), (st2, 32, "st2x32"),
                             (st3, 64, "st3x64"), (st4, 128, "st4x128")):
            fn, feats = subm_conv_chain(st_, cin, dtype)
            timeit(f"subm conv {nm} [{tag}]", fn, feats)
        for st_in, plan, cin, cout, nm in (
                (st1, d2, 16, 32, "down1->2"),
                (st2, d3, 32, 64, "down2->3"),
                (st3, d4, 64, 128, "down3->4")):
            fn, feats = down_conv_chain(st_in, plan, cin, cout, dtype)
            timeit(f"down conv {nm} [{tag}]", fn, feats)

    # --- neck + head vs predict ----------------------------------------
    model = CenterPoint(cfg)
    variables = jax.jit(lambda f_, c: model.init(
        jax.random.PRNGKey(0), f_, c, train=False))(res.features, res.coords)

    def full_fwd(p0):
        def body(i, carry):
            p, s = carry
            r = voxelize_batch(p, valid, VOX, PC_RANGE, GRID, CAPS[0], 10)
            preds, _ = model.apply(variables, r.features, r.coords,
                                   train=False, packed_table=r.packed_table)
            s2 = sum(jnp.sum(x) for t in preds for x in t.values())
            return (p + s2 * jnp.float32(1e-38), s2)
        return lax.fori_loop(0, IT, body, (points, jnp.float32(0)))[1]

    timeit("vox+backbone+neck+head (no predict)", jax.jit(full_fwd), points)

    preds0, _ = jax.jit(lambda f_, c: model.apply(
        variables, f_, c, train=False))(res.features, res.coords)

    def predict_chain(p0):
        def body(i, carry):
            pr, s = carry
            out = centerpoint_predict(cfg, pr)
            s2 = out["scores"].sum()
            pert = s2 * jnp.float32(1e-38)
            pr2 = [{k: v + pert for k, v in t.items()} for t in pr]
            return (pr2, s2)
        return lax.fori_loop(0, IT, body, (p0, jnp.float32(0)))[1]

    timeit("centerpoint_predict", jax.jit(predict_chain), preds0)


if __name__ == "__main__":
    main()
