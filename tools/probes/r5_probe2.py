"""Round-5 probe 2: A/B the center-identity subm-plan surgery (r5) against
the r4 path, after probe 1 measured subm st1/st2 plan chains at 35/24 ms vs
the r2 record of 12.4/8.7 ms and e2e at 198 ms vs r4's 156 (exact profile).
Hypothesis: the flat-stream slice+concat splice (plan) and/or the conv
body's two-slice gather (center skip) re-layouts the hot int stream
(CLAUDE.md v5e rule 5) and regressed every subm stage.

Measures, both flag states in one process:
  subm plan chains st1/st2, conv body chain st1, e2e forward.
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

    def rt0(s):
        return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)

    cfg = CenterPointConfig(max_voxels=CAPS[0], stage_caps=CAPS)

    def vox(p, v):
        return voxelize_batch(p, v, VOX, PC_RANGE, GRID, CAPS[0], 10)

    res = jax.jit(vox)(points, valid)
    st1 = SparseTensor(jnp.zeros((1, CAPS[0], 16), jnp.float32), res.coords,
                       cfg.sparse_shape, rows_sorted=True)
    d2 = jax.jit(lambda s: build_conv_plan(s, 3, 2, 1, max_out=CAPS[1]))(st1)
    st2 = SparseTensor(jnp.zeros((1, CAPS[1], 32)), d2.out_coords,
                       d2.out_spatial_shape, rows_sorted=True)

    def subm_chain(st_):
        grid = st_.spatial_shape

        def run(coords):
            def body(i, carry):
                c, s = carry
                p = build_subm_plan(
                    SparseTensor(st_.features, c, grid, rows_sorted=True), 3)
                s2 = p.gather_idx[0, 0]
                return (c + rt0(s2.astype(jnp.float32)), s2)
            return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
        return jax.jit(run)

    def conv_chain(st_, cin):
        plan = jax.jit(lambda s: build_subm_plan(s, 3))(st_)
        w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.1)
        feats = jnp.asarray(
            rng.randn(1, st_.num_rows, cin).astype(np.float32))

        def run(f0):
            def body(i, fx):
                o = apply_sparse_conv(fx, plan, w)
                return o * (0.1 / 27.0) + fx * 0.5
            return lax.fori_loop(0, IT, body, f0).sum()
        return jax.jit(run), feats

    def e2e(tag):
        model = CenterPoint(cfg)
        variables = jax.jit(lambda f_, c: model.init(
            jax.random.PRNGKey(0), f_, c, train=False))(
                res.features, res.coords)

        def fwd_chain(p0):
            def body(i, carry):
                p, s = carry
                r = vox(p, valid)
                preds, _ = model.apply(variables, r.features, r.coords,
                                       train=False,
                                       packed_table=r.packed_table)
                out = centerpoint_predict(cfg, preds)
                s2 = out["scores"].sum()
                return (p + s2 * jnp.float32(1e-38), s2)
            return lax.fori_loop(0, IT, body, (points, jnp.float32(0)))[1]

        timeit(f"e2e fwd [{tag}]", jax.jit(fwd_chain), points)

    for flag in (False, True):
        sp.set_center_identity(flag)
        tag = "center_skip" if flag else "r4_path"
        timeit(f"subm_plan st1 [{tag}]", subm_chain(st1), st1.coords)
        timeit(f"subm_plan st2 [{tag}]", subm_chain(st2), st2.coords)
        fn, feats = conv_chain(st1, 16)
        timeit(f"conv st1x16 subm body [{tag}]", fn, feats)
        e2e(tag)
    sp.set_center_identity(True)


if __name__ == "__main__":
    main()
