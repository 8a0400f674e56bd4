"""Round-5 probe 7: in-model validation of the mini-rank down plans
(keytable.pack_mini/lookup_mini replacing pack_occupancy+lookup, r5
probe 6). Expected from the decomposition: down st1->2 20.2 -> ~10,
st2->3 11.2 -> ~7, st3->4 3.3 -> ~2.5, e2e fwd 150.4 -> ~138 (exact f32).
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
    from df3d.ops.sparse import SparseTensor, build_conv_plan
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
        return st2, st3

    st2, st3 = jax.jit(chainplans)(st1)

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
            return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
        return jax.jit(run)

    timeit("down_plan st1->2 [mini]", down_chain(st1, CAPS[1]), st1.coords)
    timeit("down_plan st2->3 [mini]", down_chain(st2, CAPS[2]), st2.coords)
    timeit("down_plan st3->4 [mini]", down_chain(st3, CAPS[3], (0, 1, 1)),
           st3.coords)

    model = CenterPoint(cfg)
    variables = jax.jit(lambda f_, c: model.init(
        jax.random.PRNGKey(0), f_, c, train=False))(res.features, res.coords)

    def fwd_chain(p0):
        def body(i, carry):
            p, s = carry
            r = voxelize_batch(p, valid, VOX, PC_RANGE, GRID, CAPS[0], 10)
            preds, _ = model.apply(variables, r.features, r.coords,
                                   train=False, packed_table=r.packed_table)
            out = centerpoint_predict(cfg, preds)
            s2 = out["scores"].sum()
            return (p + s2 * jnp.float32(1e-38), s2)
        return lax.fori_loop(0, IT, body, (points, jnp.float32(0)))[1]

    timeit("e2e fwd [mini]", jax.jit(fwd_chain), points)


if __name__ == "__main__":
    main()
