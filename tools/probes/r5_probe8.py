"""Round-5 probe 8: pick the serving profile on top of the mini-rank down
plans. e2e forward A/B/C at bench config:
  A exact (f32, sort vox)                 — probe 7 measured 139.9 ms
  B tpu_v5e (bf16 conv bodies >=32ch)
  C B + bf16 2D tail (neck+head+dense-tail) — re-test of r3 probe 15's
    "wash" now that the frame is ~14 ms shorter and the tail is ~18 ms
Also isolates the neck+head tail: full fwd minus predict in f32 vs bf16.
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
    from df3d.models.layers import set_compute_dtype_2d
    from df3d.ops.sparse import set_compute_dtype
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
    model = CenterPoint(cfg)
    variables = jax.jit(lambda f_, c: model.init(
        jax.random.PRNGKey(0), f_, c, train=False))(res.features, res.coords)

    def fwd_chain():
        def run(p0):
            def body(i, carry):
                p, s = carry
                r = voxelize_batch(p, valid, VOX, PC_RANGE, GRID, CAPS[0], 10)
                preds, _ = model.apply(
                    variables, r.features, r.coords, train=False,
                    packed_table=r.packed_table)
                out = centerpoint_predict(cfg, preds)
                s2 = out["scores"].sum()
                return (p + s2 * jnp.float32(1e-38), s2)
            return lax.fori_loop(0, IT, body, (p0, jnp.float32(0)))[1]
        return jax.jit(run)

    import jax.numpy as jnp2

    configs = [
        ("A exact", None, 0, None),
        ("B bf16 conv>=32", jnp2.bfloat16, 32, None),
        ("C B + bf16 2d tail", jnp2.bfloat16, 32, jnp2.bfloat16),
        ("D bf16 2d tail only", None, 0, jnp2.bfloat16),
    ]
    for name, cdt, minch, tdt in configs:
        if cdt is None:
            set_compute_dtype(None)
        else:
            set_compute_dtype(cdt, min_channels=minch)
        set_compute_dtype_2d(tdt)
        timeit(f"e2e fwd [{name}]", fwd_chain(), points)
    set_compute_dtype(None)
    set_compute_dtype_2d(None)


if __name__ == "__main__":
    main()
