"""Round-3 probe 17: realistic-workload (raycast + fitted caps) e2e A/Bs.

The bench headline moved to ray-cast frames with fitted caps
(102400/73728/27648/10240). This probe measures, with the careful
in-graph-chain methodology (CLAUDE.md):

  a) full CenterPoint fwd, fitted caps, f32 tail
  b) same + bf16 tail
  c) same at the old saturated caps for the delta
plus the voxelize / backbone / tail split at fitted caps.

Run when the relay is back, after r3_probe14/15.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 4
_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


def timed(name, fn, *args, iters=ITERS):
    try:
        f = jax.jit(fn)
        t0 = time.time()
        s = float(f(*args))
        c = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            s = float(f(*args))
            best = min(best, time.time() - t0)
        per = (best - RTT) / iters * 1000.0
        print(f"{name:52s} {per:8.2f} ms/iter  (compile {c:.0f}s, "
              f"sink {s:.3g})", flush=True)
        return per
    except Exception as e:
        print(f"{name:52s} FAIL {str(e).splitlines()[0][:90]}", flush=True)
        return None


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def main():
    from bench import REALISTIC_STAGE_CAPS
    from df3d.models import layers as L
    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops.voxelize import voxelize_batch
    from df3d.utils.synth import make_raycast_frame

    frame = make_raycast_frame(np.random.RandomState(100), 260_000)
    points = jnp.asarray(frame[None])
    valid = jnp.ones(points.shape[:2], bool)

    def build(caps):
        cfg = CenterPointConfig(max_voxels=caps[0], stage_caps=caps)
        res = jax.jit(lambda p, v: voxelize_batch(
            p, v, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
            cfg.max_voxels, cfg.max_points_per_voxel))(points, valid)
        model = CenterPoint(cfg)
        variables = jax.jit(lambda f, c: model.init(
            jax.random.PRNGKey(0), f, c, train=False))(
                res.features, res.coords)
        return cfg, model, variables

    def full_fwd(cfg, model):
        def fn(variables, points, valid):
            def body(i, carry):
                p = points + perturb(carry).astype(points.dtype)
                r = voxelize_batch(
                    p, valid, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
                    cfg.max_voxels, cfg.max_points_per_voxel)
                preds, _ = model.apply(variables, r.features, r.coords,
                                       train=False)
                out = centerpoint_predict(cfg, preds)
                return jnp.float32(out["scores"].sum(dtype=jnp.float32))
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))
        return fn

    fit_cfg, fit_model, fit_vars = build(REALISTIC_STAGE_CAPS)
    for name, bf16 in [("a fitted caps f32", False),
                       ("b fitted caps bf16 tail", True)]:
        L.set_compute_dtype_2d(jnp.bfloat16 if bf16 else None)
        timed(f"{name} full fwd", full_fwd(fit_cfg, fit_model),
              fit_vars, points, valid)
    L.set_compute_dtype_2d(None)

    sat_cfg, sat_model, sat_vars = build((120_000, 90_000, 55_000, 30_000))
    timed("c saturated caps f32 full fwd (same frame)",
          full_fwd(sat_cfg, sat_model), sat_vars, points, valid)

    # split at fitted caps: voxelize only / backbone cut
    cfg = fit_cfg

    def vox_only(points, valid):
        def body(i, carry):
            p = points + perturb(carry).astype(points.dtype)
            r = voxelize_batch(
                p, valid, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
                cfg.max_voxels, cfg.max_points_per_voxel)
            return jnp.float32(
                r.features.sum(dtype=jnp.float32)
                + r.coords.sum(dtype=jnp.int32).astype(jnp.float32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    timed("d fitted caps voxelize only", vox_only, points, valid)


if __name__ == "__main__":
    main()
