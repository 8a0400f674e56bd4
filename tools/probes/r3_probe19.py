"""Round-3 probe 19: e2e A/B of bf16 sparse-conv BODIES at bench config.

Probe 18 C measured the per-stage win in isolation (st3 64-ch: 1.72 ->
1.20 ms per 2 subm convs, -30%; st2 32-ch marginal; st1 16-ch would
regress — 32B rows leave the v5e 2 ns/row gather sweet spot). This probe
decides the DEFAULT by measuring the full CenterPoint forward (fitted
caps, ray-cast frame — exactly the bench headline workload):

  a) all-f32 (current default)
  b) bf16 conv bodies, min_channels=64 (st3 + st4-subm before dense tail)
  c) bf16 conv bodies, min_channels=32 (adds stage 2)
  d) winner of b/c + bf16 2D tail (interaction check; tail alone was a
     wash in probe 15)

Methodology: in-graph fori_loop chain of ITERS full forwards with a
runtime-zero coord perturbation (CLAUDE.md measurement rules).
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
    from df3d.ops import sparse as S
    from df3d.ops.voxelize import voxelize_batch
    from df3d.utils.synth import make_raycast_frame

    frame = make_raycast_frame(np.random.RandomState(100), 260_000)
    points = jnp.asarray(frame[None])
    valid = jnp.ones(points.shape[:2], bool)

    caps = REALISTIC_STAGE_CAPS
    cfg = CenterPointConfig(max_voxels=caps[0], stage_caps=caps)
    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
        cfg.max_voxels, cfg.max_points_per_voxel))(points, valid)
    model = CenterPoint(cfg)
    variables = jax.jit(lambda f, c: model.init(
        jax.random.PRNGKey(0), f, c, train=False))(res.features, res.coords)

    def full_fwd():
        # fresh closure per variant: set_compute_dtype is a trace-time
        # global, so each variant must get its own jit cache entry
        # (the probe-15 lesson)
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

    results = {}
    variants = [
        ("a f32 baseline", None, 64, None),
        ("b bf16 conv min_ch=64", jnp.bfloat16, 64, None),
        ("c bf16 conv min_ch=32", jnp.bfloat16, 32, None),
    ]
    for name, dt, mc, tail in variants:
        S.set_compute_dtype(dt, min_channels=mc)
        L.set_compute_dtype_2d(tail)
        results[name] = timed(f"{name} full fwd", full_fwd(),
                              variables, points, valid)

    # d) best conv variant + bf16 tail
    bs = {k: v for k, v in results.items() if v is not None}
    if bs:
        best = min(bs, key=bs.get)
        if best != "a f32 baseline":
            _, dt, mc, _ = next(v for v in variants if v[0] == best)
            S.set_compute_dtype(dt, min_channels=mc)
            L.set_compute_dtype_2d(jnp.bfloat16)
            results["d best+bf16 tail"] = timed(
                f"d ({best}) + bf16 tail full fwd", full_fwd(),
                variables, points, valid)
    S.set_compute_dtype(None)
    L.set_compute_dtype_2d(None)
    print("SUMMARY", {k: None if v is None else round(v, 2)
                      for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
