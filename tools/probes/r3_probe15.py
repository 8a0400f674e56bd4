"""Round-3 probe 15: full-model A/Bs for the two staged switches.

  a) baseline CenterPoint forward (bench config, dense st4 tail)
  b) + bf16 neck/head tail  (models/layers.set_compute_dtype_2d)
  c) + pallas v2 conv bodies (ops/sparse.set_pallas_conv)  [if probe 14
     showed the whole-table permutation is competitive]
  d) b + c
plus the isolated neck+head+predict chain f32 vs bf16.

Run AFTER r3_probe14 (correctness + rates of the Mosaic dynamic_gather).
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
    # fresh lambda: jax.jit caches on function identity, so re-jitting the
    # same fn after flipping a module global would silently reuse the old
    # trace (this invalidated the first run's b/c/d variants)
    try:
        f = jax.jit(lambda *a: fn(*a))
        t0 = time.time()
        s = float(f(*args))
        c = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            s = float(f(*args))
            best = min(best, time.time() - t0)
        per = (best - RTT) / iters * 1000.0
        print(f"{name:48s} {per:8.2f} ms/iter  (compile {c:.0f}s, "
              f"sink {s:.3g})", flush=True)
        return per
    except Exception as e:
        print(f"{name:48s} FAIL {str(e).splitlines()[0][:90]}", flush=True)
        return None


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def main():
    from df3d.models import layers as L
    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops import sparse as sp
    from df3d.ops.voxelize import voxelize_batch

    cfg = CenterPointConfig(
        max_voxels=120_000, stage_caps=(120_000, 90_000, 55_000, 30_000),
    )
    rng = np.random.RandomState(0)
    num_points = 260_000
    pts = np.concatenate(
        [rng.uniform(-54, 54, (1, num_points, 2)),
         rng.uniform(-5, 3, (1, num_points, 1)),
         rng.uniform(0, 1, (1, num_points, 2))], -1).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)

    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
        cfg.max_voxels, cfg.max_points_per_voxel))(points, valid)
    model = CenterPoint(cfg)
    variables = jax.jit(lambda f, c: model.init(
        jax.random.PRNGKey(0), f, c, train=False))(res.features, res.coords)

    def full_fwd(variables, points, valid):
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

    for name, bf16, pv2 in [
        ("a baseline", False, False),
        ("b bf16 tail", True, False),
        ("c pallas v2 convs", False, True),
        ("d bf16 + pallas v2", True, True),
    ]:
        L.set_compute_dtype_2d(jnp.bfloat16 if bf16 else None)
        sp.set_pallas_conv(pv2)
        timed(f"{name} full fwd", full_fwd, variables, points, valid)
    L.set_compute_dtype_2d(None)
    sp.set_pallas_conv(False)

    # isolated neck+head+predict on a fixed BEV
    from df3d.models.heads.center_head import CenterHead
    from df3d.models.necks import BEVBackbone

    class Tail(L.nn.Module):
        @L.nn.compact
        def __call__(self, x, train=False):
            x = BEVBackbone(
                layer_nums=(5, 5), layer_strides=(1, 2),
                num_filters=(128, 256), upsample_strides=(1, 2),
                num_upsample_filters=(256, 256), name="neck")(x, train)
            return CenterHead(cfg.tasks, name="head")(x, train)

    bev = jnp.asarray(rng.randn(1, 180, 180, 256).astype(np.float32) * 0.1)
    tail = Tail()
    tvars = jax.jit(lambda b: tail.init(jax.random.PRNGKey(0), b))(bev)

    def tail_fwd(tvars, bev):
        def body(i, carry):
            b = bev + perturb(carry).astype(bev.dtype)
            preds = tail.apply(tvars, b)
            out = centerpoint_predict(cfg, preds)
            return jnp.float32(out["scores"].sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    for name, bf16 in [("tail f32", False), ("tail bf16", True)]:
        L.set_compute_dtype_2d(jnp.bfloat16 if bf16 else None)
        timed(f"{name} neck+head+predict", tail_fwd, tvars, bev)
    L.set_compute_dtype_2d(None)


if __name__ == "__main__":
    main()
