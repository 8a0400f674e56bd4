"""Round-3 probe 20: sort-free bitrank voxelize + packed-table reuse e2e.

Two new formulations (both exact w.r.t. coords/plans; bitrank drops the
max_points cap — mean over all points):
  * PLAN_TABLE_REUSE: strided plans hand their parity-plane occupancy
    table to the next stage's subm plan (skips pack_keys at st2/st3).
  * voxelize(method="bitrank"): occupancy-bit scatter + rank lookup
    replaces argsort + sorted segment machinery, and emits the stage-1
    table for free.

Variants (full CenterPoint fwd, fitted caps, ray-cast frame):
  a) reuse OFF, sort voxelize  (probe-19 baseline re-measure)
  b) reuse ON,  sort voxelize  (st2/st3 reuse only)
  c) reuse ON,  bitrank voxelize + table into the model (st1 too)
  d) c + bf16 conv min_ch=32   (stacked with the probe-19 winner)
Plus isolated voxelize chains: sort vs bitrank at 260k points.
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
    tcells = cfg.sparse_shape[0] * cfg.sparse_shape[1] * cfg.sparse_shape[2]

    def vox(p, v, method):
        return voxelize_batch(
            p, v, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
            cfg.max_voxels, cfg.max_points_per_voxel, method=method,
            table_cells=tcells if method == "bitrank" else None)

    # isolated voxelize chains
    def vox_chain(method):
        def fn(p, v):
            def body(i, carry):
                pp = p + perturb(carry).astype(p.dtype)
                r = vox(pp, v, method)
                return jnp.float32(
                    r.features.sum(dtype=jnp.float32)
                    + r.coords.sum().astype(jnp.float32))
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))
        return fn

    timed("vox sort isolated", vox_chain("sort"), points, valid)
    timed("vox bitrank isolated", vox_chain("bitrank"), points, valid)

    res = jax.jit(lambda p, v: vox(p, v, "sort"))(points, valid)
    model = CenterPoint(cfg)
    variables = jax.jit(lambda f, c: model.init(
        jax.random.PRNGKey(0), f, c, train=False))(res.features, res.coords)

    def full_fwd(method):
        def fn(variables, points, valid):
            def body(i, carry):
                p = points + perturb(carry).astype(points.dtype)
                r = vox(p, valid, method)
                preds, _ = model.apply(
                    variables, r.features, r.coords, train=False,
                    packed_table=r.packed_table)
                out = centerpoint_predict(cfg, preds)
                return jnp.float32(out["scores"].sum(dtype=jnp.float32))
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))
        return fn

    results = {}
    for name, reuse, method, bf16 in [
        ("a reuseOFF sort", False, "sort", False),
        ("b reuseON  sort", True, "sort", False),
        ("c reuseON  bitrank", True, "bitrank", False),
        ("d c + bf16 conv min32", True, "bitrank", True),
    ]:
        S.set_plan_table_reuse(reuse)
        S.set_compute_dtype(jnp.bfloat16 if bf16 else None, min_channels=32)
        results[name] = timed(f"{name} full fwd", full_fwd(method),
                              variables, points, valid)
    S.set_plan_table_reuse(True)
    S.set_compute_dtype(None)
    print("SUMMARY", {k: None if v is None else round(v, 2)
                      for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
