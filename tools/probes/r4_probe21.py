"""Round-4 probe 21: segment breakdown of the BENCH HEADLINE config.

The r2 breakdown (182 ms era: subm plans ~27, down plans ~47, convs ~65,
voxelize ~10.5, tail ~21) predates fitted caps, bf16>=32ch bodies, dense
stage-4 tail, and packed-table reuse — the current ~154 ms forward has no
measured decomposition, so the next formulation attack would be blind.
Four in-graph chains at the exact headline config (tpu_v5e profile, sort
voxelize, ray-cast frame, fitted caps):

  A  voxelize only
  B  A + 3D backbone (SpMiddleResNetFHD incl. dense st4 tail)
  C  A + backbone + neck + head   (= full apply)
  D  C + decode/NMS (centerpoint_predict)

B-A = backbone (plans+convs), C-B = neck+head, D-C = predict.
Methodology per CLAUDE.md: fori chain of ITERS, runtime-zero perturbation
threaded into the POINTS (everything downstream depends on them).
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
        print(f"{name:40s} {per:8.2f} ms/iter  (compile {c:.0f}s, "
              f"sink {s:.3g})", flush=True)
        return per
    except Exception as e:
        print(f"{name:40s} FAIL {str(e).splitlines()[0][:110]}", flush=True)
        return None


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def main():
    from bench import REALISTIC_STAGE_CAPS
    from df3d.models.backbones_3d import SpMiddleResNetFHD
    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops.sparse import SparseTensor
    from df3d.ops.voxelize import voxelize_batch
    from df3d.serving import apply_profile
    from df3d.utils.synth import make_raycast_frame

    apply_profile("tpu_v5e")

    frame = make_raycast_frame(np.random.RandomState(100), 260_000)
    points = jnp.asarray(frame[None])
    valid = jnp.ones(points.shape[:2], bool)

    caps = REALISTIC_STAGE_CAPS
    cfg = CenterPointConfig(max_voxels=caps[0], stage_caps=caps)

    def vox(p, v):
        return voxelize_batch(
            p, v, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
            cfg.max_voxels, cfg.max_points_per_voxel)

    res = jax.jit(vox)(points, valid)
    model = CenterPoint(cfg)
    variables = jax.jit(lambda f, c: model.init(
        jax.random.PRNGKey(0), f, c, train=False))(res.features, res.coords)
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables["batch_stats"]["backbone"]}
    caps_eff = tuple(min(c, caps[0]) for c in cfg.stage_caps)
    backbone = SpMiddleResNetFHD(
        cfg.num_point_features, caps_eff, dense_tail=cfg.dense_tail,
        dense_from=cfg.dense_from)

    def chain_vox(points, valid):
        def body(i, carry):
            p = points + perturb(carry).astype(points.dtype)
            r = vox(p, valid)
            return jnp.float32(
                r.features.sum(dtype=jnp.float32)
                + r.coords.sum().astype(jnp.float32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    def chain_backbone(points, valid):
        def body(i, carry):
            p = points + perturb(carry).astype(points.dtype)
            r = vox(p, valid)
            st = SparseTensor(r.features, r.coords, cfg.sparse_shape,
                              rows_sorted=True)
            bev, _ = backbone.apply(bb_vars, st, False)
            return jnp.float32(bev.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    def chain_heads(points, valid):
        def body(i, carry):
            p = points + perturb(carry).astype(points.dtype)
            r = vox(p, valid)
            preds, _ = model.apply(variables, r.features, r.coords,
                                   train=False)
            s = jnp.float32(0)
            for task in preds:
                for v in task.values():
                    s += v.sum(dtype=jnp.float32)
            return s
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    def chain_full(points, valid):
        def body(i, carry):
            p = points + perturb(carry).astype(points.dtype)
            r = vox(p, valid)
            preds, _ = model.apply(variables, r.features, r.coords,
                                   train=False)
            out = centerpoint_predict(cfg, preds)
            return jnp.float32(out["scores"].sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    a = timed("A voxelize", chain_vox, points, valid)
    b = timed("B vox+backbone3d", chain_backbone, points, valid)
    c = timed("C vox+backbone+neck+head", chain_heads, points, valid)
    d = timed("D full (C+predict)", chain_full, points, valid)
    if None not in (a, b, c, d):
        print(f"SEGMENTS: vox {a:.1f} | backbone {b - a:.1f} | "
              f"neck+head {c - b:.1f} | predict {d - c:.1f} | total {d:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
