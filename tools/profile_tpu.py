#!/usr/bin/env python
"""TPU wall-clock profiling for the CenterPoint inference path (SURVEY §5.1
tracing/profiling replacement). Times each pipeline segment with forced
materialization; run on the real chip."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


import time

import numpy as np


def force(o):
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(o) if hasattr(l, "astype")]
    return float(jnp.stack([l.astype(jnp.float32).sum() for l in leaves]).sum())


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        force(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops.voxelize import voxelize_batch

    cfg = CenterPointConfig(
        max_voxels=120_000, stage_caps=(120_000, 90_000, 55_000, 30_000)
    )
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-54, 54, (1, 260_000, 2)), rng.uniform(-5, 3, (1, 260_000, 1)),
         rng.uniform(0, 1, (1, 260_000, 2))], -1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)

    def voxelize(p, v):
        return voxelize_batch(
            p, v, cfg.voxel_size, cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )

    res = jax.jit(voxelize)(points, valid)
    model = CenterPoint(cfg)
    variables = jax.jit(
        lambda f, c: model.init(jax.random.PRNGKey(0), f, c, train=False)
    )(res.features, res.coords)

    timeit("voxelize", jax.jit(voxelize), points, valid)
    fwd = jax.jit(lambda v, f, c: model.apply(v, f, c, train=False)[0])
    preds = timeit("forward (backbone+neck+head)", fwd, variables, res.features, res.coords)
    timeit("predict (decode+nms)", jax.jit(lambda p: centerpoint_predict(cfg, p)), preds)

    full = jax.jit(
        lambda v, p, vl: centerpoint_predict(
            cfg, model.apply(v, *(lambda r: (r.features, r.coords))(voxelize(p, vl)), train=False)[0]
        )
    )
    timeit("end-to-end", full, variables, points, valid)


if __name__ == "__main__":
    main()
