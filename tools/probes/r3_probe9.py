"""Round-3 probe 9: full-model CenterPoint forward A/B — x3 ON vs OFF —
using the bench.py methodology (async dispatch, force once). The r3 bench
with the tuple-form x3 reads 4.921 fps vs 5.513 end-r2 (no x3): isolate
whether x3 is still net-negative in-model and where.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import df3d.ops.sparse as sp
    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops.voxelize import voxelize_batch

    cfg = CenterPointConfig(
        max_voxels=120_000, stage_caps=(120_000, 90_000, 55_000, 30_000),
    )
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-54, 54, (1, 260_000, 2)),
         rng.uniform(-5, 3, (1, 260_000, 1)),
         rng.uniform(0, 1, (1, 260_000, 2))], -1).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)

    def voxelize(p, v):
        return voxelize_batch(p, v, cfg.voxel_size, cfg.pc_range,
                              cfg.grid_size, cfg.max_voxels,
                              cfg.max_points_per_voxel)

    res = jax.jit(voxelize)(points, valid)
    model = CenterPoint(cfg)
    variables = jax.jit(
        lambda f, c: model.init(jax.random.PRNGKey(0), f, c, train=False)
    )(res.features, res.coords)

    def make_infer():
        @jax.jit
        def infer(variables, points, valid):
            r = voxelize(points, valid)
            preds, _ = model.apply(
                variables, r.features, r.coords, train=False)
            return centerpoint_predict(cfg, preds)
        return infer

    def timefn(infer, name):
        t0 = time.time()
        float(infer(variables, points, valid)["scores"].sum())
        print(f"{name} compile {time.time()-t0:.0f}s", flush=True)
        iters = 10
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [infer(variables, points, valid) for _ in range(iters)]
            s = 0.0
            for o in outs:
                s += o["scores"].sum()
            float(s)
            best = max(best, iters / (time.perf_counter() - t0))
        print(f"{name}: {best:.3f} fps  {1000/best:.1f} ms", flush=True)

    sp.X3_ENABLED = True
    timefn(make_infer(), "A x3=on ")
    sp.X3_ENABLED = False
    timefn(make_infer(), "B x3=off")


if __name__ == "__main__":
    main()
