"""Forward-only e2e probe: CenterPoint 0.075 full inference (voxelize ->
backbone -> neck -> head -> predict) as ONE jit, fori_loop x4, perturbed.
Faster to compile than bench.py (no train step); reports device ms/frame."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict)
    from df3d.ops.voxelize import voxelize_batch

    cfg = CenterPointConfig(max_voxels=120_000,
                            stage_caps=(120_000, 90_000, 60_000, 30_000))
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
    variables = jax.jit(lambda f, c: model.init(
        jax.random.PRNGKey(0), f, c, train=False))(res.features, res.coords)

    IT = 4
    def fwd_chain(variables, points, valid):
        def body(i, carry):
            p, s = carry
            r = voxelize(p, valid)
            preds, _ = model.apply(variables, r.features, r.coords,
                                   train=False)
            out = centerpoint_predict(cfg, preds)
            s2 = out["scores"].sum()
            return (p + s2 * jnp.float32(1e-38), s2)
        return jax.lax.fori_loop(0, IT, body, (points, jnp.float32(0)))[1]

    f = jax.jit(fwd_chain)
    t0 = time.time()
    s = float(f(variables, points, valid))
    print(f"compile+first: {time.time()-t0:.0f}s  sink {s:.4g}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s = float(f(variables, points, valid))
        best = min(best, time.time() - t0)
    print(f"e2e forward: {(best - 0.033)/IT*1000:.1f} ms/frame", flush=True)

if __name__ == "__main__":
    main()
