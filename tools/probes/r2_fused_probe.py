"""Fused-model full-scale forward probe: TransFusion3DDF at nuScenes scale
(6 cams, 448x800 images, 0.075 voxel, 120k voxels) — the open round-2 item
'fused-model full-scale perf pass'. Reports ms/frame for the image branch
alone and the full fused forward."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from df3d.models.detectors.fused import (
        FusedConfig, ImageBranch, TransFusion3DDF,
    )
    from df3d.models.detectors.transfusion import (
        TransFusionConfig, transfusion_predict,
    )
    from df3d.models.fusion.actr import ACTRConfig
    from df3d.ops.voxelize import voxelize_batch

    cfg = TransFusionConfig()
    fused = FusedConfig(
        image_shape=(448, 800), image_branch="resnet_fpn", num_cams=6,
        actr=ACTRConfig(n_levels=3, model_name="ACTRv2", hybrid=True),
    )
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-54, 54, (1, 260_000, 2)),
         rng.uniform(-5, 3, (1, 260_000, 1)),
         rng.uniform(0, 1, (1, 260_000, 2))], -1).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)
    images = jnp.asarray(
        rng.rand(1, 6, 448, 800, 3).astype(np.float32))
    # plausible camera projections: intrinsics ~ nuScenes CAM_FRONT
    proj = np.zeros((1, 6, 3, 4), np.float32)
    for c in range(6):
        proj[0, c] = np.array([
            [1266.0, 0.0, 400.0, 0.2],
            [0.0, 1266.0, 224.0, 0.1],
            [0.0, 0.0, 1.0, 0.0],
        ], np.float32)
    proj = jnp.asarray(proj)

    def voxelize(p, v):
        return voxelize_batch(p, v, cfg.voxel_size, cfg.pc_range,
                              cfg.grid_size, cfg.max_voxels,
                              cfg.max_points_per_voxel)

    res = jax.jit(voxelize)(points, valid)
    model = TransFusion3DDF(cfg, fused)
    t0 = time.time()
    vs = jax.jit(lambda f, c, im, pr: model.init(
        jax.random.PRNGKey(0), f, c, im, pr, train=False
    ))(res.features, res.coords, images, proj)
    print(f"init: {time.time()-t0:.0f}s", flush=True)

    RTT = 0.033
    IT = 2

    # image branch alone
    ib = ImageBranch(fused)
    ib_vs = jax.jit(lambda im: ib.init(jax.random.PRNGKey(0), im, False))(
        images.reshape(6, 448, 800, 3))

    def ib_chain(v, im0):
        def body(i, carry):
            im, s = carry
            feats = ib.apply(v, im, False)
            s2 = sum(f.sum() for f in feats)
            return (im + s2 * jnp.float32(1e-38), s2)
        return jax.lax.fori_loop(
            0, IT, body, (im0, jnp.float32(0)))[1]

    f_ib = jax.jit(ib_chain)
    t0 = time.time()
    s = float(f_ib(ib_vs, images.reshape(6, 448, 800, 3)))
    print(f"image-branch compile {time.time()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s = float(f_ib(ib_vs, images.reshape(6, 448, 800, 3)))
        best = min(best, time.time() - t0)
    print(f"image branch (6cam R50+FPN): {(best-RTT)/IT*1000:.1f} ms",
          flush=True)

    def fwd_chain(v, p0):
        def body(i, carry):
            p, s = carry
            r = voxelize(p, valid)
            preds, _ = model.apply(v, r.features, r.coords, images, proj,
                                   train=False)
            out = transfusion_predict(cfg, preds)
            s2 = out["scores"].sum()
            return (p + s2 * jnp.float32(1e-38), s2)
        return jax.lax.fori_loop(0, IT, body, (p0, jnp.float32(0)))[1]

    f = jax.jit(fwd_chain)
    t0 = time.time()
    s = float(f(vs, points))
    print(f"fused fwd compile {time.time()-t0:.0f}s  sink {s:.4g}",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s = float(f(vs, points))
        best = min(best, time.time() - t0)
    print(f"TransFusion3DDF e2e: {(best-RTT)/IT*1000:.1f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
