#!/usr/bin/env python
"""Fit per-stage sparse-backbone caps to a dataset's TRUE dilated occupancy.

Strided sparse convs DILATE the active set (spconv SparseConv3d semantics,
TransFusion/mmdet3d/ops/spconv/src/indice.cc); df3d's static caps truncate
overflow, which is an accuracy risk if the caps are guesses. This tool
measures the true per-stage occupancy distribution over real frames (info
pkl) — or surface-like synthetic frames with --synthetic — and prints
percentile-fitted caps for CenterPointConfig.stage_caps & friends.

  python tools/fit_caps.py --preset centerpoint_nusc --data-root ... \
      --info-path infos_train.pkl --frames 200 --pctl 99
  python tools/fit_caps.py --preset centerpoint_nusc --synthetic --frames 16
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True)
    p.add_argument("--data-root", default=None)
    p.add_argument("--info-path", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="surface-like synthetic frames (no dataset needed)")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--pctl", type=float, default=99.0)
    p.add_argument("--headroom", type=float, default=1.05,
                   help="multiplier on the fitted percentile")
    p.add_argument("--max-points", type=int, default=260_000)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from df3d.config import get_preset
    from df3d.ops.sparse import SparseTensor, build_conv_plan
    from df3d.ops.voxelize import voxelize_batch

    preset = get_preset(args.preset)
    cfg = preset["lidar"] if isinstance(preset, dict) else preset

    if args.synthetic:
        from df3d.utils.synth import make_raycast_frame

        def frames():
            for i in range(args.frames):
                yield make_raycast_frame(
                    np.random.RandomState(i), args.max_points,
                    extra_features=cfg.num_point_features - 3)
    else:
        if args.preset.endswith("_kitti"):
            from df3d.data.kitti import KittiDataset

            ds = KittiDataset(args.data_root, args.info_path)
        else:
            from df3d.data.nuscenes import NuScenesDataset

            ds = NuScenesDataset(args.data_root, args.info_path)

        def frames():
            for i in range(min(args.frames, len(ds))):
                yield ds[i]["points"]

    # generous probe caps so the measurement itself never truncates
    probe_cap = cfg.max_voxels + cfg.max_voxels // 2
    kz_pads = (1, 1, (0, 1, 1))

    @jax.jit
    def measure(points, valid):
        res = voxelize_batch(
            points, valid, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
            probe_cap, cfg.max_points_per_voxel,
        )
        st = SparseTensor(
            jnp.zeros((1, probe_cap, 1)), res.coords, cfg.sparse_shape,
            rows_sorted=True,
        )
        occs = [st.valid.sum()]
        for pad in kz_pads:
            plan = build_conv_plan(st, 3, 2, pad, max_out=probe_cap)
            occs.append(plan.true_occ[0])
            st = SparseTensor(
                jnp.zeros((1, probe_cap, 1)), plan.out_coords,
                plan.out_spatial_shape, rows_sorted=True,
            )
        return jnp.stack(occs)

    per_stage = []
    for pts in frames():
        pts = np.asarray(pts, np.float32)[: args.max_points]
        buf = np.zeros((1, args.max_points, pts.shape[1]), np.float32)
        buf[0, : len(pts)] = pts
        valid = np.zeros((1, args.max_points), bool)
        valid[0, : len(pts)] = True
        occ = np.asarray(measure(jnp.asarray(buf), jnp.asarray(valid)))
        per_stage.append(occ)
    per_stage = np.stack(per_stage)  # (F, 4)

    fitted = []
    for s in range(per_stage.shape[1]):
        v = per_stage[:, s]
        p = float(np.percentile(v, args.pctl))
        cap = int(np.ceil(p * args.headroom / 1024) * 1024)
        fitted.append({
            "stage": s + 1, "max": int(v.max()), "mean": float(v.mean()),
            f"p{args.pctl:g}": p, "fitted_cap": cap,
        })
    print(json.dumps({
        "frames": int(per_stage.shape[0]),
        "stage_caps": [f["fitted_cap"] for f in fitted],
        "detail": fitted,
    }, indent=2))


if __name__ == "__main__":
    main()
