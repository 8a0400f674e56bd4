"""Count RCNN ball-query neighbor occupancy on the VRC golden fixture.

Hypothesis (round 4) for the golden-VRC failure: pool radii
(0.4/0.8/1.6 m) are lattice-proportional to the reference's 0.05 m
voxels; at the then-fixture's 0.5 m voxels the conv3/conv4 ball queries
found ~zero neighbors (measured: 53-83% of ROI grid points with ZERO
neighbors, mean occupancy 0.03 of nsample), so the RCNN head refined
from empty pools. NOTE (ADVICE r4): those numbers were taken at the
PRE-FIX config; this script imports tiny_vrc_preset(), which now bakes
the fixed 0.25 m voxels and the lattice-proportional 2.0/4.0/8.0 m radii
(r5) — as committed it measures the FIXED config (r5 measurement: every
grid point fully occupied, 0 empty). Prints mean neighbors per grid
point per scale for ROIs placed AT the gt boxes.
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    import optax

    from df3d.core.calib import voxel_centers_from_coords
    from df3d.data.kitti import KittiDataset
    from df3d.data.pipeline import make_batch
    from df3d.models.build import build_detector
    from df3d.ops.roi_ops import (
        collect_local_voxels, grid_ball_query, roi_grid_points,
    )
    from df3d.ops.voxelize import voxelize_batch
    from tests.test_golden_e2e import _write_kitti_fixture, tiny_vrc_preset

    tmp = pathlib.Path(tempfile.mkdtemp())
    root, info_path = _write_kitti_fixture(tmp)
    preset = tiny_vrc_preset()
    print("voxel", preset.voxel_size, "grid", preset.grid_size,
          "caps", preset.stage_caps, flush=True)
    for s in preset.rcnn.scales:
        print(" scale", s.feature_key, "ds", s.downsample, "radius",
              s.radius, "nsample", s.nsample, flush=True)
    print(" coarse_radius", preset.rcnn.coarse_radius, "max_local",
          preset.rcnn.max_local, flush=True)

    built = build_detector(preset, optax.adam(1e-4), example_points=2000)
    ds = KittiDataset(root, info_path, training=True)
    batch = make_batch([ds[0]], 2000, 32, preset.num_point_features)
    res = voxelize_batch(
        jnp.asarray(batch["points"]), jnp.asarray(batch["points_valid"]),
        preset.voxel_size, preset.pc_range, preset.grid_size,
        preset.max_voxels, preset.max_points_per_voxel)
    print("occupied voxels:", int(res.num_voxels[0]), flush=True)

    preds = built.model.apply(
        {"params": built.state.params["rpn"],
         "batch_stats": built.state.batch_stats["rpn"]},
        res.features, res.coords, train=False)

    gt = jnp.asarray(batch["gt_boxes"][0][:2, :7])  # ROIs AT the gt boxes
    rois = gt
    for s in preset.rcnn.scales:
        st = preds["ms"][s.feature_key]
        xyz = voxel_centers_from_coords(
            st.coords[0], preset.voxel_size, preset.pc_range, s.downsample)
        grid = roi_grid_points(rois, preset.rcnn.grid_size)
        lidx, lmask = collect_local_voxels(
            rois[:, :3], xyz, st.valid[0], preset.rcnn.coarse_radius,
            preset.rcnn.max_local)
        nidx, nmask = grid_ball_query(
            grid, xyz, lidx, lmask, s.radius, s.nsample)
        occ = np.asarray(nmask).mean(axis=(1, 2))          # per roi
        empty = (np.asarray(nmask).sum(-1) == 0).mean(axis=1)
        print(f"{s.feature_key}: valid voxels {int(st.valid[0].sum())}  "
              f"local {np.asarray(lmask).sum(1)}  "
              f"mean-neighb/grid-pt {occ.round(3)}  "
              f"empty-grid-pt frac {empty.round(3)}", flush=True)


if __name__ == "__main__":
    main()
