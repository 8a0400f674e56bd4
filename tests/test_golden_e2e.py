"""Golden end-to-end regression tests (VERDICT r3 #5): tiny deterministic
fixture datasets -> short overfit train -> BN recalibration -> checkpoint ->
the REAL eval CLI (tools/test.py evaluate_once) -> assert stable detection
metrics.

This is the accuracy ratchet the perf work needs: importers and module-level
parity can't catch a silent end-to-end accuracy regression (a target-assign
off-by-one, a decode sign flip, a voxelize semantics change); a golden mAP on
a committed fixture can. The reference has nothing equivalent — its closest
is TransFusion/tests/test_models/test_forward.py:1-207 (forward shapes only);
pcdet/det3d validate only on the full datasets, which this environment does
not have.

Scenes are synthesized deterministically (fixed RandomState): cars are dense
uniform point boxes over a sparse ground plane, so a few dozen overfit steps
from a fixed init measurably learn them. Every metric below goes through the
same path a user runs: dataset class -> make_batch -> jitted eval step ->
devkit-faithful evaluator (nuScenes mAP/NDS, KITTI R40 AP + AOS).

Golden values were measured at the commit that introduced this file (forced
CPU, highest matmul precision, fixed seeds end to end). Tolerances are tight
enough to catch real regressions (a decode/assign bug zeroes these metrics)
but leave room for cross-version XLA fusion jitter. If an intentional change
moves a metric, re-pin the golden in the same commit and say why.
"""

import json
import pathlib
import pickle

import numpy as np
import pytest

import jax

from tests.test_kitti_data import CALIB_TXT

_TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"

pytestmark = pytest.mark.slow


def _load_test_cli():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "df3d_test_cli", _TOOLS / "test.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _box_points(rng, box, n):
    """Uniform points inside a 7-dof lidar box (gravity-center z, CCW)."""
    x, y, z, dx, dy, dz, yaw = box
    local = rng.uniform(-0.5, 0.5, (n, 3)) * np.array([dx, dy, dz])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    pts = np.empty((n, 3), np.float32)
    pts[:, :2] = local[:, :2] @ rot.T + np.array([x, y])
    pts[:, 2] = local[:, 2] + z
    return pts


def _scene_points(rng, boxes, n_per_box, ground_range, n_ground,
                  ground_z=(-1.9, -1.7)):
    """Cars as dense point boxes + a sparse ground plane (deterministic)."""
    clouds = [_box_points(rng, b, n_per_box) for b in boxes]
    ground = np.concatenate(
        [rng.uniform(ground_range[0], ground_range[1], (n_ground, 1)),
         rng.uniform(ground_range[2], ground_range[3], (n_ground, 1)),
         rng.uniform(*ground_z, (n_ground, 1))], axis=1).astype(np.float32)
    clouds.append(ground)
    xyz = np.concatenate(clouds)
    inten = rng.uniform(0, 1, (len(xyz), 1)).astype(np.float32)
    return np.concatenate([xyz, inten], axis=1)


# --- nuScenes-style CenterPoint ------------------------------------------

CP_FRAMES = [  # two frames, two cars each, fixed poses
    [(8.0, 4.0, -0.6, 4.2, 1.9, 1.6, 0.3),
     (-10.0, -6.0, -0.5, 4.6, 2.0, 1.7, -1.2)],
    [(12.0, -8.0, -0.4, 4.0, 1.8, 1.5, 2.0),
     (-5.0, 10.0, -0.7, 4.4, 1.9, 1.6, 0.9)],
]

# measured at introduction (seed-fixed overfit, 60 steps, lr 3e-3):
# mAP 1.0000, NDS 0.8900 — every gt matched at every center-distance
# threshold on both frames (NDS < 1 from the velocity/attr error terms).
CP_GOLDEN_MAP = 1.0
CP_GOLDEN_NDS = 0.8900


def _write_nusc_fixture(tmp_path):
    root = tmp_path / "nusc"
    (root / "sweeps").mkdir(parents=True)
    rng = np.random.RandomState(7)
    infos = []
    for i, boxes in enumerate(CP_FRAMES):
        pts4 = _scene_points(rng, boxes, n_per_box=250,
                             ground_range=(-24, 24, -24, 24), n_ground=400)
        # nuScenes .bin layout: 5 float32 per point (x y z i ring)
        pts5 = np.concatenate(
            [pts4, np.zeros((len(pts4), 1), np.float32)], axis=1)
        path = f"sweeps/frame{i}.bin"
        pts5.tofile(root / path)
        infos.append({
            "token": f"t{i}", "lidar_path": path, "sweeps": [],
            "gt_boxes": np.asarray(boxes, np.float32),
            "gt_names": np.array(["car"] * len(boxes)),
            "gt_velocity": np.zeros((len(boxes), 2), np.float32),
        })
    info_path = tmp_path / "nusc_infos_val.pkl"
    with open(info_path, "wb") as f:
        pickle.dump({"infos": infos}, f)
    return root, info_path


def test_golden_centerpoint_nusc(tmp_path):
    import jax.numpy as jnp
    import optax  # noqa: F401  (schedules pull it in)

    from df3d.config import get_preset
    from df3d.data.nuscenes import NuScenesDataset
    from df3d.data.pipeline import make_batch
    from df3d.models.build import build_detector
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.checkpoint import save_checkpoint
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        make_centerpoint_train_step, recalibrate_batch_stats,
    )

    root, info_path = _write_nusc_fixture(tmp_path)
    preset = get_preset("centerpoint_tiny_smoke")
    n_steps = 60

    built = build_detector(preset, adam_onecycle(3e-3, n_steps))
    dataset = NuScenesDataset(root, info_path)
    batch_np = make_batch([dataset[0], dataset[1]], 2000, 32,
                          preset.num_point_features)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("points", "points_valid", "gt_boxes", "gt_classes",
                      "gt_valid")}

    step = jax.jit(make_centerpoint_train_step(built.model, preset))
    state = built.state
    state, logs0 = step(state, batch)
    first_loss = float(logs0["loss"])
    for _ in range(n_steps - 1):
        state, logs = step(state, batch)
    last_loss = float(logs["loss"])
    assert np.isfinite(last_loss) and last_loss < 0.5 * first_loss, (
        first_loss, last_loss)

    # short-schedule BN fix: momentum-0.99 running stats are still ~55% at
    # init after 60 steps; recover the true batch stats exactly
    res = voxelize_batch(
        batch["points"], batch["points_valid"], preset.voxel_size,
        preset.pc_range, preset.grid_size, preset.max_voxels,
        preset.max_points_per_voxel)

    def run_fwd(bs):
        _, upd = built.model.apply(
            {"params": state.params, "batch_stats": bs},
            res.features, res.coords, train=True,
            mutable=["batch_stats", "intermediates"])
        return upd["batch_stats"]

    state = state.replace(
        batch_stats=recalibrate_batch_stats(jax.jit(run_fwd),
                                            state.batch_stats))
    save_checkpoint(tmp_path / "ckpt", state, step=n_steps)

    out_json = tmp_path / "metrics.json"
    test_cli = _load_test_cli()
    args = _NS(
        preset="centerpoint_tiny_smoke", data_root=str(root),
        info_path=str(info_path), ckpt=str(tmp_path / "ckpt"),
        batch_size=1, max_points=2000, image_shape=None, out=str(out_json),
        tta=None, overrides=[], watch=False, max_waiting_mins=0,
    )
    test_cli.evaluate_once(args, preset, tmp_path / "ckpt")
    metrics = json.loads(out_json.read_text())

    # a decode/assign regression zeroes these; XLA jitter moves them <0.02
    assert metrics["mAP"] > CP_GOLDEN_MAP - 0.05, metrics["mAP"]
    assert abs(metrics["NDS"] - CP_GOLDEN_NDS) < 0.05, metrics["NDS"]
    # tighter ratchet than the (saturated) mAP (VERDICT r4 weak #5): the
    # devkit TP error terms move continuously under subtle decode/center
    # regressions long before a match is lost. Measured at re-pin:
    # trans_err ~0.03 m, scale_err ~0.02, orient_err ~0.01 rad on this
    # overfit fixture; bounds leave ~4x headroom for XLA jitter.
    tp = metrics["detail"]["tp_errors"]
    assert tp["trans_err"] < 0.15, tp
    assert tp["scale_err"] < 0.10, tp
    assert tp["orient_err"] < 0.10, tp


# --- nuScenes-style TransFusion-L -----------------------------------------

# measured at introduction (r5, seed-fixed overfit, lr 1e-3, tiny config
# below): mAP 0.827 / NDS 0.736 at 240 steps. The Hungarian-matched query
# head approaches this fixture asymptotically rather than saturating, and
# the TRANSIENT is chaotic: an FP-level change in gradient summation
# order (the r5 subm gather-backward) moved the 80-step endpoint from
# mAP 0.794 to 0.539, while the 240-step point is far more stable. The
# ratchet therefore pins FLOORS with wide margin under the 240-step
# measurement — a decode/matching/assign regression zeroes both metrics,
# which is what this test exists to catch.
TF_GOLDEN_MAP = 0.65
TF_GOLDEN_NDS = 0.55


def tiny_transfusion_preset():
    """Fixture-scale TransFusion-L: 0.5 m voxels over +-16 m, ds8 -> 8x8
    BEV, 10-class head (labels must index NUSC_CLASSES for the devkit
    eval), 16 proposals."""
    from df3d.models.detectors.transfusion import TransFusionConfig
    from df3d.models.heads.transfusion_head import TransFusionHeadCfg

    return TransFusionConfig(
        pc_range=(-16.0, -16.0, -2.4, 16.0, 16.0, 2.4),
        voxel_size=(0.5, 0.5, 0.2),
        grid_size=(24, 64, 64),
        max_voxels=2048,
        num_point_features=5,
        stage_caps=(2048, 1024, 512, 256),
        head=TransFusionHeadCfg(
            num_classes=10, num_proposals=16, hidden_channel=32,
            num_heads=4, ffn_channel=64, bev_size=(8, 8),
            voxel_size=(0.5, 0.5), pc_range=(-16.0, -16.0), head_conv=16,
        ),
    )


def test_golden_transfusion_nusc(tmp_path):
    import jax.numpy as jnp

    from df3d.data.nuscenes import NuScenesDataset
    from df3d.data.pipeline import make_batch
    from df3d.models.build import build_detector
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.checkpoint import save_checkpoint
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        make_transfusion_train_step, recalibrate_batch_stats,
    )

    # same deterministic fixture as the CenterPoint golden: every gt box
    # lies within this preset's +-16 m range; out-of-range ground points
    # are simply cropped by the voxelizer
    root, info_path = _write_nusc_fixture(tmp_path)
    preset = tiny_transfusion_preset()
    n_steps = 240  # see TF_GOLDEN_* note: the 80-step transient is chaotic

    built = build_detector(preset, adam_onecycle(1e-3, n_steps))
    dataset = NuScenesDataset(root, info_path)
    batch_np = make_batch([dataset[0], dataset[1]], 2000, 32,
                          preset.num_point_features)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("points", "points_valid", "gt_boxes", "gt_classes",
                      "gt_valid")}

    step = jax.jit(make_transfusion_train_step(built.model, preset))
    state = built.state
    state, logs0 = step(state, batch)
    first_loss = float(logs0["loss"])
    for _ in range(n_steps - 1):
        state, logs = step(state, batch)
    last_loss = float(logs["loss"])
    assert np.isfinite(last_loss) and last_loss < 0.5 * first_loss, (
        first_loss, last_loss)

    res = voxelize_batch(
        batch["points"], batch["points_valid"], preset.voxel_size,
        preset.pc_range, preset.grid_size, preset.max_voxels,
        preset.max_points_per_voxel)

    def run_fwd(bs):
        _, upd = built.model.apply(
            {"params": state.params, "batch_stats": bs},
            res.features, res.coords, train=True,
            mutable=["batch_stats", "intermediates"])
        return upd["batch_stats"]

    state = state.replace(
        batch_stats=recalibrate_batch_stats(jax.jit(run_fwd),
                                            state.batch_stats))
    save_checkpoint(tmp_path / "ckpt", state, step=n_steps)

    out_json = tmp_path / "metrics.json"
    test_cli = _load_test_cli()
    args = _NS(
        preset="transfusion_tiny_golden", data_root=str(root),
        info_path=str(info_path), ckpt=str(tmp_path / "ckpt"),
        batch_size=1, max_points=2000, image_shape=None, out=str(out_json),
        tta=None, overrides=[], watch=False, max_waiting_mins=0,
        aux_loss=False,
    )
    test_cli.evaluate_once(args, preset, tmp_path / "ckpt")
    metrics = json.loads(out_json.read_text())

    assert metrics["mAP"] > TF_GOLDEN_MAP, metrics["mAP"]
    assert metrics["NDS"] > TF_GOLDEN_NDS, metrics["NDS"]


# --- KITTI-style Voxel R-CNN ----------------------------------------------

TINY_VRC_OVERRIDES = [
    "pc_range=[0.0, -16.0, -2.4, 32.0, 16.0, 2.4]",
    # 0.25 m voxels (was 0.5): at 0.5 the conv2/3/4 lattices are 1/2/4 m and
    # the RCNN pool radii (0.4/0.8/1.6 m — lattice-proportional to the
    # reference's 0.05 m voxels) starve every ball query: measured 53-83%
    # of ROI grid points had ZERO neighbors and mean occupancy was 0.03 of
    # nsample (tools/probes/dbg_vrc_pool_occupancy.py), so the refinement
    # stage regressed from empty pools and never reached 0.7 IoU. Radii are
    # rescaled to the same lattice proportions in tiny_vrc_preset().
    "voxel_size=[0.25, 0.25, 0.2]",
    "grid_size=[24, 128, 128]",
    # eval-CLI smoke uses 512, but the golden fixture needs honest caps:
    # before the fixture was frustum-pre-cropped, the uncropped EVAL cloud
    # dilated to 1103 stage-2 cells (vs 839 train) and a 1024 cap silently
    # dropped cells at eval only, zeroing every metric. Kept with headroom
    # (same rule as the bench caps: max observed x1.1, round up); the train
    # step logs cap_overflow — it stays 0 on this fixture.
    "max_voxels=2048",
    "stage_caps=[2048, 2048, 1024, 512]",
    "train_pre_nms=128", "train_post_nms=32",
    "test_pre_nms=128", "test_post_nms=16",
    "final_max_boxes=16",
    "rcnn.grid_size=4",
    "rcnn.max_local=128",
    "rcnn.roi_per_image=16",
    # must cover ROI half-diagonal (~2.3 m for a car) + the largest pool
    # radius (8.0 m below): collect_local_voxels gathers candidates around
    # the ROI CENTER, so a smaller coarse radius silently starves the
    # outermost grid points' ball queries
    "rcnn.coarse_radius=11.0",
]

# camera-frame annos (KITTI convention: location in rect cam, dims l,h,w,
# bottom-face y); lidar gt derives through camera_box_to_lidar so points,
# train targets, and eval gt share ONE conversion path
VRC_FRAMES = [
    [{"loc": (0.0, 1.2, 12.0), "dim": (3.9, 1.56, 1.6), "ry": 0.05,
      "bbox": (420.0, 160.0, 560.0, 240.0)},
     {"loc": (-4.0, 1.3, 20.0), "dim": (4.2, 1.6, 1.7), "ry": -0.6,
      "bbox": (200.0, 170.0, 300.0, 220.0)}],
    [{"loc": (3.0, 1.1, 16.0), "dim": (4.0, 1.5, 1.6), "ry": 1.2,
      "bbox": (600.0, 165.0, 720.0, 230.0)},
     {"loc": (-2.0, 1.2, 26.0), "dim": (4.1, 1.55, 1.65), "ry": 2.4,
      "bbox": (330.0, 172.0, 410.0, 212.0)}],
]

# re-pinned in round 5 (seed-fixed overfit, 400 steps, lr 3e-3, 0.25 m
# preset with lattice-proportional 2/4/8 m pool radii + the pcdet
# opposite-orientation heading flip): measured final_recall 1.0 at EVERY
# IoU (0.3/0.5/0.7) and Car_3d/bev_moderate = 7.5 — which is this
# fixture's PROTOCOL CEILING, not a weak result: official R40 AP places
# score thresholds only where recall can step (get_thresholds), so 4 gts
# yield 4 threshold points and max AP = 3/40*100 = 7.5 exactly (verified
# by scoring the gt boxes themselves: also 7.5). The r4 pin (88.12, 150
# steps) predated the preset change, was never re-measured (ADVICE r4),
# and could not have come from this evaluator on a 4-gt fixture; 150
# steps also left the refinement under-converged (57-degree heading
# errors — tools/probes/dbg_golden_vrc.py history).
VRC_GOLDEN_3D_MODERATE = 7.5   # == ceiling; every moderate match at 0.7
VRC_GOLDEN_FINAL_RECALL = 1.0


def tiny_vrc_preset():
    """The fixture-scale VoxelRCNN preset shared by the golden test and the
    dbg_golden_vrc / dbg_vrc_pool_occupancy probes.

    Pool radii scale with the voxel: the reference's 0.4/0.8/1.6 m radii are
    4 lattice units of its (0.05 m, ds 2/4/8) grids (VoxelRCNN
    kitti_dataset.yaml voxel 0.05 -> conv2/3/4 lattices 0.1/0.2/0.4 m); at
    the fixture's 0.25 m voxels the same 4-unit proportion is 2.0/4.0/8.0 m
    (ADVICE r4: the earlier 1.0/2.0/4.0 was off by 2x and conv3/4 pools
    stayed under-filled — see TINY_VRC_OVERRIDES comment for the original
    starvation measurement). Radii derive from the voxel ratio instead of
    being hard-coded."""
    import dataclasses

    from df3d.config import apply_preset_overrides, get_preset

    preset = apply_preset_overrides(
        get_preset("voxel_rcnn_car_kitti"), TINY_VRC_OVERRIDES)
    ratio = 0.25 / 0.05  # fixture voxel / reference voxel
    scales = tuple(
        dataclasses.replace(s, radius=s.radius * ratio)
        for s in preset.rcnn.scales)
    return dataclasses.replace(
        preset, rcnn=dataclasses.replace(preset.rcnn, scales=scales))


def _write_kitti_fixture(tmp_path):
    from df3d.data.kitti import (
        camera_box_to_lidar, lidar_to_img_matrix, parse_calib_file,
    )

    root = tmp_path / "kitti"
    (root / "training" / "velodyne").mkdir(parents=True)
    (root / "training" / "image_2").mkdir(parents=True)
    calib_p = tmp_path / "calib.txt"
    calib_p.write_text(CALIB_TXT)
    calib = parse_calib_file(calib_p)
    proj = lidar_to_img_matrix(calib)
    rng = np.random.RandomState(11)
    infos = []
    for i, objs in enumerate(VRC_FRAMES):
        idx = f"{i:06d}"
        cam = np.array(
            [list(o["loc"]) + list(o["dim"]) + [o["ry"]] for o in objs],
            np.float32)
        lidar_boxes = camera_box_to_lidar(cam, calib)
        pts = _scene_points(
            rng, [tuple(b) for b in lidar_boxes], n_per_box=400,
            ground_range=(1, 30, -14, 14), ground_z=(-1.8, -1.6),
            n_ground=300)
        # pre-crop the fixture cloud to the camera frustum (same mask as
        # KittiDataset training-mode FOV_POINTS_ONLY, kitti.py:193): the
        # dataset crops at TRAIN but not at EVAL, and an overfit tiny model
        # does not survive the distribution shift — eval-only extra points
        # cost ~80 AP on this fixture. Pre-cropping makes train and eval
        # clouds identical by construction, which is what a deterministic
        # regression ratchet needs.
        homo = np.concatenate([pts[:, :3], np.ones_like(pts[:, :1])], 1)
        uvw = homo @ proj.T
        depth = uvw[:, 2]
        u = uvw[:, 0] / np.maximum(depth, 1e-6)
        v = uvw[:, 1] / np.maximum(depth, 1e-6)
        keep = (depth > 0.1) & (u >= 0) & (u < 1242) & (v >= 0) & (v < 375)
        pts = pts[keep]
        assert len(pts) > 800, len(pts)  # cars must stay densely sampled
        pts.astype(np.float32).tofile(
            root / "training" / "velodyne" / f"{idx}.bin")
        from PIL import Image

        img = (rng.rand(96, 320, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / "training" / "image_2" / f"{idx}.png")
        n = len(objs)
        infos.append({
            "point_cloud": {"lidar_idx": idx},
            "calib": {
                "P2": np.vstack([calib["P2"], [0, 0, 0, 1]]),
                "R0_rect": np.pad(calib["R0"], ((0, 1), (0, 1))),
                "Tr_velo_to_cam": np.vstack([calib["V2C"], [0, 0, 0, 1]]),
            },
            "image": {"image_shape": np.array([375, 1242])},
            "annos": {
                "name": np.array(["Car"] * n),
                "location": cam[:, :3],
                "dimensions": cam[:, 3:6],
                "rotation_y": cam[:, 6],
                "bbox": np.array([o["bbox"] for o in objs], np.float32),
                "occluded": np.zeros(n, np.int64),
                "truncated": np.zeros(n, np.float64),
                "alpha": cam[:, 6],  # fixture: alpha == ry (AOS exercises it)
            },
        })
    info_path = tmp_path / "kitti_infos_val.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return root, info_path


def tiny_vrc_3ddf_preset():
    """Fused (camera+LiDAR) VoxelRCNN-3DDF at fixture scale: same LiDAR
    config as tiny_vrc_preset, 96x320 camera at the fixture's PNG size,
    1-block-per-stage image backbone (full R50 SPMD compiles for minutes
    on XLA:CPU), tiny ACTR."""
    from df3d.models.fusion.actr import ACTRConfig

    return {
        "lidar": tiny_vrc_preset(),
        "actr": ACTRConfig(
            d_model=16, n_heads=2, n_points=2, n_levels=2, num_layers=1,
            dim_feedforward=32, lt_npoint=8, lt_nsample=4,
            model_name="ACTRv2",
        ),
        "image_shape": (96, 320),
        "image_layers": (1, 1, 1, 1),
    }


def test_golden_voxelrcnn_3ddf_kitti(tmp_path):
    """Fused-model accuracy ratchet (VERDICT r4 #5): same fixture, loader,
    trainer, BN recalibration, and eval CLI as the LiDAR-only golden, but
    through VoxelRCNN3DDF (image branch -> MVX -> ACTRv2 -> IFAT -> RCNN).
    The fixture images are noise, so fusion must learn to pass lidar
    information through — a silent fusion-path regression (projection bug,
    gate collapse, hook miswiring) shows up here as lost recall/AP."""
    import jax.numpy as jnp

    from df3d.data.images import finalize_camera_sample
    from df3d.data.kitti import KittiDataset
    from df3d.data.pipeline import make_batch
    from df3d.models.build import build_detector
    from df3d.models.detectors.voxel_rcnn import build_anchors, proposal_layer
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.checkpoint import save_checkpoint
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        make_voxelrcnn_train_step, recalibrate_batch_stats,
    )

    root, info_path = _write_kitti_fixture(tmp_path)
    preset = tiny_vrc_3ddf_preset()
    lidar = preset["lidar"]
    n_steps = 300

    built = build_detector(preset, adam_onecycle(3e-3, n_steps))
    dataset = KittiDataset(root, info_path, training=True, load_images=True,
                           image_shape=preset["image_shape"])
    samples = [finalize_camera_sample(dataset[i], preset["image_shape"])
               for i in range(2)]
    batch_np = make_batch(samples, 2000, 32, lidar.num_point_features)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("points", "points_valid", "gt_boxes", "gt_classes",
                      "gt_valid")}
    # single-cam KITTI models take (B, H, W, 3)
    batch["images"] = jnp.asarray(
        np.stack([s["images"] for s in samples]))[:, 0]
    batch["proj"] = jnp.asarray(np.stack([s["proj"] for s in samples]))[:, 0]

    step = jax.jit(make_voxelrcnn_train_step(
        built.model, built.head, lidar, fused=True))
    state = built.state
    keys = jax.random.split(jax.random.PRNGKey(3), n_steps)
    state, logs0 = step(state, batch, keys[0])
    first_loss = float(logs0["loss"])
    for k in keys[1:]:
        state, logs = step(state, batch, k)
    last_loss = float(logs["loss"])
    assert np.isfinite(last_loss) and last_loss < 0.5 * first_loss, (
        first_loss, last_loss)

    res = voxelize_batch(
        batch["points"], batch["points_valid"], lidar.voxel_size,
        lidar.pc_range, lidar.grid_size, lidar.max_voxels,
        lidar.max_points_per_voxel)
    anchors = build_anchors(lidar)

    def run_fwd(bs):
        preds, upd = built.model.apply(
            {"params": state.params["rpn"], "batch_stats": bs["rpn"]},
            res.features, res.coords, batch["images"], batch["proj"],
            train=True, mutable=["batch_stats", "intermediates"])
        rois, _, mask = proposal_layer(lidar, preds, anchors, train=False)
        _, r_upd = built.head.apply(
            {"params": state.params["rcnn"], "batch_stats": bs["rcnn"]},
            rois, mask, preds["ms"], train=True, mutable=["batch_stats"])
        return {"rpn": upd["batch_stats"], "rcnn": r_upd["batch_stats"]}

    state = state.replace(
        batch_stats=recalibrate_batch_stats(jax.jit(run_fwd),
                                            state.batch_stats))
    save_checkpoint(tmp_path / "ckpt", state, step=n_steps)

    out_json = tmp_path / "metrics.json"
    test_cli = _load_test_cli()
    args = _NS(
        preset="voxel_rcnn_3ddf_tiny_kitti", data_root=str(root),
        info_path=str(info_path), ckpt=str(tmp_path / "ckpt"),
        batch_size=1, max_points=2000, image_shape=preset["image_shape"],
        out=str(out_json), tta=None, overrides=[], watch=False,
        max_waiting_mins=0, aux_loss=False,
    )
    test_cli.evaluate_once(args, preset, tmp_path / "ckpt")
    metrics = json.loads(out_json.read_text())

    assert metrics["final_recall_0.5"] >= 1.0 - 1e-6, metrics
    # protocol ceiling on this 4-gt fixture is 7.5 (see VRC_GOLDEN note);
    # 5.0 tolerates one borderline 0.7-IoU miss under XLA jitter
    assert metrics["Car_3d_moderate"] >= 5.0 - 1e-6, (
        metrics["Car_3d_moderate"])
    assert metrics["Car_bev_moderate"] >= 5.0 - 1e-6, (
        metrics["Car_bev_moderate"])


def test_golden_voxelrcnn_kitti(tmp_path):
    import jax.numpy as jnp

    from df3d.data.kitti import KittiDataset
    from df3d.data.pipeline import make_batch
    from df3d.models.build import build_detector
    from df3d.models.detectors.voxel_rcnn import build_anchors, proposal_layer
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.checkpoint import save_checkpoint
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        make_voxelrcnn_train_step, recalibrate_batch_stats,
    )

    root, info_path = _write_kitti_fixture(tmp_path)
    preset = tiny_vrc_preset()
    n_steps = 400

    built = build_detector(preset, adam_onecycle(3e-3, n_steps))
    dataset = KittiDataset(root, info_path, training=True)
    batch_np = make_batch([dataset[0], dataset[1]], 2000, 32,
                          preset.num_point_features)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("points", "points_valid", "gt_boxes", "gt_classes",
                      "gt_valid")}

    step = jax.jit(make_voxelrcnn_train_step(built.model, built.head, preset))
    state = built.state
    keys = jax.random.split(jax.random.PRNGKey(3), n_steps)
    state, logs0 = step(state, batch, keys[0])
    first_loss = float(logs0["loss"])
    for k in keys[1:]:
        state, logs = step(state, batch, k)
    last_loss = float(logs["loss"])
    assert np.isfinite(last_loss) and last_loss < 0.5 * first_loss, (
        first_loss, last_loss)

    res = voxelize_batch(
        batch["points"], batch["points_valid"], preset.voxel_size,
        preset.pc_range, preset.grid_size, preset.max_voxels,
        preset.max_points_per_voxel)
    anchors = build_anchors(preset)

    def run_fwd(bs):
        preds, upd = built.model.apply(
            {"params": state.params["rpn"], "batch_stats": bs["rpn"]},
            res.features, res.coords, train=True,
            mutable=["batch_stats", "intermediates"])
        rois, _, mask = proposal_layer(preset, preds, anchors, train=False)
        _, r_upd = built.head.apply(
            {"params": state.params["rcnn"], "batch_stats": bs["rcnn"]},
            rois, mask, preds["ms"], train=True, mutable=["batch_stats"])
        return {"rpn": upd["batch_stats"], "rcnn": r_upd["batch_stats"]}

    state = state.replace(
        batch_stats=recalibrate_batch_stats(jax.jit(run_fwd),
                                            state.batch_stats))
    save_checkpoint(tmp_path / "ckpt", state, step=n_steps)

    out_json = tmp_path / "metrics.json"
    test_cli = _load_test_cli()
    args = _NS(
        preset="voxel_rcnn_car_kitti", data_root=str(root),
        info_path=str(info_path), ckpt=str(tmp_path / "ckpt"),
        batch_size=1, max_points=2000, image_shape=None, out=str(out_json),
        tta=None, overrides=[], watch=False, max_waiting_mins=0,
    )
    test_cli.evaluate_once(args, preset, tmp_path / "ckpt")
    metrics = json.loads(out_json.read_text())

    assert metrics["final_recall_0.5"] >= VRC_GOLDEN_FINAL_RECALL - 1e-6, (
        metrics)
    # refinement must ADD accuracy over the RPN: 0.7-IoU recall holds at
    # the final stage (one FP-noise miss of four tolerated — the 0.7 gate
    # sits within run-to-run XLA jitter of a borderline box)
    assert metrics["final_recall_0.7"] >= 0.75 - 1e-6, metrics
    # AP is quantized in 2.5 steps on this fixture (see ceiling note
    # above): 7.5 = all moderate matches at 0.7; 5.0 = one lost
    assert metrics["Car_3d_moderate"] >= 5.0 - 1e-6, (
        metrics["Car_3d_moderate"])
    assert metrics["Car_bev_moderate"] >= VRC_GOLDEN_3D_MODERATE - 1e-6, (
        metrics["Car_bev_moderate"])
