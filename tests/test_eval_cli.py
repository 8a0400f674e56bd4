"""End-to-end eval CLI smoke tests: tools/test.py must evaluate every
family from a checkpoint + dataset fixtures (VERDICT r2 #3: the round-2
CLI was CenterPoint+nuScenes only).

Tiny configs via --set-style overrides keep CPU compile times sane; the
KITTI path runs the REAL two-pass official eval + AOS + recall records on
a synthesized mini dataset (velodyne .bin + image_2 .png + info pkl)."""

import importlib.util
import json
import pathlib
import pickle

import numpy as np
import pytest

from df3d.config import apply_preset_overrides, get_preset

from tests.test_kitti_data import CALIB_TXT

_TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"


def _load_test_cli():
    # loaded by path: "test" would collide with the stdlib test package
    spec = importlib.util.spec_from_file_location(
        "df3d_test_cli", _TOOLS / "test.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TINY_VRC_OVERRIDES = [
    "pc_range=[0.0, -16.0, -2.4, 32.0, 16.0, 2.4]",
    "voxel_size=[0.5, 0.5, 0.2]",
    "grid_size=[24, 64, 64]",
    "max_voxels=512",
    "stage_caps=[512, 256, 128, 96]",
    "train_pre_nms=128", "train_post_nms=32",
    "test_pre_nms=128", "test_post_nms=16",
    "final_max_boxes=16",
    "rcnn.grid_size=4",
    "rcnn.max_local=32",
    "rcnn.roi_per_image=16",
]


def _mini_kitti(tmp_path):
    from df3d.data.kitti import parse_calib_file

    root = tmp_path / "kitti"
    (root / "training" / "velodyne").mkdir(parents=True)
    (root / "training" / "image_2").mkdir(parents=True)
    calib_p = tmp_path / "calib.txt"
    calib_p.write_text(CALIB_TXT)
    calib = parse_calib_file(calib_p)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(2):
        idx = f"{i:06d}"
        pts = np.concatenate(
            [rng.uniform(2, 30, (400, 1)), rng.uniform(-14, 14, (400, 1)),
             rng.uniform(-2.0, 1.5, (400, 1)), rng.uniform(0, 1, (400, 1))],
            axis=1).astype(np.float32)
        pts.tofile(root / "training" / "velodyne" / f"{idx}.bin")
        from PIL import Image

        img = (rng.rand(96, 320, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "training" / "image_2" / f"{idx}.png")
        infos.append({
            "point_cloud": {"lidar_idx": idx},
            "calib": {
                "P2": np.vstack([calib["P2"], [0, 0, 0, 1]]),
                "R0_rect": np.pad(calib["R0"], ((0, 1), (0, 1))),
                "Tr_velo_to_cam": np.vstack([calib["V2C"], [0, 0, 0, 1]]),
            },
            "image": {"image_shape": np.array([96, 320])},
            "annos": {
                "name": np.array(["Car"]),
                "location": np.array([[0.0, 1.0, 15.0]], np.float32),
                "dimensions": np.array([[3.9, 1.56, 1.6]], np.float32),
                "rotation_y": np.array([0.1], np.float32),
                "bbox": np.array([[100.0, 30.0, 220.0, 80.0]], np.float32),
                "occluded": np.array([0]),
                "truncated": np.array([0.0]),
                "alpha": np.array([0.1], np.float32),
            },
        })
    info_path = tmp_path / "kitti_infos_val.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return root, info_path


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_eval_cli_kitti_voxelrcnn(tmp_path, capsys):
    """voxel_rcnn_car_kitti (tiny overrides) end to end: checkpoint ->
    proposals -> RCNN -> KITTI official eval incl. AOS + recall records."""
    test_cli = _load_test_cli()
    from df3d.train.checkpoint import save_checkpoint

    root, info_path = _mini_kitti(tmp_path)
    preset = apply_preset_overrides(
        get_preset("voxel_rcnn_car_kitti"), TINY_VRC_OVERRIDES)

    args = _NS(
        preset="voxel_rcnn_car_kitti", data_root=str(root),
        info_path=str(info_path), ckpt=str(tmp_path / "ckpt"),
        batch_size=1, max_points=2000, image_shape=None, out=None,
        tta=None, overrides=[], watch=False, max_waiting_mins=0,
    )
    state, step, cfg, family, fx = test_cli.build_eval(args, preset)
    assert family == "voxelrcnn" and fx is None
    save_checkpoint(tmp_path / "ckpt", state, step=7)

    got_step = test_cli.evaluate_once(args, preset, tmp_path / "ckpt")
    assert got_step == 7
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert "Car_3d_moderate" in res and "Car_aos_moderate" in res
    assert "roi_recall_0.5" in res and "final_recall_0.3" in res
    assert res["step"] == 7


def test_eval_cli_nuscenes_centerpoint(tmp_path, capsys):
    """centerpoint (tiny preset) through the refactored generic loop with
    a synthesized nuScenes info pkl + .bin sweeps."""
    test_cli = _load_test_cli()
    from df3d.train.checkpoint import save_checkpoint

    rng = np.random.RandomState(1)
    root = tmp_path / "nusc"
    (root / "sweeps").mkdir(parents=True)
    infos = []
    for i in range(2):
        pts = np.concatenate(
            [rng.uniform(-20, 20, (500, 2)), rng.uniform(-2, 1.5, (500, 1)),
             rng.uniform(0, 1, (500, 2))], axis=1).astype(np.float32)
        path = f"sweeps/frame{i}.bin"
        pts.astype(np.float32).tofile(root / path)
        infos.append({
            "token": f"t{i}", "lidar_path": path, "sweeps": [],
            "gt_boxes": np.array(
                [[5.0, 0.0, -0.5, 4.0, 1.9, 1.6, 0.3]], np.float32),
            "gt_names": np.array(["car"]),
            "gt_velocity": np.zeros((1, 2), np.float32),
        })
    info_path = tmp_path / "nusc_infos_val.pkl"
    with open(info_path, "wb") as f:
        pickle.dump({"infos": infos}, f)

    preset = get_preset("centerpoint_tiny_smoke")
    args = _NS(
        preset="centerpoint_tiny_smoke", data_root=str(root),
        info_path=str(info_path), ckpt=str(tmp_path / "ckpt"),
        batch_size=1, max_points=2000, image_shape=None, out=None,
        tta=None, overrides=[], watch=False, max_waiting_mins=0,
    )
    state, step, cfg, family, fx = test_cli.build_eval(args, preset)
    assert family == "centerpoint"
    save_checkpoint(tmp_path / "ckpt", state, step=3)
    got = test_cli.evaluate_once(args, preset, tmp_path / "ckpt")
    assert got == 3
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mAP" in res and "NDS" in res


def test_transfusion_eval_step_shapes():
    """make_transfusion_eval_step returns boxes/scores/labels/valid (the
    third family's eval path, unit-level)."""
    import jax
    import jax.numpy as jnp

    from df3d.models.detectors.transfusion import (
        TransFusionConfig, TransFusionL,
    )
    from df3d.models.heads.transfusion_head import TransFusionHeadCfg
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import TrainState, make_transfusion_eval_step
    from df3d.ops.voxelize import voxelize_batch

    cfg = TransFusionConfig(
        pc_range=(-12.8, -12.8, -2.4, 12.8, 12.8, 2.4),
        voxel_size=(0.4, 0.4, 0.2),
        grid_size=(24, 64, 64),
        max_voxels=512,
        num_point_features=5,
        stage_caps=(512, 256, 128, 96),
        head=TransFusionHeadCfg(
            num_classes=3, num_proposals=16, hidden_channel=32,
            num_heads=4, ffn_channel=64, small_classes=(2,),
            bev_size=(8, 8), out_size_factor=8, voxel_size=(0.4, 0.4),
            pc_range=(-12.8, -12.8),
        ),
    )
    rng = np.random.RandomState(2)
    pts = jnp.asarray(np.concatenate(
        [rng.uniform(-12, 12, (1, 600, 2)), rng.uniform(-2, 2, (1, 600, 1)),
         rng.uniform(0, 1, (1, 600, 2))], -1).astype(np.float32))
    res = voxelize_batch(
        pts, jnp.ones((1, 600), bool), cfg.voxel_size, cfg.pc_range,
        cfg.grid_size, cfg.max_voxels, cfg.max_points_per_voxel)
    model = TransFusionL(cfg)
    vs = model.init(jax.random.PRNGKey(0), res.features, res.coords,
                    train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=vs["params"],
        tx=adam_onecycle(1e-3, 1), batch_stats=vs["batch_stats"])
    step = make_transfusion_eval_step(model, cfg)
    out = step(state, {"points": pts,
                       "points_valid": jnp.ones((1, 600), bool)})
    assert out["boxes"].shape[0] == 1 and out["boxes"].shape[-1] == 9
    assert out["scores"].shape == out["labels"].shape == out["valid"].shape
    assert np.isfinite(np.asarray(out["boxes"])).all()
