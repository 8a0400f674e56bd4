"""nuScenes info-pkl generation from raw relational JSON tables (no devkit):
synthesize a 2-sample mini-db and check pose chains, sweeps, cameras,
boxes and velocities (reference semantics: det3d nusc_common.py,
TransFusion tools/data_converter/nuscenes_converter.py)."""

import json
import pickle

import numpy as np
import pytest


def _quat_z(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


@pytest.fixture
def mini_nusc(tmp_path):
    v = "v1.0-mini"
    d = tmp_path / v
    d.mkdir()

    def write(name, rows):
        with open(d / f"{name}.json", "w") as f:
            json.dump(rows, f)

    write("sensor", [
        {"token": "s_lidar", "channel": "LIDAR_TOP", "modality": "lidar"},
        {"token": "s_cam", "channel": "CAM_FRONT", "modality": "camera"},
    ])
    write("calibrated_sensor", [
        {"token": "cs_lidar", "sensor_token": "s_lidar",
         "translation": [0.9, 0.0, 1.8], "rotation": _quat_z(0.0),
         "camera_intrinsic": []},
        {"token": "cs_cam", "sensor_token": "s_cam",
         "translation": [1.5, 0.0, 1.5], "rotation": _quat_z(-np.pi / 2),
         "camera_intrinsic": [[1000, 0, 800], [0, 1000, 450], [0, 0, 1]]},
    ])
    write("ego_pose", [
        {"token": "ep0", "translation": [100.0, 50.0, 0.0],
         "rotation": _quat_z(0.0), "timestamp": 1_000_000},
        {"token": "ep1", "translation": [105.0, 50.0, 0.0],
         "rotation": _quat_z(0.0), "timestamp": 1_500_000},
        {"token": "ep_sweep", "translation": [99.0, 50.0, 0.0],
         "rotation": _quat_z(0.0), "timestamp": 900_000},
    ])
    write("scene", [{"token": "sc0", "name": "scene-0001"}])
    write("sample", [
        {"token": "samp0", "scene_token": "sc0", "timestamp": 1_000_000,
         "anns": ["ann0"], "prev": "", "next": "samp1"},
        {"token": "samp1", "scene_token": "sc0", "timestamp": 1_500_000,
         "anns": ["ann1"], "prev": "samp0", "next": ""},
    ])
    write("sample_data", [
        {"token": "sd_lidar0", "sample_token": "samp0", "is_key_frame": True,
         "calibrated_sensor_token": "cs_lidar", "ego_pose_token": "ep0",
         "filename": "lidar0.bin", "timestamp": 1_000_000,
         "prev": "sd_sweep", "next": ""},
        {"token": "sd_sweep", "sample_token": "samp0", "is_key_frame": False,
         "calibrated_sensor_token": "cs_lidar", "ego_pose_token": "ep_sweep",
         "filename": "sweep0.bin", "timestamp": 900_000,
         "prev": "", "next": "sd_lidar0"},
        {"token": "sd_cam0", "sample_token": "samp0", "is_key_frame": True,
         "calibrated_sensor_token": "cs_cam", "ego_pose_token": "ep0",
         "filename": "cam0.jpg", "timestamp": 1_000_000,
         "prev": "", "next": ""},
        {"token": "sd_lidar1", "sample_token": "samp1", "is_key_frame": True,
         "calibrated_sensor_token": "cs_lidar", "ego_pose_token": "ep1",
         "filename": "lidar1.bin", "timestamp": 1_500_000,
         "prev": "", "next": ""},
    ])
    write("category", [{"token": "cat_car", "name": "car"}])
    write("instance", [
        {"token": "inst0", "category_token": "cat_car"},
    ])
    # the object sits 10m ahead of the ego in global frame, moving +x at 2m/s
    write("sample_annotation", [
        {"token": "ann0", "sample_token": "samp0", "instance_token": "inst0",
         "translation": [110.0, 50.0, 1.0], "size": [2.0, 4.0, 1.5],
         "rotation": _quat_z(0.3), "prev": "", "next": "ann1"},
        {"token": "ann1", "sample_token": "samp1", "instance_token": "inst0",
         "translation": [111.0, 50.0, 1.0], "size": [2.0, 4.0, 1.5],
         "rotation": _quat_z(0.3), "prev": "ann0", "next": ""},
    ])
    return tmp_path, v


def test_nuscenes_info_generation(mini_nusc):
    import sys

    sys.path.insert(0, "tools")
    from create_data import create_nuscenes_infos

    root, version = mini_nusc
    infos = create_nuscenes_infos(root, version)
    assert len(infos) == 2
    with open(root / f"df3d_nusc_infos_{version}.pkl", "rb") as f:
        saved = pickle.load(f)
    assert len(saved["infos"]) == 2

    i0 = next(i for i in infos if i["token"] == "samp0")
    assert i0["lidar_path"] == "lidar0.bin"
    assert i0["scene_name"] == "scene-0001"

    # box in LIDAR frame: global (110,50,1) - ego (100,50,0) - lidar (0.9,0,1.8)
    box = i0["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [9.1, 0.0, -0.8], atol=1e-5)
    # size (w,l,h) -> stored (l, w, h); yaw preserved (identity chain)
    np.testing.assert_allclose(box[3:6], [4.0, 2.0, 1.5], atol=1e-6)
    np.testing.assert_allclose(box[6], 0.3, atol=1e-5)
    assert i0["gt_names"][0] == "car"
    # velocity: 1m over 0.5s -> 2 m/s in +x
    np.testing.assert_allclose(i0["gt_velocity"][0], [2.0, 0.0], atol=1e-4)

    # sweep: transform maps sweep-lidar frame -> key-lidar frame; the ego
    # moved +1m in x between sweep and key, so a sweep-frame origin point
    # lands at x = -1 in the key frame
    sw = i0["sweeps"][0]
    assert sw["lidar_path"] == "sweep0.bin"
    np.testing.assert_allclose(sw["time_lag"], 0.1, atol=1e-9)
    origin = sw["transform_matrix"] @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(origin[:3], [-1.0, 0.0, 0.0], atol=1e-5)

    # camera chain: lidar point -> cam frame; with the cam rotated -90deg
    # about z, a point ahead of the lidar maps to the cam's... verify
    # round-trip consistency instead: lidar2cam @ [0,0,0,1] equals the
    # lidar origin expressed in cam coordinates
    cam = i0["cams"]["CAM_FRONT"]
    lidar_origin_in_cam = cam["lidar2cam"] @ np.array([0, 0, 0, 1.0])
    # lidar at (0.9, 0, 1.8), cam at (1.5, 0, 1.5) ego frame; delta in ego
    # = (-0.6, 0, 0.3); cam frame = R_cam^T @ delta with R_cam = rot_z(-90)
    r_cam = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], float)  # rot_z(-90)
    np.testing.assert_allclose(
        lidar_origin_in_cam[:3], r_cam.T @ np.array([-0.6, 0.0, 0.3]),
        atol=1e-6,
    )
    assert cam["lidar2img"].shape == (4, 4)


def test_second_sample_velocity_uses_prev_chain(mini_nusc):
    import sys

    sys.path.insert(0, "tools")
    from create_data import create_nuscenes_infos

    root, version = mini_nusc
    infos = create_nuscenes_infos(root, version)
    i1 = next(i for i in infos if i["token"] == "samp1")
    np.testing.assert_allclose(i1["gt_velocity"][0], [2.0, 0.0], atol=1e-4)
