#!/usr/bin/env python
"""Dataset preparation: info pkls + GT databases.

Counterpart of the reference create_data tools (TransFusion/tools/
create_data.py:11-60, CenterPoint/tools/create_data.py, pcdet
kitti_dataset.py:224 create_kitti_infos): parse raw KITTI files into info
pkls and build the per-class GT point database used by the copy-paste
augmentor. (nuScenes info generation requires the devkit's relational db;
df3d consumes det3d/mmdet3d-format nuScenes infos directly.)

  python tools/create_data.py kitti --root /data/kitti --split train
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import pathlib
import pickle

import numpy as np


def create_kitti_infos(root: pathlib.Path, split: str):
    from df3d.data.kitti import (
        camera_box_to_lidar, lidar_to_img_matrix, parse_calib_file,
    )

    split_file = root / "ImageSets" / f"{split}.txt"
    ids = [l.strip() for l in open(split_file) if l.strip()]
    infos = []
    for idx in ids:
        calib = parse_calib_file(root / "training" / "calib" / f"{idx}.txt")
        info = {
            "point_cloud": {"lidar_idx": idx, "num_features": 4},
            "calib": {
                "P2": np.vstack([calib["P2"], [0, 0, 0, 1]]),
                "R0_rect": _pad4(calib["R0"]),
                "Tr_velo_to_cam": np.vstack([calib["V2C"], [0, 0, 0, 1]]),
            },
            "image": {"image_idx": idx, "image_shape": np.array([375, 1242])},
        }
        label = root / "training" / "label_2" / f"{idx}.txt"
        if label.exists():
            names, trunc, occ, bbox, cam_boxes = [], [], [], [], []
            for line in open(label):
                f = line.split()
                if not f:
                    continue
                names.append(f[0])
                trunc.append(float(f[1]))
                occ.append(float(f[2]))
                bbox.append([float(v) for v in f[4:8]])
                # h, w, l, x, y, z, ry -> cam (x,y,z,l,h,w,ry)
                h, w, l = float(f[8]), float(f[9]), float(f[10])
                x, y, z = float(f[11]), float(f[12]), float(f[13])
                cam_boxes.append([x, y, z, l, h, w, float(f[14])])
            cam_boxes = np.asarray(cam_boxes, np.float32).reshape(-1, 7)
            info["annos"] = {
                "name": np.asarray(names),
                "truncated": np.asarray(trunc),
                "occluded": np.asarray(occ),
                "bbox": np.asarray(bbox, np.float32).reshape(-1, 4),
                "gt_boxes_lidar": camera_box_to_lidar(cam_boxes, calib)
                if len(cam_boxes) else np.zeros((0, 7), np.float32),
            }
        infos.append(info)
    out = root / f"kitti_infos_{split}.pkl"
    with open(out, "wb") as f:
        pickle.dump(infos, f)
    print(f"wrote {len(infos)} infos -> {out}")
    return infos


def _pad4(m3):
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = m3
    return out


def _load_image(path):
    """Decode an image with whatever decoder the environment has; None if
    none is available (crops are then skipped, never faked)."""
    try:
        from PIL import Image

        return np.asarray(Image.open(path))
    except ImportError:
        pass
    try:
        import imageio.v2 as imageio

        return imageio.imread(path)
    except ImportError:
        return None


def create_gt_database(root: pathlib.Path, split: str, classes=("Car",),
                       with_image_crops: bool = False):
    """Crop per-object point clouds (and, with --with-image-crops, the
    objects' camera-image patches keyed by the label 2D bbox — the
    reference stores these for depth-ordered gt-paste,
    pcdet database_sampler.py:166-230) into a db for the augmentor."""
    from df3d.data.kitti import KittiDataset
    from df3d.data.native import NativeLoader

    ds = KittiDataset(root, root / f"kitti_infos_{split}.pkl",
                      class_names=classes, use_cpp_loader=True)
    lib = NativeLoader()
    db_dir = root / "gt_database"
    db_dir.mkdir(exist_ok=True)
    db = {c: [] for c in classes}
    for i in range(len(ds)):
        s = ds[i]
        if "gt_boxes" not in s or not len(s["gt_boxes"]):
            continue
        image = None
        if with_image_crops:
            img_path = root / "training" / "image_2" / f"{s['sample_idx']}.png"
            if img_path.exists():
                image = _load_image(img_path)
        box_of_point = lib.points_in_boxes(s["points"], s["gt_boxes"])
        bboxes2d = s.get("gt_bbox2d")
        for j, (box, name) in enumerate(zip(s["gt_boxes"], s["gt_names"])):
            pts = s["points"][box_of_point == j].copy()
            pts[:, :3] -= box[:3]  # store box-local
            path = db_dir / f"{s['sample_idx']}_{name}_{j}.npy"
            np.save(path, pts)
            entry = {
                "path": str(path.relative_to(root)),
                "box3d_lidar": box,
                "num_points": len(pts),
            }
            if image is not None and bboxes2d is not None and j < len(bboxes2d):
                x1, y1, x2, y2 = [int(round(v)) for v in bboxes2d[j]]
                x1, y1 = max(x1, 0), max(y1, 0)
                x2 = min(x2, image.shape[1])
                y2 = min(y2, image.shape[0])
                if x2 - x1 >= 2 and y2 - y1 >= 2:
                    cpath = db_dir / f"{s['sample_idx']}_{name}_{j}_crop.npy"
                    np.save(cpath, image[y1:y2, x1:x2])
                    entry["image_crop_path"] = str(cpath.relative_to(root))
                    entry["bbox2d"] = np.array([x1, y1, x2, y2], np.float32)
            db[name].append(entry)
    out = root / f"kitti_dbinfos_{split}.pkl"
    with open(out, "wb") as f:
        pickle.dump(db, f)
    print(f"wrote gt database -> {out}")


def create_nuscenes_infos(root: pathlib.Path, version: str = "v1.0-trainval",
                          max_sweeps: int = 10):
    """nuScenes info-pkl generation without the devkit: walks the relational
    JSON tables directly (sample, sample_data, ego_pose, calibrated_sensor,
    sample_annotation, instance, category, scene) and emits det3d-shaped
    infos — lidar path, up-to-max_sweeps sweep records with relative pose
    transforms, 6 camera paths + lidar2cam/intrinsics chains, boxes with
    velocities (CenterPoint/det3d nusc_common.py:1-578,
    TransFusion/tools/data_converter/nuscenes_converter.py semantics).
    """
    import json

    tdir = root / version

    def table(name):
        with open(tdir / f"{name}.json") as f:
            rows = json.load(f)
        return {r["token"]: r for r in rows}

    samples = table("sample")
    sample_data = table("sample_data")
    ego_poses = table("ego_pose")
    calib_sensors = table("calibrated_sensor")
    annotations = table("sample_annotation")
    instances = table("instance")
    categories = table("category")
    sensors = table("sensor")
    scenes = table("scene")

    def quat_to_rot(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ], np.float64)

    def pose_mat(rec):
        m = np.eye(4)
        m[:3, :3] = quat_to_rot(rec["rotation"])
        m[:3, 3] = rec["translation"]
        return m

    def sd_to_global(sd):
        """sensor -> global 4x4 for a sample_data record."""
        car = pose_mat(ego_poses[sd["ego_pose_token"]])
        sensor = pose_mat(calib_sensors[sd["calibrated_sensor_token"]])
        return car @ sensor

    # group sample_data by sample + channel
    by_sample = {}
    for sd in sample_data.values():
        if not sd["is_key_frame"]:
            continue
        cs = calib_sensors[sd["calibrated_sensor_token"]]
        channel = sensors[cs["sensor_token"]]["channel"]
        by_sample.setdefault(sd["sample_token"], {})[channel] = sd

    # previous-sweep chains keyed by sample_data token
    cam_channels = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                    "CAM_BACK", "CAM_BACK_RIGHT", "CAM_BACK_LEFT")

    infos = []
    for stoken, sample in samples.items():
        chans = by_sample.get(stoken, {})
        if "LIDAR_TOP" not in chans:
            continue
        lidar_sd = chans["LIDAR_TOP"]
        l2g = sd_to_global(lidar_sd)
        g2l = np.linalg.inv(l2g)

        sweeps = []
        cur = lidar_sd
        while len(sweeps) < max_sweeps and cur["prev"]:
            cur = sample_data[cur["prev"]]
            s2g = sd_to_global(cur)
            sweeps.append({
                "lidar_path": cur["filename"],
                "transform_matrix": (g2l @ s2g).astype(np.float32),
                "time_lag": (lidar_sd["timestamp"] - cur["timestamp"]) / 1e6,
            })

        cams = {}
        for ch in cam_channels:
            if ch not in chans:
                continue
            cam_sd = chans[ch]
            cs = calib_sensors[cam_sd["calibrated_sensor_token"]]
            c2g = sd_to_global(cam_sd)
            lidar2cam = (np.linalg.inv(c2g) @ l2g).astype(np.float32)
            intrinsic = np.asarray(cs["camera_intrinsic"], np.float32)
            cams[ch] = {
                "data_path": cam_sd["filename"],
                "lidar2cam": lidar2cam,
                "cam_intrinsic": intrinsic,
                "lidar2img": (
                    np.vstack([intrinsic @ lidar2cam[:3], lidar2cam[3]])
                ).astype(np.float32),
            }

        boxes, names, velocities = [], [], []
        for atoken in sample["anns"]:
            a = annotations[atoken]
            cat = categories[instances[a["instance_token"]]["category_token"]]
            # global -> lidar frame
            ctr = g2l[:3, :3] @ np.asarray(a["translation"]) + g2l[:3, 3]
            rot = g2l[:3, :3] @ quat_to_rot(a["rotation"])
            yaw = np.arctan2(rot[1, 0], rot[0, 0])
            w, l, h = a["size"]
            boxes.append([*ctr, l, w, h, yaw])
            names.append(cat["name"])
            # velocity: finite difference over the annotation chain (devkit
            # box_velocity), rotated into the lidar frame
            vel = _ann_velocity(annotations, samples, a)
            velocities.append((g2l[:3, :3] @ vel)[:2])

        infos.append({
            "token": stoken,
            "scene_name": scenes[sample["scene_token"]]["name"],
            "scene_token": sample["scene_token"],
            "lidar_path": lidar_sd["filename"],
            "timestamp": lidar_sd["timestamp"],
            "sweeps": sweeps,
            "cams": cams,
            "gt_boxes": np.asarray(boxes, np.float32).reshape(-1, 7),
            "gt_names": np.asarray(names),
            "gt_velocity": np.asarray(velocities, np.float32).reshape(-1, 2),
        })

    out = root / f"df3d_nusc_infos_{version}.pkl"
    with open(out, "wb") as f:
        pickle.dump({"infos": infos, "version": version}, f)
    print(f"wrote {len(infos)} nuScenes infos -> {out}")
    return infos


def _ann_velocity(annotations, samples, a, max_time_diff=1.5):
    """Devkit box_velocity: central difference between the prev/next
    annotations of the same instance in GLOBAL frame using the true sample
    timestamps; NaN-equivalent (zeros) if the chain is too short or the
    time gap exceeds max_time_diff."""
    has_prev = bool(a["prev"])
    has_next = bool(a["next"])
    if not has_prev and not has_next:
        return np.zeros(3)
    first = annotations[a["prev"]] if has_prev else a
    last = annotations[a["next"]] if has_next else a
    pos_diff = np.asarray(last["translation"]) - np.asarray(first["translation"])
    t_first = samples[first["sample_token"]]["timestamp"] / 1e6
    t_last = samples[last["sample_token"]]["timestamp"] / 1e6
    time_diff = t_last - t_first
    if time_diff <= 0 or time_diff > 2 * max_time_diff:
        return np.zeros(3)
    return pos_diff / time_diff


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["kitti", "nuscenes"])
    p.add_argument("--root", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--max-sweeps", type=int, default=10)
    p.add_argument("--with-gt-database", action="store_true")
    p.add_argument("--with-image-crops", action="store_true")
    args = p.parse_args()
    root = pathlib.Path(args.root)
    if args.dataset == "nuscenes":
        create_nuscenes_infos(root, args.version, args.max_sweeps)
        return
    create_kitti_infos(root, args.split)
    if args.with_gt_database:
        create_gt_database(root, args.split,
                           with_image_crops=args.with_image_crops)


if __name__ == "__main__":
    main()
