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


def create_gt_database(root: pathlib.Path, split: str, classes=("Car",)):
    """Crop per-object point clouds into a db for the gt-paste augmentor."""
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
        box_of_point = lib.points_in_boxes(s["points"], s["gt_boxes"])
        for j, (box, name) in enumerate(zip(s["gt_boxes"], s["gt_names"])):
            pts = s["points"][box_of_point == j].copy()
            pts[:, :3] -= box[:3]  # store box-local
            path = db_dir / f"{s['sample_idx']}_{name}_{j}.npy"
            np.save(path, pts)
            db[name].append({
                "path": str(path.relative_to(root)),
                "box3d_lidar": box,
                "num_points": len(pts),
            })
    out = root / f"kitti_dbinfos_{split}.pkl"
    with open(out, "wb") as f:
        pickle.dump(db, f)
    print(f"wrote gt database -> {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["kitti"])
    p.add_argument("--root", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--with-gt-database", action="store_true")
    args = p.parse_args()
    root = pathlib.Path(args.root)
    create_kitti_infos(root, args.split)
    if args.with_gt_database:
        create_gt_database(root, args.split)


if __name__ == "__main__":
    main()
