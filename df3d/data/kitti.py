"""KITTI dataset: calib parsing, info pkls, padded batch assembly.

Equivalents of VoxelRCNN/pcdet/utils/calibration_kitti.py:1-125 (P2/R0/V2C
parse + lidar_to_img chain) and pcdet/datasets/kitti/kitti_dataset.py:13-494
(info pkls, camera-FOV point filtering, gt box construction). Heavy lifting
(decode .bin, FOV crop) can optionally go through the C++ loader in csrc/.
"""

from __future__ import annotations

import pathlib
import pickle

import numpy as np


def parse_calib_file(path) -> dict:
    """KITTI calib txt -> dict of matrices (P2 3x4, R0 3x3, V2C 3x4)."""
    out = {}
    for line in open(path):
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        out[k.strip()] = np.fromstring(v, sep=" ", dtype=np.float32)
    return {
        "P2": out["P2"].reshape(3, 4),
        "R0": out.get("R0_rect", out.get("R0", np.eye(3, dtype=np.float32).ravel())).reshape(3, 3),
        "V2C": out.get("Tr_velo_to_cam", out.get("Tr_velo2cam")).reshape(3, 4),
    }


def lidar_to_img_matrix(calib: dict) -> np.ndarray:
    """Compose lidar->image 3x4 (calibration_kitti.lidar_to_img chain)."""
    r0 = np.eye(4, dtype=np.float32)
    r0[:3, :3] = calib["R0"]
    v2c = np.eye(4, dtype=np.float32)
    v2c[:3, :4] = calib["V2C"]
    p2 = np.eye(4, dtype=np.float32)
    p2[:3, :4] = calib["P2"]
    return (p2 @ r0 @ v2c)[:3]


def rect_to_lidar(calib: dict, pts_rect: np.ndarray) -> np.ndarray:
    """Camera-rect frame -> lidar frame (inverse chain)."""
    r0 = np.eye(4, dtype=np.float32)
    r0[:3, :3] = calib["R0"]
    v2c = np.eye(4, dtype=np.float32)
    v2c[:3, :4] = calib["V2C"]
    inv = np.linalg.inv(r0 @ v2c)
    homo = np.concatenate([pts_rect, np.ones_like(pts_rect[:, :1])], axis=1)
    return (homo @ inv.T)[:, :3]


def camera_box_to_lidar(boxes_cam: np.ndarray, calib: dict) -> np.ndarray:
    """KITTI label (x,y,z in rect cam, l,h,w, ry) -> df3d lidar 7-dof
    (gravity-center z). Mirrors pcdet box_utils.boxes3d_kitti_camera_to_lidar."""
    xyz = rect_to_lidar(calib, boxes_cam[:, :3])
    l, h, w = boxes_cam[:, 3], boxes_cam[:, 4], boxes_cam[:, 5]
    ry = boxes_cam[:, 6]
    xyz[:, 2] += h / 2  # bottom -> gravity center
    heading = -(ry + np.pi / 2)
    return np.stack(
        [xyz[:, 0], xyz[:, 1], xyz[:, 2], l, w, h, heading], axis=1
    ).astype(np.float32)


class KittiDataset:
    """Info-pkl driven dataset (pcdet-format kitti_infos_*.pkl)."""

    CLASSES = ("Car", "Pedestrian", "Cyclist")

    def __init__(self, root, info_path, class_names=("Car",), training=True,
                 use_cpp_loader: bool = True):
        self.root = pathlib.Path(root)
        with open(info_path, "rb") as f:
            self.infos = pickle.load(f)
        self.class_names = class_names
        self.training = training
        self._cpp = None
        if use_cpp_loader:
            try:
                from df3d.data.native import NativeLoader

                self._cpp = NativeLoader()
            except Exception:
                self._cpp = None

    def __len__(self):
        return len(self.infos)

    def _fov_crop(self, points, proj, image_shape):
        h, w = int(image_shape[0]), int(image_shape[1])
        if self._cpp is not None:
            keep = self._cpp.fov_mask(points, proj, h, w)
        else:
            homo = np.concatenate(
                [points[:, :3], np.ones_like(points[:, :1])], axis=1
            )
            uvw = homo @ proj.T
            depth = uvw[:, 2]
            u = uvw[:, 0] / np.maximum(depth, 1e-6)
            v = uvw[:, 1] / np.maximum(depth, 1e-6)
            keep = (depth > 0.1) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        return points[keep]

    def load_points(self, idx: str) -> np.ndarray:
        path = self.root / "training" / "velodyne" / f"{idx}.bin"
        if self._cpp is not None:
            return self._cpp.read_point_bin(str(path), 4)
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)

    def __getitem__(self, index: int) -> dict:
        info = self.infos[index]
        sample_idx = info["point_cloud"]["lidar_idx"]
        points = self.load_points(sample_idx)
        calib = {
            "P2": info["calib"]["P2"][:3, :4].astype(np.float32),
            "R0": info["calib"]["R0_rect"][:3, :3].astype(np.float32),
            "V2C": info["calib"]["Tr_velo_to_cam"][:3, :4].astype(np.float32),
        }
        proj = lidar_to_img_matrix(calib)
        image_shape = np.asarray(
            info.get("image", {}).get("image_shape", np.array([375, 1242]))
        )
        if self.training:  # pcdet FOV_POINTS_ONLY: camera-frustum crop
            points = self._fov_crop(points, proj, image_shape)
        out = {
            "sample_idx": sample_idx,
            "points": points,
            "proj": proj,
            "image_shape": image_shape,
        }
        if "annos" in info:
            annos = info["annos"]
            mask = np.array([n != "DontCare" for n in annos["name"]])
            names = annos["name"][mask]
            if "gt_boxes_lidar" in annos:
                boxes = annos["gt_boxes_lidar"][mask][:, :7].astype(np.float32)
            else:
                cam = np.concatenate(
                    [annos["location"], annos["dimensions"],
                     annos["rotation_y"][..., None]], axis=1
                )[mask]
                boxes = camera_box_to_lidar(cam, calib)
            keep = np.isin(names, self.class_names)
            out["gt_boxes"] = boxes[keep]
            out["gt_names"] = names[keep]
            out["gt_classes"] = np.array(
                [self.class_names.index(n) for n in names[keep]], np.int32
            )
            if "bbox" in annos:  # label-2D boxes (image-crop gt-database)
                out["gt_bbox2d"] = annos["bbox"][mask][keep].astype(np.float32)
        return out
