"""nuScenes dataset: info pkls with multi-sweep lidar + 6 cameras.

Equivalents of CenterPoint/det3d/datasets/nuscenes (nusc_common.py
get_lidar2cam_matrix, 10-sweep accumulation in pipelines/loading.py:199-343)
and TransFusion/mmdet3d/datasets/nuscenes_dataset.py. All pose/calibration
math is precomputed into the infos (the build plan's fix for the
reference's per-step devkit queries, SURVEY §3.3).
"""

from __future__ import annotations

import pathlib
import pickle

import numpy as np

NUSC_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


def accumulate_sweeps(info, root, nsweeps: int = 10, max_points: int | None = None):
    """Load the key-frame cloud + (nsweeps-1) past sweeps transformed into
    the key frame, with a time-lag feature channel -> (N, 5) x,y,z,i,dt."""
    root = pathlib.Path(root)
    main = np.fromfile(str(root / info["lidar_path"]), dtype=np.float32)
    main = main.reshape(-1, 5)[:, :4]
    clouds = [np.concatenate([main, np.zeros_like(main[:, :1])], axis=1)]
    for sweep in info.get("sweeps", [])[: nsweeps - 1]:
        pts = np.fromfile(str(root / sweep["lidar_path"]), dtype=np.float32)
        pts = pts.reshape(-1, 5)[:, :4]
        tm = sweep["transform_matrix"].astype(np.float32)  # sweep -> key frame
        xyz1 = np.concatenate([pts[:, :3], np.ones_like(pts[:, :1])], axis=1)
        pts[:, :3] = (xyz1 @ tm.T)[:, :3]
        dt = np.full_like(pts[:, :1], sweep.get("time_lag", 0.0))
        clouds.append(np.concatenate([pts, dt], axis=1))
    out = np.concatenate(clouds)
    if max_points is not None and len(out) > max_points:
        out = out[np.random.permutation(len(out))[:max_points]]
    return out


class NuScenesDataset:
    """Info-pkl driven dataset (det3d-format infos_*_10sweeps_withvelo)."""

    def __init__(self, root, info_path, class_names=NUSC_CLASSES,
                 nsweeps: int = 10, load_images: bool = False,
                 image_shape: tuple[int, int] = (448, 800)):
        self.root = pathlib.Path(root)
        with open(info_path, "rb") as f:
            data = pickle.load(f)
        self.infos = data["infos"] if isinstance(data, dict) else data
        self.class_names = tuple(class_names)
        self.nsweeps = nsweeps
        self.load_images = load_images
        self.image_shape = tuple(image_shape)

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index: int) -> dict:
        info = self.infos[index]
        points = accumulate_sweeps(info, self.root, self.nsweeps)
        out = {"token": info.get("token"), "points": points}

        if "gt_boxes" in info:
            boxes = np.asarray(info["gt_boxes"], np.float32)  # (M, 7 or 9)
            names = np.asarray(info["gt_names"])
            keep = np.isin(names, self.class_names)
            if boxes.shape[1] == 7:
                vel = np.asarray(info.get("gt_velocity", np.zeros((len(boxes), 2))))
                boxes = np.concatenate([boxes, np.nan_to_num(vel)], axis=1)
            out["gt_boxes"] = boxes[keep].astype(np.float32)
            out["gt_classes"] = np.array(
                [self.class_names.index(n) for n in names[keep]], np.int32
            )

        if self.load_images and "cams" in info:
            projs, paths = [], []
            for cam in sorted(info["cams"].keys()):
                c = info["cams"][cam]
                # lidar -> camera -> image: 4x4 precomputed in infos
                l2c = np.asarray(
                    c.get("lidar2cam", c.get("lidar2cam_matrix")), np.float32
                )
                intr = np.eye(4, dtype=np.float32)
                intr[:3, :3] = np.asarray(c["camera_intrinsics"], np.float32)
                projs.append((intr @ l2c)[:3])
                paths.append(str(self.root / c["data_path"]))
            out["cam_projs"] = np.stack(projs)  # (6, 3, 4)
            out["cam_paths"] = paths
            # runtime decode + resize/normalize/pad to the static
            # image_shape, resize folded into the projections (det3d
            # LoadPointCloudImageFromFile loading.py:199 + mmdet3d
            # MyResize/MyNormalize/MyPad loading.py:10,306,348)
            from df3d.data.images import load_camera_frame

            out["images"], out["proj"] = load_camera_frame(
                paths, out["cam_projs"], self.image_shape)
        return out


class CBGSWrapper:
    """Class-balanced resampling (mmdet3d dataset_wrappers.py:7 CBGSDataset):
    duplicate sample indices so each class appears ~uniformly.

    The reference draws its duplicate set once per RUN with the global RNG
    (`_get_sample_indices`, np.random.choice); a seed-frozen draw would bias
    long trainings toward one fixed duplicate set. `resample(seed)` redraws
    deterministically; PrefetchLoader calls it with the epoch index, so each
    epoch sees a fresh (but reproducible) duplicate set. Per-class counts
    are seed-independent, so len() is stable across epochs."""

    def __init__(self, dataset, seed: int = 0):
        self.dataset = dataset
        ncls = len(dataset.class_names)
        cls_to_samples = [[] for _ in range(ncls)]
        for i in range(len(dataset)):
            info = dataset.infos[i]
            names = set(np.asarray(info.get("gt_names", [])).tolist())
            for c in names:
                if c in dataset.class_names:
                    cls_to_samples[dataset.class_names.index(c)].append(i)
        total = sum(len(s) for s in cls_to_samples)
        frac = 1.0 / ncls
        # (class index list, number of draws) — reference truncates with
        # int(), dataset_wrappers.py:56
        self._groups = [
            (s, int(frac / (len(s) / total) * len(s)))
            for s in cls_to_samples if s
        ]
        self.resample(seed)

    def resample(self, seed: int) -> None:
        rng = np.random.RandomState(seed)
        self.indices = []
        for s, reps in self._groups:
            self.indices.extend(rng.choice(s, reps).tolist())
        if not self.indices:
            self.indices = list(range(len(self.dataset)))

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]
