"""ctypes bindings for the C++ data-path library (csrc/libdf3dio.so).

Lazily builds via `make -C csrc` on first use if the .so is missing.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_SO = _CSRC / "libdf3dio.so"

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build():
    subprocess.run(["make", "-C", str(_CSRC)], check=True, capture_output=True)


class NativeLoader:
    def __init__(self):
        if not _SO.exists():
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.read_point_bin.restype = ctypes.c_int64
        lib.read_point_bin.argtypes = [ctypes.c_char_p, _f32p, ctypes.c_int64]
        lib.transform_points.restype = None
        lib.transform_points.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p,
        ]
        lib.cpu_voxelize.restype = ctypes.c_int64
        lib.cpu_voxelize.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p, _f32p, _i32p,
            ctypes.c_int64, ctypes.c_int64, _f32p, _i32p, _i32p,
        ]
        lib.points_in_boxes_cpu.restype = None
        lib.points_in_boxes_cpu.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p, ctypes.c_int64, _i32p,
        ]
        lib.fov_mask.restype = None
        lib.fov_mask.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p,
            ctypes.c_int32, ctypes.c_int32, _u8p,
        ]
        self.lib = lib

    def read_point_bin(self, path: str, num_features: int = 4,
                       max_points: int = 400_000) -> np.ndarray:
        buf = np.empty(max_points * num_features, np.float32)
        n = self.lib.read_point_bin(path.encode(), buf, buf.size)
        if n < 0:
            raise FileNotFoundError(path)
        return buf[:n].reshape(-1, num_features).copy()

    def transform_points(self, pts: np.ndarray, tm: np.ndarray) -> np.ndarray:
        pts = np.ascontiguousarray(pts, np.float32)
        self.lib.transform_points(
            pts, pts.shape[0], pts.shape[1],
            np.ascontiguousarray(tm, np.float32).reshape(-1),
        )
        return pts

    def voxelize(self, pts, voxel_size, range_min, grid_zyx,
                 max_voxels: int, max_points: int = 10):
        pts = np.ascontiguousarray(pts, np.float32)
        n, f = pts.shape
        feats = np.zeros((max_voxels, f), np.float32)
        coords = np.full((max_voxels, 3), -1, np.int32)
        npts = np.zeros((max_voxels,), np.int32)
        nv = self.lib.cpu_voxelize(
            pts, n, f,
            np.asarray(voxel_size, np.float32),
            np.asarray(range_min, np.float32),
            np.asarray(grid_zyx, np.int32),
            max_voxels, max_points, feats, coords, npts,
        )
        return feats, coords, npts, int(nv)

    def points_in_boxes(self, pts, boxes) -> np.ndarray:
        pts = np.ascontiguousarray(pts, np.float32)
        boxes = np.ascontiguousarray(boxes, np.float32)
        out = np.empty((pts.shape[0],), np.int32)
        self.lib.points_in_boxes_cpu(
            pts, pts.shape[0], pts.shape[1], boxes, boxes.shape[0], out
        )
        return out

    def fov_mask(self, pts, proj, img_h: int, img_w: int) -> np.ndarray:
        pts = np.ascontiguousarray(pts, np.float32)
        keep = np.empty((pts.shape[0],), np.uint8)
        self.lib.fov_mask(
            pts, pts.shape[0], pts.shape[1],
            np.ascontiguousarray(proj, np.float32).reshape(-1),
            img_h, img_w, keep,
        )
        return keep.astype(bool)
