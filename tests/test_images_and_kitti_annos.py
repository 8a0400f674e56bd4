"""Runtime camera-image pipeline + KITTI det-anno generation + AOS.

Covers the round-3 additions: decode/resize/normalize/pad with projection
folding (df3d/data/images.py), KittiDataset image loading, prediction-anno
generation (camera bbox + alpha) and the AOS eval metric.
"""

import pathlib
import pickle

import numpy as np
import pytest

from df3d.data.images import (
    IMAGENET_MEAN, IMAGENET_STD, decode_image, finalize_camera_sample,
    load_camera_frame, resize_normalize_pad, scale_projection,
)
from df3d.data.kitti import (
    camera_box_to_lidar, lidar_boxes_to_kitti_annos, parse_calib_file,
    lidar_to_img_matrix, recall_counts,
)

from tests.test_kitti_data import CALIB_TXT


def _write_jpeg(path, h, w, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)
    return img


def test_decode_resize_normalize_pad(tmp_path):
    p = tmp_path / "cam.jpg"
    _write_jpeg(p, 90, 160)
    img = decode_image(p)
    assert img.shape == (90, 160, 3) and img.dtype == np.uint8

    out, (sy, sx) = resize_normalize_pad(img, (64, 96))
    assert out.shape == (64, 96, 3) and out.dtype == np.float32
    # keep_ratio: min(64/90, 96/160) = 0.6 -> (54, 96); bottom rows padded
    assert abs(sy - 54 / 90) < 1e-6 and abs(sx - 96 / 160) < 1e-6
    assert np.all(out[54:] == 0.0)  # MyPad zeros bottom
    assert np.any(out[:54] != 0.0)
    # normalization: un-normalize a pixel and compare to a PIL resize
    from PIL import Image

    ref = np.asarray(Image.fromarray(img).resize((96, 54), Image.BILINEAR))
    got = out[:54] * IMAGENET_STD + IMAGENET_MEAN
    np.testing.assert_allclose(got, ref.astype(np.float32), atol=1.0)


def test_projection_scaling_consistency(tmp_path):
    """A 3D point must project to the SAME relative pixel before resize
    (original proj) and after (scaled proj on the resized image)."""
    calib = _calib(tmp_path)
    proj = lidar_to_img_matrix(calib)
    pt = np.array([20.0, 1.0, 0.0, 1.0], np.float32)
    uvw = proj @ pt
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    sp = scale_projection(proj, 0.5, 0.25)
    uvw2 = sp @ pt
    assert abs(uvw2[0] / uvw2[2] - u * 0.25) < 1e-3
    assert abs(uvw2[1] / uvw2[2] - v * 0.5) < 1e-3


def _calib(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TXT)
    return parse_calib_file(p)


def test_load_camera_frame_and_finalize(tmp_path):
    paths = []
    for i in range(2):
        p = tmp_path / f"cam{i}.jpg"
        _write_jpeg(p, 90, 160, seed=i)
        paths.append(str(p))
    projs = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    images, out_projs = load_camera_frame(paths, projs, (64, 96))
    assert images.shape == (2, 64, 96, 3)
    assert out_projs.shape == (2, 3, 4)
    # resize folded into intrinsics rows 0/1
    assert abs(out_projs[0][0, 0] - 96 / 160) < 1e-6
    assert abs(out_projs[0][1, 1] - 54 / 90) < 1e-6

    sample = {"image": decode_image(paths[0]),
              "proj": np.eye(3, 4, dtype=np.float32)}
    fin = finalize_camera_sample(sample, (64, 96))
    assert fin["images"].shape == (1, 64, 96, 3)
    assert fin["proj"].shape == (1, 3, 4)


def test_kitti_dataset_loads_images(tmp_path):
    """KittiDataset(load_images=True) emits the raw decoded image alongside
    points/calib (pcdet get_image kitti_dataset.py:68)."""
    from df3d.data.kitti import KittiDataset

    root = tmp_path / "kitti"
    (root / "training" / "velodyne").mkdir(parents=True)
    (root / "training" / "image_2").mkdir(parents=True)
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(2, 40, (200, 1)), rng.uniform(-10, 10, (200, 1)),
         rng.uniform(-1.5, 1.0, (200, 1)), rng.uniform(0, 1, (200, 1))],
        axis=1).astype(np.float32)
    pts.tofile(root / "training" / "velodyne" / "000001.bin")
    from PIL import Image

    img = (rng.rand(375, 1242, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(root / "training" / "image_2" / "000001.png")

    calib = _calib(tmp_path)
    info = {
        "point_cloud": {"lidar_idx": "000001"},
        "calib": {
            "P2": np.vstack([calib["P2"], [0, 0, 0, 1]]),
            "R0_rect": np.pad(calib["R0"], ((0, 1), (0, 1))),
            "Tr_velo_to_cam": np.vstack([calib["V2C"], [0, 0, 0, 1]]),
        },
        "image": {"image_shape": np.array([375, 1242])},
        "annos": {
            "name": np.array(["Car"]),
            "location": np.array([[0.0, 1.65, 20.0]]),
            "dimensions": np.array([[4.0, 1.5, 1.8]]),
            "rotation_y": np.array([0.1]),
            "bbox": np.array([[500.0, 150.0, 700.0, 250.0]]),
            "occluded": np.array([0]),
            "truncated": np.array([0.0]),
            "alpha": np.array([0.1]),
        },
    }
    info_path = tmp_path / "infos.pkl"
    with open(info_path, "wb") as f:
        pickle.dump([info], f)

    ds = KittiDataset(root, info_path, training=False, load_images=True,
                      image_shape=(96, 320))
    s = ds[0]
    assert s["image"].shape == (375, 1242, 3)
    assert "calib" in s and "annos_raw" in s
    fin = finalize_camera_sample(s, (96, 320))
    assert fin["images"].shape == (1, 96, 320, 3)
    # points project consistently through the finalized projection
    uvw = np.concatenate([pts[:1, :3], [[1.0]]], axis=1) @ fin["proj"][0].T


def test_lidar_boxes_to_kitti_annos_round_trip(tmp_path):
    calib = _calib(tmp_path)
    cam = np.array([[0.0, 1.65, 20.0, 4.0, 1.5, 1.8, 0.3]], np.float32)
    lidar = camera_box_to_lidar(cam, calib)
    det = lidar_boxes_to_kitti_annos(
        lidar, np.array([0.9]), np.array([0]), calib, (375, 1242), ("Car",))
    assert det["name"][0] == "Car"
    np.testing.assert_allclose(det["boxes_lidar"], lidar, atol=1e-5)
    # recovered ry: heading = -(ry + pi/2) -> ry = -heading - pi/2
    ry = -lidar[0, 6] - np.pi / 2
    assert abs((ry - cam[0, 6] + np.pi) % (2 * np.pi) - np.pi) < 1e-3
    # alpha = -atan2(-y, x) + ry
    want_alpha = -np.arctan2(-lidar[0, 1], lidar[0, 0]) + ry
    assert abs(det["alpha"][0] - want_alpha) < 1e-4
    # bbox: the 20m-ahead car must land inside the image around the center
    bb = det["bbox"][0]
    assert 0 <= bb[0] < bb[2] < 1242 and 0 <= bb[1] < bb[3] < 375
    assert bb[2] - bb[0] > 20  # a 4m car at 20m is >> 20 px wide

    empty = lidar_boxes_to_kitti_annos(
        np.zeros((0, 7)), np.zeros((0,)), np.zeros((0,), np.int32),
        calib, (375, 1242), ("Car",))
    assert len(empty["name"]) == 0 and empty["bbox"].shape == (0, 4)


def test_aos_metric():
    """Perfect orientations -> AOS == bbox AP; orientations flipped by pi
    -> AOS ~ 0 while bbox AP unchanged (official compute_aos semantics)."""
    from df3d.data.kitti_eval import evaluate_kitti

    rng = np.random.RandomState(3)
    gts, dets_good, dets_flipped = [], [], []
    for f in range(8):
        n = rng.randint(1, 4)
        bbox = np.stack(
            [rng.uniform(0, 800, n), rng.uniform(0, 200, n),
             np.zeros(n), np.zeros(n)], axis=1)
        bbox[:, 2] = bbox[:, 0] + rng.uniform(60, 120, n)
        bbox[:, 3] = bbox[:, 1] + rng.uniform(50, 80, n)
        alpha = rng.uniform(-np.pi, np.pi, n)
        gt = {
            "name": np.array(["Car"] * n), "bbox": bbox, "alpha": alpha,
            "occluded": np.zeros(n), "truncated": np.zeros(n),
            "boxes_lidar": np.zeros((n, 7)),
        }
        base = {
            "name": np.array(["Car"] * n), "bbox": bbox.copy(),
            "score": rng.uniform(0.5, 1.0, n),
            "boxes_lidar": np.zeros((n, 7)),
        }
        gts.append(gt)
        dets_good.append({**base, "alpha": alpha.copy()})
        dets_flipped.append({**base, "alpha": alpha + np.pi})
    good = evaluate_kitti(gts, dets_good, metrics=("bbox",),
                          compute_aos=True)
    flip = evaluate_kitti(gts, dets_flipped, metrics=("bbox",),
                          compute_aos=True)
    for d in range(3):
        assert abs(good["Car"]["aos"][d] - good["Car"]["bbox"][d]) < 1e-6
        assert flip["Car"]["bbox"][d] == good["Car"]["bbox"][d]
        assert flip["Car"]["aos"][d] < 1.0  # cos similarity collapses


def test_recall_counts():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0], [20, 0, 0, 4, 2, 1.5, 0.0]],
                  np.float32)
    det = np.array([[0.1, 0.05, 0, 4, 2, 1.5, 0.0]], np.float32)
    rc = recall_counts(det, gt)
    assert rc["gt"] == 2
    assert rc["recall_0.7"] == 1 and rc["recall_0.3"] == 1
    rc0 = recall_counts(np.zeros((0, 7)), gt)
    assert rc0["recall_0.5"] == 0 and rc0["gt"] == 2
