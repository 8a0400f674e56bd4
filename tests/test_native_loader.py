"""C++ data-path library vs numpy references."""

import numpy as np
import pytest

native = pytest.importorskip("df3d.data.native")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.NativeLoader()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build failed: {e}")


def test_read_point_bin(tmp_path, lib):
    pts = np.random.RandomState(0).randn(100, 4).astype(np.float32)
    p = tmp_path / "pts.bin"
    pts.tofile(p)
    got = lib.read_point_bin(str(p), 4)
    np.testing.assert_array_equal(got, pts)


def test_transform_points(lib):
    rng = np.random.RandomState(1)
    pts = rng.randn(50, 5).astype(np.float32)
    ang = 0.7
    tm = np.eye(4, dtype=np.float32)
    tm[0, 0] = np.cos(ang); tm[0, 1] = -np.sin(ang)
    tm[1, 0] = np.sin(ang); tm[1, 1] = np.cos(ang)
    tm[:3, 3] = [1.0, 2.0, 3.0]
    want = pts.copy()
    want[:, :3] = pts[:, :3] @ tm[:3, :3].T + tm[:3, 3]
    got = lib.transform_points(pts.copy(), tm)
    np.testing.assert_allclose(got[:, :3], want[:, :3], atol=1e-5)
    np.testing.assert_array_equal(got[:, 3:], pts[:, 3:])


def test_cpu_voxelize_matches_mean(lib):
    rng = np.random.RandomState(2)
    pts = rng.uniform(-4, 4, (500, 4)).astype(np.float32)
    feats, coords, npts, nv = lib.voxelize(
        pts, (0.5, 0.5, 0.5), (-4, -4, -4), (16, 16, 16),
        max_voxels=512, max_points=5,
    )
    assert 0 < nv <= 512
    # check one voxel's mean against numpy
    ref = {}
    for p in pts:
        c = tuple(np.floor((p[:3] + 4) / 0.5).astype(int)[::-1])
        if any(v < 0 or v >= 16 for v in c):
            continue
        ref.setdefault(c, [])
        if len(ref[c]) < 5:
            ref[c].append(p)
    assert nv == len(ref)
    for s in range(nv):
        key = tuple(coords[s])
        want = np.mean(np.stack(ref[key]), axis=0)
        np.testing.assert_allclose(feats[s], want, atol=1e-5)


def test_points_in_boxes(lib):
    pts = np.array([[0, 0, 0, 1], [5, 5, 0, 1], [0.9, 0, 0, 1]], np.float32)
    boxes = np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    got = lib.points_in_boxes(pts, boxes)
    np.testing.assert_array_equal(got, [0, -1, 0])


def test_fov_mask(lib):
    # identity-like projection: u = x/z scaled
    proj = np.array(
        [[100, 0, 50, 0], [0, 100, 50, 0], [0, 0, 1, 0]], np.float32
    )
    pts = np.array(
        [[0.0, 0.0, 1.0, 0], [10.0, 0.0, 1.0, 0], [0.0, 0.0, -1.0, 0]],
        np.float32,
    )
    keep = lib.fov_mask(pts, proj, 100, 100)
    np.testing.assert_array_equal(keep, [True, False, False])
