import numpy as np

from df3d.data.kitti import (
    camera_box_to_lidar, lidar_to_img_matrix, parse_calib_file, rect_to_lidar,
)


CALIB_TXT = """P0: 7.07e+02 0 6.01e+02 0 0 7.07e+02 1.83e+02 0 0 0 1 0
P2: 707.0493 0.0 604.0814 45.75831 0.0 707.0493 180.5066 -0.3454157 0.0 0.0 1.0 0.004981016
R0_rect: 0.9999128 0.01009263 -0.008511932 -0.01012729 0.9999406 -0.004037671 0.008470675 0.004123522 0.9999556
Tr_velo_to_cam: 0.006927964 -0.9999722 -0.002757829 -0.02457729 -0.001162982 0.002749836 -0.9999955 -0.06127237 0.9999753 0.006964693 0.001135103 -0.3321029
"""


def test_parse_and_compose(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TXT)
    calib = parse_calib_file(p)
    assert calib["P2"].shape == (3, 4)
    assert calib["R0"].shape == (3, 3)
    assert calib["V2C"].shape == (3, 4)
    proj = lidar_to_img_matrix(calib)
    assert proj.shape == (3, 4)
    # a point straight ahead in lidar (x forward) should project near the
    # image center with positive depth
    pt = np.array([[20.0, 0.0, 0.0, 1.0]], np.float32)
    uvw = (proj @ pt.T).T[0]
    u, v, w = uvw[0] / uvw[2], uvw[1] / uvw[2], uvw[2]
    assert w > 0
    assert 0 < u < 1242 and 0 < v < 375


def test_rect_to_lidar_round_trip(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TXT)
    calib = parse_calib_file(p)
    rng = np.random.RandomState(0)
    lidar = rng.uniform(1, 40, (10, 3)).astype(np.float32)
    # lidar -> rect
    r0 = np.eye(4, dtype=np.float32)
    r0[:3, :3] = calib["R0"]
    v2c = np.eye(4, dtype=np.float32)
    v2c[:3, :4] = calib["V2C"]
    homo = np.concatenate([lidar, np.ones((10, 1), np.float32)], 1)
    rect = (homo @ (r0 @ v2c).T)[:, :3]
    back = rect_to_lidar(calib, rect)
    np.testing.assert_allclose(back, lidar, atol=1e-3)


def test_camera_box_to_lidar(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TXT)
    calib = parse_calib_file(p)
    # a car 20m ahead in rect cam coords (x right, y down, z forward)
    cam = np.array([[0.0, 1.65, 20.0, 4.0, 1.5, 1.8, 0.0]], np.float32)
    lidar = camera_box_to_lidar(cam, calib)
    assert lidar.shape == (1, 7)
    x, y, z, dx, dy, dz, heading = lidar[0]
    assert 19 < x < 21          # forward
    assert abs(y) < 1           # centered
    assert dx == 4.0 and dy == 1.8 and dz == 1.5  # l, w, h -> dx, dy, dz
    # gravity center above the bottom point
    assert -2 < z < 0.5
