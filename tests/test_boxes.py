import jax.numpy as jnp
import numpy as np

from df3d.core import boxes as B


def test_corners_axis_aligned():
    box = jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 2.0, 0.0]])
    corners = np.asarray(B.boxes_to_corners_3d(box))[0]
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(0), [-1.0, 1.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(corners.max(0), [3.0, 3.0, 4.0], atol=1e-5)


def test_corners_rotation_90deg():
    box = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 2]])
    corners = np.asarray(B.boxes_to_corners_3d(box))[0]
    # after 90deg CCW the long axis lies along y
    np.testing.assert_allclose(corners[:, 0].max(), 1.0, atol=1e-5)
    np.testing.assert_allclose(corners[:, 1].max(), 2.0, atol=1e-5)


def test_rotate_points_round_trip():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(1, 50, 5).astype(np.float32))
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, (1,)).astype(np.float32))
    back = B.rotate_points_along_z(B.rotate_points_along_z(pts, ang), -ang)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_points_in_boxes():
    boxes = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, np.pi / 4]])
    pts = jnp.array(
        [
            [0.0, 0.0, 0.0],  # center: in
            [1.2, 0.0, 0.0],  # beyond rotated half-extent along x? diag= sqrt2 -> in
            [1.5, 0.0, 0.0],  # out (max reach along x is sqrt(2)~1.414)
            [0.0, 0.0, 1.5],  # out in z
        ]
    )
    got = np.asarray(B.points_in_boxes(pts, boxes))[:, 0]
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_limit_period():
    v = jnp.array([3.5 * np.pi, -0.6 * np.pi])
    out = np.asarray(B.limit_period(v, 0.5, np.pi))
    assert np.all(out >= -np.pi / 2) and np.all(out < np.pi / 2)


def test_bottom_center_round_trip():
    box = jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 2.0, 0.3]])
    back = B.boxes3d_bottom_center_to_lidar(B.boxes3d_lidar_to_bottom_center(box))
    np.testing.assert_allclose(np.asarray(back), np.asarray(box), atol=1e-6)
