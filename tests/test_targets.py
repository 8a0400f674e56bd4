import jax.numpy as jnp
import numpy as np

from df3d.core import target_utils as T


def test_gaussian_radius_reference_values():
    # reproduce the CornerNet formula with a few hand-checked values
    # matches det3d center_utils.gaussian_radius((10, 10), 0.5) == 4.1421356
    r = float(T.gaussian_radius(jnp.float32(10.0), jnp.float32(10.0), 0.5))
    assert abs(r - 4.1421356) < 1e-4
    r_big = float(T.gaussian_radius(jnp.float32(50.0), jnp.float32(50.0), 0.5))
    assert abs(r_big - 20.7106781) < 1e-3


def test_draw_gaussian_peak_and_mask():
    hm = jnp.zeros((64, 64))
    centers = jnp.array([[32.0, 16.0]])
    out = np.asarray(
        T.draw_gaussians(hm, centers, jnp.array([4.0]), jnp.array([True]))
    )
    assert abs(out[16, 32] - 1.0) < 1e-5  # peak at (y=16, x=32)
    assert out[16, 32 + 5] == 0.0  # beyond radius
    assert out[16, 32 + 3] > 0.1  # inside radius
    # invalid gt draws nothing
    out2 = np.asarray(
        T.draw_gaussians(hm, centers, jnp.array([4.0]), jnp.array([False]))
    )
    assert out2.max() == 0.0


def test_draw_gaussian_edge_clipping():
    hm = jnp.zeros((32, 32))
    centers = jnp.array([[0.0, 0.0], [31.0, 31.0]])
    out = np.asarray(
        T.draw_gaussians(hm, centers, jnp.array([3.0, 3.0]), jnp.array([True, True]))
    )
    assert abs(out[0, 0] - 1.0) < 1e-5
    assert abs(out[31, 31] - 1.0) < 1e-5


def test_assign_center_targets_shapes_and_content():
    gt = jnp.array(
        [
            [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.5],
            [20.0, 20.0, 0.0, 2.0, 2.0, 2.0, -0.3, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],  # padding row
        ]
    )
    classes = jnp.array([0, 1, 0])
    valid = jnp.array([True, True, False])
    out = T.assign_center_targets(
        gt, classes, valid,
        num_classes=2, feature_size=(128, 128), voxel_size=(0.8, 0.8),
        pc_range=(-51.2, -51.2), out_size_factor=1, max_objs=8,
    )
    assert out["heatmap"].shape == (2, 128, 128)
    assert out["anno_box"].shape == (8, 10)
    assert int(out["mask"].sum()) == 2
    hm = np.asarray(out["heatmap"])
    # gt0 center pixel: (0-(-51.2))/0.8 = 64
    assert hm[0, 64, 64] > 0.99
    # class separation
    assert hm[1, 64, 64] < 0.5
    # anno box encodes log dims and sincos
    anno = np.asarray(out["anno_box"])
    np.testing.assert_allclose(anno[0, 3:6], np.log([4.0, 2.0, 1.5]), atol=1e-3)
    np.testing.assert_allclose(anno[0, 6:8], [1.0, 0.5], atol=1e-4)  # vel
    np.testing.assert_allclose(anno[0, 8], np.sin(0.3), atol=1e-4)
    np.testing.assert_allclose(anno[0, 9], np.cos(0.3), atol=1e-4)


def test_assign_center_targets_jits():
    import jax

    fn = jax.jit(
        lambda g, c, v: T.assign_center_targets(
            g, c, v, num_classes=2, feature_size=(64, 64), voxel_size=(0.8, 0.8),
            pc_range=(-25.6, -25.6), out_size_factor=1, max_objs=4,
        )
    )
    out = fn(jnp.zeros((4, 9)), jnp.zeros(4, jnp.int32), jnp.zeros(4, bool))
    assert out["heatmap"].shape == (2, 64, 64)
