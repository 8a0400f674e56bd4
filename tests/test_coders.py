import jax.numpy as jnp
import numpy as np

from df3d.core.box_coders import CenterPointCoder, ResidualCoder, TransFusionBBoxCoder


def _rand_boxes(rng, n, extra=0):
    b = np.stack(
        [
            rng.uniform(-40, 40, n), rng.uniform(-40, 40, n), rng.uniform(-2, 1, n),
            rng.uniform(1, 6, n), rng.uniform(1, 4, n), rng.uniform(1, 3, n),
            rng.uniform(-np.pi, np.pi, n),
        ]
        + [rng.uniform(-3, 3, n) for _ in range(extra)],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(b)


def test_residual_round_trip():
    rng = np.random.RandomState(0)
    boxes, anchors = _rand_boxes(rng, 32), _rand_boxes(rng, 32)
    coder = ResidualCoder()
    dec = coder.decode(coder.encode(boxes, anchors), anchors)
    got, want = np.asarray(dec), np.asarray(boxes)
    np.testing.assert_allclose(got[:, :6], want[:, :6], atol=2e-3, rtol=1e-3)
    dr = np.abs(np.angle(np.exp(1j * (got[:, 6] - want[:, 6]))))
    assert dr.max() < 1e-4


def test_residual_sincos_round_trip():
    rng = np.random.RandomState(1)
    boxes, anchors = _rand_boxes(rng, 16, extra=2), _rand_boxes(rng, 16, extra=2)
    coder = ResidualCoder(code_size=9, encode_angle_by_sincos=True)
    enc = coder.encode(boxes, anchors)
    assert enc.shape[-1] == 10
    dec = coder.decode(enc, anchors)
    got, want = np.asarray(dec), np.asarray(boxes)
    np.testing.assert_allclose(got[:, :6], want[:, :6], atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(got[:, 7:], want[:, 7:], atol=1e-4)
    dr = np.abs(np.angle(np.exp(1j * (got[:, 6] - want[:, 6]))))
    assert dr.max() < 1e-3


def test_centerpoint_decode():
    coder = CenterPointCoder(voxel_size=(0.1, 0.1), pc_range=(-51.2, -51.2), out_size_factor=8)
    xs, ys = jnp.array([10.0]), jnp.array([20.0])
    reg = jnp.array([[0.5, 0.25]])
    height = jnp.array([[1.0]])
    dim = jnp.log(jnp.array([[4.0, 2.0, 1.5]]))
    box = coder.decode(xs, ys, reg, height, dim, jnp.array([0.0]), jnp.array([1.0]))
    got = np.asarray(box)[0]
    np.testing.assert_allclose(got[0], 10.5 * 0.8 - 51.2, atol=1e-5)
    np.testing.assert_allclose(got[1], 20.25 * 0.8 - 51.2, atol=1e-5)
    np.testing.assert_allclose(got[3:6], [4.0, 2.0, 1.5], rtol=1e-5)
    np.testing.assert_allclose(got[6], 0.0, atol=1e-6)


def test_transfusion_round_trip():
    rng = np.random.RandomState(2)
    boxes = _rand_boxes(rng, 8, extra=2)  # bottom-center convention, 9-dof
    coder = TransFusionBBoxCoder(
        pc_range=(-54.0, -54.0), voxel_size=(0.075, 0.075), out_size_factor=8
    )
    enc = coder.encode(boxes)
    dec = coder.decode(
        center=enc[:, :2], height=enc[:, 2], dim=enc[:, 3:6],
        rot_sin=enc[:, 6], rot_cos=enc[:, 7], vel=enc[:, 8:10],
    )
    got, want = np.asarray(dec), np.asarray(boxes)
    np.testing.assert_allclose(got[:, :6], want[:, :6], atol=1e-3)
    dr = np.abs(np.angle(np.exp(1j * (got[:, 6] - want[:, 6]))))
    assert dr.max() < 1e-4
    np.testing.assert_allclose(got[:, 7:], want[:, 7:], atol=1e-4)
