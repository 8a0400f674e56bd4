"""Deformable conv (ops/dcn.py) vs plain conv + shift semantics, and the
DCNSepHead wiring (det3d center_head.py:112-170 equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.ops.dcn import deform_conv2d


def _plain_conv(x, w):
    """SAME 3x3 conv via lax, weights (9, C, Cout) tap-row-major."""
    k = w.reshape(3, 3, x.shape[-1], w.shape[-1])
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_zero_offsets_match_plain_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 16, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(9, 8, 4) * 0.1).astype(np.float32))
    off = jnp.zeros((2, 12, 16, 4 * 9 * 2), jnp.float32)
    got = deform_conv2d(x, off, w, groups=4)
    want = _plain_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_integer_offset_shifts_sampling():
    """A constant (dy=0, dx=1) delta on every tap equals a conv over the
    x-shifted image (zero-fill at the border)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 10, 4).astype(np.float32))
    w = jnp.asarray((rng.randn(9, 4, 4) * 0.1).astype(np.float32))
    off = np.zeros((1, 10, 10, 2 * 9 * 2), np.float32)
    off[..., 1::2] = 1.0  # dx = +1 for every (group, tap)
    got = deform_conv2d(x, jnp.asarray(off), w, groups=2)
    x_shift = jnp.concatenate(
        [x[:, :, 1:], jnp.zeros((1, 10, 1, 4))], axis=2)
    want = _plain_conv(x_shift, w)
    # interior columns match exactly; column 0 differs by construction
    # (the shifted-image conv zero-pads at x=-1 where the deform conv
    # legitimately samples x=0)
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 1:], np.asarray(want)[:, :, 1:], atol=1e-4)


def test_fractional_offsets_bilinear():
    """dx=0.5 gives the average of dx=0 and dx=1 samples (bilinearity)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray((rng.randn(9, 4, 4) * 0.1).astype(np.float32))

    def with_dx(v):
        off = np.zeros((1, 8, 8, 1 * 9 * 2), np.float32)
        off[..., 1::2] = v
        return np.asarray(deform_conv2d(x, jnp.asarray(off), w, groups=1))

    np.testing.assert_allclose(
        with_dx(0.5)[:, :, :6], (with_dx(0.0) + with_dx(1.0))[:, :, :6] / 2,
        atol=1e-4)


def test_dcn_center_head_forward_and_grad():
    from df3d.models.heads.center_head import CenterHead

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    head = CenterHead((1, 2), dcn_head=True)
    vs = head.init(jax.random.PRNGKey(0), x, train=False)
    outs = head.apply(vs, x, train=False)
    assert outs[0]["hm"].shape == (1, 16, 16, 1)
    assert outs[1]["hm"].shape == (1, 16, 16, 2)
    # zero-init offsets -> adaption == plain conv path at init; grads flow
    # into both the offset conv and the deform kernel
    def loss(p):
        o = head.apply({"params": p, "batch_stats": vs["batch_stats"]},
                       x, train=False)
        return sum(jnp.square(t["hm"]).mean() for t in o)

    g = jax.grad(loss)(vs["params"])
    assert float(jnp.abs(
        g["task0_adapt_cls"]["adapt_kernel"]).sum()) > 0
    assert float(jnp.abs(
        g["task0_adapt_cls"]["conv_offset"]["kernel"]).sum()) > 0
