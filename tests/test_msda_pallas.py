"""Pallas MSDA kernel (interpret mode on CPU) vs the XLA reference —
the reference repo's own kernel-vs-fallback agreement pattern."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.ops.msda import ms_deform_attn
from df3d.ops.pallas.msda_kernel import ms_deform_attn_pallas


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    shapes = ((6, 9), (3, 5))
    b, nh, d, q, p = 2, 2, 8, 10, 4
    lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(b, lv, nh, d).astype(np.float32))
    locs = jnp.asarray(
        rng.uniform(-0.2, 1.2, (b, q, nh, len(shapes), p, 2)).astype(np.float32)
    )
    w = rng.rand(b, q, nh, len(shapes), p).astype(np.float32)
    w /= w.reshape(b, q, nh, -1).sum(-1).reshape(b, q, nh, 1, 1)
    return shapes, value, locs, jnp.asarray(w)


def test_pallas_matches_xla_forward():
    shapes, value, locs, w = _inputs()
    want = np.asarray(ms_deform_attn(value, shapes, locs, w))
    got = np.asarray(
        ms_deform_attn_pallas(value, shapes, locs, w, q_tile=4, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_q_padding():
    shapes, value, locs, w = _inputs(1)
    # q=10 not divisible by tile=8 -> padding path
    want = np.asarray(ms_deform_attn(value, shapes, locs, w))
    got = np.asarray(
        ms_deform_attn_pallas(value, shapes, locs, w, q_tile=8, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_backward_routes_to_xla():
    shapes, value, locs, w = _inputs(2)

    def f_pallas(v, l, a):
        return ms_deform_attn_pallas(v, shapes, l, a, 4, True).sum()

    def f_xla(v, l, a):
        return ms_deform_attn(v, shapes, l, a).sum()

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(value, locs, w)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(value, locs, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
