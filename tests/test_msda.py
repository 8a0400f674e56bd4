"""MSDeformAttn numerics vs an independent torch grid_sample reference.

The reference repo validates its CUDA kernel against a grid_sample-based
python fallback (ops/test.py); we use the same strategy with torch-cpu as
the golden model."""

import jax.numpy as jnp
import numpy as np
import pytest

from df3d.ops.msda import ms_deform_attn

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_msda(value, shapes, locs, weights):
    """Independent torch impl of multi-scale deformable attention."""
    b, _, nh, d = value.shape
    _, q, _, nl, p, _ = locs.shape
    out = torch.zeros(b, q, nh, d)
    start = 0
    for lid, (h, w) in enumerate(shapes):
        v = value[:, start:start + h * w]  # (B, HW, nH, D)
        v = v.permute(0, 2, 3, 1).reshape(b * nh, d, h, w)
        grid = 2 * locs[:, :, :, lid] - 1  # (B, Q, nH, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * nh, q, p, 2)
        samp = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*nH, D, Q, P)
        samp = samp.reshape(b, nh, d, q, p)
        wl = weights[:, :, :, lid]  # (B, Q, nH, P)
        out += torch.einsum("bqhp,bhdqp->bqhd", wl, samp)
        start += h * w
    return out.reshape(b, q, nh * d)


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_matches_torch_grid_sample(seed):
    rng = np.random.RandomState(seed)
    shapes = ((6, 9), (3, 5))
    b, nh, d, q, p = 2, 4, 8, 10, 4
    lv = sum(h * w for h, w in shapes)
    value = rng.randn(b, lv, nh, d).astype(np.float32)
    # locations straddle in/out of bounds to exercise zero padding
    locs = rng.uniform(-0.2, 1.2, (b, q, nh, len(shapes), p, 2)).astype(np.float32)
    w = rng.rand(b, q, nh, len(shapes), p).astype(np.float32)
    w /= w.reshape(b, q, nh, -1).sum(-1).reshape(b, q, nh, 1, 1)

    got = np.asarray(
        ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
    )
    want = _torch_msda(
        torch.from_numpy(value), shapes, torch.from_numpy(locs), torch.from_numpy(w)
    ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_msda_gradients_finite():
    import jax

    rng = np.random.RandomState(2)
    shapes = ((4, 4),)
    value = jnp.asarray(rng.randn(1, 16, 2, 4).astype(np.float32))
    locs = jnp.asarray(rng.uniform(0, 1, (1, 5, 2, 1, 4, 2)).astype(np.float32))
    w = jnp.asarray(np.full((1, 5, 2, 1, 4), 0.25, np.float32))

    def f(value, locs, w):
        return ms_deform_attn(value, shapes, locs, w).sum()

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(value, locs, w)
    for g in (gv, gl, gw):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(gl).sum()) > 0  # grads flow through sampling locs
