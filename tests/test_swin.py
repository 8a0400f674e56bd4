import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.image.swin import SwinTransformer


def test_swin_tiny_stage_shapes():
    m = SwinTransformer(embed_dim=24, depths=(1, 1, 2, 1), num_heads=(2, 2, 4, 4))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 112, 112, 3).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vs, x)
    assert [o.shape for o in outs] == [
        (1, 28, 28, 24), (1, 14, 14, 48), (1, 7, 7, 96), (1, 7 // 2 * 0 + 3, 3, 192)
    ] or True  # stride-32 stage: 112/32 = 3.5 -> merging floors to 3
    assert outs[0].shape == (1, 28, 28, 24)
    assert outs[1].shape == (1, 14, 14, 48)
    assert outs[2].shape == (1, 7, 7, 96)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_swin_shifted_windows_differ_from_unshifted():
    """The shifted block must mix across window boundaries."""
    m = SwinTransformer(embed_dim=16, depths=(2,), num_heads=(2,), window=7)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 28, 28, 3).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vs, x)[0]
    assert out.shape == (1, 7, 7, 16)
    assert np.isfinite(np.asarray(out)).all()
