import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.heads.transfusion_head import TransFusionHeadCfg
from df3d.models.heads.transfusion_lc import TransFusionLCDecoder

CFG = TransFusionHeadCfg(
    num_classes=3, num_proposals=8, hidden_channel=16, num_heads=2,
    ffn_channel=32, bev_size=(8, 8),
)


def test_lc_decoder_refines_predictions():
    rng = np.random.RandomState(0)
    b, p, nc, hc, wc = 1, 8, 2, 6, 8
    q = jnp.asarray(rng.randn(b, p, 16).astype(np.float32))
    qpos = jnp.asarray(rng.uniform(0, 8, (b, p, 2)).astype(np.float32))
    first = {
        "center": qpos,
        "height": jnp.zeros((b, p)),
        "dim": jnp.zeros((b, p, 3)),
        "rot": jnp.zeros((b, p, 2)),
        "vel": jnp.zeros((b, p, 2)),
        "cls": jnp.zeros((b, p, 3)),
    }
    img = jnp.asarray(rng.randn(b, nc, hc, wc, 12).astype(np.float32))
    uv = jnp.asarray(rng.rand(b, nc, p, 2).astype(np.float32))
    vis = jnp.ones((b, nc, p), bool).at[:, 1, :4].set(False)

    m = TransFusionLCDecoder(CFG, num_cams=nc)
    vs = m.init(jax.random.PRNGKey(0), q, qpos, first, img, uv, vis)
    out = m.apply(vs, q, qpos, first, img, uv, vis)
    assert out["center"].shape == (b, p, 2)
    assert out["cls"].shape == (b, p, 3)
    for k in ("center", "height", "dim", "rot", "vel", "cls"):
        assert np.isfinite(np.asarray(out[k])).all()
    # zero-init final layers: refined == first stage at init
    np.testing.assert_allclose(
        np.asarray(out["center"]), np.asarray(first["center"]), atol=1e-6
    )
