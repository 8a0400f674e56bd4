import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.heads.transfusion_head import TransFusionHeadCfg
from df3d.models.heads.transfusion_lc import TransFusionLCDecoder

CFG = TransFusionHeadCfg(
    num_classes=3, num_proposals=8, hidden_channel=16, num_heads=2,
    ffn_channel=32, bev_size=(8, 8), head_conv=16,
)


def _inputs(rng, b=1, p=8, nc=2, hc=6, wc=8):
    q = jnp.asarray(rng.randn(b, p, 16).astype(np.float32))
    qpos = jnp.asarray(rng.uniform(0, 8, (b, p, 2)).astype(np.float32))
    first = {
        "center": qpos + 1.0,
        "height": jnp.ones((b, p)) * 0.5,
        "dim": jnp.ones((b, p, 3)),
        "rot": jnp.zeros((b, p, 2)),
        "vel": jnp.zeros((b, p, 2)),
        "cls": jnp.zeros((b, p, 3)),
    }
    img = jnp.asarray(rng.randn(b, nc, hc, wc, 12).astype(np.float32))
    uv = jnp.asarray(
        (rng.rand(b, nc, p, 2) * [wc, hc]).astype(np.float32))
    return q, qpos, first, img, uv


def test_lc_decoder_refines_predictions():
    rng = np.random.RandomState(0)
    b, p, nc = 1, 8, 2
    q, qpos, first, img, uv = _inputs(rng, b, p, nc)
    vis = jnp.ones((b, nc, p), bool).at[:, 1, :4].set(False)

    m = TransFusionLCDecoder(CFG, num_cams=nc)
    vs = m.init(jax.random.PRNGKey(0), q, qpos, first, img, uv, vis)
    out = m.apply(vs, q, qpos, first, img, uv, vis)
    assert out["center"].shape == (b, p, 2)
    assert out["cls"].shape == (b, p, 3)
    for k in ("center", "height", "dim", "rot", "vel", "cls"):
        assert np.isfinite(np.asarray(out[k])).all()
    # visible queries got refined (differ from first stage)
    assert np.abs(np.asarray(out["cls"]) - np.asarray(first["cls"])).max() > 0


def test_lc_decoder_off_image_queries_keep_first_stage():
    rng = np.random.RandomState(1)
    b, p, nc = 1, 8, 2
    q, qpos, first, img, uv = _inputs(rng, b, p, nc)
    vis = jnp.ones((b, nc, p), bool)
    vis = vis.at[:, :, :3].set(False)  # queries 0..2 visible nowhere

    m = TransFusionLCDecoder(CFG, num_cams=nc)
    vs = m.init(jax.random.PRNGKey(0), q, qpos, first, img, uv, vis)
    out = m.apply(vs, q, qpos, first, img, uv, vis)
    for k in ("center", "height", "dim", "rot", "vel", "cls"):
        np.testing.assert_allclose(
            np.asarray(out[k])[:, :3], np.asarray(first[k])[:, :3], atol=1e-6
        )
    assert np.abs(
        np.asarray(out["cls"])[:, 3:] - np.asarray(first["cls"])[:, 3:]
    ).max() > 0


def test_lc_decoder_gaussian_bias_path():
    rng = np.random.RandomState(2)
    b, p, nc = 1, 8, 2
    q, qpos, first, img, uv = _inputs(rng, b, p, nc)
    vis = jnp.ones((b, nc, p), bool)
    radius = jnp.asarray(rng.uniform(1, 3, (b, nc, p)).astype(np.float32))

    m = TransFusionLCDecoder(CFG, num_cams=nc)
    vs = m.init(jax.random.PRNGKey(0), q, qpos, first, img, uv, vis,
                query_radius=radius)
    out = m.apply(vs, q, qpos, first, img, uv, vis, query_radius=radius)
    for k in ("center", "cls"):
        assert np.isfinite(np.asarray(out[k])).all()
    # narrower gaussian -> different attention result
    out2 = m.apply(vs, q, qpos, first, img, uv, vis,
                   query_radius=radius * 0.2)
    assert np.abs(np.asarray(out["cls"]) - np.asarray(out2["cls"])).max() > 0
