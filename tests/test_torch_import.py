"""Checkpoint-import machinery: torch-layout transposes + ResNet name map
against a synthetic torchvision-style state dict."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from df3d.train import torch_import as TI  # noqa: E402


def test_layout_transposes():
    w = np.random.RandomState(0).randn(8, 4, 3, 3).astype(np.float32)
    f = TI.conv2d(w)
    assert f.shape == (3, 3, 4, 8)
    lw = np.random.RandomState(1).randn(8, 4).astype(np.float32)
    assert TI.linear(lw).shape == (4, 8)

    w1 = np.random.RandomState(2).randn(3, 3, 3, 4, 8).astype(np.float32)
    t1 = TI.spconv_taps(w1, "v1")
    assert t1.shape == (27, 4, 8)
    np.testing.assert_array_equal(t1[0], w1[0, 0, 0])
    np.testing.assert_array_equal(t1[26], w1[2, 2, 2])

    w2 = np.random.RandomState(3).randn(8, 3, 3, 3, 4).astype(np.float32)
    t2 = TI.spconv_taps(w2, "v2")
    assert t2.shape == (27, 4, 8)
    np.testing.assert_array_equal(t2[0], w2[:, 0, 0, 0, :].T)


def _fake_torch_resnet_sd(layers=(1, 1, 1, 1)):
    """Synthetic state dict with torchvision ResNet naming."""
    rng = np.random.RandomState(0)
    sd = {}

    def add_bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(rng.rand(c).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(rng.rand(c).astype(np.float32))
        sd[f"{name}.running_mean"] = torch.tensor(rng.rand(c).astype(np.float32))
        sd[f"{name}.running_var"] = torch.tensor(1 + rng.rand(c).astype(np.float32))

    sd["backbone.conv1.weight"] = torch.tensor(
        rng.randn(64, 3, 7, 7).astype(np.float32)
    )
    add_bn("backbone.bn1", 64)
    inplanes = 64
    planes = [64, 128, 256, 512]
    for li, n in enumerate(layers):
        for j in range(n):
            p = planes[li]
            t = f"backbone.layer{li+1}.{j}"
            sd[f"{t}.conv1.weight"] = torch.tensor(
                rng.randn(p, inplanes if j == 0 else p * 4, 1, 1).astype(np.float32)
            )
            sd[f"{t}.conv2.weight"] = torch.tensor(
                rng.randn(p, p, 3, 3).astype(np.float32)
            )
            sd[f"{t}.conv3.weight"] = torch.tensor(
                rng.randn(p * 4, p, 1, 1).astype(np.float32)
            )
            for ci, c in ((1, p), (2, p), (3, p * 4)):
                add_bn(f"{t}.bn{ci}", c)
            if j == 0:
                sd[f"{t}.downsample.0.weight"] = torch.tensor(
                    rng.randn(p * 4, inplanes, 1, 1).astype(np.float32)
                )
                add_bn(f"{t}.downsample.1", p * 4)
        inplanes = planes[li] * 4
    return sd


def test_resnet_import_numerics():
    """Imported weights produce the same output as a manual torch forward of
    the first conv+bn (spot numeric check)."""
    import jax
    import jax.numpy as jnp

    from df3d.models.image.resnet import ResNet

    layers = (1, 1, 1, 1)
    sd = _fake_torch_resnet_sd(layers)
    model = ResNet(layers)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 32, 32, 3).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), x, train=False)

    params, stats = TI.resnet_name_map(vs["params"], sd, layers)
    new_params = TI.merge_into(jax.tree_util.tree_map(np.asarray, vs["params"]), params)
    new_stats = TI.merge_into(
        jax.tree_util.tree_map(np.asarray, vs["batch_stats"]), stats
    )
    out = model.apply(
        {"params": new_params, "batch_stats": new_stats}, x, train=False
    )
    assert np.isfinite(np.asarray(out["layer4"])).all()

    # torch reference for the stem: conv1 -> bn1 -> relu
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    tw = sd["backbone.conv1.weight"]
    ty = torch.nn.functional.conv2d(tx, tw, stride=2, padding=3)
    bnw, bnb = sd["backbone.bn1.weight"], sd["backbone.bn1.bias"]
    rm, rv = sd["backbone.bn1.running_mean"], sd["backbone.bn1.running_var"]
    ty = (ty - rm[None, :, None, None]) / torch.sqrt(rv[None, :, None, None] + 1e-5)
    ty = torch.relu(ty * bnw[None, :, None, None] + bnb[None, :, None, None])

    # recompute flax stem only
    import flax.linen as fnn

    stem = fnn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False)
    fy = stem.apply(
        {"params": {"kernel": jnp.asarray(TI.conv2d(np.asarray(tw)))}}, x
    )
    fy = (fy - jnp.asarray(rm.numpy())) / jnp.sqrt(jnp.asarray(rv.numpy()) + 1e-5)
    fy = jax.nn.relu(fy * jnp.asarray(bnw.numpy()) + jnp.asarray(bnb.numpy()))
    np.testing.assert_allclose(
        np.asarray(fy).transpose(0, 3, 1, 2), ty.numpy(), atol=1e-4
    )
