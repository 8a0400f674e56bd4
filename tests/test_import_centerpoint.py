"""CenterPoint checkpoint importer: synthesize a det3d-named state dict with
the real shapes and verify every mapped leaf lands (shape-checked by
merge_into) and changes the model output."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.detectors.centerpoint import CenterPoint, CenterPointConfig
from df3d.ops.voxelize import voxelize_batch
from df3d.train.import_centerpoint import import_centerpoint

TINY = CenterPointConfig(
    pc_range=(-16.0, -16.0, -2.4, 16.0, 16.0, 2.4),
    voxel_size=(0.5, 0.5, 0.2),
    grid_size=(24, 64, 64),
    max_voxels=256,
    num_point_features=4,
    stage_caps=(256, 192, 128, 96),
    tasks=(1, 2),
    max_objs=8,
    nms_pre_max_size=64,
    nms_post_max_size=8,
)


def _synth_det3d_sd(rng):
    """det3d CenterPoint names with v1 spconv layouts (kz,ky,kx,in,out)."""
    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def sp(name, kz, ky, kx, ci, co):
        sd[name] = rng.randn(kz, ky, kx, ci, co).astype(np.float32) * 0.05

    def block(prefix, c):
        sp(f"{prefix}.conv1.weight", 3, 3, 3, c, c)
        sp(f"{prefix}.conv2.weight", 3, 3, 3, c, c)
        bn(f"{prefix}.bn1", c)
        bn(f"{prefix}.bn2", c)

    sp("backbone.conv_input.0.weight", 3, 3, 3, 4, 16)
    bn("backbone.conv_input.1", 16)
    block("backbone.conv1.0", 16)
    block("backbone.conv1.1", 16)
    chans = {2: (16, 32), 3: (32, 64), 4: (64, 128)}
    for stage, (ci, co) in chans.items():
        sp(f"backbone.conv{stage}.0.weight", 3, 3, 3, ci, co)
        bn(f"backbone.conv{stage}.1", co)
        block(f"backbone.conv{stage}.3", co)
        block(f"backbone.conv{stage}.4", co)
    sp("backbone.extra_conv.0.weight", 3, 1, 1, 128, 128)
    bn("backbone.extra_conv.1", 128)

    def conv2(name, ci, co, k=3, bias=False):
        sd[f"{name}.weight"] = rng.randn(co, ci, k, k).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.randn(co).astype(np.float32) * 0.1

    # neck: in 256 (=128*2 z-slices), blocks (128, 256), deblocks (256, 256)
    conv2("neck.blocks.0.1", 128, 128)  # TINY z-chain -> 1 slice * 128ch
    bn("neck.blocks.0.2", 128)
    for j in range(5):
        conv2(f"neck.blocks.0.{4 + 3 * j}", 128, 128)
        bn(f"neck.blocks.0.{5 + 3 * j}", 128)
    conv2("neck.blocks.1.1", 128, 256)
    bn("neck.blocks.1.2", 256)
    for j in range(5):
        conv2(f"neck.blocks.1.{4 + 3 * j}", 256, 256)
        bn(f"neck.blocks.1.{5 + 3 * j}", 256)
    conv2("neck.deblocks.0.0", 128, 256, k=1)
    bn("neck.deblocks.0.1", 256)
    sd["neck.deblocks.1.0.weight"] = rng.randn(256, 256, 2, 2).astype(np.float32) * 0.05
    bn("neck.deblocks.1.1", 256)

    conv2("bbox_head.shared_conv.0", 512, 64, bias=True)
    bn("bbox_head.shared_conv.1", 64)
    for t, ncls in enumerate((1, 2)):
        for name, ch in (("reg", 2), ("height", 1), ("dim", 3), ("rot", 2),
                         ("vel", 2), ("hm", ncls)):
            conv2(f"bbox_head.tasks.{t}.{name}.0", 64, 64, bias=True)
            bn(f"bbox_head.tasks.{t}.{name}.1", 64)
            conv2(f"bbox_head.tasks.{t}.{name}.3", 64, ch, bias=True)
    return sd


def test_import_centerpoint_full_map():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-15, 15, (1, 300, 2)), rng.uniform(-1.8, 1.8, (1, 300, 1)),
             rng.uniform(0, 1, (1, 300, 1))], -1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        pts, jnp.ones((1, 300), bool), TINY.voxel_size, TINY.pc_range,
        TINY.grid_size, TINY.max_voxels, 5,
    )
    model = CenterPoint(TINY)
    variables = model.init(jax.random.PRNGKey(0), res.features, res.coords, train=False)

    sd = _synth_det3d_sd(rng)
    new_vars = import_centerpoint(variables, sd)  # asserts shapes internally

    out0, _ = model.apply(variables, res.features, res.coords, train=False)
    out1, _ = model.apply(
        {"params": new_vars["params"], "batch_stats": new_vars["batch_stats"]},
        res.features, res.coords, train=False,
    )
    # imported weights actually flow through the model
    d = float(jnp.abs(out0[0]["hm"] - out1[0]["hm"]).max())
    assert d > 1e-4
    assert np.isfinite(np.asarray(out1[0]["hm"])).all()

    # spot-check one spconv tap mapping: tap (0,0,0) of conv_input
    w = sd["backbone.conv_input.0.weight"]
    got = new_vars["params"]["backbone"]["conv_input"]["SubMConv3d_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got)[0], w[0, 0, 0], atol=0)
    np.testing.assert_allclose(np.asarray(got)[26], w[2, 2, 2], atol=0)


def test_import_convtranspose_numeric_parity():
    """Imported ConvTranspose2d weights must reproduce torch's output exactly
    (flax ConvTranspose is NOT the gradient-derived transpose: the import map
    flips the spatial taps). Hand-computed reference, no torch needed:
    torch ConvTranspose2d stride=k=2: out[2i+di, 2j+dj] = sum_c in[c,i,j] *
    w[c, :, di, dj]."""
    from flax import linen as nn

    rng = np.random.RandomState(1)
    cin, cout = 3, 4
    w_t = rng.randn(cin, cout, 2, 2).astype(np.float32)  # torch (in,out,kh,kw)
    x = rng.randn(1, 5, 5, cin).astype(np.float32)  # NHWC

    # torch semantics by hand
    ref = np.zeros((1, 10, 10, cout), np.float32)
    for i in range(5):
        for j in range(5):
            for di in range(2):
                for dj in range(2):
                    ref[0, 2 * i + di, 2 * j + dj] += (
                        x[0, i, j] @ w_t[:, :, di, dj]
                    )

    mod = nn.ConvTranspose(cout, (2, 2), strides=(2, 2), use_bias=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # the importer's mapping: (in,out,kh,kw)->(kh,kw,in,out) + spatial flip
    w_flax = w_t.transpose(2, 3, 0, 1)[::-1, ::-1]
    out = mod.apply(
        {"params": {"kernel": jnp.asarray(np.ascontiguousarray(w_flax))}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_import_centerpoint_two_way_coverage():
    """VERDICT r4 #8: every synthesized det3d key consumed, every df3d
    param/stat leaf written."""
    from df3d.train.import_centerpoint import centerpoint_name_map
    from tests.import_cov import TrackingDict, assert_two_way_coverage

    rng = np.random.RandomState(9)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-15, 15, (1, 300, 2)),
             rng.uniform(-1.8, 1.8, (1, 300, 1)),
             rng.uniform(0, 1, (1, 300, 1))], -1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        pts, jnp.ones((1, 300), bool), TINY.voxel_size, TINY.pc_range,
        TINY.grid_size, TINY.max_voxels, 5,
    )
    model = CenterPoint(TINY)
    variables = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, train=False)
    sd = TrackingDict(_synth_det3d_sd(rng))
    flax_p = jax.tree_util.tree_map(np.asarray, variables["params"])
    params, stats = centerpoint_name_map(flax_p, sd, spconv_layout="v1")
    assert_two_way_coverage(
        sd, [params, stats],
        [flax_p,
         jax.tree_util.tree_map(np.asarray, variables["batch_stats"])])
