"""TransFusion-L (mmdet3d) checkpoint importer: synthesize an mmdet3d-named
state dict (shapes inverted from the flax tree) and verify the full map
lands, including the packed-qkv MultiheadAttention split."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.detectors.transfusion import TransFusionConfig, TransFusionL
from df3d.models.heads.transfusion_head import TransFusionHeadCfg
from df3d.ops.voxelize import voxelize_batch
from df3d.train.import_transfusion import import_transfusion

TINY = TransFusionConfig(
    pc_range=(-16.0, -16.0, -2.4, 16.0, 16.0, 2.4),
    voxel_size=(0.5, 0.5, 0.2),
    grid_size=(24, 64, 64),
    max_voxels=256,
    num_point_features=5,
    stage_caps=(256, 192, 128, 96),
    head=TransFusionHeadCfg(
        num_classes=3, num_proposals=16, hidden_channel=32, num_heads=4,
        ffn_channel=64, bev_size=(8, 8), voxel_size=(0.5, 0.5),
        pc_range=(-16.0, -16.0), head_conv=16,
    ),
)


def _synth_mmdet3d_sd(rng, variables):
    sd = {}
    p = variables["params"]

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    me = p["middle_encoder"]

    def sp(torch_name, kernel):
        k, ci, co = kernel.shape
        kz, kyx = (3, 3) if k == 27 else (3, 1)
        sd[f"{torch_name}.weight"] = rng.randn(
            kz, kyx, kyx, ci, co).astype(np.float32) * 0.05

    enc = "pts_middle_encoder"
    sp(f"{enc}.conv_input.0", me["conv_input"]["SubMConv3d_0"]["kernel"])
    bn(f"{enc}.conv_input.1", 16)
    chans = ((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    for i, blocks in enumerate(chans):
        t = f"{enc}.encoder_layers.encoder_layer{i + 1}"
        for j, ch in enumerate(blocks):
            if j == len(blocks) - 1 and i != 3:
                sp(f"{t}.{j}.0", me[f"stage{i}_down"]["SparseConv3d_0"]["kernel"])
                bn(f"{t}.{j}.1", ch)
            else:
                blk = me[f"stage{i}_block{j}"]
                sp(f"{t}.{j}.conv1", blk["SubMConv3d_0"]["kernel"])
                sp(f"{t}.{j}.conv2", blk["SubMConv3d_1"]["kernel"])
                bn(f"{t}.{j}.bn1", ch)
                bn(f"{t}.{j}.bn2", ch)
    sp(f"{enc}.conv_out.0", me["conv_out"]["SparseConv3d_0"]["kernel"])
    bn(f"{enc}.conv_out.1", 128)

    nk = p["pts_backbone"]

    def conv2(torch_name, flax_name, transpose=False):
        if transpose:
            kh, kw, ci, co = nk[flax_name]["ConvTranspose_0"]["kernel"].shape
            sd[f"{torch_name}.weight"] = rng.randn(
                ci, co, kh, kw).astype(np.float32) * 0.05
        else:
            kh, kw, ci, co = nk[flax_name]["Conv_0"]["kernel"].shape
            sd[f"{torch_name}.weight"] = rng.randn(
                co, ci, kh, kw).astype(np.float32) * 0.05
        parts = torch_name.split(".")
        bn(".".join(parts[:-1] + [str(int(parts[-1]) + 1)]), co)

    for i, ln in enumerate((5, 5)):
        t = f"pts_backbone.blocks.{i}"
        conv2(f"{t}.0", f"block{i}_in")
        for j in range(ln):
            conv2(f"{t}.{3 + 3 * j}", f"block{i}_conv{j}")
    kh, kw, ci, co = nk["deblock0"]["Conv_0"]["kernel"].shape
    sd["pts_neck.deblocks.0.0.weight"] = rng.randn(
        co, ci, 1, 1).astype(np.float32) * 0.05
    bn("pts_neck.deblocks.0.1", co)
    conv2("pts_neck.deblocks.1.0", "deblock1", transpose=True)

    hd = p["bbox_head"]
    h = "pts_bbox_head"
    kh, kw, ci, co = hd["shared_conv"]["kernel"].shape
    sd[f"{h}.shared_conv.weight"] = rng.randn(co, ci, kh, kw).astype(np.float32) * 0.05
    sd[f"{h}.shared_conv.bias"] = rng.randn(co).astype(np.float32) * 0.1
    kh, kw, ci, co = hd["hm_conv0"]["kernel"].shape
    sd[f"{h}.heatmap_head.0.conv.weight"] = rng.randn(
        co, ci, kh, kw).astype(np.float32) * 0.05
    bn(f"{h}.heatmap_head.0.bn", co)
    kh, kw, ci, co = hd["hm_conv1"]["kernel"].shape
    sd[f"{h}.heatmap_head.1.weight"] = rng.randn(
        co, ci, kh, kw).astype(np.float32) * 0.05
    sd[f"{h}.heatmap_head.1.bias"] = rng.randn(co).astype(np.float32) * 0.1
    ci, co = hd["class_encoding"]["kernel"].shape
    sd[f"{h}.class_encoding.weight"] = rng.randn(co, ci, 1).astype(np.float32) * 0.05
    sd[f"{h}.class_encoding.bias"] = rng.randn(co).astype(np.float32) * 0.1

    for tname, fname in (("self_posembed", "query_pos_embed"),
                         ("cross_posembed", "key_pos_embed")):
        t = f"{h}.decoder.0.{tname}.position_embedding_head"
        for ti, d_name in ((0, "Dense_0"), (3, "Dense_1")):
            ci, co = hd[fname][d_name]["kernel"].shape
            sd[f"{t}.{ti}.weight"] = rng.randn(co, ci, 1).astype(np.float32) * 0.05
            sd[f"{t}.{ti}.bias"] = rng.randn(co).astype(np.float32) * 0.1
        bn(f"{t}.1", hd[fname]["Dense_0"]["kernel"].shape[1])

    d = TINY.head.hidden_channel
    for attn in ("self_attn", "multihead_attn"):
        t = f"{h}.decoder.0.{attn}"
        sd[f"{t}.in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32) * 0.05
        sd[f"{t}.in_proj_bias"] = rng.randn(3 * d).astype(np.float32) * 0.1
        sd[f"{t}.out_proj.weight"] = rng.randn(d, d).astype(np.float32) * 0.05
        sd[f"{t}.out_proj.bias"] = rng.randn(d).astype(np.float32) * 0.1
    for i, norm in enumerate(("norm1", "norm2", "norm3")):
        sd[f"{h}.decoder.0.{norm}.weight"] = rng.rand(d).astype(np.float32) + 0.5
        sd[f"{h}.decoder.0.{norm}.bias"] = rng.randn(d).astype(np.float32) * 0.1
    for li, dn in ((1, "Dense_0"), (2, "Dense_1")):
        ci, co = hd["decoder0"][dn]["kernel"].shape
        sd[f"{h}.decoder.0.linear{li}.weight"] = rng.randn(
            co, ci).astype(np.float32) * 0.05
        sd[f"{h}.decoder.0.linear{li}.bias"] = rng.randn(co).astype(np.float32) * 0.1

    for tname, fname in (("center", "center"), ("height", "height"),
                         ("dim", "dim"), ("rot", "rot"), ("vel", "vel"),
                         ("heatmap", "cls")):
        t = f"{h}.prediction_heads.0.{tname}"
        ci, co = hd[f"{fname}_fc0"]["kernel"].shape
        sd[f"{t}.0.conv.weight"] = rng.randn(co, ci, 1).astype(np.float32) * 0.05
        bn(f"{t}.0.bn", co)
        ci, co = hd[f"{fname}_fc1"]["kernel"].shape
        sd[f"{t}.1.weight"] = rng.randn(co, ci, 1).astype(np.float32) * 0.05
        sd[f"{t}.1.bias"] = rng.randn(co).astype(np.float32) * 0.1
    return sd


def test_import_transfusion_full_map():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-15, 15, (1, 300, 2)),
             rng.uniform(-1.8, 1.8, (1, 300, 1)),
             rng.uniform(0, 1, (1, 300, 2))], -1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        pts, jnp.ones((1, 300), bool), TINY.voxel_size, TINY.pc_range,
        TINY.grid_size, TINY.max_voxels, 5,
    )
    model = TransFusionL(TINY)
    variables = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, train=False)

    sd = _synth_mmdet3d_sd(rng, variables)
    new_vars = import_transfusion(variables, sd, num_heads=4)

    # qkv split spot check: flax query kernel == W_q^T reshaped
    d = TINY.head.hidden_channel
    h = 4
    wq = sd["pts_bbox_head.decoder.0.self_attn.in_proj_weight"][:d]
    got = new_vars["params"]["bbox_head"]["decoder0"]["self_attn"]["query"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), wq.T.reshape(d, h, d // h), atol=0)
    wo = sd["pts_bbox_head.decoder.0.self_attn.out_proj.weight"]
    got = new_vars["params"]["bbox_head"]["decoder0"]["self_attn"]["out"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), wo.T.reshape(h, d // h, d), atol=0)

    preds0, _ = model.apply(variables, res.features, res.coords, train=False)
    preds1, _ = model.apply(
        {"params": new_vars["params"], "batch_stats": new_vars["batch_stats"]},
        res.features, res.coords, train=False,
    )
    assert float(jnp.abs(preds0["cls"] - preds1["cls"]).max()) > 1e-6
    assert np.isfinite(np.asarray(preds1["cls"])).all()


def test_mha_split_numerics():
    """The packed-qkv split must reproduce torch MultiheadAttention exactly
    (verified against torch.nn.functional on CPU)."""
    import torch

    from df3d.train.import_transfusion import _mha
    from flax import linen as nn

    rng = np.random.RandomState(3)
    d, heads, n, b = 16, 4, 6, 2
    mha_t = torch.nn.MultiheadAttention(d, heads, dropout=0.0)
    sd = {f"a.{k}": v.detach().numpy() for k, v in mha_t.state_dict().items()}
    params = _mha(sd, "a", heads)

    x = rng.randn(n, b, d).astype(np.float32)  # torch (L, B, D)
    with torch.no_grad():
        ref, _ = mha_t(torch.from_numpy(x), torch.from_numpy(x),
                       torch.from_numpy(x))
    mod = nn.MultiHeadDotProductAttention(num_heads=heads)
    x_f = jnp.asarray(x.transpose(1, 0, 2))  # flax (B, L, D)
    got = mod.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                    x_f, x_f)
    np.testing.assert_allclose(
        np.asarray(got).transpose(1, 0, 2), ref.numpy(), atol=2e-5)


def test_import_transfusion_two_way_coverage():
    """VERDICT r4 #8: every synthesized mmdet3d key consumed, every df3d
    param/stat leaf written — catches name-map drift that the shape spot
    checks above cannot."""
    from df3d.train.import_transfusion import transfusion_name_map
    from tests.import_cov import TrackingDict, assert_two_way_coverage

    rng = np.random.RandomState(5)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-15, 15, (1, 300, 2)),
             rng.uniform(-1.8, 1.8, (1, 300, 1)),
             rng.uniform(0, 1, (1, 300, 2))], -1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        pts, jnp.ones((1, 300), bool), TINY.voxel_size, TINY.pc_range,
        TINY.grid_size, TINY.max_voxels, 5,
    )
    model = TransFusionL(TINY)
    variables = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, train=False)
    sd = TrackingDict(_synth_mmdet3d_sd(rng, variables))
    params, stats = transfusion_name_map(sd, num_heads=4)
    assert_two_way_coverage(
        sd, [params, stats],
        [jax.tree_util.tree_map(np.asarray, variables["params"]),
         jax.tree_util.tree_map(np.asarray, variables["batch_stats"])])
