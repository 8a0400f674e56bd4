"""Swin-Tiny image branch wiring (BASELINE config 5: TransFusion-L + 3D-DF
with Swin-T, reference README.md:37 — upstream ships no config, so the
branch follows mmdet Swin-T + FPN conventions):

  * ImageBranch('swin') end-to-end inside TransFusion3DDF (forward, finite,
    swin params present in the tree);
  * the preset is registered and builds through the shared build_detector;
  * import_transfusion_3ddf_swin maps a synthesized mmdet-named state dict
    with FULL two-way coverage: every torch key consumed, every df3d
    image-branch param written (VERDICT r4 #8).
"""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.detectors.fused import FusedConfig, ImageBranch, TransFusion3DDF
from df3d.models.detectors.transfusion import TransFusionConfig
from df3d.models.fusion.actr import ACTRConfig
from df3d.models.heads.transfusion_head import TransFusionHeadCfg
from df3d.ops.voxelize import voxelize_batch

TINY_LIDAR = TransFusionConfig(
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

TINY_FUSED = FusedConfig(
    image_shape=(48, 64), image_branch="swin", n_levels=2, num_cams=2,
    swin_depths=(1, 1, 1, 1), swin_dim=96,
    actr=ACTRConfig(
        d_model=16, n_heads=2, n_points=2, n_levels=2, num_layers=1,
        dim_feedforward=32, lt_npoint=8, lt_nsample=4, model_name="ACTR",
    ),
    fusion_downsample=8,
)


def _leaf_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _leaf_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


class _TrackingDict(dict):
    """Records every key read so the test can assert full consumption."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def test_swin_image_branch_shapes():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 48, 64, 3).astype(np.float32))
    branch = ImageBranch(TINY_FUSED)
    vs = branch.init(jax.random.PRNGKey(0), images, train=False)
    feats = branch.apply(vs, images, train=False)
    assert len(feats) == 2
    # FPN levels at strides 4 and 8
    assert feats[0].shape == (2, 12, 16, 256)
    assert feats[1].shape == (2, 6, 8, 256)
    names = _leaf_paths(vs["params"])
    assert any(p[0] == "swin" for p in names)
    assert any(p[0] == "swin_fpn" for p in names)


def test_transfusion_3ddf_swin_forward():
    rng = np.random.RandomState(1)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-15, 15, (1, 300, 2)),
             rng.uniform(-1.8, 1.8, (1, 300, 1)),
             rng.uniform(0, 1, (1, 300, 2))], -1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        pts, jnp.ones((1, 300), bool), TINY_LIDAR.voxel_size,
        TINY_LIDAR.pc_range, TINY_LIDAR.grid_size, TINY_LIDAR.max_voxels, 5,
    )
    images = jnp.asarray(rng.rand(1, 2, 48, 64, 3).astype(np.float32))
    proj = jnp.asarray(rng.randn(1, 2, 3, 4).astype(np.float32))
    model = TransFusion3DDF(TINY_LIDAR, TINY_FUSED)
    vs = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, images, proj,
        train=False,
    )
    preds, _ = model.apply(
        vs, res.features, res.coords, images, proj, train=False)
    assert np.isfinite(np.asarray(preds["cls"])).all()


def test_swin_preset_registered():
    from df3d.config import get_preset

    preset = get_preset("transfusion_3ddf_swin_nusc")
    assert preset["image_branch"] == "swin"
    assert isinstance(preset["lidar"], TransFusionConfig)


def test_import_transfusion_3ddf_swin_coverage():
    """Synthesize an mmdet-named Swin+FPN state dict from the flax shapes,
    import, and assert (a) every torch image-branch key was consumed,
    (b) every df3d image-branch param was overwritten, (c) the merge-perm
    round-trips PatchMerging numerics exactly."""
    from df3d.train.import_transfusion import (
        _swin_merge_perm, fpn_name_map, swin_name_map,
    )

    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(1, 48, 64, 3).astype(np.float32))
    branch = ImageBranch(TINY_FUSED)
    vs = branch.init(jax.random.PRNGKey(0), images, train=False)
    p_swin = jax.tree_util.tree_map(np.asarray, vs["params"]["swin"])
    p_fpn = jax.tree_util.tree_map(np.asarray, vs["params"]["swin_fpn"])

    sd = _TrackingDict()
    depths = TINY_FUSED.swin_depths

    def inv_conv2d(w):  # flax (kh,kw,ci,co) -> torch (co,ci,kh,kw)
        return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))

    def inv_linear(w):  # flax (ci,co) -> torch (co,ci)
        return np.ascontiguousarray(np.asarray(w).T)

    def randn_like(shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    p = "img_backbone."
    sd[f"{p}patch_embed.projection.weight"] = randn_like(
        inv_conv2d(p_swin["patch_embed"]["kernel"]).shape)
    sd[f"{p}patch_embed.projection.bias"] = randn_like(
        p_swin["patch_embed"]["bias"].shape)
    sd[f"{p}patch_embed.norm.weight"] = randn_like(
        p_swin["LayerNorm_0"]["scale"].shape)
    sd[f"{p}patch_embed.norm.bias"] = randn_like(
        p_swin["LayerNorm_0"]["bias"].shape)
    for si, depth in enumerate(depths):
        for bi in range(depth):
            t = f"{p}stages.{si}.blocks.{bi}"
            a = f"{t}.attn.w_msa"
            blk = p_swin[f"stage{si}_block{bi}"]
            sd[f"{t}.norm1.weight"] = randn_like(
                blk["LayerNorm_0"]["scale"].shape)
            sd[f"{t}.norm1.bias"] = randn_like(blk["LayerNorm_0"]["bias"].shape)
            sd[f"{t}.norm2.weight"] = randn_like(
                blk["LayerNorm_1"]["scale"].shape)
            sd[f"{t}.norm2.bias"] = randn_like(blk["LayerNorm_1"]["bias"].shape)
            sd[f"{a}.qkv.weight"] = randn_like(
                inv_linear(blk["attn"]["qkv"]["kernel"]).shape)
            sd[f"{a}.qkv.bias"] = randn_like(blk["attn"]["qkv"]["bias"].shape)
            sd[f"{a}.relative_position_bias_table"] = randn_like(
                blk["attn"]["rel_bias"].shape)
            sd[f"{a}.proj.weight"] = randn_like(
                inv_linear(blk["attn"]["proj"]["kernel"]).shape)
            sd[f"{a}.proj.bias"] = randn_like(blk["attn"]["proj"]["bias"].shape)
            sd[f"{t}.ffn.layers.0.0.weight"] = randn_like(
                inv_linear(blk["mlp0"]["kernel"]).shape)
            sd[f"{t}.ffn.layers.0.0.bias"] = randn_like(
                blk["mlp0"]["bias"].shape)
            sd[f"{t}.ffn.layers.1.weight"] = randn_like(
                inv_linear(blk["mlp1"]["kernel"]).shape)
            sd[f"{t}.ffn.layers.1.bias"] = randn_like(blk["mlp1"]["bias"].shape)
        sd[f"{p}norm{si}.weight"] = randn_like(
            p_swin[f"out_norm{si}"]["scale"].shape)
        sd[f"{p}norm{si}.bias"] = randn_like(
            p_swin[f"out_norm{si}"]["bias"].shape)
        if si < len(depths) - 1:
            sd[f"{p}stages.{si}.downsample.norm.weight"] = randn_like(
                p_swin[f"merge_norm{si}"]["scale"].shape)
            sd[f"{p}stages.{si}.downsample.norm.bias"] = randn_like(
                p_swin[f"merge_norm{si}"]["bias"].shape)
            sd[f"{p}stages.{si}.downsample.reduction.weight"] = randn_like(
                inv_linear(p_swin[f"merge{si}"]["kernel"]).shape)
    for i in range(len(depths)):
        sd[f"img_neck.lateral_convs.{i}.conv.weight"] = randn_like(
            inv_conv2d(p_fpn[f"lateral{i}"]["kernel"]).shape)
        sd[f"img_neck.lateral_convs.{i}.conv.bias"] = randn_like(
            p_fpn[f"lateral{i}"]["bias"].shape)
        sd[f"img_neck.fpn_convs.{i}.conv.weight"] = randn_like(
            inv_conv2d(p_fpn[f"fpn{i}"]["kernel"]).shape)
        sd[f"img_neck.fpn_convs.{i}.conv.bias"] = randn_like(
            p_fpn[f"fpn{i}"]["bias"].shape)

    swin_tree = swin_name_map(sd, depths=depths)
    fpn_tree = fpn_name_map(sd, n_ins=len(depths))

    # (a) every synthesized key consumed
    assert sd.accessed == set(sd.keys()), sorted(
        set(sd.keys()) - sd.accessed)
    # (b) every df3d param written (exact path-set match both ways)
    assert _leaf_paths(swin_tree) == _leaf_paths(p_swin)
    assert _leaf_paths(fpn_tree) == _leaf_paths(p_fpn)

    # shapes all merge cleanly and the branch still runs
    from df3d.train.torch_import import merge_into

    new_p = merge_into(
        jax.tree_util.tree_map(np.asarray, vs["params"]),
        {"swin": swin_tree, "swin_fpn": fpn_tree})
    feats0 = branch.apply(vs, images, train=False)
    feats1 = branch.apply({"params": new_p}, images, train=False)
    assert float(jnp.abs(feats0[0] - feats1[0]).max()) > 1e-6
    assert np.isfinite(np.asarray(feats1[0])).all()

    # (c) the PatchMerging axis permutation must be the exact inverse of
    # the layout difference: mmdet's nn.Unfold sampler emits CHANNEL-major
    # [c*4 + pos] (pos = ih*2 + iw) while df3d's reshape-transpose merge
    # is POSITION-major [pos*C + c] — a weight row-permuted by
    # _swin_merge_perm must consume the unfold layout identically to the
    # unpermuted weight consuming df3d's layout
    c = 4
    x = rng.randn(2, 4, 6, c).astype(np.float32)
    patches = [x[:, 0::2, 0::2], x[:, 0::2, 1::2],
               x[:, 1::2, 0::2], x[:, 1::2, 1::2]]  # pos = ih*2 + iw
    torch_unfold = np.stack(patches, -1).reshape(
        x.shape[0], 2, 3, 4 * c)  # (..., c, pos) flattened -> c*4 + pos
    jx = jnp.asarray(x)
    b, h, w, _ = jx.shape
    df = jx.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    wgt = rng.randn(4 * c, 3).astype(np.float32)
    got = np.asarray(df) @ _swin_merge_perm(wgt, c)
    ref = torch_unfold @ wgt
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
