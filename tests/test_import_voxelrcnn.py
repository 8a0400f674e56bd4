"""VoxelRCNN (pcdet) checkpoint importer: synthesize a pcdet-named state
dict shaped exactly like the published checkpoints (derived by inverting the
layout transforms from the flax shapes) and verify every mapped leaf lands
and changes the model output."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.detectors.voxel_rcnn import (
    VoxelRCNN, VoxelRCNNConfig,
)
from df3d.models.heads.voxelrcnn_head import (
    RoIPoolScaleCfg, VoxelRCNNHead, VoxelRCNNHeadCfg,
)
from df3d.ops.voxelize import voxelize_batch
from df3d.train.import_voxelrcnn import import_voxelrcnn

TINY = VoxelRCNNConfig(
    pc_range=(0.0, -16.0, -2.4, 32.0, 16.0, 2.4),
    voxel_size=(0.5, 0.5, 0.2),
    grid_size=(24, 64, 64),
    max_voxels=512,
    num_point_features=4,
    stage_caps=(512, 384, 256, 128),
    train_pre_nms=128, train_post_nms=32, test_pre_nms=128, test_post_nms=16,
    rcnn=VoxelRCNNHeadCfg(
        grid_size=4,
        scales=(
            RoIPoolScaleCfg("conv2", 2, 0.8, nsample=8),
            RoIPoolScaleCfg("conv3", 4, 1.6, nsample=8),
            RoIPoolScaleCfg("conv4", 8, 1.6, nsample=8),
        ),
        max_local=64,
        roi_per_image=16,
    ),
)


def _synth_pcdet_sd(rng, rpn_vars, rcnn_vars):
    """Build a pcdet-named sd by inverting the importer's transforms from
    the flax shapes (so the published-checkpoint naming + torch layouts are
    exercised end to end)."""
    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    bb = rpn_vars["params"]["backbone"]

    def sp(torch_name, flax_name, subm):
        child = "SubMConv3d_0" if subm else "SparseConv3d_0"
        k, ci, co = bb[flax_name][child]["kernel"].shape
        kz = 3 if k == 27 else 3
        kyx = 3 if k == 27 else 1
        sd[f"{torch_name}.weight"] = rng.randn(
            kz, kyx, kyx, ci, co).astype(np.float32) * 0.05

    sp("backbone_3d.conv_input.0", "conv_input", True)
    bn("backbone_3d.conv_input.1", 16)
    sp("backbone_3d.conv1.0.0", "conv1", True)
    bn("backbone_3d.conv1.0.1", 16)
    for stage, (down, a, b, co) in enumerate(
        [("down2", "conv2a", "conv2b", 32), ("down3", "conv3a", "conv3b", 64),
         ("down4", "conv4a", "conv4b", 64)], start=2,
    ):
        t = f"backbone_3d.conv{stage}"
        sp(f"{t}.0.0", down, False)
        bn(f"{t}.0.1", co)
        sp(f"{t}.1.0", a, True)
        bn(f"{t}.1.1", co)
        sp(f"{t}.2.0", b, True)
        bn(f"{t}.2.1", co)
    sp("backbone_3d.conv_out.0", "conv_out", False)
    bn("backbone_3d.conv_out.1", 128)

    nk = rpn_vars["params"]["neck"]

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
        t = f"backbone_2d.blocks.{i}"
        conv2(f"{t}.1", f"block{i}_in")  # writes {t}.1.weight + {t}.2 bn
        for j in range(ln):
            conv2(f"{t}.{4 + 3 * j}", f"block{i}_conv{j}")
    # deblock0: stride-1 pointwise stored as ConvTranspose (in,out,1,1)
    kh, kw, ci, co = nk["deblock0"]["Conv_0"]["kernel"].shape
    sd["backbone_2d.deblocks.0.0.weight"] = rng.randn(
        ci, co, 1, 1).astype(np.float32) * 0.05
    bn("backbone_2d.deblocks.0.1", co)
    conv2("backbone_2d.deblocks.1.0", "deblock1", transpose=True)

    dh = rpn_vars["params"]["dense_head"]
    for tname, fname in (("conv_cls", "conv_cls"), ("conv_box", "conv_box"),
                         ("conv_dir_cls", "conv_dir")):
        kh, kw, ci, co = dh[fname]["kernel"].shape
        sd[f"dense_head.{tname}.weight"] = rng.randn(
            co, ci, kh, kw).astype(np.float32) * 0.05
        sd[f"dense_head.{tname}.bias"] = rng.randn(co).astype(np.float32) * 0.1

    rc = rcnn_vars["params"]
    for k, key in enumerate(("conv2", "conv3", "conv4")):
        t = f"roi_head.roi_grid_pool_layers.{k}"
        ci, co = rc[f"{key}_mlp_in"]["kernel"].shape
        sd[f"{t}.mlps_in.0.0.weight"] = rng.randn(co, ci, 1).astype(np.float32) * 0.05
        bn(f"{t}.mlps_in.0.1", co)
        ci, co = rc[f"{key}_mlp_pos"]["kernel"].shape
        sd[f"{t}.mlps_pos.0.0.weight"] = rng.randn(
            co, ci, 1, 1).astype(np.float32) * 0.05
        bn(f"{t}.mlps_pos.0.1", co)
        ci, co = rc[f"{key}_mlp_out"]["kernel"].shape
        sd[f"{t}.mlps_out.0.0.weight"] = rng.randn(co, ci, 1).astype(np.float32) * 0.05
        bn(f"{t}.mlps_out.0.1", co)

    for prefix, torch_prefix in (
        ("shared", "roi_head.shared_fc_layer"),
        ("cls", "roi_head.cls_fc_layers"),
        ("reg", "roi_head.reg_fc_layers"),
    ):
        idx = 0
        i = 0
        while f"{prefix}_fc{i}" in rc:
            ci, co = rc[f"{prefix}_fc{i}"]["kernel"].shape
            sd[f"{torch_prefix}.{idx}.weight"] = rng.randn(
                co, ci).astype(np.float32) * 0.05
            bn(f"{torch_prefix}.{idx + 1}", co)
            i += 1
            # voxel_rcnn_car has DP_RATIO 0.3 -> dropout between layers
            idx += 4
    for pred, torch_pred in (("cls_pred", "roi_head.cls_pred_layer"),
                             ("reg_pred", "roi_head.reg_pred_layer")):
        ci, co = rc[pred]["kernel"].shape
        sd[f"{torch_pred}.weight"] = rng.randn(co, ci).astype(np.float32) * 0.05
        sd[f"{torch_pred}.bias"] = rng.randn(co).astype(np.float32) * 0.1
    return sd


def test_import_voxelrcnn_full_map():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 31, (1, 400, 1)), rng.uniform(-15, 15, (1, 400, 1)),
             rng.uniform(-1.8, 1.8, (1, 400, 1)), rng.uniform(0, 1, (1, 400, 1))],
            axis=-1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        pts, jnp.ones((1, 400), bool), TINY.voxel_size, TINY.pc_range,
        TINY.grid_size, TINY.max_voxels, TINY.max_points_per_voxel,
    )
    model = VoxelRCNN(TINY)
    rpn_vars = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, train=False)

    preds0 = model.apply(rpn_vars, res.features, res.coords, train=False)
    head = VoxelRCNNHead(TINY.rcnn, TINY.voxel_size, TINY.pc_range)
    rois = jnp.tile(
        jnp.asarray([[8.0, 0.0, -0.5, 3.9, 1.6, 1.56, 0.2]], np.float32),
        (TINY.rcnn.roi_per_image, 1),
    )[None]
    roi_mask = jnp.ones((1, TINY.rcnn.roi_per_image))
    rcnn_vars = head.init(
        jax.random.PRNGKey(1), rois, roi_mask, preds0["ms"], train=False)

    sd = _synth_pcdet_sd(rng, rpn_vars, rcnn_vars)
    new_rpn, new_rcnn = import_voxelrcnn(rpn_vars, rcnn_vars, sd)

    # numeric spot checks of the layout transforms
    got = new_rpn["params"]["backbone"]["conv_input"]["SubMConv3d_0"]["kernel"]
    w = sd["backbone_3d.conv_input.0.weight"]
    np.testing.assert_array_equal(np.asarray(got)[0], w[0, 0, 0])
    np.testing.assert_array_equal(np.asarray(got)[26], w[2, 2, 2])
    got = new_rcnn["params"]["shared_fc0"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got), sd["roi_head.shared_fc_layer.0.weight"].T)
    got = new_rpn["params"]["neck"]["deblock1"]["ConvTranspose_0"]["kernel"]
    wt = sd["backbone_2d.deblocks.1.0.weight"]
    np.testing.assert_array_equal(
        np.asarray(got), wt.transpose(2, 3, 0, 1)[::-1, ::-1])

    # imported weights flow through both stages
    preds1 = model.apply(
        {"params": new_rpn["params"], "batch_stats": new_rpn["batch_stats"]},
        res.features, res.coords, train=False,
    )
    d = float(jnp.abs(preds0["cls"] - preds1["cls"]).max())
    assert d > 1e-6
    cls0, _ = head.apply(rcnn_vars, rois, roi_mask, preds0["ms"], train=False)
    cls1, _ = head.apply(
        {"params": new_rcnn["params"],
         "batch_stats": new_rcnn["batch_stats"]},
        rois, roi_mask, preds1["ms"], train=False,
    )
    assert float(jnp.abs(cls0 - cls1).max()) > 1e-6
    assert np.isfinite(np.asarray(cls1)).all()


def test_spconv_layout_autodetect():
    from df3d.train.import_voxelrcnn import spconv_taps_auto

    rng = np.random.RandomState(0)
    w1 = rng.randn(3, 3, 3, 16, 32).astype(np.float32)  # v1
    t1 = spconv_taps_auto(w1)
    assert t1.shape == (27, 16, 32)
    np.testing.assert_array_equal(t1[1], w1[0, 0, 1])
    w2 = np.transpose(w1, (4, 0, 1, 2, 3))  # v2 (out,kz,ky,kx,in)
    t2 = spconv_taps_auto(w2)
    assert t2.shape == (27, 16, 32)
    np.testing.assert_allclose(t2, t1, atol=0)


def test_import_voxelrcnn_two_way_coverage():
    """VERDICT r4 #8: every synthesized pcdet key consumed, every df3d
    param/stat leaf written, for BOTH stages."""
    from df3d.train.import_voxelrcnn import voxelrcnn_name_map
    from tests.import_cov import TrackingDict, assert_two_way_coverage

    rng = np.random.RandomState(7)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 31, (1, 400, 1)), rng.uniform(-15, 15, (1, 400, 1)),
             rng.uniform(-1.8, 1.8, (1, 400, 1)), rng.uniform(0, 1, (1, 400, 1))],
            axis=-1,
        ).astype(np.float32)
    )
    res = voxelize_batch(
        pts, jnp.ones((1, 400), bool), TINY.voxel_size, TINY.pc_range,
        TINY.grid_size, TINY.max_voxels, TINY.max_points_per_voxel,
    )
    model = VoxelRCNN(TINY)
    rpn_vars = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, train=False)
    preds0 = model.apply(rpn_vars, res.features, res.coords, train=False)
    head = VoxelRCNNHead(TINY.rcnn, TINY.voxel_size, TINY.pc_range)
    rois = jnp.tile(
        jnp.asarray([[8.0, 0.0, -0.5, 3.9, 1.6, 1.56, 0.2]], np.float32),
        (TINY.rcnn.roi_per_image, 1),
    )[None]
    rcnn_vars = head.init(
        jax.random.PRNGKey(1), rois, jnp.ones((1, TINY.rcnn.roi_per_image)),
        preds0["ms"], train=False)

    sd = TrackingDict(_synth_pcdet_sd(rng, rpn_vars, rcnn_vars))
    rpn_p, rpn_s, rcnn_p, rcnn_s = voxelrcnn_name_map(sd)
    assert_two_way_coverage(
        sd, [rpn_p, rpn_s, rcnn_p, rcnn_s],
        [jax.tree_util.tree_map(np.asarray, rpn_vars["params"]),
         jax.tree_util.tree_map(np.asarray, rpn_vars["batch_stats"]),
         jax.tree_util.tree_map(np.asarray, rcnn_vars["params"]),
         jax.tree_util.tree_map(np.asarray, rcnn_vars["batch_stats"])])
