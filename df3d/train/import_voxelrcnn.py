"""Voxel R-CNN (pcdet) checkpoint importer: torch .pth -> df3d flax trees.

Maps the OpenPCDet module naming (VoxelRCNN/pcdet/models/detectors/
detector3d_template.py:211-262 `_load_state_dict` semantics incl. spconv
weight-layout permutations via shape auto-detection, `find_all_spconv_keys`)
onto the df3d VoxelRCNN (rpn) + VoxelRCNNHead (rcnn) trees:

  backbone_3d.conv_input/conv1/conv2../conv_out   -> backbone.{conv_input,
      conv1, down2, conv2a, conv2b, down3, ..., conv_out}
  backbone_2d.blocks/deblocks (BaseBEVBackbone)   -> neck.block*/deblock*
  dense_head.conv_cls/conv_box/conv_dir_cls       -> dense_head.conv_*
  roi_head.roi_grid_pool_layers.{k}.mlps_{in,pos,out}
      (pointnet2_stack/voxel_pool_modules.py)     -> {conv2,conv3,conv4}_mlp_*
  roi_head.{shared,cls,reg}_fc_layers + pred      -> shared_fc*/cls_*/reg_*
"""

from __future__ import annotations

import numpy as np

from .torch_import import conv2d, linear, merge_into


def _bn(sd, prefix):
    p = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    s = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return p, s


def spconv_taps_auto(w: np.ndarray) -> np.ndarray:
    """5D spconv weight -> (K, in, out) taps, auto-detecting v1
    (kz,ky,kx,in,out) vs v2 (out,kz,ky,kx,in) layout the way pcdet's
    _load_state_dict disambiguates by shape (kernel dims are 1 or 3 here,
    channel dims are >=4)."""
    if w.ndim != 5:
        raise ValueError(f"expected 5D spconv weight, got {w.shape}")
    if all(d in (1, 3) for d in w.shape[:3]):  # v1
        kz, ky, kx, ci, co = w.shape
        return w.reshape(kz * ky * kx, ci, co)
    if all(d in (1, 3) for d in w.shape[1:4]):  # v2
        co, kz, ky, kx, ci = w.shape
        return w.transpose(1, 2, 3, 4, 0).reshape(kz * ky * kx, ci, co)
    raise ValueError(f"cannot infer spconv layout from {w.shape}")


def _conv1d(w):  # torch Conv1d (out, in, 1) -> Dense (in, out)
    return np.asarray(w)[:, :, 0].T


def _conv2d_1x1(w):  # torch Conv2d (out, in, 1, 1) -> Dense (in, out)
    return np.asarray(w)[:, :, 0, 0].T


def voxelrcnn_name_map(sd: dict, layer_nums=(5, 5)) -> tuple[dict, dict, dict, dict]:
    """-> (rpn_params, rpn_stats, rcnn_params, rcnn_stats) numpy trees."""
    params: dict = {"backbone": {}, "neck": {}, "dense_head": {}}
    stats: dict = {"backbone": {}, "neck": {}}

    bb_p, bb_s = params["backbone"], stats["backbone"]

    def sparse_cbr(flax_name, conv_key, bn_prefix, subm):
        child = "SubMConv3d_0" if subm else "SparseConv3d_0"
        bnp, bns = _bn(sd, bn_prefix)
        bb_p[flax_name] = {
            child: {"kernel": spconv_taps_auto(np.asarray(sd[conv_key]))},
            "MaskedBatchNorm_0": bnp,
        }
        bb_s[flax_name] = {"MaskedBatchNorm_0": bns}

    # VoxelBackBone8x (pcdet spconv_backbone.py:135-267 SparseSequential
    # indices: stage.0 = strided conv, stage.1/.2 = subm blocks)
    sparse_cbr("conv_input", "backbone_3d.conv_input.0.weight",
               "backbone_3d.conv_input.1", subm=True)
    sparse_cbr("conv1", "backbone_3d.conv1.0.0.weight",
               "backbone_3d.conv1.0.1", subm=True)
    for stage, (down, a, b) in enumerate(
        [("down2", "conv2a", "conv2b"), ("down3", "conv3a", "conv3b"),
         ("down4", "conv4a", "conv4b")], start=2,
    ):
        t = f"backbone_3d.conv{stage}"
        sparse_cbr(down, f"{t}.0.0.weight", f"{t}.0.1", subm=False)
        sparse_cbr(a, f"{t}.1.0.weight", f"{t}.1.1", subm=True)
        sparse_cbr(b, f"{t}.2.0.weight", f"{t}.2.1", subm=True)
    sparse_cbr("conv_out", "backbone_3d.conv_out.0.weight",
               "backbone_3d.conv_out.1", subm=False)

    # BaseBEVBackbone: blocks.{i} = [ZeroPad, Conv(1), BN(2), ReLU,
    # (Conv, BN, ReLU) x layer_num]; deblocks.{k} = [ConvTranspose/Conv, BN]
    nk_p, nk_s = params["neck"], stats["neck"]

    def conv_bn_2d(flax_name, conv_key, bn_prefix, transpose=False):
        w = np.asarray(sd[conv_key])
        if transpose:
            # torch ConvTranspose2d (in,out,kh,kw) -> flax (kh,kw,in,out)
            # + 180-degree tap flip (flax runs a fractionally-strided conv)
            w = np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])
            child = "ConvTranspose_0"
        else:
            w = conv2d(w)
            child = "Conv_0"
        bnp, bns = _bn(sd, bn_prefix)
        nk_p[flax_name] = {child: {"kernel": w}, "BatchNorm_0": bnp}
        nk_s[flax_name] = {"BatchNorm_0": bns}

    for i, ln in enumerate(layer_nums):
        t = f"backbone_2d.blocks.{i}"
        conv_bn_2d(f"block{i}_in", f"{t}.1.weight", f"{t}.2")
        for j in range(ln):
            conv_bn_2d(f"block{i}_conv{j}", f"{t}.{4 + 3 * j}.weight",
                       f"{t}.{5 + 3 * j}")
    for k in range(2):
        t = f"backbone_2d.deblocks.{k}"
        w = np.asarray(sd[f"{t}.0.weight"])
        if w.shape[2] == 1:  # stride-1 deblock: pointwise, df3d uses Conv
            bnp, bns = _bn(sd, f"{t}.1")
            nk_p[f"deblock{k}"] = {
                # ConvTranspose (in,out,1,1) == pointwise (1,1,in,out)
                "Conv_0": {"kernel": w.transpose(2, 3, 0, 1)},
                "BatchNorm_0": bnp,
            }
            nk_s[f"deblock{k}"] = {"BatchNorm_0": bns}
        else:
            conv_bn_2d(f"deblock{k}", f"{t}.0.weight", f"{t}.1",
                       transpose=True)

    # AnchorHeadSingle
    dh = params["dense_head"]
    for torch_name, flax_name in (
        ("conv_cls", "conv_cls"), ("conv_box", "conv_box"),
        ("conv_dir_cls", "conv_dir"),
    ):
        key = f"dense_head.{torch_name}.weight"
        if key in sd:
            dh[flax_name] = {
                "kernel": conv2d(np.asarray(sd[key])),
                "bias": np.asarray(sd[f"dense_head.{torch_name}.bias"]),
            }

    # VoxelRCNNHead (roi_head)
    rcnn_p: dict = {}
    rcnn_s: dict = {}

    def masked_bn(flax_name, prefix):
        p, s = _bn(sd, prefix)
        rcnn_p[flax_name] = p
        rcnn_s[flax_name] = s

    for k, key in enumerate(("conv2", "conv3", "conv4")):
        t = f"roi_head.roi_grid_pool_layers.{k}"
        if f"{t}.mlps_in.0.0.weight" not in sd:
            continue
        rcnn_p[f"{key}_mlp_in"] = {"kernel": _conv1d(sd[f"{t}.mlps_in.0.0.weight"])}
        masked_bn(f"{key}_bn_in", f"{t}.mlps_in.0.1")
        rcnn_p[f"{key}_mlp_pos"] = {"kernel": _conv2d_1x1(sd[f"{t}.mlps_pos.0.0.weight"])}
        masked_bn(f"{key}_bn_pos", f"{t}.mlps_pos.0.1")
        rcnn_p[f"{key}_mlp_out"] = {"kernel": _conv1d(sd[f"{t}.mlps_out.0.0.weight"])}
        masked_bn(f"{key}_bn_out", f"{t}.mlps_out.0.1")

    # FC stacks: Sequential [Linear, BN, ReLU(, Dropout)] x k -> Linear at
    # torch index 0 then +3 (no dropout) or +4 (dropout between layers);
    # probe both strides
    def fc_stack_auto(flax_prefix, torch_prefix):
        i, idx = 0, 0
        while f"{torch_prefix}.{idx}.weight" in sd:
            rcnn_p[f"{flax_prefix}_fc{i}"] = {
                "kernel": linear(np.asarray(sd[f"{torch_prefix}.{idx}.weight"]))
            }
            masked_bn(f"{flax_prefix}_bn{i}", f"{torch_prefix}.{idx + 1}")
            i += 1
            if f"{torch_prefix}.{idx + 3}.weight" in sd:
                idx += 3
            elif f"{torch_prefix}.{idx + 4}.weight" in sd:
                idx += 4
            else:
                break
        return i

    if "roi_head.shared_fc_layer.0.weight" in sd:
        fc_stack_auto("shared", "roi_head.shared_fc_layer")
        fc_stack_auto("cls", "roi_head.cls_fc_layers")
        fc_stack_auto("reg", "roi_head.reg_fc_layers")
        rcnn_p["cls_pred"] = {
            "kernel": linear(np.asarray(sd["roi_head.cls_pred_layer.weight"])),
            "bias": np.asarray(sd["roi_head.cls_pred_layer.bias"]),
        }
        rcnn_p["reg_pred"] = {
            "kernel": linear(np.asarray(sd["roi_head.reg_pred_layer.weight"])),
            "bias": np.asarray(sd["roi_head.reg_pred_layer.bias"]),
        }

    return params, stats, rcnn_p, rcnn_s


def import_voxelrcnn(rpn_variables: dict, rcnn_variables: dict,
                     torch_sd: dict) -> tuple[dict, dict]:
    """Merge a pcdet VoxelRCNN state dict into (rpn, rcnn) df3d variables."""
    import jax

    p, s, rp, rs = voxelrcnn_name_map(torch_sd)
    new_rpn = {
        "params": merge_into(
            jax.tree_util.tree_map(np.asarray, rpn_variables["params"]), p),
        "batch_stats": merge_into(
            jax.tree_util.tree_map(np.asarray, rpn_variables["batch_stats"]), s),
    }
    new_rcnn = {
        "params": merge_into(
            jax.tree_util.tree_map(np.asarray, rcnn_variables["params"]), rp),
        "batch_stats": merge_into(
            jax.tree_util.tree_map(
                np.asarray, rcnn_variables["batch_stats"]), rs),
    }
    return new_rpn, new_rcnn
