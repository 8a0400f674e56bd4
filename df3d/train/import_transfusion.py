"""TransFusion-L (mmdet3d) checkpoint importer: torch .pth -> df3d flax.

Maps the mmdet3d naming (TransFusion/mmdet3d/models: middle_encoders/
sparse_encoder.py SparseEncoder conv_input/encoder_layers/conv_out,
backbones/second.py SECOND blocks, necks/second_fpn.py SECONDFPN deblocks,
dense_heads/transfusion_head.py TransFusionHead shared_conv/heatmap_head/
class_encoding/decoder/prediction_heads) onto the df3d TransFusionL tree,
with spconv layout + torch MultiheadAttention packed-qkv splits.
"""

from __future__ import annotations

import numpy as np

from .import_voxelrcnn import spconv_taps_auto
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


def _conv1d(w):  # (out, in, 1) -> (in, out)
    return np.asarray(w)[:, :, 0].T


def _mha(sd, prefix, num_heads):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])  # (3d, d)
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])    # (3d,)
    d = w.shape[1]
    hd = d // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * d:(i + 1) * d]  # (d, d), y = wi @ x
        out[name] = {
            "kernel": wi.T.reshape(d, num_heads, hd),
            "bias": b[i * d:(i + 1) * d].reshape(num_heads, hd),
        }
    wo = np.asarray(sd[f"{prefix}.out_proj.weight"])  # (d, d)
    out["out"] = {
        "kernel": wo.T.reshape(num_heads, hd, d),
        "bias": np.asarray(sd[f"{prefix}.out_proj.bias"]),
    }
    return out


def transfusion_name_map(sd: dict, num_heads: int = 8,
                         encoder_channels=((16, 16, 32), (32, 32, 64),
                                           (64, 64, 128), (128, 128)),
                         layer_nums=(5, 5)) -> tuple[dict, dict]:
    """-> (params, stats) numpy trees matching df3d TransFusionL."""
    params: dict = {"middle_encoder": {}, "pts_backbone": {}, "bbox_head": {}}
    stats: dict = {"middle_encoder": {}, "pts_backbone": {}, "bbox_head": {}}

    me_p, me_s = params["middle_encoder"], stats["middle_encoder"]

    def sparse_cbr(flax_name, conv_key, bn_prefix, subm):
        child = "SubMConv3d_0" if subm else "SparseConv3d_0"
        bnp, bns = _bn(sd, bn_prefix)
        me_p[flax_name] = {
            child: {"kernel": spconv_taps_auto(np.asarray(sd[conv_key]))},
            "MaskedBatchNorm_0": bnp,
        }
        me_s[flax_name] = {"MaskedBatchNorm_0": bns}

    def basic_block(flax_name, t):
        b0p, b0s = _bn(sd, f"{t}.bn1")
        b1p, b1s = _bn(sd, f"{t}.bn2")
        me_p[flax_name] = {
            "SubMConv3d_0": {"kernel": spconv_taps_auto(np.asarray(sd[f"{t}.conv1.weight"]))},
            "SubMConv3d_1": {"kernel": spconv_taps_auto(np.asarray(sd[f"{t}.conv2.weight"]))},
            "MaskedBatchNorm_0": b0p,
            "MaskedBatchNorm_1": b1p,
        }
        me_s[flax_name] = {"MaskedBatchNorm_0": b0s, "MaskedBatchNorm_1": b1s}

    enc = "pts_middle_encoder"
    sparse_cbr("conv_input", f"{enc}.conv_input.0.weight",
               f"{enc}.conv_input.1", subm=True)
    for i, blocks in enumerate(encoder_channels):
        t = f"{enc}.encoder_layers.encoder_layer{i + 1}"
        for j in range(len(blocks)):
            last = j == len(blocks) - 1
            if last and i != len(encoder_channels) - 1:
                sparse_cbr(f"stage{i}_down", f"{t}.{j}.0.weight",
                           f"{t}.{j}.1", subm=False)
            else:
                basic_block(f"stage{i}_block{j}", f"{t}.{j}")
    sparse_cbr("conv_out", f"{enc}.conv_out.0.weight",
               f"{enc}.conv_out.1", subm=False)

    # SECOND + SECONDFPN -> df3d BEVBackbone (pts_backbone): SECOND blocks
    # have no ZeroPad (torch indices 0 conv, 1 bn, then +3)
    nk_p, nk_s = params["pts_backbone"], stats["pts_backbone"]

    def conv_bn_2d(flax_name, conv_key, bn_prefix, transpose=False):
        w = np.asarray(sd[conv_key])
        if transpose:
            w = np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])
            child = "ConvTranspose_0"
        else:
            w = conv2d(w)
            child = "Conv_0"
        bnp, bns = _bn(sd, bn_prefix)
        nk_p[flax_name] = {child: {"kernel": w}, "BatchNorm_0": bnp}
        nk_s[flax_name] = {"BatchNorm_0": bns}

    for i, ln in enumerate(layer_nums):
        t = f"pts_backbone.blocks.{i}"
        conv_bn_2d(f"block{i}_in", f"{t}.0.weight", f"{t}.1")
        for j in range(ln):
            conv_bn_2d(f"block{i}_conv{j}", f"{t}.{3 + 3 * j}.weight",
                       f"{t}.{4 + 3 * j}")
    for k in range(2):
        t = f"pts_neck.deblocks.{k}"
        w = np.asarray(sd[f"{t}.0.weight"])
        if w.shape[2] == 1:  # stride-1: pointwise conv in df3d
            bnp, bns = _bn(sd, f"{t}.1")
            # SECONDFPN stride-1 deblock is a plain Conv2d (out,in,1,1)
            nk_p[f"deblock{k}"] = {
                "Conv_0": {"kernel": conv2d(w)},
                "BatchNorm_0": bnp,
            }
            nk_s[f"deblock{k}"] = {"BatchNorm_0": bns}
        else:
            conv_bn_2d(f"deblock{k}", f"{t}.0.weight", f"{t}.1",
                       transpose=True)

    # TransFusionHead
    hd_p, hd_s = params["bbox_head"], stats["bbox_head"]
    h = "pts_bbox_head"
    hd_p["shared_conv"] = {"kernel": conv2d(np.asarray(sd[f"{h}.shared_conv.weight"]))}
    if f"{h}.shared_conv.bias" in sd:
        hd_p["shared_conv"]["bias"] = np.asarray(sd[f"{h}.shared_conv.bias"])
    hd_p["hm_conv0"] = {"kernel": conv2d(np.asarray(sd[f"{h}.heatmap_head.0.conv.weight"]))}
    bnp, bns = _bn(sd, f"{h}.heatmap_head.0.bn")
    hd_p["hm_bn"], hd_s["hm_bn"] = bnp, bns
    hd_p["hm_conv1"] = {
        "kernel": conv2d(np.asarray(sd[f"{h}.heatmap_head.1.weight"])),
        "bias": np.asarray(sd[f"{h}.heatmap_head.1.bias"]),
    }
    hd_p["class_encoding"] = {
        "kernel": _conv1d(sd[f"{h}.class_encoding.weight"]),
        "bias": np.asarray(sd[f"{h}.class_encoding.bias"]),
    }

    # position embeddings: Conv1d(2->d) + BN1d + ReLU + Conv1d(d->d)
    for torch_name, flax_name in (
        ("self_posembed", "query_pos_embed"),
        ("cross_posembed", "key_pos_embed"),
    ):
        t = f"{h}.decoder.0.{torch_name}.position_embedding_head"
        bnp, bns = _bn(sd, f"{t}.1")
        hd_p[flax_name] = {
            "Dense_0": {"kernel": _conv1d(sd[f"{t}.0.weight"]),
                        "bias": np.asarray(sd[f"{t}.0.bias"])},
            "bn": bnp,
            "Dense_1": {"kernel": _conv1d(sd[f"{t}.3.weight"]),
                        "bias": np.asarray(sd[f"{t}.3.bias"])},
        }
        hd_s[flax_name] = {"bn": bns}

    # decoder layer
    dec = {"self_attn": _mha(sd, f"{h}.decoder.0.self_attn", num_heads),
           "cross_attn": _mha(sd, f"{h}.decoder.0.multihead_attn", num_heads)}
    for i, norm in enumerate(("norm1", "norm2", "norm3")):
        dec[f"LayerNorm_{i}"] = {
            "scale": np.asarray(sd[f"{h}.decoder.0.{norm}.weight"]),
            "bias": np.asarray(sd[f"{h}.decoder.0.{norm}.bias"]),
        }
    dec["Dense_0"] = {"kernel": linear(np.asarray(sd[f"{h}.decoder.0.linear1.weight"])),
                      "bias": np.asarray(sd[f"{h}.decoder.0.linear1.bias"])}
    dec["Dense_1"] = {"kernel": linear(np.asarray(sd[f"{h}.decoder.0.linear2.weight"])),
                      "bias": np.asarray(sd[f"{h}.decoder.0.linear2.bias"])}
    hd_p["decoder0"] = dec

    # prediction FFN heads; reference 'heatmap' branch == df3d 'cls'
    for torch_name, flax_name in (
        ("center", "center"), ("height", "height"), ("dim", "dim"),
        ("rot", "rot"), ("vel", "vel"), ("heatmap", "cls"),
    ):
        t = f"{h}.prediction_heads.0.{torch_name}"
        hd_p[f"{flax_name}_fc0"] = {"kernel": _conv1d(sd[f"{t}.0.conv.weight"])}
        bnp, bns = _bn(sd, f"{t}.0.bn")
        hd_p[f"{flax_name}_bn0"], hd_s[f"{flax_name}_bn0"] = bnp, bns
        hd_p[f"{flax_name}_fc1"] = {
            "kernel": _conv1d(sd[f"{t}.1.weight"]),
            "bias": np.asarray(sd[f"{t}.1.bias"]),
        }
    return params, stats


def import_transfusion(variables: dict, torch_sd: dict, **kw) -> dict:
    """Merge an mmdet3d TransFusion-L state dict into df3d variables."""
    import jax

    params, stats = transfusion_name_map(torch_sd, **kw)
    return {
        "params": merge_into(
            jax.tree_util.tree_map(np.asarray, variables["params"]), params),
        "batch_stats": merge_into(
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
            stats),
    }


# --- Swin-Tiny image branch (TransFusion-L + 3D-DF Swin variant) -----------

def _swin_merge_perm(arr: np.ndarray, c: int) -> np.ndarray:
    """Permute a leading 4C axis from mmdet's PatchMerging layout to
    df3d's.

    mmdet's PatchMerging (mmdet/models/backbones/swin.py) samples the 2x2
    sub-patches with nn.Unfold, whose output is CHANNEL-major:
    index = c*4 + pos with pos = ih*2 + iw over [(0,0),(0,1),(1,0),(1,1)]
    — and mmdet's swin converter rewrites official microsoft ckpts into
    this order, so every checkpoint this name map can read (it consumes
    mmdet key names: stages.*, attn.w_msa, ffn.layers) carries it. df3d's
    reshape-transpose merge (image/swin.py) is POSITION-major with the
    same (ih, iw) enumeration: index = pos*C + c. The map is therefore a
    pure (C, 4) -> (4, C) transpose of the axis."""
    g = arr.reshape(c, 4, *arr.shape[1:])
    return g.swapaxes(0, 1).reshape(arr.shape)


def swin_name_map(sd: dict, prefix: str = "img_backbone.",
                  depths=(2, 2, 6, 2)) -> dict:
    """mmdet-convention SwinTransformer state dict -> df3d
    image.swin.SwinTransformer param tree (LayerNorm-only: no BN stats).

    Handles the two packing conventions real checkpoints carry:
      * window-attention qkv is ONE packed (3C, C) Linear — split along the
        output into df3d's single Dense(3C) (same q/k/v order, so a plain
        transpose suffices);
      * relative_position_bias_table ((2w-1)^2, nH) copies verbatim — df3d
        indexes it with the identical (2w-1)-based flat index;
      * PatchMerging's 4C concat order differs from df3d's
        reshape-transpose merge — reduction/norm weights are group-permuted
        (see _swin_merge_perm).
    """
    p = prefix
    out: dict = {
        "patch_embed": {
            "kernel": conv2d(np.asarray(sd[f"{p}patch_embed.projection.weight"])),
            "bias": np.asarray(sd[f"{p}patch_embed.projection.bias"]),
        },
        "LayerNorm_0": {
            "scale": np.asarray(sd[f"{p}patch_embed.norm.weight"]),
            "bias": np.asarray(sd[f"{p}patch_embed.norm.bias"]),
        },
    }

    def ln(torch_prefix):
        return {"scale": np.asarray(sd[f"{torch_prefix}.weight"]),
                "bias": np.asarray(sd[f"{torch_prefix}.bias"])}

    for si, depth in enumerate(depths):
        for bi in range(depth):
            t = f"{p}stages.{si}.blocks.{bi}"
            a = f"{t}.attn.w_msa"
            out[f"stage{si}_block{bi}"] = {
                "LayerNorm_0": ln(f"{t}.norm1"),
                "LayerNorm_1": ln(f"{t}.norm2"),
                "attn": {
                    "qkv": {
                        "kernel": linear(np.asarray(sd[f"{a}.qkv.weight"])),
                        "bias": np.asarray(sd[f"{a}.qkv.bias"]),
                    },
                    "rel_bias": np.asarray(
                        sd[f"{a}.relative_position_bias_table"]),
                    "proj": {
                        "kernel": linear(np.asarray(sd[f"{a}.proj.weight"])),
                        "bias": np.asarray(sd[f"{a}.proj.bias"]),
                    },
                },
                "mlp0": {
                    "kernel": linear(np.asarray(sd[f"{t}.ffn.layers.0.0.weight"])),
                    "bias": np.asarray(sd[f"{t}.ffn.layers.0.0.bias"]),
                },
                "mlp1": {
                    "kernel": linear(np.asarray(sd[f"{t}.ffn.layers.1.weight"])),
                    "bias": np.asarray(sd[f"{t}.ffn.layers.1.bias"]),
                },
            }
        out[f"out_norm{si}"] = ln(f"{p}norm{si}")
        if si < len(depths) - 1:
            c = np.asarray(sd[f"{p}stages.{si}.downsample.norm.weight"]).shape[0] // 4
            out[f"merge_norm{si}"] = {
                "scale": _swin_merge_perm(
                    np.asarray(sd[f"{p}stages.{si}.downsample.norm.weight"]), c),
                "bias": _swin_merge_perm(
                    np.asarray(sd[f"{p}stages.{si}.downsample.norm.bias"]), c),
            }
            out[f"merge{si}"] = {
                "kernel": _swin_merge_perm(
                    linear(np.asarray(
                        sd[f"{p}stages.{si}.downsample.reduction.weight"])), c),
            }
    return out


def fpn_name_map(sd: dict, prefix: str = "img_neck.", n_ins: int = 4) -> dict:
    """mmdet FPN (lateral_convs/fpn_convs) -> df3d image.resnet.FPN."""
    out = {}
    for i in range(n_ins):
        out[f"lateral{i}"] = {
            "kernel": conv2d(np.asarray(sd[f"{prefix}lateral_convs.{i}.conv.weight"])),
            "bias": np.asarray(sd[f"{prefix}lateral_convs.{i}.conv.bias"]),
        }
        out[f"fpn{i}"] = {
            "kernel": conv2d(np.asarray(sd[f"{prefix}fpn_convs.{i}.conv.weight"])),
            "bias": np.asarray(sd[f"{prefix}fpn_convs.{i}.conv.bias"]),
        }
    return out


def import_transfusion_3ddf_swin(variables: dict, torch_sd: dict,
                                 depths=(2, 2, 6, 2), **kw) -> dict:
    """Merge a TransFusion+Swin checkpoint into df3d TransFusion3DDF
    variables: img_backbone.* -> image_branch.swin, img_neck.* ->
    image_branch.swin_fpn, pts_* -> detector.* (the LiDAR map)."""
    import jax

    lidar_p, lidar_s = transfusion_name_map(torch_sd, **kw)
    params = {
        "detector": lidar_p,
        "image_branch": {
            "swin": swin_name_map(torch_sd, depths=depths),
            "swin_fpn": fpn_name_map(torch_sd),
        },
    }
    stats = {"detector": lidar_s}
    return {
        "params": merge_into(
            jax.tree_util.tree_map(np.asarray, variables["params"]), params),
        "batch_stats": merge_into(
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
            stats),
    }
