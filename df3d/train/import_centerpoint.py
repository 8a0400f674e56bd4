"""CenterPoint (det3d) checkpoint importer: torch .pth -> df3d flax trees.

Maps the det3d module naming (CenterPoint/det3d/models: SpMiddleResNetFHD
SparseSequential indices, RPN blocks/deblocks, CenterHead SepHead branches)
onto the df3d.models.detectors.centerpoint.CenterPoint tree, with spconv
weight-layout transposes. Enables loading the reference's published
checkpoints (README.md:33-34 links) for numerics parity.
"""

from __future__ import annotations

import numpy as np

from .torch_import import conv2d, spconv_taps


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


def _spconv_layout(sd, key, layout):
    w = np.asarray(sd[key])
    if w.ndim != 5:
        raise ValueError(f"{key}: expected 5D spconv weight, got {w.shape}")
    return spconv_taps(w, layout)


def centerpoint_name_map(flax_params: dict, sd: dict,
                         spconv_layout: str = "v1") -> tuple[dict, dict]:
    """Build (params, batch_stats) numpy trees matching df3d CenterPoint.

    spconv_layout: 'v1' (kz,ky,kx,in,out — the published det3d ckpts) or
    'v2' (out,kz,ky,kx,in).
    """
    params: dict = {"backbone": {}, "neck": {}, "head": {}}
    stats: dict = {"backbone": {}, "neck": {}, "head": {}}

    bb_p = params["backbone"]
    bb_s = stats["backbone"]

    def sparse_cbr(flax_name, conv_key, bn_prefix, subm):
        conv_child = "SubMConv3d_0" if subm else "SparseConv3d_0"
        bnp, bns = _bn(sd, bn_prefix)
        bb_p[flax_name] = {
            conv_child: {"kernel": _spconv_layout(sd, conv_key, spconv_layout)},
            "MaskedBatchNorm_0": bnp,
        }
        bb_s[flax_name] = {"MaskedBatchNorm_0": bns}

    def basic_block(flax_name, torch_prefix):
        b0p, b0s = _bn(sd, f"{torch_prefix}.bn1")
        b1p, b1s = _bn(sd, f"{torch_prefix}.bn2")
        bb_p[flax_name] = {
            "SubMConv3d_0": {"kernel": _spconv_layout(sd, f"{torch_prefix}.conv1.weight", spconv_layout)},
            "SubMConv3d_1": {"kernel": _spconv_layout(sd, f"{torch_prefix}.conv2.weight", spconv_layout)},
            "MaskedBatchNorm_0": b0p,
            "MaskedBatchNorm_1": b1p,
        }
        bb_s[flax_name] = {"MaskedBatchNorm_0": b0s, "MaskedBatchNorm_1": b1s}

    # SpMiddleResNetFHD (det3d scn.py module indices)
    sparse_cbr("conv_input", "backbone.conv_input.0.weight",
               "backbone.conv_input.1", subm=True)
    basic_block("res1a", "backbone.conv1.0")
    basic_block("res1b", "backbone.conv1.1")
    for stage, (down_name, a, b) in enumerate(
        [("down2", "res2a", "res2b"), ("down3", "res3a", "res3b"),
         ("down4", "res4a", "res4b")], start=2,
    ):
        t = f"backbone.conv{stage}"
        sparse_cbr(down_name, f"{t}.0.weight", f"{t}.1", subm=False)
        basic_block(a, f"{t}.3")
        basic_block(b, f"{t}.4")
    sparse_cbr("extra_conv", "backbone.extra_conv.0.weight",
               "backbone.extra_conv.1", subm=False)

    # RPN neck (det3d rpn.py): blocks.{i} Sequential
    # [ZeroPad2d, Conv2d(1), BN(2), ReLU, (Conv2d, BN, ReLU) x layer_num]
    nk_p = params["neck"]
    nk_s = stats["neck"]

    def conv_bn_2d(flax_name, conv_key, bn_prefix, transpose=False):
        w = np.asarray(sd[conv_key])
        if transpose:
            # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out)
            # PLUS a 180-degree spatial flip: flax nn.ConvTranspose (with
            # transpose_kernel=False) runs a fractionally-strided conv with
            # the kernel as given, whereas torch implements the gradient-
            # derived transpose — the two differ by mirrored taps.
            w = w.transpose(2, 3, 0, 1)[::-1, ::-1]
            child = "ConvTranspose_0"
        else:
            w = conv2d(w)
            child = "Conv_0"
        bnp, bns = _bn(sd, bn_prefix)
        nk_p[flax_name] = {child: {"kernel": w}, "BatchNorm_0": bnp}
        nk_s[flax_name] = {"BatchNorm_0": bns}

    for i, layer_num in enumerate((5, 5)):
        t = f"neck.blocks.{i}"
        conv_bn_2d(f"block{i}_in", f"{t}.1.weight", f"{t}.2")
        for j in range(layer_num):
            conv_bn_2d(f"block{i}_conv{j}", f"{t}.{4 + 3 * j}.weight",
                       f"{t}.{5 + 3 * j}")
    for k in range(2):
        t = f"neck.deblocks.{k}"
        # deblock 0 is stride-1 Conv2d, deblock 1 is ConvTranspose2d
        conv_bn_2d(f"deblock{k}", f"{t}.0.weight", f"{t}.1", transpose=(k == 1))

    # CenterHead: shared conv + per-task SepHead branches
    hd_p = params["head"]
    hd_s = stats["head"]
    hd_p["Conv_0"] = {
        "kernel": conv2d(np.asarray(sd["bbox_head.shared_conv.0.weight"])),
        "bias": np.asarray(sd["bbox_head.shared_conv.0.bias"]),
    }
    bnp, bns = _bn(sd, "bbox_head.shared_conv.1")
    hd_p["BatchNorm_0"] = bnp
    hd_s["BatchNorm_0"] = bns

    branches = ("reg", "height", "dim", "rot", "vel", "hm")
    t = 0
    while f"bbox_head.tasks.{t}.reg.0.weight" in sd:
        for name in branches:
            tb = f"bbox_head.tasks.{t}.{name}"
            fb = f"task{t}_{name}"
            bnp, bns = _bn(sd, f"{tb}.1")
            hd_p[fb] = {
                "Conv_0": {
                    "kernel": conv2d(np.asarray(sd[f"{tb}.0.weight"])),
                    "bias": np.asarray(sd[f"{tb}.0.bias"]),
                },
                "BatchNorm_0": bnp,
                "Conv_1": {
                    "kernel": conv2d(np.asarray(sd[f"{tb}.3.weight"])),
                    "bias": np.asarray(sd[f"{tb}.3.bias"]),
                },
            }
            hd_s[fb] = {"BatchNorm_0": bns}
        t += 1
    return params, stats


def import_centerpoint(variables: dict, torch_sd: dict, spconv_layout: str = "v1") -> dict:
    """Merge a det3d CenterPoint state dict into df3d variables."""
    import jax

    from .torch_import import merge_into

    params, stats = centerpoint_name_map(variables["params"], torch_sd, spconv_layout)
    new_params = merge_into(
        jax.tree_util.tree_map(np.asarray, variables["params"]), params
    )
    new_stats = merge_into(
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]), stats
    )
    return {"params": new_params, "batch_stats": new_stats}
