"""Reference-checkpoint importers: torch .pth state dicts -> df3d flax trees.

The reference ships checkpoints for all headline numbers (BASELINE.md); for
numerics parity df3d loads them directly (SURVEY §5.4: "preserve the
reference checkpoint API"). This module holds the name maps between the
three torch naming schemes (pcdet / det3d / mmdet3d + torchvision) and the
df3d module tree, plus the layout transposes:

  torch Conv2d   (out, in, kh, kw)      -> flax (kh, kw, in, out)
  torch Linear   (out, in)              -> flax (in, out)
  spconv v1      (kz, ky, kx, in, out)  -> df3d taps (K, in, out)
  spconv v2      (out, kz, ky, kx, in)  -> df3d taps (K, in, out)
  BatchNorm      weight/bias/running_*  -> scale/bias/mean/var
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint into a {name: np.ndarray} state
    dict (handles the three wrappers: pcdet {'model_state': ...}, det3d
    {'state_dict': ...}, mmdet3d {'state_dict': ...}; strips any
    'module.' DDP prefix)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state", "state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def conv2d(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)


def linear(w: np.ndarray) -> np.ndarray:
    return w.T


def spconv_taps(w: np.ndarray, layout: str = "v2") -> np.ndarray:
    """-> (K, in, out) row-major (z, y, x) taps (df3d apply_sparse_conv)."""
    if layout == "v1":  # (kz, ky, kx, in, out)
        kz, ky, kx, ci, co = w.shape
        return w.reshape(kz * ky * kx, ci, co)
    if layout == "v2":  # (out, kz, ky, kx, in)
        co, kz, ky, kx, ci = w.shape
        return w.transpose(1, 2, 3, 4, 0).reshape(kz * ky * kx, ci, co)
    raise ValueError(layout)


def import_batchnorm(dst: dict, torch_sd: Mapping, prefix: str):
    """Fill a df3d MaskedBatchNorm/flax BatchNorm param+stat pair."""
    dst["params"]["scale"] = np.asarray(torch_sd[f"{prefix}.weight"])
    dst["params"]["bias"] = np.asarray(torch_sd[f"{prefix}.bias"])
    dst["stats"]["mean"] = np.asarray(torch_sd[f"{prefix}.running_mean"])
    dst["stats"]["var"] = np.asarray(torch_sd[f"{prefix}.running_var"])


def resnet_name_map(flax_params: dict, torch_sd: Mapping, layers=(3, 4, 6, 3),
                    torch_prefix: str = "backbone.") -> tuple[dict, dict]:
    """Map a torchvision/mmdet ResNet into df3d.models.image.resnet.ResNet.

    Returns (params, batch_stats) numpy trees matching the flax layout.
    """
    params = {}
    stats = {}

    def bn(flax_name, torch_name):
        params[flax_name] = {
            "scale": np.asarray(torch_sd[f"{torch_name}.weight"]),
            "bias": np.asarray(torch_sd[f"{torch_name}.bias"]),
        }
        stats[flax_name] = {
            "mean": np.asarray(torch_sd[f"{torch_name}.running_mean"]),
            "var": np.asarray(torch_sd[f"{torch_name}.running_var"]),
        }

    params["conv1"] = {"kernel": conv2d(np.asarray(torch_sd[f"{torch_prefix}conv1.weight"]))}
    bn("bn1", f"{torch_prefix}bn1")
    for li, n in enumerate(layers):
        for j in range(n):
            t = f"{torch_prefix}layer{li+1}.{j}"
            f = f"layer{li+1}_{j}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {
                    "kernel": conv2d(np.asarray(torch_sd[f"{t}.conv{ci}.weight"]))
                }
            params[f] = blk
            for ci in (1, 2, 3):
                bn_name = f"{f}/bn{ci}"
                params.setdefault(f, {})
                params[f][f"bn{ci}"] = {
                    "scale": np.asarray(torch_sd[f"{t}.bn{ci}.weight"]),
                    "bias": np.asarray(torch_sd[f"{t}.bn{ci}.bias"]),
                }
                stats.setdefault(f, {})
                stats[f][f"bn{ci}"] = {
                    "mean": np.asarray(torch_sd[f"{t}.bn{ci}.running_mean"]),
                    "var": np.asarray(torch_sd[f"{t}.bn{ci}.running_var"]),
                }
            if f"{t}.downsample.0.weight" in torch_sd:
                params[f]["downsample_conv"] = {
                    "kernel": conv2d(np.asarray(torch_sd[f"{t}.downsample.0.weight"]))
                }
                params[f]["downsample_bn"] = {
                    "scale": np.asarray(torch_sd[f"{t}.downsample.1.weight"]),
                    "bias": np.asarray(torch_sd[f"{t}.downsample.1.bias"]),
                }
                stats[f]["downsample_bn"] = {
                    "mean": np.asarray(torch_sd[f"{t}.downsample.1.running_mean"]),
                    "var": np.asarray(torch_sd[f"{t}.downsample.1.running_var"]),
                }
    return params, stats


def merge_into(flax_tree: dict, imported: dict, path=()):
    """Recursively overwrite matching leaves of flax_tree with imported
    arrays (asserting shapes); leaves absent from `imported` keep their
    values. Returns a new tree."""
    out = {}
    for k, v in flax_tree.items():
        if k in imported:
            if isinstance(v, dict):
                out[k] = merge_into(v, imported[k], path + (k,))
            else:
                arr = np.asarray(imported[k])
                assert np.shape(v) == arr.shape, (path + (k,), np.shape(v), arr.shape)
                out[k] = arr.astype(np.asarray(v).dtype)
        else:
            out[k] = v
    return out
