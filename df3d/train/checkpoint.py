"""Checkpoint save/restore (orbax) + torch .pth import.

Reference behavior replicated (SURVEY §5.4): per-epoch checkpoints with
max-keep pruning and newest-checkpoint auto-resume
(pcdet train_utils.py:120-140, tools/train.py:131-138; det3d
Trainer.resume trainer.py:492). Torch import loads the reference's
`{'model_state', 'optimizer_state', 'epoch', 'it'}` dicts (torch-cpu) and
maps names into flax param/batch-stats trees for numerics parity.
"""

from __future__ import annotations

import pathlib
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir, state, step: int, max_keep: int = 5):
    ckpt_dir = pathlib.Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir / f"step_{step:08d}", state)
    prune_checkpoints(ckpt_dir, max_keep)


def list_checkpoints(ckpt_dir):
    ckpt_dir = pathlib.Path(ckpt_dir)
    if not ckpt_dir.exists():
        return []
    steps = []
    for p in ckpt_dir.iterdir():
        m = re.fullmatch(r"step_(\d+)", p.name)
        if m:
            steps.append((int(m.group(1)), p))
    return sorted(steps)


def prune_checkpoints(ckpt_dir, max_keep: int):
    import shutil

    ckpts = list_checkpoints(ckpt_dir)
    for _, p in ckpts[:-max_keep]:
        shutil.rmtree(p, ignore_errors=True)


def restore_latest(ckpt_dir, example_state):
    """Newest-checkpoint auto-resume; returns (state, step) or (None, -1)."""
    ckpts = list_checkpoints(ckpt_dir)
    if not ckpts:
        return None, -1
    step, path = ckpts[-1]
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, example_state)
    return state, step


def restore_checkpoint(path, example_state):
    """Restore one specific step_NNNNNNNN checkpoint directory; returns
    (state, step). Used by the post-train last-N evaluation
    (pcdet tools/train.py:179-195 repeat_eval_ckpt analog)."""
    path = pathlib.Path(path).absolute()
    m = re.fullmatch(r"step_(\d+)", path.name)
    step = int(m.group(1)) if m else -1
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, example_state)
    return state, step


# ---------------------------------------------------------------------------
# torch .pth import


def load_torch_state_dict(path) -> dict[str, np.ndarray]:
    """Load a reference checkpoint's model_state as numpy arrays."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state", blob.get("state_dict", blob))
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def assign_from_torch(params: Any, mapping: dict[str, tuple[str, str]],
                      torch_sd: dict[str, np.ndarray]):
    """Generic assignment: mapping['flax/path/to/leaf'] = (torch_key, kind)
    where kind in {'dense', 'conv', 'conv1x1', 'norm', 'raw', 'taps'}.

    kinds transpose torch layouts to flax:
      dense   (out,in)        -> (in,out)
      conv    (out,in,kh,kw)  -> (kh,kw,in,out)
      taps    (out,in,kz,ky,kx) -> (K, in, out)  [sparse conv taps, row-major]
      raw     copied as-is
    """
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])

    def put(tree, path, val):
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node[k]
        want = node[keys[-1]]
        assert want.shape == val.shape, (path, want.shape, val.shape)
        node[keys[-1]] = val.astype(np.asarray(want).dtype)

    tree = jax.tree_util.tree_map(np.asarray, params)
    for fpath, (tkey, kind) in mapping.items():
        w = torch_sd[tkey]
        if kind == "dense":
            w = w.T
        elif kind == "conv":
            w = w.transpose(2, 3, 1, 0)
        elif kind == "taps":
            o, i = w.shape[:2]
            w = w.reshape(o, i, -1).transpose(2, 1, 0)
        put(tree, fpath, w)
    return tree
