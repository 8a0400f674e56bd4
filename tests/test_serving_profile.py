"""The serving-profile knob (df3d/serving.py) must be the same switch the
bench uses: profile application sets the ops-level compute-dtype globals
(individually covered by tests/test_sparse_conv.py::*bf16* and
tests/test_centerpoint_e2e.py::*bf16*) and selects the voxelize method."""

import jax.numpy as jnp

from df3d import serving
from df3d.models import layers as L
from df3d.ops import sparse as sp


def test_tpu_v5e_profile_sets_globals_and_exact_resets():
    try:
        p = serving.apply_profile("tpu_v5e")
        assert p.vox_method == "sort"  # probe 20: bitrank loses e2e
        assert sp._COMPUTE_DTYPE == jnp.bfloat16
        assert sp._COMPUTE_DTYPE_MIN_CH == 32
        assert L._COMPUTE_DTYPE_2D is None  # bf16 tail was a wash (probe 19d)

        p = serving.apply_profile("exact")
        assert p.vox_method == "sort"
        assert sp._COMPUTE_DTYPE is None
        assert L._COMPUTE_DTYPE_2D is None
    finally:
        serving.apply_profile("exact")


def test_profiles_registry_is_consistent():
    for name, p in serving.PROFILES.items():
        assert p.name == name
        assert p.vox_method in ("sort", "bitrank")
        assert p.conv_dtype in ("float32", "bfloat16")
