"""Dense 3D grid ops for the backbone's dense tail.

TPU-first design note (r3 probes 10/11): sparse gather-GEMM convs are
gather-ISSUE bound at ~2 ns/row on the v5e, and strided-plan builds cost
tens of ms. At stage-4 scale ((6,180,180) grid, 128 channels, ~15%
occupancy) a DENSE bf16 conv runs the MXU near peak (1.1 ms vs ~2.5 ms
sparse PLUS ~13 ms of plan builds), so the backbone switches
representation there: scatter the sparse rows into the dense grid once and
run plain XLA convs with masked BatchNorm. Bonus: dense strided convs have
EXACT spconv dilation semantics (reference spconv never truncates —
TransFusion/mmdet3d/ops/spconv/src/indice.cc allocates dynamically), so
the stage-cap overflow risk (VERDICT r2 missing #3) vanishes for dense
stages. Equivalents of the reference's stage-4 spconv stacks:
CenterPoint/det3d/models/backbones/scn.py:150-168, mmdet3d
sparse_encoder.py stage 4.

Conventions match df3d.ops.sparse: channel-last (B, Z, Y, X, C), the
active-site mask rides along; submanifold conv = dense conv X output mask;
strided conv's new mask = any-pool dilation of the input mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from df3d.ops import sparse as _sparse
from df3d.ops.sparse import _triple


def set_compute_dtype(dtype):
    """One knob for the whole 3D backbone: delegates to ops.sparse so the
    sparse gather-GEMM taps and the dense-tail convs can't drift apart
    (accumulation stays f32 via preferred_element_type either way)."""
    _sparse.set_compute_dtype(dtype)


_DN = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NZYXC", "ZYXIO", "NZYXC"))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseTensor:
    """Dense twin of SparseTensor for the backbone tail: features
    (B, Z, Y, X, C) with an active-site mask (B, Z, Y, X)."""

    features: jax.Array
    mask: jax.Array

    @property
    def spatial_shape(self):
        return tuple(self.features.shape[1:4])

    @property
    def batch_size(self):
        return self.features.shape[0]

    @property
    def valid(self):
        """Alias so layer modules (MaskedBatchNorm call sites) treat dense
        and sparse tensors uniformly."""
        return self.mask

    def with_features(self, feats: jax.Array) -> "DenseTensor":
        return DenseTensor(feats, self.mask)


@dataclasses.dataclass(frozen=True)
class DenseConvSpec:
    """Plan-free stand-in for ConvPlan on the dense tail: just the static
    conv geometry. Passed where a ConvPlan would go so the layer modules
    (SubMConv3d / SparseConv3d / blocks) dispatch on tensor type with
    UNCHANGED parameter trees (same (K, Cin, Cout) kernels -> checkpoints
    and torch importers are representation-agnostic)."""

    ksize: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)

    @property
    def num_taps(self):
        kz, ky, kx = self.ksize
        return kz * ky * kx


def densify(st, dtype=None) -> DenseTensor:
    """SparseTensor (B, N, C) + coords -> DenseTensor. Padding rows
    (coords -1) are dropped by clip+mask."""
    z, y, x = st.spatial_shape
    b, n, c = st.features.shape
    dtype = dtype or st.features.dtype
    keys = st.keys()  # (B, N) int32
    valid = st.valid
    cells = z * y * x
    flat_idx = jnp.where(valid, keys, cells)
    # python-unrolled over the (small) batch, like ops.sparse plan builds
    fs, ms = [], []
    for bi in range(b):
        f = jnp.zeros((cells + 1, c), dtype).at[flat_idx[bi]].set(
            st.features[bi].astype(dtype), mode="drop")
        m = jnp.zeros((cells + 1,), bool).at[flat_idx[bi]].set(
            valid[bi], mode="drop")
        fs.append(f[:cells].reshape(z, y, x, c))
        ms.append(m[:cells].reshape(z, y, x))
    return DenseTensor(jnp.stack(fs), jnp.stack(ms))


def sparsify(dt: DenseTensor, max_rows: int):
    """DenseTensor -> SparseTensor with a static row cap, rows key-sorted,
    padding (coords -1) last — the same invariants ops.sparse relies on.
    Compaction is a cumsum + sorted drop-mode scatter over the dense grid
    (r3 probe 11: ~ms-scale at tail-grid sizes)."""
    from df3d.ops.sparse import SparseTensor

    z, y, x = dt.spatial_shape
    b = dt.batch_size
    c = dt.features.shape[-1]
    cells = z * y * x
    flat_m = dt.mask.reshape(b, cells)
    flat_f = dt.features.reshape(b, cells, c)

    # python-unrolled batch (vmap rewrites scatter/gather dnums off the
    # v5e fast path — CLAUDE.md rule 7)
    all_coords, all_feats = [], []
    for bi in range(b):
        m, f = flat_m[bi], flat_f[bi]
        rank = jnp.cumsum(m.astype(jnp.int32)) - 1
        # overflow rows (rank >= max_rows) go to the drop slot, NOT slot
        # max_rows-1 (which would overwrite the legitimately-kept row);
        # no indices_are_sorted hint — the max_rows sentinels interleave
        # with the ranks, so the sequence is not nondecreasing (and v5e
        # scatters don't reward the hint anyway, CLAUDE.md rule 8)
        slot = jnp.where(m & (rank < max_rows), rank, max_rows)
        key_of = jnp.full((max_rows + 1,), -1, jnp.int32).at[slot].set(
            jnp.arange(cells, dtype=jnp.int32), mode="drop",
        )[:-1]
        ok = key_of >= 0
        k = jnp.maximum(key_of, 0)
        coords = jnp.where(
            ok[:, None],
            jnp.stack([k // (y * x), (k // x) % y, k % x], -1), -1,
        ).astype(jnp.int32)
        all_coords.append(coords)
        all_feats.append(f[k] * ok[:, None].astype(f.dtype))
    return SparseTensor(
        jnp.stack(all_feats), jnp.stack(all_coords), (z, y, x),
        rows_sorted=True,
    )


def dense_conv(dt: DenseTensor, w_taps: jax.Array, ksize, stride=1,
               padding=1, subm: bool = True) -> DenseTensor:
    """Apply a conv with sparse-layout weights (K, Cin, Cout) on the dense
    grid. subm=True: submanifold semantics (output masked to the input's
    active set). subm=False: spconv SparseConv3d semantics (output active
    set = dilated input mask — exact, uncapped)."""
    ksize = _triple(ksize)
    stride = _triple(stride)
    padding = _triple(padding)
    kz, ky, kx = ksize
    cin, cout = w_taps.shape[1:]
    w = w_taps.reshape(kz, ky, kx, cin, cout)
    x = dt.features
    cd = _sparse._COMPUTE_DTYPE
    if cd is not None:
        x, w = x.astype(cd), w.astype(cd)
    pads = tuple((p, p) for p in padding)
    out = lax.conv_general_dilated(
        x, w, stride, pads, dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    ).astype(dt.features.dtype)
    if subm:
        assert stride == (1, 1, 1)
        mask = dt.mask
    else:
        mask = lax.reduce_window(
            dt.mask, False, lax.bitwise_or, (1, kz, ky, kx),
            (1,) + stride, ((0, 0),) + pads,
        )
    return DenseTensor(out * mask[..., None].astype(out.dtype), mask)


def bev_from_dense(dt: DenseTensor) -> jax.Array:
    """(B, Z, Y, X, C) -> (B, Y, X, Z*C) (HeightCompression on the dense
    tail — no to_dense scatter needed)."""
    x = dt.features * dt.mask[..., None].astype(dt.features.dtype)
    b, z, y, xx, c = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(b, y, xx, z * c)
