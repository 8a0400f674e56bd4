"""Static-shape sparse voxel tensors and conv plans (the spconv replacement).

Replaces the reference's vendored/pip spconv
(TransFusion/mmdet3d/ops/spconv: rulebook build in src/indice.cc +
indice_cuda.cu, gather-GEMM-scatter in reordering*.cu; Python
structure.py/conv.py/ops.py) with a TPU-native design:

  * `SparseTensor` — features (B, N, C) + coords (B, N, 3)=(z, y, x) padded
    to a static N per sample; padding rows have coords -1. The batch axis is
    a REAL array axis (never flattened), so sharding it over the data mesh
    keeps every sort/searchsorted sample-local — no cross-device collectives
    inside the backbone under data parallelism.
  * `build_subm_plan` / `build_conv_plan` — the rulebook: for every output
    site and kernel tap, the row index of the contributing input (or N for
    "none"). Pure XLA sort/searchsorted, vmapped over the batch; computed
    once per coords-set and reused across layers exactly like spconv's
    indice_key.
  * `apply_sparse_conv` — gather-GEMM-scatter as a lax.scan of K dense
    matmuls on the MXU with masked gathers; no scatter conflicts because
    the formulation PULLS into output rows.

Submanifold semantics match SubMConv3d (output sites == input sites);
strided SparseConv3d generates the union of reachable output sites
(deduped via sort-unique into a static max_out buffer).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from df3d.ops import keytable

_INT_MAX = jnp.iinfo(jnp.int32).max


def _triple(v) -> tuple[int, int, int]:
    return (v, v, v) if isinstance(v, int) else tuple(v)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseTensor:
    """Batched sparse voxel tensor with static per-sample row count.

    `rows_sorted` declares that valid rows are sorted ascending by spatial
    key within each sample (padding last) — true for everything produced by
    ops/voxelize.py and by strided conv plans. It unlocks the fast paths in
    the plan builders (rank == row id) and the x-window conv gathers."""

    features: jax.Array  # (B, N, C)
    coords: jax.Array    # (B, N, 3) int32 (z, y, x); -1 rows are padding
    spatial_shape: tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    rows_sorted: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def valid(self) -> jax.Array:  # (B, N)
        return self.coords[..., 0] >= 0

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]

    @property
    def num_rows(self) -> int:
        return self.features.shape[1]

    def with_features(self, features: jax.Array) -> "SparseTensor":
        return dataclasses.replace(self, features=features)

    def keys(self) -> jax.Array:
        """(B, N) linearized spatial keys; padding rows -> INT_MAX."""
        z, y, x = self.spatial_shape
        assert z * y * x < 2**31, "int32 key overflow"
        c = self.coords
        key = (c[..., 0] * y + c[..., 1]) * x + c[..., 2]
        return jnp.where(self.valid, key, _INT_MAX)

    def to_dense(self) -> jax.Array:
        """-> (B, Z, Y, X, C) dense tensor."""
        z, y, x = self.spatial_shape
        c = self.features.shape[-1]

        def one(feats, keys, valid):
            flat = jnp.zeros((z * y * x, c), feats.dtype)
            k = jnp.where(valid, keys, z * y * x)
            return flat.at[k].set(feats, mode="drop").reshape(z, y, x, c)

        return jax.vmap(one)(self.features, self.keys(), self.valid)


def _kernel_offsets(ksize: Sequence[int]) -> jnp.ndarray:
    """(K, 3) int32 offsets in (z, y, x), row-major like spconv."""
    kz, ky, kx = ksize
    oz, oy, ox = jnp.meshgrid(
        jnp.arange(kz), jnp.arange(ky), jnp.arange(kx), indexing="ij"
    )
    return jnp.stack([oz, oy, ox], axis=-1).reshape(-1, 3).astype(jnp.int32)


# Budget (bytes) for the per-sample word-rank key table (ops/keytable.py:
# [bit word, rank prefix] per 32 grid cells — ~21 MB at nuScenes
# 0.075-voxel scale). Above budget, fall back to searchsorted over the
# per-sample sorted keys.
_TABLE_BUDGET = 2 << 30


def _use_bitrank(batch: int, cells: int) -> bool:
    return batch * keytable.num_words(cells) * 8 <= _TABLE_BUDGET


def _lookup(sorted_keys, query, row_of_sorted, n):
    """Rows whose key == query; n ('no match') points at the zero pad row."""
    pos = jnp.searchsorted(sorted_keys, query, method="scan_unrolled")
    pos = jnp.minimum(pos, sorted_keys.shape[0] - 1)
    found = sorted_keys[pos] == query
    return jnp.where(found, row_of_sorted[pos], n)


def _rank_to_row(rank, keys, n, rows_sorted):
    """Map bitrank ranks (position among present keys, miss == n) to row
    ids. With the sorted-rows invariant rank IS the row id; otherwise one
    small gather through the argsort permutation."""
    if rows_sorted:
        return rank
    order = jnp.argsort(keys)  # padding keys are INT_MAX -> sorted last
    order_pad = jnp.concatenate(
        [order.astype(jnp.int32), jnp.array([n], jnp.int32)]
    )
    return order_pad[jnp.minimum(rank, n)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConvPlan:
    """Gather plan: for each sample, kernel tap and output row, the input row
    index (or N_in for 'no contribution'). TAP-MAJOR (B, K, N_out): every
    per-tap slice is a full-lane (N,) vector, and the conv body consumes it
    without a transpose. Reusable across layers with identical coords — the
    analog of spconv's indice_key."""

    gather_idx: jax.Array  # (B, K, N_out) int32 in [0, N_in]
    out_coords: jax.Array  # (B, N_out, 3) int32
    out_spatial_shape: tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    kernel_size: tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    out_rows_sorted: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def num_taps(self) -> int:
        return self.gather_idx.shape[1]


def _centered_offsets(ksize):
    """Static python list of (dz, dy, dx) tap offsets, row-major like
    spconv."""
    kz, ky, kx = ksize
    return [
        (dz - (kz - 1) // 2, dy - (ky - 1) // 2, dx - (kx - 1) // 2)
        for dz in range(kz) for dy in range(ky) for dx in range(kx)
    ]


def build_subm_plan(st: SparseTensor, ksize) -> ConvPlan:
    """Submanifold plan: output sites = input sites; neighbor at tap k is
    input site + k - (ksize-1)//2.

    Perf (v5e): neighbor membership/rank comes from the word-rank table
    (keytable.py) — one ~2-5 ns row gather per query instead of one
    ~11-13 ns random HBM gather into a 332 MB dense table (round 1).
    Queries are generated per tap as (N,)-shaped vector ops with STATIC key
    offsets — materializing an (N, K, 3) neighbor tensor puts 3 in the vreg
    minor dim and wastes 125/128 lanes (measured ~2x the whole plan cost).
    The center tap is the identity (no lookup). Valid rows must have UNIQUE
    keys.
    """
    ksize = _triple(ksize)
    z, y, x = st.spatial_shape
    n = st.num_rows
    k_total = ksize[0] * ksize[1] * ksize[2]
    assert k_total % 2 == 1, "submanifold kernels must be odd-sized"
    center = k_total // 2
    offs = _centered_offsets(ksize)

    cells = z * y * x
    use_bitrank = _use_bitrank(st.batch_size, cells)
    ar = jnp.arange(n, dtype=jnp.int32)

    def one(coords, keys, valid):
        cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]
        qs, oks = [], []
        for t, (dz, dy, dx) in enumerate(offs):
            if t == center:
                continue
            ok_t = valid
            if dz:
                ok_t = ok_t & (cz + dz >= 0) & (cz + dz < z)
            if dy:
                ok_t = ok_t & (cy + dy >= 0) & (cy + dy < y)
            if dx:
                ok_t = ok_t & (cx + dx >= 0) & (cx + dx < x)
            qs.append(keys + ((dz * y + dy) * x + dx))
            oks.append(ok_t)
        q = jnp.stack(qs).reshape(-1)    # ((K-1)*N,) tap-major
        ok = jnp.stack(oks).reshape(-1)
        if use_bitrank:
            packed = keytable.pack_keys(keys, valid, cells)
            rank = keytable.lookup(packed, q, ok, n)
            rows = _rank_to_row(rank, keys, n, st.rows_sorted)
        else:
            order = jnp.argsort(keys)
            rows = _lookup(
                keys[order], jnp.where(ok, q, _INT_MAX - 1), order, n
            )
        rows = rows.reshape(k_total - 1, n)
        ident = jnp.where(valid, ar, n)[None]
        return jnp.concatenate(
            [rows[:center], ident, rows[center:]], axis=0
        )

    gather = jax.vmap(one)(st.coords, st.keys(), st.valid)
    return ConvPlan(
        gather, st.coords, st.spatial_shape, ksize,
        out_rows_sorted=st.rows_sorted,
    )


def build_conv_plan(st: SparseTensor, ksize, stride, padding, max_out: int) -> ConvPlan:
    """Strided sparse conv plan (SparseConv3d semantics).

    Output sites: all o with o*stride - padding + k == some input site for
    some tap k, deduped per sample. Then for each output and tap, gather the
    input at i = o*stride - padding + k.
    """
    ksize, stride, padding = _triple(ksize), _triple(stride), _triple(padding)
    z, y, x = st.spatial_shape
    oz = (z + 2 * padding[0] - ksize[0]) // stride[0] + 1
    oy = (y + 2 * padding[1] - ksize[1]) // stride[1] + 1
    ox = (x + 2 * padding[2] - ksize[2]) // stride[2] + 1
    assert min(oz, oy, ox) > 0, (
        f"conv collapses spatial shape {st.spatial_shape} -> {(oz, oy, ox)}"
    )
    assert oz * oy * ox < 2**31
    n = st.num_rows

    k_count = ksize[0] * ksize[1] * ksize[2]
    cells_out = oz * oy * ox
    dense_out = _use_bitrank(st.batch_size, cells_out)

    # per-dim candidate count: o in [ceil((i+pad-ks+1)/s), floor((i+pad)/s)]
    # has at most ceil(ks/s) integers — enumerate those instead of all K taps
    ncand = tuple(-(-k // s) for k, s in zip(ksize, stride))
    cand_list = [
        (az, ay, ax)
        for az in range(ncand[0]) for ay in range(ncand[1])
        for ax in range(ncand[2])
    ]

    def one(coords, keys, valid):
        # candidate outputs per input site, generated per static combo as
        # (N,)-shaped vector ops (an (N, C, 3) tensor puts 3 in the vreg
        # minor dim — measured ~2x the whole plan cost)
        tz = coords[:, 0] + padding[0]
        ty = coords[:, 1] + padding[1]
        tx = coords[:, 2] + padding[2]
        o0z, o0y, o0x = tz // stride[0], ty // stride[1], tx // stride[2]
        ckeys, taps = [], []
        for az, ay, ax in cand_list:
            co_z, co_y, co_x = o0z - az, o0y - ay, o0x - ax
            rz = tz - co_z * stride[0]
            ry = ty - co_y * stride[1]
            rx = tx - co_x * stride[2]
            ok_c = (
                valid
                & (rz < ksize[0]) & (ry < ksize[1]) & (rx < ksize[2])
                & (co_z >= 0) & (co_y >= 0) & (co_x >= 0)
                & (co_z < oz) & (co_y < oy) & (co_x < ox)
            )  # residuals are >= 0 by construction of the floor-div
            ckeys.append(jnp.where(
                ok_c, (co_z * oy + co_y) * ox + co_x, _INT_MAX))
            taps.append((rz * ksize[1] + ry) * ksize[2] + rx)
        cand_key = jnp.stack(ckeys).reshape(-1)  # (C*N,) candidate-major
        tap = jnp.stack(taps).reshape(-1)

        if dense_out:
            # dedup + plan by SCATTER (no input-side table at all):
            # byte occupancy -> word-rank table (keytable.py) -> rank per
            # candidate from one row gather (round 1 cumsum'd an int32
            # prefix over every output cell — 43 MB of random HBM gathers
            # at down2 scale). The (input row, tap) pairs per output are
            # unique, so both the out_key and the gather plan are plain
            # drop-mode scatters.
            live0 = cand_key != _INT_MAX
            occ = jnp.zeros((cells_out,), bool).at[
                jnp.where(live0, cand_key, cells_out)
            ].set(True, mode="drop")
            packed = keytable.pack_occupancy(occ, cells_out)
            rank = keytable.lookup(
                packed, jnp.minimum(cand_key, cells_out - 1), live0,
                max_out,
            )
            live = live0 & (rank < max_out)
            slot = jnp.where(live, rank, max_out)
            out_key = jnp.full((max_out + 1,), _INT_MAX, jnp.int32).at[
                slot
            ].set(cand_key.astype(jnp.int32), mode="drop")[:max_out]

            # tap-major plan: flat slot = tap * max_out + rank
            flat_pos = jnp.where(
                live, jnp.clip(tap, 0, k_count - 1) * max_out + slot,
                max_out * k_count,
            )
            rows_src = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None],
                (len(cand_list), n),
            ).reshape(-1)
            gidx = jnp.full((max_out * k_count + 1,), n, jnp.int32).at[
                flat_pos
            ].set(rows_src, mode="drop")[:-1]

            ovalid = out_key != _INT_MAX
            k_ = jnp.where(ovalid, out_key, 0)
            cx = k_ % ox
            k_ = k_ // ox
            cy = k_ % oy
            cz = k_ // oy
            out_coords = jnp.where(
                ovalid[:, None],
                jnp.stack([cz, cy, cx], -1).astype(jnp.int32), -1,
            )
            return gidx.reshape(k_count, max_out), out_coords

        skey = jnp.sort(cand_key)
        first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
        first &= skey != _INT_MAX
        uid = jnp.cumsum(first.astype(jnp.int32)) - 1
        # duplicate slots carry identical skey values and INT_MAX rows
        # sit at the end, so the index vector stays nondecreasing
        slot = jnp.where(
            skey != _INT_MAX, jnp.minimum(uid, max_out), max_out
        )
        out_key = jnp.full((max_out,), _INT_MAX, jnp.int32).at[slot].set(
            skey, mode="drop", indices_are_sorted=True
        )

        ovalid = out_key != _INT_MAX
        k_ = jnp.where(ovalid, out_key, 0)
        cx = k_ % ox
        k_ = k_ // ox
        cy = k_ % oy
        cz = k_ // oy
        out_coords = jnp.where(
            ovalid[:, None], jnp.stack([cz, cy, cx], -1).astype(jnp.int32), -1
        )

        # gather rule: input coord = o*stride - pad + k (tap-major)
        order = jnp.argsort(keys)
        skeys = keys[order]
        qs, oks = [], []
        for t, (dz, dy, dx) in enumerate(
            (a, b, c)
            for a in range(ksize[0]) for b in range(ksize[1])
            for c in range(ksize[2])
        ):
            sz_ = cz * stride[0] - padding[0] + dz
            sy_ = cy * stride[1] - padding[1] + dy
            sx_ = cx * stride[2] - padding[2] + dx
            ok_t = (
                ovalid
                & (sz_ >= 0) & (sz_ < z) & (sy_ >= 0) & (sy_ < y)
                & (sx_ >= 0) & (sx_ < x)
            )
            qs.append((sz_ * y + sy_) * x + sx_)
            oks.append(ok_t)
        q = jnp.stack(qs).reshape(-1)
        ok = jnp.stack(oks).reshape(-1)
        gidx = _lookup(skeys, jnp.where(ok, q, _INT_MAX - 1), order, n)
        return gidx.reshape(k_count, max_out), out_coords

    gather, out_coords = jax.vmap(one)(st.coords, st.keys(), st.valid)
    return ConvPlan(
        gather, out_coords, (oz, oy, ox), ksize, out_rows_sorted=True,
    )


# Optional compute dtype for the conv taps (e.g. jnp.bfloat16): halves HBM
# traffic for the gathers and uses the MXU's bf16 path; accumulation stays
# f32. Set via set_compute_dtype() (bench/serving); None = input dtype.
_COMPUTE_DTYPE = None


def set_compute_dtype(dtype):
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def apply_sparse_conv(features: jax.Array, plan: ConvPlan, weights: jax.Array,
                      precision=None) -> jax.Array:
    """Gather-GEMM conv body (pull formulation, no scatter).

    features (B, N_in, Cin); weights (K, Cin, Cout) with K = prod(kernel)
    in the same row-major (z, y, x) tap order as the plan.
    Returns (B, N_out, Cout).

    Perf (v5e, 120k x 16 x 27 taps): ONE flat lax.gather of all (B*K*N_out)
    rows + one im2col GEMM = 5.8 ms vs 13.1 ms for a take_along_axis scan —
    the raw lax.gather HLO (collapsed dims, clip mode) lowers ~2x better
    than take_along_axis's batched form, and the single call lets XLA
    pipeline everything into the MXU matmul. (Windowed multi-tap gathers,
    widened-operand windows and take_along_axis forms were all probed and
    LOSE — tools/probes/r2_probe*.py: only this exact single-row gather
    shape hits XLA:TPU's fast path.)
    """
    b, n_in, cin = features.shape
    if _COMPUTE_DTYPE is not None:
        features = features.astype(_COMPUTE_DTYPE)
        weights = weights.astype(_COMPUTE_DTYPE)
    k, n_out = plan.gather_idx.shape[1:]

    padded = jnp.concatenate(
        [features, jnp.zeros((b, 1, cin), features.dtype)], axis=1
    ).reshape(b * (n_in + 1), cin)

    # plans are tap-major already; add per-sample base offsets
    idx = plan.gather_idx + (
        jnp.arange(b, dtype=jnp.int32) * (n_in + 1)
    )[:, None, None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    g = jax.lax.gather(
        padded, idx.reshape(-1, 1), dnums, slice_sizes=(1, cin), mode="clip"
    ).reshape(b, k, n_out, cin)
    out = jnp.einsum(
        "bknc,kcd->bnd", g, weights,
        preferred_element_type=jnp.float32, precision=precision,
    )
    return out.astype(features.dtype)
