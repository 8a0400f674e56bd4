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
    ops/voxelize.py and by strided conv plans. It unlocks the fast path in
    the plan builders (rank == row id)."""

    features: jax.Array  # (B, N, C)
    coords: jax.Array    # (B, N, 3) int32 (z, y, x); -1 rows are padding
    spatial_shape: tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    rows_sorted: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Optional pre-built word-rank occupancy table (keytable.py) over this
    # tensor's grid: (B, num_blocks(prod(spatial_shape)), 16) int32. Ranks
    # count the TRUE occupancy (possibly beyond the static row cap) in key
    # order, so under `rows_sorted` a rank < N IS the row id and rank >= N
    # is a truncated cell (no row). Producers: ops/voxelize.py bitrank
    # method, strided conv plans (ConvPlan.out_packed). build_subm_plan
    # reuses it instead of re-packing the keys (~1-2 ms per stage at
    # nuScenes scale). `packed_table_grid` records the (Z, Y, X) grid the
    # table was built over; the reuse guard requires it to equal THIS
    # tensor's spatial_shape exactly — different factorizations of the
    # same cell/block count linearize keys differently, and a weaker
    # block-count-only match would silently yield wrong gather rows
    # (ADVICE r3).
    packed_table: jax.Array | None = None
    packed_table_grid: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True))

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


# Budget (bytes) for the per-sample block-rank key table (ops/keytable.py:
# one 64B [prefix, bit words] row per 448 grid cells — ~12 MB at nuScenes
# 0.075-voxel scale). Above budget, fall back to searchsorted over the
# per-sample sorted keys.
_TABLE_BUDGET = 2 << 30


def _use_bitrank(batch: int, cells: int) -> bool:
    return batch * keytable.num_blocks(cells) * 64 <= _TABLE_BUDGET


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


# NOTE (round 4): the round-3 "x3" x-triple conv machinery (serve each
# (dz, dy) tap group with ONE gather from a width-3C triple table) was
# REMOVED. It won every isolated probe (triple9 2.0 vs flat27 6.2 ms at
# stage 1, r3 probe 7) but cost +23 ms IN-MODEL on the v5e (r3 probe 9:
# 203.4 vs 180.4 ms e2e) — a composition effect that survived a packed->
# tuple plan refactor, producer barriers, and three bisect rounds. The
# finding (and the builder design: per-tap rank arithmetic on consecutive
# keys, _x3_from_tap_rows at git tag/commits around f8eec46) lives in
# CLAUDE.md; re-derive from history if a future chip changes the math.

# Reuse pre-built SparseTensor.packed_table in build_subm_plan (skips the
# per-stage pack_keys rebuild). Exact — same ranks either way; toggleable
# for A/B probes only (the x3 lesson: isolated wins can compose badly).
PLAN_TABLE_REUSE = True


def set_plan_table_reuse(flag: bool) -> None:
    global PLAN_TABLE_REUSE
    PLAN_TABLE_REUSE = flag


# Subm-conv center-tap identity optimization (r5): the conv BODY skips the
# center tap's feature gather and applies W_center as a masked matmul
# (probe 2: 5.17 vs 5.41 ms per st1 conv — a real if small win). The PLAN
# side must still LOOK UP all 27 taps: skipping the center lookup and
# splicing an arange stream into the flat plan re-layouts the hot int
# stream and TRIPLED every subm plan build (probe 2: st1 34.6 vs 10.6 ms,
# st2 23.6 vs 6.7 — CLAUDE.md v5e rule 5; same lesson as the r3 x3 paths).
CENTER_IDENTITY = True


def set_center_identity(flag: bool) -> None:
    global CENTER_IDENTITY
    CENTER_IDENTITY = flag


PALLAS_V2_CONV = False


def set_pallas_conv(flag: bool) -> None:
    """Route conv bodies through the whole-table Mosaic kernel
    (ops/pallas/sparse_conv_kernel.py v2). Off by default pending the
    on-chip rate probe (tools/probes/r3_probe14.py)."""
    global PALLAS_V2_CONV
    PALLAS_V2_CONV = flag


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConvPlan:
    """Gather plan: for each sample, kernel tap and output row, the input row
    index (or N_in for 'no contribution'). Stored tap-major and FLAT
    (B, K*N_out): reshaping the flat lookup stream into a (K, N) 2D array
    changes the TPU tiling (T(1024) -> T(8,128)) and measured ~30 ms at
    nuScenes scale — and the conv body consumes flat indices anyway.
    Reusable across layers with identical coords — the analog of spconv's
    indice_key."""

    gather_idx: jax.Array  # (B, K*N_out) int32 in [0, N_in], tap-major
    out_coords: jax.Array  # (B, N_out, 3) int32
    out_spatial_shape: tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    kernel_size: tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    out_rows_sorted: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Submanifold plans: the center tap is the IDENTITY map (gather row r ==
    # r where valid, else miss) — gather_idx still carries the full K tap
    # groups (consumers/pallas unchanged; the BUILDER also still looks all
    # K up — skipping the center lookup re-layouts the flat stream and
    # tripled plan builds, r5 probe 2), but apply_sparse_conv skips the
    # center group's feature gather (1/K of the conv-body rows) and applies
    # W_center as a direct masked matmul instead (probe 2: small real win).
    center_identity: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # strided plans: TRUE dilated output occupancy per sample BEFORE the
    # static cap (spconv never truncates — indice.cc allocates dynamically;
    # this makes df3d's cap overflow observable: overflow = max(0,
    # true_occ - N_out); see CLAUDE.md stage-cap fidelity note)
    true_occ: jax.Array | None = None  # (B,) int32, or None (subm plans)
    # PALLAS_V2_CONV only: (B, K, N_in+1) tap-major rows pre-padded to the
    # kernel's table height, built ONCE per plan behind the same barrier.
    # The flat->(K, N) retiling of a ~3M-int stream costs ~30 ms (v5e rule
    # 5); paying it per-plan instead of per-conv amortizes it across every
    # layer sharing the plan.
    idx2d: jax.Array | None = None
    # strided dense-occupancy plans: the packed word-rank table of the
    # OUTPUT grid (B, num_blocks(prod(out_spatial_shape)), 16) — a free
    # byproduct of the parity-plane occupancy step. Attached to the output
    # SparseTensor (layers.SparseConv3d) so the next stage's subm plan
    # skips its pack_keys build.
    out_packed: jax.Array | None = None

    @property
    def num_taps(self) -> int:
        k = self.kernel_size
        return k[0] * k[1] * k[2]

    @property
    def num_out_rows(self) -> int:
        return self.gather_idx.shape[1] // self.num_taps

    def gather_idx_2d(self) -> jax.Array:
        """(B, K, N_out) view for tests/debug (pays a relayout on TPU)."""
        return self.gather_idx.reshape(
            self.gather_idx.shape[0], self.num_taps, -1)


def _maybe_idx2d(gather: jax.Array, k: int, n_in: int):
    """(B, K*N_out) -> (B, K, N_in+1) pre-padded for the v2 pallas kernel
    (pad queries point at the miss/zero row n_in). None unless the pallas
    route is enabled, or when N_out exceeds the table height (the
    whole-table permutation kernel requires N_out <= N_in+1)."""
    if not PALLAS_V2_CONV:
        return None
    b = gather.shape[0]
    n_out = gather.shape[1] // k
    if n_out > n_in + 1:
        return None
    g2 = gather.reshape(b, k, n_out)
    if n_out < n_in + 1:
        g2 = jnp.pad(g2, ((0, 0), (0, 0), (0, n_in + 1 - n_out)),
                     constant_values=n_in)
    return g2


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
    Valid rows must have UNIQUE keys.
    """
    ksize = _triple(ksize)
    z, y, x = st.spatial_shape
    n = st.num_rows
    k_total = ksize[0] * ksize[1] * ksize[2]
    assert k_total % 2 == 1, "submanifold kernels must be odd-sized"
    offs = _centered_offsets(ksize)

    cells = z * y * x
    use_bitrank = _use_bitrank(st.batch_size, cells)

    # pre-built table reuse: ranks in a producer-supplied table count the
    # TRUE (uncapped) occupancy, so rank >= n means "cell occupied but its
    # row was truncated" -> clamp to the miss row. Requires the sorted-rows
    # invariant (rank == row id) and a table built over EXACTLY this
    # tensor's grid (cell/block counts collide across (Z, Y, X)
    # factorizations — ADVICE r3).
    reuse = (
        PLAN_TABLE_REUSE and use_bitrank and st.rows_sorted
        and st.packed_table is not None
        and st.packed_table_grid == tuple(st.spatial_shape)
    )

    center_identity = CENTER_IDENTITY

    def one(coords, keys, valid, pre_packed):
        cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]
        qs, oks = [], []
        for dz, dy, dx in offs:
            ok_t = valid
            if dz:
                ok_t = ok_t & (cz + dz >= 0) & (cz + dz < z)
            if dy:
                ok_t = ok_t & (cy + dy >= 0) & (cy + dy < y)
            if dx:
                ok_t = ok_t & (cx + dx >= 0) & (cx + dx < x)
            qs.append(keys + ((dz * y + dy) * x + dx))
            oks.append(ok_t)
        q = jnp.stack(qs).reshape(-1)    # (K*N,) tap-major, stays FLAT
        ok = jnp.stack(oks).reshape(-1)
        if use_bitrank:
            if pre_packed is not None:
                rank = keytable.lookup(pre_packed, q, ok, n)
                rows = jnp.minimum(rank, n)
            else:
                packed = keytable.pack_keys(keys, valid, cells)
                rank = keytable.lookup(packed, q, ok, n)
                rows = _rank_to_row(rank, keys, n, st.rows_sorted)
        else:
            order = jnp.argsort(keys)
            rows = _lookup(
                keys[order], jnp.where(ok, q, _INT_MAX - 1), order, n
            )
        return rows

    # python-unrolled over the (small) batch: vmap's gather batching rule
    # rewrites the transposed-output gather off XLA:TPU's fast path
    # (measured 4x slower at nuScenes scale)
    keys_all, valid_all = st.keys(), st.valid
    gather = jnp.stack([
        one(st.coords[b], keys_all[b], valid_all[b],
            st.packed_table[b] if reuse else None)
        for b in range(st.batch_size)
    ])
    # materialize: without the barrier XLA fuses the rulebook build into
    # every consumer conv's gather-index computation, re-running the table
    # lookups once per layer that shares the plan
    idx2d = _maybe_idx2d(gather, ksize[0] * ksize[1] * ksize[2],
                         st.features.shape[1])
    parts = jax.lax.optimization_barrier(
        tuple(p for p in (gather, idx2d) if p is not None))
    parts = list(parts)
    gather = parts.pop(0)
    idx2d = parts.pop(0) if idx2d is not None else None
    return ConvPlan(
        gather, st.coords, st.spatial_shape, ksize,
        out_rows_sorted=st.rows_sorted, idx2d=idx2d,
        center_identity=center_identity,
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
    # Parity-plane safety (ADVICE r2): the occupancy scatter below indexes
    # an extended grid of odim + ncand - 1 cells per dim with the floor-div
    # cell o0 = (i + pad) // s of every VALID input i in [0, dim). If the
    # largest o0 exceeds the extended extent, the flat pidx silently crosses
    # into another parity plane's region and fabricates phantom occupied
    # cells (mode='drop' only protects the final slot). True for every
    # kernel/stride/pad combo used by the models (k3/s2 any pad, (3,1,1),
    # (2,1,1)/p0) — fail loudly on any combo where it is not.
    for d, (dim, k_, s_, p_, o_, c_) in enumerate(
        zip((z, y, x), ksize, stride, padding,
            (oz, oy, ox), ncand)
    ):
        assert not dense_out or (dim - 1 + p_) // s_ <= o_ + c_ - 2, (
            f"build_conv_plan: dim {d}: kernel={k_} stride={s_} pad={p_} "
            f"overflows the parity-plane extended grid "
            f"({(dim - 1 + p_) // s_} > {o_ + c_ - 2}); this combo would "
            "corrupt strided-plan occupancy"
        )
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
            # Output-cell occupancy WITHOUT scattering all C candidates:
            # scatter each input ONCE into (parity-plane, floor-div cell)
            # over an extended grid, then OR the statically-valid
            # (candidate shift, parity) slices — candidate a_d is reachable
            # iff r0_d + a_d*s_d < k_d where r0_d = t_d mod s_d, a static
            # predicate per (a, parity) combo. Cuts the 7 ms 8x-candidate
            # scatter at down2 scale to a 1 ms N-element scatter + vector
            # ORs. Rank per candidate then comes from the word-rank table
            # (keytable.py; round 1 cumsum'd an int32 prefix over every
            # output cell — 43 MB of random HBM gathers at down2 scale).
            live0 = cand_key != _INT_MAX
            ez = oz + ncand[0] - 1
            ey = oy + ncand[1] - 1
            ex = ox + ncand[2] - 1
            ecells = ez * ey * ex
            nplanes = stride[0] * stride[1] * stride[2]
            r0z = tz - o0z * stride[0]
            r0y = ty - o0y * stride[1]
            r0x = tx - o0x * stride[2]
            par = (r0z * stride[1] + r0y) * stride[2] + r0x
            ekey = (o0z * ey + o0y) * ex + o0x
            pidx = jnp.where(valid, par * ecells + ekey, nplanes * ecells)
            h = jnp.zeros((nplanes * ecells,), bool).at[pidx].set(
                True, mode="drop"
            ).reshape(nplanes, ez, ey, ex)
            occ4 = jnp.zeros((oz, oy, ox), bool)
            for az, ay, ax in cand_list:
                sl = h[:, az:az + oz, ay:ay + oy, ax:ax + ox]
                for p in range(nplanes):
                    pz = p // (stride[1] * stride[2])
                    py = (p // stride[2]) % stride[1]
                    px = p % stride[2]
                    if (pz + az * stride[0] >= ksize[0]
                            or py + ay * stride[1] >= ksize[1]
                            or px + ax * stride[2] >= ksize[2]):
                        continue  # this shift unreachable from this parity
                    occ4 = occ4 | sl[p]
            # 16-cell mini-rank table (r5 probe 6): the 448-cell/64B-row
            # lookup runs ~12.6 ns/query in-plan; the 8B-row mini variant
            # runs ~3.8 ns/query bit-exact AND its build replaces the
            # ~3 ms pack_occupancy (the mini table is only viable here
            # because the dense output occupancy is already materialized)
            mini = keytable.pack_mini(occ4.reshape(-1), cells_out)
            rank = keytable.lookup_mini(
                mini, jnp.minimum(cand_key, cells_out - 1), live0,
                max_out,
            )
            live = live0 & (rank < max_out)
            slot = jnp.where(live, rank, max_out)

            # gather plan by SCATTER of the (input row, tap) pairs
            # (unique per output, drop-mode). An output-side gather form
            # (27 rank lookups per output row into the input key table)
            # was probed and is ~10 ms SLOWER in-model at down2 scale
            # despite fewer indexed elements — scatters win here.
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

            # out_coords decoded FROM the plan instead of a second 960k
            # scatter (measured ~5 ms at down2 scale): every live output
            # slot has >= 1 valid tap; its input row + tap offset determine
            # the output cell exactly (resid construction).
            first_r = jnp.full((max_out,), n, jnp.int32)
            first_k = jnp.zeros((max_out,), jnp.int32)
            for t in range(k_count):
                seg = jax.lax.dynamic_slice_in_dim(
                    gidx, t * max_out, max_out)
                found = (seg < n) & (first_r == n)
                first_r = jnp.where(found, seg, first_r)
                first_k = jnp.where(found, t, first_k)
            ovalid = first_r < n
            in_key = jnp.concatenate(
                [keys, jnp.array([0], jnp.int32)])[jnp.minimum(first_r, n)]
            iz = in_key // (y * x)
            iy = (in_key // x) % y
            ix = in_key % x
            oz_ = (iz + padding[0] - first_k // (ksize[1] * ksize[2])
                   ) // stride[0]
            oy_ = (iy + padding[1] - (first_k // ksize[2]) % ksize[1]
                   ) // stride[1]
            ox_ = (ix + padding[2] - first_k % ksize[2]) // stride[2]
            out_coords = jnp.where(
                ovalid[:, None],
                jnp.stack([oz_, oy_, ox_], -1).astype(jnp.int32), -1,
            )
            true_occ = occ4.sum(dtype=jnp.int32)
            # gidx stays FLAT (K*max_out,)
            # no out_packed anymore: the 64B table was a free byproduct of
            # the rank step's pack_occupancy; with the mini table, packing
            # it would cost ~3 ms to save the next subm plan's ~0.6-0.9 ms
            # pack_keys — a strict loss (r5). Reuse still applies to the
            # voxelizer-produced stage-1 table.
            return gidx, out_coords, true_occ, None

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
        true_occ = first.sum(dtype=jnp.int32)  # uniques BEFORE the cap
        # stays FLAT (K*max_out,); no packed table on the sort fallback
        return gidx, out_coords, true_occ, None

    # python-unrolled over the batch (see build_subm_plan)
    keys_all, valid_all = st.keys(), st.valid
    outs = [
        one(st.coords[b], keys_all[b], valid_all[b])
        for b in range(st.batch_size)
    ]
    gather = jnp.stack([o[0] for o in outs])
    out_coords = jnp.stack([o[1] for o in outs])
    true_occ = jnp.stack([o[2] for o in outs])
    out_packed = (
        jnp.stack([o[3] for o in outs])
        if PLAN_TABLE_REUSE and outs[0][3] is not None else None
    )
    idx2d = _maybe_idx2d(gather, ksize[0] * ksize[1] * ksize[2],
                         st.features.shape[1])
    parts = jax.lax.optimization_barrier(
        tuple(p for p in (gather, out_coords, idx2d, out_packed)
              if p is not None))
    parts = list(parts)
    gather = parts.pop(0)
    out_coords = parts.pop(0)
    idx2d = parts.pop(0) if idx2d is not None else None
    out_packed = parts.pop(0) if out_packed is not None else None
    return ConvPlan(
        gather, out_coords, (oz, oy, ox), ksize, out_rows_sorted=True,
        true_occ=true_occ, idx2d=idx2d, out_packed=out_packed,
    )


# Optional compute dtype for the conv taps (e.g. jnp.bfloat16): halves HBM
# traffic for the gathers and uses the MXU's bf16 path; accumulation stays
# f32. Set via set_compute_dtype() (bench/serving); None = input dtype.
# min_channels gates the conversion per conv: v5e single-row gathers run
# ~2 ns/row only at >= 64B rows (CLAUDE.md layout rule 2), so bf16 HELPS
# stages whose f32 rows are >= 128B (>= 32 ch; probe 18 C: st3 64ch
# 1.72 -> 1.20 ms per 2 subm convs) and HURTS 16-ch stage 1 (64B -> 32B
# rows leaves the sweet spot). Default 64: convert only clear wins.
_COMPUTE_DTYPE = None
_COMPUTE_DTYPE_MIN_CH = 64


def set_compute_dtype(dtype, min_channels: int = 64):
    global _COMPUTE_DTYPE, _COMPUTE_DTYPE_MIN_CH
    _COMPUTE_DTYPE = dtype
    _COMPUTE_DTYPE_MIN_CH = min_channels


# Gather-based backward for SUBMANIFOLD convs (r5, VERDICT r4 #7): the
# autodiff transpose of the conv's gather is a scatter-add at 7-13 ns/row
# (v5e rule 8) — at train time the subm convs' dx scatters dominate the
# backward (~13M rows at stage 1 alone). Submanifold plans are SYMMETRIC
# (site i is j's neighbor at tap t iff j is i's neighbor at tap K-1-t,
# truncation included), so dx is exactly another apply of the SAME plan
# with reversed-transposed taps: dx = conv(dy, plan, W') with
# W'_t = W[K-1-t]^T — a 2 ns/row gather. dW re-gathers the inputs (one
# extra gather instead of storing the 27N x Cin im2col buffer).
SUBM_BWD_GATHER = True


def set_subm_bwd_gather(flag: bool) -> None:
    global SUBM_BWD_GATHER
    SUBM_BWD_GATHER = flag


_GATHER_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def _gather_rows(features, idx, n_per_sample):
    """Padded per-sample row gather: features (B, N, C), idx (B, M) in
    [0, N] with N == miss/zero row -> (B, M, C)."""
    b, n, c = features.shape
    padded = jnp.concatenate(
        [features, jnp.zeros((b, 1, c), features.dtype)], axis=1
    ).reshape(b * (n + 1), c)
    base = (jnp.arange(b, dtype=jnp.int32) * (n + 1))[:, None]
    return jax.lax.gather(
        padded, (idx + base).reshape(-1, 1), _GATHER_DN,
        slice_sizes=(1, c), mode="clip",
    ).reshape(b, idx.shape[1] // n_per_sample, n_per_sample, c)


def _subm_center_impl(features, weights, gather_idx, precision=None):
    """Center-identity subm conv forward on raw arrays (see
    apply_sparse_conv): gather K-1 taps + masked matmul for W_center."""
    b, n, cin = features.shape
    k = weights.shape[0]
    kc = k // 2
    cidx = gather_idx[:, kc * n:(kc + 1) * n]  # (B, N)
    cmask = (cidx < n).astype(features.dtype)
    idx_nc = jnp.concatenate(
        [gather_idx[:, : kc * n], gather_idx[:, (kc + 1) * n:]], axis=1)
    g = _gather_rows(features, idx_nc, n)  # (B, K-1, N, Cin)
    w_nc = jnp.concatenate([weights[:kc], weights[kc + 1:]], axis=0)
    out = jnp.einsum(
        "bknc,kcd->bnd", g, w_nc,
        preferred_element_type=jnp.float32, precision=precision,
    )
    out = out + jnp.einsum(
        "bnc,cd->bnd", features * cmask[..., None], weights[kc],
        preferred_element_type=jnp.float32, precision=precision,
    )
    return out.astype(features.dtype)


@jax.custom_vjp
def _subm_conv_sym(features, weights, gather_idx):
    return _subm_center_impl(features, weights, gather_idx)


def _subm_conv_sym_fwd(features, weights, gather_idx):
    return _subm_center_impl(features, weights, gather_idx), (
        features, weights, gather_idx)


def _subm_conv_sym_bwd(res, dy):
    features, weights, gather_idx = res
    dy = dy.astype(features.dtype)
    b, n, cin = features.shape
    k = weights.shape[0]
    kc = k // 2
    # dx via the symmetric plan: W'_t = W[K-1-t]^T (flip keeps the center
    # tap central, so the same center-identity impl applies verbatim)
    w_rev = jnp.flip(weights, axis=0).swapaxes(1, 2)
    dx = _subm_center_impl(dy, w_rev, gather_idx)
    # dW: re-gather the inputs (recompute instead of storing the im2col
    # buffer — ~177 MB at stage-1 scale)
    cidx = gather_idx[:, kc * n:(kc + 1) * n]
    cmask = (cidx < n).astype(features.dtype)
    idx_nc = jnp.concatenate(
        [gather_idx[:, : kc * n], gather_idx[:, (kc + 1) * n:]], axis=1)
    g = _gather_rows(features, idx_nc, n)  # (B, K-1, N, Cin)
    dw_nc = jnp.einsum(
        "bknc,bnd->kcd", g, dy, preferred_element_type=jnp.float32)
    dw_c = jnp.einsum(
        "bnc,bnd->cd", features * cmask[..., None], dy,
        preferred_element_type=jnp.float32)
    dw = jnp.concatenate(
        [dw_nc[:kc], dw_c[None], dw_nc[kc:]], axis=0).astype(weights.dtype)
    return dx, dw, None


_subm_conv_sym.defvjp(_subm_conv_sym_fwd, _subm_conv_sym_bwd)


def apply_sparse_conv(features: jax.Array, plan: ConvPlan, weights: jax.Array,
                      precision=None, force_xla: bool = False) -> jax.Array:
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
    if _COMPUTE_DTYPE is not None and cin >= _COMPUTE_DTYPE_MIN_CH:
        features = features.astype(_COMPUTE_DTYPE)
        weights = weights.astype(_COMPUTE_DTYPE)
    k = plan.num_taps
    n_out = plan.gather_idx.shape[1] // k

    if PALLAS_V2_CONV and not force_xla and n_out <= n_in + 1:
        # whole-table-resident Mosaic kernel (per-lane row permutation +
        # fused MXU accumulate); plan.gather_idx rows are per-sample with
        # miss == n_in == the kernel's zero pad row. Prefer the plan's
        # pre-padded idx2d (one flat->2D retiling per PLAN, not per conv);
        # plans built before set_pallas_conv(True) lack it and pay the
        # reshape here.
        from df3d.ops.pallas.sparse_conv_kernel import (
            apply_sparse_conv_pallas_v2,
        )

        idx = (plan.idx2d if plan.idx2d is not None
               else plan.gather_idx.reshape(b, k, n_out))
        out = apply_sparse_conv_pallas_v2(
            features, idx, weights, table_dtype=_COMPUTE_DTYPE,
        )
        return out[:, :n_out].astype(features.dtype)

    if plan.center_identity:
        if SUBM_BWD_GATHER and precision is None:
            # symmetric-plan custom vjp: the input gradient is computed by
            # a GATHER with the SAME plan and reversed-transposed taps
            # instead of autodiff's transpose (a 7-13 ns/row scatter-add)
            return _subm_conv_sym(features, weights, plan.gather_idx)
        return _subm_center_impl(features, weights, plan.gather_idx,
                                 precision)

    padded = jnp.concatenate(
        [features, jnp.zeros((b, 1, cin), features.dtype)], axis=1
    ).reshape(b * (n_in + 1), cin)
    base = (jnp.arange(b, dtype=jnp.int32) * (n_in + 1))[:, None]
    # plans are tap-major flat; add per-sample base offsets
    idx = plan.gather_idx + base
    # the (B*K*N, cin) -> (b, k, n_out, cin) reshape only splits the
    # leading dim — no tiling change, unlike reshaping the flat int plan
    g = jax.lax.gather(
        padded, idx.reshape(-1, 1), _GATHER_DN, slice_sizes=(1, cin),
        mode="clip",
    ).reshape(b, k, n_out, cin)
    out = jnp.einsum(
        "bknc,kcd->bnd", g, weights,
        preferred_element_type=jnp.float32, precision=precision,
    )
    return out.astype(features.dtype)


