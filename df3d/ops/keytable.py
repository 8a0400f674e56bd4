"""Bit-packed occupancy-rank tables for sparse-key membership + rank.

The round-1 rulebook looked neighbor keys up in a dense int32 key->row table
(grid cells x 4 bytes — 332 MB at nuScenes 0.075-voxel scale). Every lookup
was one random HBM gather at ~11-13 ns; plan builds dominated the
CenterPoint forward (~93 ms of 237 ms).

This module packs the same information 28x smaller: per 448-cell block one
64-byte row `[prefix, w0..w13, pad]` — occupancy bits plus the exclusive
rank prefix of the block (11.8 MB at the (40,1440,1440) grid). A lookup is
ONE row gather + an unrolled word-major popcount:

    rank(q) = prefix[q // 448] + popcount(bits below q within the block)
    hit(q)  = bit q set

Every constant here is the product of on-chip measurement
(tools/probes/r2_probe*.py, round 2). The v5e gather/layout rules learned:

  * only single-row gathers (slice_sizes=(1, C), collapsed_slice_dims=(0,))
    hit XLA:TPU's fast path — windowed/multi-row slices, flat-1D slices and
    take_along_axis forms are up to ~200x slower;
  * rates are WIDTH- and SIZE-dependent: 64B rows from a <~12 MB table run
    ~2 ns/row; 4-32B rows run 4.7-6.8 ns at any size; >~16 MB degrades to
    HBM latency (5-13 ns);
  * the gather output must be produced TRANSPOSED (offset_dims=(0,), giving
    (16, Q)) so the finish consumes contiguous (Q,) column slices — with
    the natural (Q, 16) output, slicing columns (or mixing (Q,)-shaped and
    (Q, k)-shaped tensors at all) relayouts vregs per op and costs more
    than the gather itself;
  * query streams must be generated as per-tap (N,)-shaped vector ops with
    static key offsets — an (N, K, 3) neighbor tensor puts 3 in the vreg
    minor dim (125/128 lanes wasted).

Because every df3d producer (ops/voxelize.py, sparse.py strided plans)
emits rows sorted by spatial key, `rank` IS the row index — membership and
row id come out of the same gather. Replaces the reference's
generate_voxel2pinds dense table (VoxelRCNN/pcdet .../voxel_query_utils.py)
and the spconv hash rulebook (TransFusion/mmdet3d/ops/spconv/src/indice.cc)
with a TPU-friendly structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BLOCK_CELLS = 448
_W = BLOCK_CELLS // 32  # 14 words per block
# numpy (not jnp) scalar: a module-level jnp constant would initialize the
# default jax backend at import time — on this image that dials the remote
# TPU relay before callers can select CPU (and hangs if the relay is down)
_FULL = np.uint32(0xFFFFFFFF)

_ROW_DN_T = lax.GatherDimensionNumbers(
    offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def num_blocks(cells: int) -> int:
    return (cells + BLOCK_CELLS - 1) // BLOCK_CELLS


def _pack_words(words: jax.Array) -> jax.Array:
    """uint32 bit words (nblk*_W,) -> packed (nblk, 16) int32 64B rows
    (slot 0 = exclusive rank prefix, slots 1-14 = bit words, slot 15 pad).

    An "ext" variant (slot 15 = next block's word 0, enabling a 3-cell
    lookup3 from one gather) was probed and REMOVED in round 4: the
    (nblk, _W) reshape + column slice it needs relayouts the multi-megaword
    bit array (r3 probe 2: +20 ms per plan build at nuScenes scale), and
    its lookup3 consumer lost in-model (2.6x slower than 27 flat lookups).
    See CLAUDE.md round-3 notes; re-derive from git history if needed."""
    nblk = words.shape[0] // _W
    wc = lax.population_count(words).astype(jnp.int32)
    blk = wc.reshape(nblk, _W).sum(-1)
    pre = jnp.cumsum(blk) - blk  # exclusive block prefix
    last = jnp.zeros((nblk, 1), jnp.int32)
    return jnp.concatenate(
        [pre[:, None],
         lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, _W),
         last],
        axis=1,
    )


def pack_keys(keys: jax.Array, valid: jax.Array, cells: int) -> jax.Array:
    """Build the packed table from UNIQUE keys (duplicates among valid rows
    would corrupt the bit scatter-add). keys (N,) int32 in [0, cells)."""
    nblk = num_blocks(cells)
    nwords = nblk * _W
    blk = keys // BLOCK_CELLS
    inblk = keys - blk * BLOCK_CELLS
    wslot = jnp.where(valid, blk * _W + (inblk >> 5), nwords)
    bit = jnp.where(
        valid,
        jnp.uint32(1) << (inblk & 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    words = (
        jnp.zeros((nwords + 1,), jnp.uint32)
        .at[wslot].add(bit, mode="drop")[:nwords]
    )
    return _pack_words(words)


def pack_occupancy(occ: jax.Array, cells: int) -> jax.Array:
    """Build the packed table from a dense (cells,) bool occupancy (handles
    duplicate writers upstream — .set(True) is idempotent)."""
    nblk = num_blocks(cells)
    pad = nblk * BLOCK_CELLS - cells
    if pad:
        occ = jnp.concatenate([occ, jnp.zeros((pad,), occ.dtype)])
    bitvals = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None]
    words = (occ.reshape(-1, 32).astype(jnp.uint32) * bitvals).sum(
        -1, dtype=jnp.uint32
    )
    return _pack_words(words)


MINI_CELLS = 16


def pack_mini(occ: jax.Array, cells: int) -> jax.Array:
    """Dense (cells,) bool occupancy -> 16-cell mini-rank table
    (ceil(cells/16), 2) int32 rows [exclusive prefix, 16 occupancy bits].

    r5 probe 6: the 64B/448-cell `lookup` runs ~12.6-13 ns/query in real
    plan-build contexts (regardless of masking, address locality, producer
    barriers, or finish width — probes 3/4/6); this 8B-row variant runs
    ~3.8 ns/query with a one-popcount finish, bit-exact. The table is 16x
    larger per cell (0.5 B/cell), so it suits DOWN-plan output grids
    (~5 MB at the nuScenes st1->2 output) where the dense occupancy is
    already materialized — not the 85M-cell stage-1 grid."""
    occ = occ[:cells]  # honor pack_occupancy's contract on oversized input
    pad = (-occ.shape[0]) % MINI_CELLS
    if pad:
        occ = jnp.concatenate([occ, jnp.zeros((pad,), occ.dtype)])
    occ2d = occ.reshape(-1, MINI_CELLS).astype(jnp.int32)
    bitvals = (jnp.int32(1) << jnp.arange(MINI_CELLS, dtype=jnp.int32))[None]
    bits = (occ2d * bitvals).sum(-1, dtype=jnp.int32)
    counts = occ2d.sum(-1, dtype=jnp.int32)
    pre = jnp.cumsum(counts) - counts
    return jnp.stack([pre, bits], axis=-1)


_ROW_DN_MINI = lax.GatherDimensionNumbers(
    offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def lookup_mini(mini: jax.Array, q: jax.Array, q_ok: jax.Array,
                miss: int) -> jax.Array:
    """Rank of each query among present cells via the mini table, or
    `miss`. Same contract as `lookup`; one 8B row gather + one popcount."""
    nrow = mini.shape[0]
    row_id = q >> 4
    b = jnp.where(q_ok, row_id, nrow)
    row = lax.gather(
        mini, b[:, None], _ROW_DN_MINI, slice_sizes=(1, 2), mode="clip"
    )  # (2, Q) transposed: column slices are contiguous (Q,) vectors
    row = lax.optimization_barrier(row)
    j = (q & 15).astype(jnp.uint32)
    w = lax.bitcast_convert_type(row[1], jnp.uint32)
    below = w & ((jnp.uint32(1) << j) - jnp.uint32(1))
    rank = row[0] + lax.population_count(below).astype(jnp.int32)
    hit = ((w >> j) & jnp.uint32(1)).astype(bool)
    return jnp.where(q_ok & hit, rank, miss)


def lookup(packed: jax.Array, q: jax.Array, q_ok: jax.Array,
           miss: int) -> jax.Array:
    """Rank of each query key among the present keys, or `miss`.
    packed (nblk, 16); q (Q,) int32 cell keys; q_ok (Q,) bool."""
    nblk = packed.shape[0]
    blk = q // BLOCK_CELLS
    b = jnp.where(q_ok, blk, nblk)
    row = lax.gather(
        packed, b[:, None], _ROW_DN_T, slice_sizes=(1, 16), mode="clip"
    )  # (16, Q): column slices below are contiguous (Q,) vectors
    row = lax.optimization_barrier(row)
    j = q - blk * BLOCK_CELLS
    jw = j >> 5
    jb = (j & 31).astype(jnp.uint32)
    partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
    rank = row[0]
    hit_word = jnp.uint32(0)
    for i in range(_W):
        wi = lax.bitcast_convert_type(row[1 + i], jnp.uint32)
        mask = jnp.where(jw > i, _FULL,
                         jnp.where(jw == i, partial, jnp.uint32(0)))
        rank = rank + lax.population_count(wi & mask).astype(jnp.int32)
        hit_word = jnp.where(jw == i, wi, hit_word)
    hit = ((hit_word >> jb) & jnp.uint32(1)).astype(bool)
    return jnp.where(q_ok & hit, rank, miss)
