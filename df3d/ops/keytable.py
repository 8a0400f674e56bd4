"""Word-granular occupancy-rank tables for sparse-key membership + rank.

The round-1 rulebook looked neighbor keys up in a dense int32 key->row table
(grid cells x 4 bytes — 332 MB at nuScenes 0.075-voxel scale). Every lookup
was one random HBM gather at ~11-13 ns; plan builds dominated the
CenterPoint forward (~93 ms of 237 ms).

This module stores, per 32-cell word, the pair `[bit_word, prefix]` where
`prefix` is the exclusive rank prefix (number of present keys before the
word) — an (nwords, 2) int32 table, 16x smaller than the dense table
(20.7 MB at the same scale). A lookup is ONE contiguous (1, 2) row gather
plus a handful of (Q,)-shaped vector ops:

    rank(q) = prefix[q >> 5] + popcount(word & ((1 << (q & 31)) - 1))
    hit(q)  = bit (q & 31) of word

The layout is the product of extensive on-chip measurement
(tools/probes/r2_probe*.py, round 2):

  * only single-row gathers (slice_sizes=(1, C), collapsed_slice_dims=(0,))
    hit XLA:TPU's fast path — windowed/multi-row slices, flat-1D slices and
    take_along_axis forms are up to ~200x slower;
  * random row gathers run ~2 ns/row from tables under ~12 MB, ~5 ns at
    ~21 MB, ~11-13 ns for big HBM tables;
  * (Q, k)-shaped mask/popcount chains (block-of-words designs) cost ~1-3 ms
    per pass at 3.24M queries — layout mixing between (Q,) and (Q, k)
    tensors relayouts vregs; this design needs exactly one (Q,) popcount.

Because every df3d producer (ops/voxelize.py, sparse.py strided plans) emits
rows sorted by spatial key, `rank` IS the row index — membership and row id
come out of the same gather. Replaces the reference's generate_voxel2pinds
dense table (VoxelRCNN/pcdet .../voxel_query_utils.py) and the spconv hash
rulebook (TransFusion/mmdet3d/ops/spconv/src/indice.cc) with a TPU-friendly
structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_ROW_DN = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def num_words(cells: int) -> int:
    return (cells + 31) // 32


def _interleave(words: jax.Array) -> jax.Array:
    """uint32 bit words (nwords,) -> (nwords, 2) int32 [word, prefix]."""
    wc = lax.population_count(words).astype(jnp.int32)
    pre = jnp.cumsum(wc) - wc  # exclusive word prefix
    return jnp.stack([lax.bitcast_convert_type(words, jnp.int32), pre], -1)


def pack_keys(keys: jax.Array, valid: jax.Array, cells: int) -> jax.Array:
    """Build the packed table from UNIQUE keys (duplicates among valid rows
    would corrupt the bit scatter-add). keys (N,) int32 in [0, cells)."""
    nwords = num_words(cells)
    wslot = jnp.where(valid, keys >> 5, nwords)
    bit = jnp.where(
        valid,
        jnp.uint32(1) << (keys & 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    words = (
        jnp.zeros((nwords + 1,), jnp.uint32)
        .at[wslot].add(bit, mode="drop")[:nwords]
    )
    return _interleave(words)


def pack_occupancy(occ: jax.Array, cells: int) -> jax.Array:
    """Build the packed table from a dense (cells,) bool occupancy (handles
    duplicate writers upstream — .set(True) is idempotent)."""
    nwords = num_words(cells)
    pad = nwords * 32 - cells
    if pad:
        occ = jnp.concatenate([occ, jnp.zeros((pad,), occ.dtype)])
    bitvals = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None]
    words = (occ.reshape(-1, 32).astype(jnp.uint32) * bitvals).sum(
        -1, dtype=jnp.uint32
    )
    return _interleave(words)


def lookup(packed: jax.Array, q: jax.Array, q_ok: jax.Array,
           miss: int) -> jax.Array:
    """Rank of each query key among the present keys, or `miss`.
    packed (nwords, 2); q (Q,) int32 cell keys; q_ok (Q,) bool."""
    nwords = packed.shape[0]
    wslot = jnp.where(q_ok, q >> 5, nwords)
    row = lax.gather(
        packed, wslot[:, None], _ROW_DN, slice_sizes=(1, 2), mode="clip"
    )
    w = lax.bitcast_convert_type(row[:, 0], jnp.uint32)
    pre = row[:, 1]
    jb = (q & 31).astype(jnp.uint32)
    partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
    rank = pre + lax.population_count(w & partial).astype(jnp.int32)
    hit = ((w >> jb) & jnp.uint32(1)).astype(bool)
    return jnp.where(q_ok & hit, rank, miss)
