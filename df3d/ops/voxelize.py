"""Device-side voxelization: hash → sort → segment-reduce.

TPU-native replacement for both reference voxelizers:
  * the CPU spconv VoxelGenerator run inside dataloader workers
    (VoxelRCNN/pcdet/datasets/processor/data_processor.py:115,
    CenterPoint/det3d/datasets/pipelines/preprocess.py:381), and
  * the CUDA `hard_voxelize` run inside the model
    (TransFusion/mmdet3d/ops/voxel/voxelize.py:10-122, src/*.cu).

Everything is static-shape: P input points (padded), `max_voxels` output
slots, deterministic "first `max_points` per voxel" capping emulated by a
stable sort + within-segment rank. Voxels come out sorted by spatial key
(not arrival order like the CUDA kernel) — downstream consumers are
order-independent, and sortedness is exactly what the sparse-conv rulebook
wants, so we keep it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from df3d.ops import keytable

_INT_MAX = jnp.iinfo(jnp.int32).max


class VoxelizationResult(NamedTuple):
    features: jax.Array  # (max_voxels, F) mean of points in voxel
    coords: jax.Array    # (max_voxels, 3) int32 (z, y, x); -1 padding
    # points per voxel. METHOD-DEPENDENT semantics (ADVICE r3): "sort" caps
    # at max_points_per_voxel and the mean runs over the kept prefix
    # (reference hard_voxelize); "bitrank" counts ALL points in the cell
    # (uncapped) and the mean runs over all of them.
    num_points: jax.Array  # (max_voxels,) int32
    num_voxels: jax.Array  # () int32
    # voxel slot per point, -1 dropped. "sort": over-cap points within a
    # kept voxel are -1 (dropped, like hard_voxelize); "bitrank": every
    # point of a kept voxel keeps its slot id (no per-voxel point cap).
    point_voxel_id: jax.Array  # (P,) int32
    # method="bitrank" only: the packed word-rank occupancy table
    # (num_blocks(table_cells), 16) int32 — attach to the stage-1
    # SparseTensor so build_subm_plan skips its pack_keys build.
    packed_table: jax.Array | None = None


def compute_voxel_coords(points, voxel_size, pc_range):
    """(P, 3+) metric points -> (P, 3) int32 (z, y, x) grid coords."""
    vs = jnp.asarray(voxel_size, jnp.float32)
    origin = jnp.asarray(pc_range[:3], jnp.float32)
    xyz_idx = jnp.floor((points[..., :3] - origin) / vs).astype(jnp.int32)
    return xyz_idx[..., ::-1]  # x,y,z -> z,y,x


def voxelize(
    points: jax.Array,
    valid: jax.Array,
    voxel_size,
    pc_range,
    grid_size,
    max_voxels: int,
    max_points_per_voxel: int = 10,
    method: str = "sort",
    table_cells: int | None = None,
) -> VoxelizationResult:
    """Hard voxelization with mean pooling (fused MeanVFE).

    points (P, F) with xyz first; valid (P,) masks padding rows.
    grid_size = (Z, Y, X) static ints. All outputs static shape.

    method="sort" (default, reference-exact): stable sort + segment-sum;
    the first `max_points_per_voxel` points per voxel (file order)
    contribute, like CUDA hard_voxelize.

    method="bitrank" (serving/bench fast path, r3 probe 20): sort-free —
    scatter occupancy bits, pack the word-rank table (keytable.py), rank
    each point's key for its voxel slot, one unsorted scatter-add for the
    mean. ~2x faster at nuScenes scale AND emits the packed table that the
    stage-1 subm plan would otherwise rebuild. Semantics divergence: the
    mean runs over ALL points in a voxel (no max_points cap — the cap
    needs within-voxel arrival order, which only the sort knows); counts
    are uncapped too. `table_cells` >= grid cells sizes the table to a
    larger downstream grid (detectors' sparse_shape carries a +1 z slot).
    """
    if method == "bitrank":
        return _voxelize_bitrank(
            points, valid, voxel_size, pc_range, grid_size, max_voxels,
            table_cells,
        )
    assert method == "sort", method
    p = points.shape[0]
    zg, yg, xg = grid_size
    assert zg * yg * xg < 2**31

    coords = compute_voxel_coords(points, voxel_size, pc_range)  # (P,3) zyx
    in_range = (
        valid
        & (coords[:, 0] >= 0) & (coords[:, 0] < zg)
        & (coords[:, 1] >= 0) & (coords[:, 1] < yg)
        & (coords[:, 2] >= 0) & (coords[:, 2] < xg)
    )
    key = (coords[:, 0] * yg + coords[:, 1]) * xg + coords[:, 2]
    key = jnp.where(in_range, key, _INT_MAX)

    order = jnp.argsort(key, stable=True)
    skey = key[order]

    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    first &= skey != _INT_MAX
    voxel_id_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1  # (P,)
    voxel_id_sorted = jnp.where(skey == _INT_MAX, max_voxels, voxel_id_sorted)

    # within-voxel rank for the max_points cap (stable sort keeps file order)
    idx = jnp.arange(p)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, -1)
    )
    rank = idx - seg_start
    keep = (rank < max_points_per_voxel) & (voxel_id_sorted < max_voxels)

    feats_sorted = points[order]
    # seg ids NONDECREASING (cap-dropped points keep their segment id but
    # contribute zero) so the segment reduce lowers to a sorted-scatter.
    # counts ride as an extra column of the SAME segment_sum — scatters
    # cost ~7 ns/index on v5e, so one fused 260k scatter beats two.
    seg_id = jnp.minimum(voxel_id_sorted, max_voxels)
    f = points.shape[1]
    aug = jnp.concatenate(
        [feats_sorted, jnp.ones((p, 1), feats_sorted.dtype)], axis=1
    )
    sums_aug = jax.ops.segment_sum(
        jnp.where(keep[:, None], aug, 0.0),
        seg_id,
        num_segments=max_voxels + 1,
        indices_are_sorted=True,
    )[:max_voxels]
    sums = sums_aug[:, :f]
    counts = sums_aug[:, f].astype(jnp.int32)
    features = sums / jnp.maximum(counts, 1)[:, None]

    # voxel coords: all rows of a voxel share identical coords, so writing
    # duplicates is safe and the index vector stays sorted
    out_coords = jnp.full((max_voxels, 3), -1, jnp.int32)
    out_coords = out_coords.at[seg_id].set(
        coords[order], mode="drop", indices_are_sorted=True
    )

    num_voxels = jnp.minimum(first.sum().astype(jnp.int32), max_voxels)

    # map back: per original point, its voxel slot (or -1)
    pv_sorted = jnp.where(keep, voxel_id_sorted, -1)
    point_voxel_id = jnp.zeros((p,), jnp.int32).at[order].set(
        pv_sorted, unique_indices=True
    )

    return VoxelizationResult(features, out_coords, counts, num_voxels, point_voxel_id)


def _voxelize_bitrank(points, valid, voxel_size, pc_range, grid_size,
                      max_voxels, table_cells):
    """Sort-free voxelize via the word-rank occupancy table (see voxelize).

    Cost structure (v5e, 260k points, 0.075 grid): one 260k bit scatter +
    table pack (~2 ms), one 260k row-rank lookup (~0.7 ms), one unsorted
    260k x (F+1) scatter-add, one 260k key scatter — vs the sort path's
    3 ms argsort + 1.5 ms 260k row gather + two sorted scatters + cumsum
    machinery."""
    p = points.shape[0]
    zg, yg, xg = grid_size
    cells = zg * yg * xg
    tcells = cells if table_cells is None else table_cells
    assert tcells >= cells and tcells < 2**31
    f = points.shape[1]

    coords = compute_voxel_coords(points, voxel_size, pc_range)  # (P,3) zyx
    in_range = (
        valid
        & (coords[:, 0] >= 0) & (coords[:, 0] < zg)
        & (coords[:, 1] >= 0) & (coords[:, 1] < yg)
        & (coords[:, 2] >= 0) & (coords[:, 2] < xg)
    )
    key = (coords[:, 0] * yg + coords[:, 1]) * xg + coords[:, 2]
    key = jnp.where(in_range, key, tcells)

    occ = jnp.zeros((tcells + 1,), bool).at[key].set(
        True, mode="drop")[:tcells]
    packed = keytable.pack_occupancy(occ, tcells)
    # rank among ALL occupied cells, key order == output row order; misses
    # and over-cap ranks both land in the dropped slot max_voxels
    rank = keytable.lookup(packed, key, in_range, max_voxels)
    slot = jnp.minimum(rank, max_voxels)
    keep = slot < max_voxels  # implies in_range (miss -> max_voxels)

    aug = jnp.concatenate(
        [points, jnp.ones((p, 1), points.dtype)], axis=1)
    sums_aug = jnp.zeros((max_voxels + 1, f + 1), points.dtype).at[
        slot].add(aug, mode="drop")[:max_voxels]
    sums = sums_aug[:, :f]
    counts = sums_aug[:, f].astype(jnp.int32)
    features = sums / jnp.maximum(counts, 1)[:, None]

    # slot coords: duplicates write identical values; decode from the key
    # (folding coords into the mean columns risks f32 rounding at large
    # per-voxel counts)
    out_key = jnp.full((max_voxels + 1,), _INT_MAX, jnp.int32).at[
        slot].set(key, mode="drop")[:max_voxels]
    ok = out_key != _INT_MAX
    k_ = jnp.where(ok, out_key, 0)
    kz = k_ // (yg * xg)
    ky = (k_ // xg) % yg
    kx = k_ % xg
    out_coords = jnp.where(
        ok[:, None], jnp.stack([kz, ky, kx], -1).astype(jnp.int32), -1)

    # true occupancy from the last block's prefix + popcount (one row)
    last = packed[-1]
    total_occ = last[0] + jax.lax.population_count(
        jax.lax.bitcast_convert_type(last[1:15], jnp.uint32)
    ).astype(jnp.int32).sum()
    num_voxels = jnp.minimum(total_occ, max_voxels)

    point_voxel_id = jnp.where(keep, rank, -1).astype(jnp.int32)
    return VoxelizationResult(
        features, out_coords, counts, num_voxels, point_voxel_id,
        packed_table=packed,
    )


def voxelize_batch(
    points: jax.Array,
    valid: jax.Array,
    voxel_size,
    pc_range,
    grid_size,
    max_voxels: int,
    max_points_per_voxel: int = 10,
    method: str = "sort",
    table_cells: int | None = None,
) -> VoxelizationResult:
    """Per-sample voxelize over the leading batch dim: features (B, V, F),
    coords (B, V, 3). The batch axis stays explicit so it shards over the
    data mesh with no cross-sample collectives.

    Python-unrolled, NOT vmapped: vmap rewrites the sort/scatter/gather
    dimension numbers off XLA:TPU's fast paths (CLAUDE.md v5e rule 7) —
    the voxelizer is scatter-bound, so the batched forms pay multiples."""
    outs = [
        voxelize(
            points[i], valid[i], voxel_size, pc_range, grid_size,
            max_voxels, max_points_per_voxel, method=method,
            table_cells=table_cells,
        )
        for i in range(points.shape[0])
    ]
    return VoxelizationResult(*[
        (jnp.stack([getattr(o, f) for o in outs])
         if getattr(outs[0], f) is not None else None)
        for f in VoxelizationResult._fields
    ])


def dynamic_voxelize(points, valid, voxel_size, pc_range, grid_size):
    """Per-point voxel coords + in-range mask (reference dynamic_voxelize);
    pair with segment reductions for dynamic VFEs / DynamicScatter."""
    zg, yg, xg = grid_size
    coords = compute_voxel_coords(points, voxel_size, pc_range)
    in_range = (
        valid
        & (coords[:, 0] >= 0) & (coords[:, 0] < zg)
        & (coords[:, 1] >= 0) & (coords[:, 1] < yg)
        & (coords[:, 2] >= 0) & (coords[:, 2] < xg)
    )
    return coords, in_range
