"""Point-set operators, pure JAX with static shapes.

TPU-native replacement for the reference's pointnet2 CUDA suite
(*/ops/{furthest_point_sample,ball_query,knn,gather_points,group_points,
interpolate}/ across all three stacks, SURVEY §2.5): FPS is an iterative
masked argmax (fori_loop), ball query a masked first-k selection, grouping a
plain gather. All take a validity mask for padded rows and return index
buffers + masks of static size.

Convention: invalid/padded points get +inf distance so they are never
selected; returned masks mark real results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def pairwise_dist2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances. a (S, 3), b (N, 3) -> (S, N).

    GEMM form (|a|^2 + |b|^2 - 2ab^T) — the broadcast-subtract form
    materializes an (S, N, 3) tensor whose minor dim 3 wastes 125/128
    vector lanes (measured disease class, tools/probes/r2_probe*.py);
    this runs the cross term on the MXU instead."""
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    return a2[:, None] + b2[None, :] - 2.0 * (a @ b.T)


def furthest_point_sample(
    xyz: jax.Array, valid: jax.Array, num_samples: int, chunks: int = 1
) -> jax.Array:
    """D-FPS (pointnet2 furthest_point_sample). xyz (N, 3), valid (N,) ->
    (num_samples,) int32 indices. If fewer valid points than samples, indices
    repeat (same as the CUDA kernel which never checks).

    chunks > 1 runs a TPU-native stratified approximation: the point set is
    split into `chunks` contiguous slabs (rows are spatially coherent —
    producers emit key-sorted voxels) and exact FPS runs in PARALLEL inside
    each slab for num_samples/chunks centers. Exact FPS is inherently
    sequential (one fori_loop step per sample — ~0.5 s for 2048 of 30k on
    v5e); chunking cuts the sequential depth by `chunks` (2048 -> 32 steps)
    at the cost of exactness ACROSS slabs. The reference's CUDA kernel
    (pointnet2 sampling_gpu.cu) is exact; use chunks=1 for parity runs."""
    n = xyz.shape[0]
    if chunks > 1:
        assert num_samples % chunks == 0, (num_samples, chunks)
        per = num_samples // chunks
        cs = -(-n // chunks)
        pad = chunks * cs - n
        if pad:
            xyz = jnp.concatenate(
                [xyz, jnp.full((pad, 3), 1e6, xyz.dtype)])
            valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        local = jax.vmap(
            lambda x, v: furthest_point_sample(x, v, per)
        )(xyz.reshape(chunks, cs, 3), valid.reshape(chunks, cs))
        glob = local + (jnp.arange(chunks, dtype=jnp.int32) * cs)[:, None]
        return jnp.minimum(glob.reshape(-1), n - 1)
    big_valid = jnp.where(valid, 0.0, -_BIG)

    def body(i, carry):
        dists, idxs, last = carry
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists + big_valid)
        idxs = idxs.at[i].set(nxt.astype(jnp.int32))
        return dists, idxs, nxt

    first = jnp.argmax(valid).astype(jnp.int32)  # first valid point
    idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
    dists0 = jnp.full((n,), _BIG)
    dists0 = jnp.minimum(dists0, jnp.sum((xyz - xyz[first]) ** 2, axis=-1))
    _, idxs, _ = jax.lax.fori_loop(1, num_samples, body, (dists0, idxs0, first))
    return idxs


def ball_query(
    centers: jax.Array, xyz: jax.Array, valid: jax.Array,
    radius: float, k: int, exact: bool = False,
):
    """First-k-by-index neighbors within radius (pointnet2 ball_query).

    centers (S, 3), xyz (N, 3), valid (N,) -> (idx (S, k) int32, mask (S, k)).
    Slots beyond the neighbor count repeat the first neighbor (CUDA kernel
    behavior) and are flagged False in mask.

    `exact=True` uses lax.top_k and matches the reference CUDA kernel's
    first-k-by-index selection bit for bit — use it in checkpoint-parity
    eval paths. The default approx path mirrors fps's chunks escape hatch:
    ~10x cheaper on v5e but recall_target=0.97 can drop a true neighbor
    even when <= k neighbors exist (ADVICE r2).
    """
    n = xyz.shape[0]
    d2 = pairwise_dist2(centers, xyz)
    within = (d2 <= radius * radius) & valid[None, :]
    # first k by original index: smallest index wins. approx_max_k is ~10x
    # cheaper than exact top_k at (2048, 30k) scale (62 -> ~6 ms on v5e);
    # the reference CUDA kernel's "first k encountered" choice is equally
    # arbitrary when more than k neighbors exist.
    rank = jnp.where(within, jnp.arange(n, dtype=jnp.int32)[None, :], n)
    if exact:
        neg_topk, idx = jax.lax.top_k(-rank.astype(jnp.float32), k)
    else:
        neg_topk, idx = jax.lax.approx_max_k(
            -rank.astype(jnp.float32), k, recall_target=0.97)
    found = -neg_topk < n
    first = idx[:, :1]
    idx = jnp.where(found, idx, first)
    return idx.astype(jnp.int32), found


def knn(query: jax.Array, xyz: jax.Array, valid: jax.Array, k: int):
    """k nearest neighbors. query (S, 3), xyz (N, 3) -> (idx (S,k), dist2 (S,k))."""
    d2 = pairwise_dist2(query, xyz)
    d2 = jnp.where(valid[None, :], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (N, C), idx (...,) -> (..., C)."""
    return points[idx]


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (N, C), idx (S, k) -> (S, k, C) (pointnet2 group_points)."""
    return points[idx]


def query_and_group(
    xyz: jax.Array, features: jax.Array, valid: jax.Array,
    centers_idx: jax.Array, radius: float, k: int,
    relative_xyz: bool = True,
):
    """pointnet2 QueryAndGroup: ball query around sampled centers, gather
    neighbor xyz (centered) + features.

    Returns (grouped_xyz (S, k, 3), grouped_feats (S, k, C), mask (S, k)).
    """
    centers = xyz[centers_idx]
    idx, mask = ball_query(centers, xyz, valid, radius, k)
    g_xyz = xyz[idx]
    if relative_xyz:
        g_xyz = g_xyz - centers[:, None, :]
    g_feat = features[idx]
    return g_xyz, g_feat, mask


def three_nn_interpolate(
    query: jax.Array, support: jax.Array, support_valid: jax.Array,
    support_feats: jax.Array,
) -> jax.Array:
    """three_nn + three_interpolate: inverse-distance weighted average of the
    3 nearest support features. query (S, 3), support (N, 3), feats (N, C)
    -> (S, C)."""
    idx, d2 = knn(query, support, support_valid, 3)
    w = 1.0 / jnp.maximum(d2, 1e-8)
    w = w / w.sum(axis=-1, keepdims=True)
    return jnp.einsum("sk,skc->sc", w, support_feats[idx])
