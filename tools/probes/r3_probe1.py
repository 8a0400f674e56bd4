"""Round-3 probe 1: wide-row single-row gather rates + x-triple conv form.

Hypothesis: the conv body is gather-ISSUE-bound (~2 ns/row at 64B rows).
The 3 x-adjacent taps of a k=3 sparse conv land on CONSECUTIVE feature rows
(sorted-by-key invariant: active cells with consecutive keys occupy
consecutive ranks), so one single-row gather from a pre-concatenated
(N, 3C) "triple table" (row r = [f[r-1], f[r], f[r+1]]) can serve all
three taps — 27 gathers -> 9, same bytes, if wide rows keep the fast rate.

Measures:
  1. ns/row for single-row gathers across row widths / dtypes / table MB
     (the r2 rules only cover <=64B rows and the >16MB penalty).
  2. A/B of the full conv body at stage-1 scale: flat-27 (current) vs
     triple-9 (f32 and bf16), including triple-table build + tap masking.
  3. Extended 480-bit keytable rows (pad slot = next block's word 0):
     one gather resolving rank+hit for 3 consecutive cells vs 3 lookups.

Methodology per CLAUDE.md: in-graph fori chains, runtime-zero perturbation
into the indices, scalar fetch, (T - RTT)/ITERS.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8
Q = 1_000_000  # queries per gather-rate probe

_DN_ROW = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)

rng = np.random.RandomState(0)

# RTT
_f0 = None
RTT = None


def init_rtt():
    global _f0, RTT
    _f0 = jax.jit(lambda x: x + 1.0)
    float(_f0(jnp.float32(1)))
    RTT = 1e9
    for _ in range(5):
        t0 = time.time()
        float(_f0(jnp.float32(1)))
        RTT = min(RTT, time.time() - t0)
    print(f"RTT = {RTT*1000:.1f} ms", flush=True)


def timed(name, fn, *args, rows_per_iter=None):
    f = jax.jit(fn)
    t0 = time.time()
    s = float(f(*args))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s = float(f(*args))
        best = min(best, time.time() - t0)
    per = (best - RTT) / ITERS * 1000.0
    extra = ""
    if rows_per_iter:
        extra = f"  {per*1e6/rows_per_iter:6.2f} ns/row"
    print(f"{name:42s} {per:8.2f} ms/iter{extra}   (compile {compile_s:.0f}s,"
          f" sink {s:.3g})", flush=True)
    return per


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


# ------------------------------------------------------------- gather rates
def p_gather_rate(table, idx0):
    n = table.shape[0]

    def body(i, carry):
        idx = jnp.minimum(idx0 + perturb(carry), n - 1)
        g = lax.gather(
            table, idx[:, None], _DN_ROW,
            slice_sizes=(1, table.shape[1]), mode="clip",
        )
        return jnp.float32(g.sum(dtype=jnp.float32))
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def rate_sweep():
    print("--- single-row gather rate sweep (Q=1M queries) ---", flush=True)
    configs = [
        # (rows, C, dtype, note)
        (120_000, 16, jnp.float32, "st1 cur   64B  7.7MB"),
        (120_000, 48, jnp.float32, "st1 tri  192B  23MB"),
        (120_000, 48, jnp.bfloat16, "st1 tri   96B 11.5MB"),
        (120_000, 96, jnp.bfloat16, "        192B  23MB"),
        (90_000, 32, jnp.float32, "st2 cur  128B 11.5MB"),
        (90_000, 32, jnp.bfloat16, "st2 b16   64B  5.8MB"),
        (90_000, 96, jnp.bfloat16, "st2 tri  192B 17.3MB"),
        (55_000, 64, jnp.float32, "st3 cur  256B  14MB"),
        (55_000, 192, jnp.bfloat16, "st3 tri  384B  21MB"),
        (30_000, 128, jnp.float32, "st4 cur  512B  15MB"),
        (30_000, 384, jnp.bfloat16, "st4 tri  768B  23MB"),
    ]
    for rows, c, dt, note in configs:
        table = jnp.asarray(
            rng.randn(rows, c).astype(np.float32)).astype(dt)
        idx0 = jnp.asarray(rng.randint(0, rows, size=Q).astype(np.int32))
        timed(f"gather ({rows//1000}k,{c}) {dt.__name__} {note}",
              p_gather_rate, table, idx0, rows_per_iter=Q)


# ------------------------------------------- conv body A/B at stage-1 scale
N1 = 120_000
C1 = 16


def p_conv_flat27(feats_in, gidx, dt):
    """feats_in stays f32; perturbed in f32 then cast to dt (a bf16-space
    perturbation underflows to exact zero and XLA hoists the table)."""
    wts = jnp.asarray(rng.randn(27, C1, C1).astype(np.float32) * 0.05
                      ).astype(dt)

    def body(i, carry):
        feats = (feats_in + carry * jnp.float32(1e-30)).astype(dt)
        padded = jnp.concatenate(
            [feats, jnp.zeros((1, C1), feats.dtype)], 0)
        g = lax.gather(
            padded, gidx.reshape(-1, 1), _DN_ROW, slice_sizes=(1, C1),
            mode="clip",
        ).reshape(27, N1, C1)
        out = jnp.einsum("knc,kcd->nd", g, wts,
                         preferred_element_type=jnp.float32)
        return out.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_conv_triple9(feats_in, anchors, mask3, dt):
    """anchors (9, N) row ids; mask3 (9, 3, N) bool tap validity."""
    wts = jnp.asarray(rng.randn(9, 3 * C1, C1).astype(np.float32) * 0.05
                      ).astype(dt)

    def body(i, carry):
        feats = (feats_in + carry * jnp.float32(1e-30)).astype(dt)
        padded = jnp.concatenate(
            [jnp.zeros((1, C1), feats.dtype), feats,
             jnp.zeros((2, C1), feats.dtype)], 0)  # (N+3, C)
        triple = jnp.concatenate(
            [padded[:-2], padded[1:-1], padded[2:]], axis=-1)  # (N+1, 3C)
        triple = lax.optimization_barrier(triple)
        g = lax.gather(
            triple, anchors.reshape(-1, 1), _DN_ROW,
            slice_sizes=(1, 3 * C1), mode="clip",
        ).reshape(9, N1, 3 * C1)
        m = jnp.concatenate(
            [jnp.broadcast_to(mask3[:, j, :, None], (9, N1, C1))
             for j in range(3)], axis=-1).astype(g.dtype)
        out = jnp.einsum("gnc,gcd->nd", g * m, wts,
                         preferred_element_type=jnp.float32)
        return out.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def conv_ab():
    print("--- conv body A/B, stage-1 scale (120k x 16, 27 taps) ---",
          flush=True)
    feats32 = jnp.asarray(rng.randn(N1, C1).astype(np.float32))
    gidx = jnp.asarray(rng.randint(0, N1, size=(27, N1)).astype(np.int32))
    anchors = jnp.asarray(rng.randint(0, N1, size=(9, N1)).astype(np.int32))
    mask3 = jnp.asarray(rng.rand(9, 3, N1) < 0.6)
    timed("conv flat27 f32 (current)",
          lambda a, b: p_conv_flat27(a, b, jnp.float32), feats32, gidx,
          rows_per_iter=27 * N1)
    timed("conv triple9 f32",
          lambda a, b, c: p_conv_triple9(a, b, c, jnp.float32),
          feats32, anchors, mask3, rows_per_iter=9 * N1)
    timed("conv flat27 bf16",
          lambda a, b: p_conv_flat27(a, b, jnp.bfloat16), feats32, gidx,
          rows_per_iter=27 * N1)
    timed("conv triple9 bf16",
          lambda a, b, c: p_conv_triple9(a, b, c, jnp.bfloat16),
          feats32, anchors, mask3, rows_per_iter=9 * N1)


# --------------------------- extended keytable rows: triple-lookup vs 3x
from df3d.ops import keytable  # noqa: E402

GRID = (40, 1440, 1440)
CELLS = GRID[0] * GRID[1] * GRID[2]
_W = keytable.BLOCK_CELLS // 32
_FULL = jnp.uint32(0xFFFFFFFF)


def pack_keys_ext(keys, valid, cells):
    """Like keytable.pack_keys but the pad slot carries the NEXT block's
    word 0 -> each 64B row covers bits [448m, 448(m+1)+32)."""
    nblk = keytable.num_blocks(cells)
    nwords = nblk * _W
    blk = keys // keytable.BLOCK_CELLS
    inblk = keys - blk * keytable.BLOCK_CELLS
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
    wc = lax.population_count(words).astype(jnp.int32)
    blkc = wc.reshape(nblk, _W).sum(-1)
    pre = jnp.cumsum(blkc) - blkc
    w2 = words.reshape(nblk, _W)
    nxt0 = jnp.concatenate([w2[1:, 0], jnp.zeros((1,), jnp.uint32)])
    return jnp.concatenate(
        [pre[:, None],
         lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, _W),
         lax.bitcast_convert_type(nxt0, jnp.int32)[:, None]],
        axis=1,
    )


def lookup3(packed, q, oks, miss):
    """q (Q,) anchor cell keys (the x-1 cell of each triple); oks (3, Q)
    validity. Returns ranks (3, Q) with miss for invalid/absent, for cells
    q, q+1, q+2."""
    nblk = packed.shape[0]
    any_ok = oks[0] | oks[1] | oks[2]
    blk = q // keytable.BLOCK_CELLS
    b = jnp.where(any_ok, blk, nblk)
    row = lax.gather(
        packed, b[:, None], keytable._ROW_DN_T, slice_sizes=(1, 16),
        mode="clip",
    )  # (16, Q)
    row = lax.optimization_barrier(row)
    e0 = q - blk * keytable.BLOCK_CELLS  # in [0, 448)
    pre = row[0]
    words = [lax.bitcast_convert_type(row[1 + i], jnp.uint32)
             for i in range(_W)] + [
        lax.bitcast_convert_type(row[15], jnp.uint32)]
    outs = []
    for d in range(3):
        e = e0 + d  # extended position in [0, 480)
        jw = e >> 5
        jb = (e & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        rank = pre
        hit_word = jnp.uint32(0)
        for i in range(_W + 1):
            mask = jnp.where(jw > i, _FULL,
                             jnp.where(jw == i, partial, jnp.uint32(0)))
            rank = rank + lax.population_count(
                words[i] & mask).astype(jnp.int32)
            hit_word = jnp.where(jw == i, words[i], hit_word)
        hit = ((hit_word >> jb) & jnp.uint32(1)).astype(bool)
        outs.append(jnp.where(oks[d] & hit, rank, miss))
    return jnp.stack(outs)


def p_lookup3(packed, q0, oks):
    def body(i, carry):
        q = jnp.minimum(q0 + perturb(carry), CELLS - 3)
        r = lookup3(packed, q, oks, N1)
        return jnp.float32(r.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_lookup1x3(packed, q0, oks):
    def body(i, carry):
        q = jnp.minimum(q0 + perturb(carry), CELLS - 3)
        s = jnp.int32(0)
        for d in range(3):
            s = s + keytable.lookup(packed, q + d, oks[d], N1).sum()
        return jnp.float32(s)
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def lookup_ab():
    print("--- keytable: extended-row triple lookup vs 3x single ---",
          flush=True)
    nq = 9 * N1 // 3  # 9 y/z-groups at st1 -> per-group N anchors; probe 1/3
    raw = np.unique(rng.randint(0, CELLS, size=200_000).astype(np.int64))
    keys_np = np.sort(raw[:N1]).astype(np.int32)
    keys = jnp.asarray(keys_np)
    valid = jnp.ones((N1,), bool)
    packed_ext = jax.jit(
        lambda k, v: pack_keys_ext(k, v, CELLS))(keys, valid)
    packed_cur = jax.jit(
        lambda k, v: keytable.pack_keys(k, v, CELLS))(keys, valid)
    q0 = jnp.asarray(rng.randint(0, CELLS - 3, size=nq).astype(np.int32))
    oks = jnp.asarray(rng.rand(3, nq) < 0.9)
    timed(f"lookup3 ext-row ({nq//1000}k anchors)", p_lookup3,
          packed_ext, q0, oks, rows_per_iter=nq)
    timed(f"3x lookup cur   ({nq//1000}k anchors)", p_lookup1x3,
          packed_cur, q0, oks, rows_per_iter=3 * nq)


def main():
    init_rtt()
    rate_sweep()
    conv_ab()
    lookup_ab()


if __name__ == "__main__":
    main()
