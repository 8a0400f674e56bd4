"""Round-2 perf probe: bit-packed rank lookup + x-window conv gathers vs the
round-1 dense-table / per-tap-gather sparse core, measured on the real chip.

Methodology (CLAUDE.md): every measurement is an IN-GRAPH fori_loop chain of
ITERS applications with a runtime-zero perturbation threaded into an input
the measured op depends on; one scalar fetch per timing; (T - RTT)/ITERS.

Run: python tools/probes/r2_bitrank_probe.py   (axon TPU default platform)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8
N = 120_000
GRID = (40, 1440, 1440)
CELLS = GRID[0] * GRID[1] * GRID[2]


def timed(name, fn, *args):
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
    print(f"{name:34s} {per:8.2f} ms/iter   (total {best*1000:.1f} ms, "
          f"compile {compile_s:.0f} s, sink {s:.3g})", flush=True)
    return per


def perturb(s):
    """Runtime-zero int32 derived from a data-dependent scalar."""
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


# ---------------------------------------------------------------- test data
rng = np.random.RandomState(0)
# clustered-ish unique voxel keys: sample coords like a lidar frame
raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.unique(raw)[:N].astype(np.int32)
rng.shuffle(keys_np)
keys_np = np.sort(keys_np)  # sorted-by-key invariant
Z, Y, X = GRID
cz = keys_np // (Y * X)
cy = (keys_np // X) % Y
cx = keys_np % X
coords_np = np.stack([cz, cy, cx], -1).astype(np.int32)

coords0 = jnp.asarray(coords_np)
keys0 = jnp.asarray(keys_np)
valid0 = jnp.ones((N,), bool)

# RTT
_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


# ------------------------------------------------- candidate: bitrank table
def build_bitrank(keys, valid, cells, ncol=5):
    """(nblk, ncol) int32 rows [excl_prefix, w0..w3, pad...] over 128-cell
    blocks. keys must be UNIQUE among valid rows. ncol=8 gives 32B-aligned
    rows."""
    nblk = (cells + 127) // 128
    nwords = nblk * 4
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
    wc = lax.population_count(words).astype(jnp.int32)
    blk = wc.reshape(nblk, 4).sum(-1)
    pre = jnp.cumsum(blk) - blk
    parts = [pre[:, None],
             lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, 4)]
    if ncol > 5:
        parts.append(jnp.zeros((nblk, ncol - 5), jnp.int32))
    return jnp.concatenate(parts, axis=1)


_DN_ROW = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)
_DN_WIN = lax.GatherDimensionNumbers(
    offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
)


def bitrank_rows(packed, q, q_ok):
    """Gather the packed rows for query cells q. -> pre, words(Q,4)."""
    nblk = packed.shape[0]
    b = jnp.where(q_ok, q >> 7, nblk)
    row = lax.gather(
        packed, b[:, None], _DN_ROW, slice_sizes=(1, packed.shape[1]),
        mode="clip",
    )
    pre = row[:, 0]
    w = lax.bitcast_convert_type(row[:, 1:5], jnp.uint32)
    return pre, w


def bitrank_finish(pre, w, q, q_ok, n):
    j = q & 127
    jw = j >> 5
    jb = (j & 31).astype(jnp.uint32)
    iw = jnp.arange(4, dtype=jnp.int32)
    full = jnp.uint32(0xFFFFFFFF)
    partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
    mask = jnp.where(
        iw[None, :] < jw[:, None], full,
        jnp.where(iw[None, :] == jw[:, None], partial[:, None],
                  jnp.uint32(0)),
    )
    rank = pre + lax.population_count(w & mask).astype(jnp.int32).sum(-1)
    wsel = jnp.where(
        jw == 0, w[:, 0],
        jnp.where(jw == 1, w[:, 1], jnp.where(jw == 2, w[:, 2], w[:, 3])),
    )
    hit = ((wsel >> jb) & jnp.uint32(1)).astype(bool)
    return jnp.where(q_ok & hit, rank, n)


def bitrank_lookup(packed, q, q_ok, n):
    pre, w = bitrank_rows(packed, q, q_ok)
    return bitrank_finish(pre, w, q, q_ok, n)


OFFS = np.stack(np.meshgrid(*[np.arange(-1, 2)] * 3, indexing="ij"),
                -1).reshape(-1, 3).astype(np.int32)
OFFS_J = jnp.asarray(OFFS)


def neighbor_queries(coords, valid, half_only=False):
    k = 13 if half_only else 27
    nbr = coords[:, None, :] + OFFS_J[None, :k]
    ok = (
        (nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
        & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
        & (nbr[..., 2] >= 0) & (nbr[..., 2] < X)
        & valid[:, None]
    )
    qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
    return qkey, ok


# ------------------------------------------------------------------- probes
def p_raw_dense(coords_in):
    """1.62M single gathers from the 332MB dense table + build (r1 floor)."""
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        table = jnp.full((CELLS + 1,), N, jnp.int32)
        table = table.at[jnp.where(valid0, keys, CELLS + 1)].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        qkey, ok = neighbor_queries(coords, valid0, half_only=True)
        rows = table[jnp.where(ok, qkey, CELLS).reshape(-1)]
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_bitrank27(coords_in, ncol=5):
    """build bitrank + 27 per-tap lookups (each one (1,ncol) row gather)."""
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build_bitrank(keys, valid0, CELLS, ncol)
        qkey, ok = neighbor_queries(coords, valid0)
        rows = bitrank_lookup(packed, qkey.reshape(-1), ok.reshape(-1), N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_bitrank_win9(coords_in, ncol=5):
    """build bitrank + 9 (2,ncol)-window gathers covering 3 x-taps each."""
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build_bitrank(keys, valid0, CELLS, ncol)
        nblk = packed.shape[0]
        qkey, ok = neighbor_queries(coords, valid0)  # (N,27)
        q = qkey.reshape(N, 9, 3)
        qok = ok.reshape(N, 9, 3)
        qc = q[..., 1]  # center-of-window cell
        base = jnp.maximum((qc - 1) >> 7, 0)
        anyok = qok.any(-1)
        bidx = jnp.where(anyok, base, nblk).reshape(-1)
        rows2 = lax.gather(
            packed, bidx[:, None], _DN_WIN, slice_sizes=(2, ncol),
            mode="clip",
        ).reshape(N, 9, 2, ncol)
        # per-tap select row 0/1 of the window
        tb = q >> 7  # (N,9,3) tap block
        sel = jnp.clip(tb - base[..., None], 0, 1)
        row = jnp.take_along_axis(
            rows2, sel[..., None], axis=2
        )  # (N,9,3,ncol)
        pre = row[..., 0].reshape(-1)
        w = lax.bitcast_convert_type(row[..., 1:5], jnp.uint32).reshape(-1, 4)
        rows = bitrank_finish(pre, w, q.reshape(-1), qok.reshape(-1), N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


CAND_OFFS = np.stack(
    np.meshgrid(*[np.arange(2)] * 3, indexing="ij"), -1
).reshape(-1, 3).astype(np.int32)  # k3 s2: ceil(3/2)^3 = 8 candidates


def p_downplan_bitrank(coords_in, max_out=90_000):
    """strided k3s2p1 plan via byte-occupancy + bitrank rank (vs r1's
    cumsum-prefix over 10.6M cells + 43MB prefix gathers)."""
    oz, oy, ox = (Z + 2 - 3) // 2 + 1, (Y + 2 - 3) // 2 + 1, (X + 2 - 3) // 2 + 1
    cells_out = oz * oy * ox
    cand_offs = jnp.asarray(CAND_OFFS)
    imax = jnp.iinfo(jnp.int32).max

    def body(i, carry):
        coords = coords_in + perturb(carry)
        top = coords + 1  # pad 1
        o0 = top // 2
        cand = o0[:, None, :] - cand_offs[None]
        resid = top[:, None, :] - cand * 2
        ok = (
            (resid >= 0).all(-1) & (resid < 3).all(-1)
            & (cand >= 0).all(-1)
            & (cand[..., 0] < oz) & (cand[..., 1] < oy) & (cand[..., 2] < ox)
            & valid0[:, None]
        )
        cand_key = (cand[..., 0] * oy + cand[..., 1]) * ox + cand[..., 2]
        cand_key = jnp.where(ok, cand_key, imax).reshape(-1)

        live0 = cand_key != imax
        occ = jnp.zeros((cells_out,), bool).at[
            jnp.where(live0, cand_key, cells_out)
        ].set(True, mode="drop")
        nblk = (cells_out + 127) // 128
        pad = nblk * 128 - cells_out
        occp = jnp.concatenate([occ, jnp.zeros((pad,), bool)])
        bitvals = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None]
        words = (occp.reshape(-1, 32).astype(jnp.uint32) * bitvals).sum(
            -1, dtype=jnp.uint32)
        wc = lax.population_count(words).astype(jnp.int32)
        blk = wc.reshape(nblk, 4).sum(-1)
        pre = jnp.cumsum(blk) - blk
        packed = jnp.concatenate(
            [pre[:, None],
             lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, 4)], 1)

        rank = bitrank_lookup(
            packed, jnp.minimum(cand_key, cells_out - 1), live0, max_out)
        live = live0 & (rank < max_out)
        slot = jnp.where(live, rank, max_out)
        out_key = jnp.full((max_out + 1,), imax, jnp.int32).at[slot].set(
            cand_key, mode="drop")[:max_out]
        tap = ((resid[..., 0] * 3 + resid[..., 1]) * 3 + resid[..., 2]
               ).reshape(-1)
        flat_pos = jnp.where(live, slot * 27 + jnp.clip(tap, 0, 26),
                             max_out * 27)
        rows_src = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, 8)).reshape(-1)
        gidx = jnp.full((max_out * 27 + 1,), N, jnp.int32).at[flat_pos].set(
            rows_src, mode="drop")[:-1]
        return jnp.float32(gidx.sum()) + jnp.float32(out_key.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_conv_flat27(feats_in, gidx):
    """current conv body: one flat 27*N single-row gather + einsum."""
    cin, cout = 16, 16
    wts = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)

    def body(i, carry):
        feats = feats_in + carry.astype(jnp.float32) * 1e-30
        padded = jnp.concatenate([feats, jnp.zeros((1, cin))], 0)
        g = lax.gather(
            padded, gidx.reshape(-1, 1), _DN_ROW, slice_sizes=(1, cin),
            mode="clip",
        ).reshape(27, N, cin)
        out = jnp.einsum("knc,kcd->nd", g, wts,
                         preferred_element_type=jnp.float32)
        return out.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_conv_win9(feats_in, starts, sel):
    """window conv body: 9*N gathers of (3*cin,) flat windows + lane select
    + einsum. starts (9,N) row starts; sel (27,N) in {-1,0,1,2}."""
    cin, cout = 16, 16
    wts = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)
    dn1 = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def body(i, carry):
        feats = feats_in + carry.astype(jnp.float32) * 1e-30
        flat = jnp.concatenate([feats, jnp.zeros((3, cin))], 0).reshape(-1)
        g = lax.gather(
            flat, (starts.reshape(-1, 1)) * cin, dn1,
            slice_sizes=(3 * cin,), mode="clip",
        ).reshape(9, N, 3, cin)
        lanes = sel.reshape(9, 3, N)
        taps = []
        for grp in range(9):
            for dx in range(3):
                s = lanes[grp, dx][:, None]
                t = jnp.where(
                    s == 0, g[grp, :, 0],
                    jnp.where(s == 1, g[grp, :, 1],
                              jnp.where(s == 2, g[grp, :, 2], 0.0)),
                )
                taps.append(t)
        gg = jnp.stack(taps, 0)  # (27, N, cin)
        out = jnp.einsum("knc,kcd->nd", gg, wts,
                         preferred_element_type=jnp.float32)
        return out.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_conv_win9_2d(feats_in, starts, sel):
    """same but (3,cin) 2D window slices from the (N+3,cin) operand."""
    cin, cout = 16, 16
    wts = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)
    dn2 = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def body(i, carry):
        feats = feats_in + carry.astype(jnp.float32) * 1e-30
        padded = jnp.concatenate([feats, jnp.zeros((3, cin))], 0)
        g = lax.gather(
            padded, starts.reshape(-1, 1), dn2, slice_sizes=(3, cin),
            mode="clip",
        ).reshape(9, N, 3, cin)
        lanes = sel.reshape(9, 3, N)
        taps = []
        for grp in range(9):
            for dx in range(3):
                s = lanes[grp, dx][:, None]
                t = jnp.where(
                    s == 0, g[grp, :, 0],
                    jnp.where(s == 1, g[grp, :, 1],
                              jnp.where(s == 2, g[grp, :, 2], 0.0)),
                )
                taps.append(t)
        gg = jnp.stack(taps, 0)
        out = jnp.einsum("knc,kcd->nd", gg, wts,
                         preferred_element_type=jnp.float32)
        return out.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def main():
    import df3d.ops.sparse as sp

    st = sp.SparseTensor(
        features=jnp.zeros((1, N, 16)),
        coords=coords0[None],
        spatial_shape=GRID,
    )

    # r1 reference points
    def p_subm_plan(coords_in):
        def body(i, carry):
            c = coords_in + perturb(carry)
            plan = sp.build_subm_plan(
                sp.SparseTensor(st.features, c[None], GRID), 3)
            return jnp.float32(plan.gather_idx.sum())
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    def p_down_plan(coords_in):
        def body(i, carry):
            c = coords_in + perturb(carry)
            plan = sp.build_conv_plan(
                sp.SparseTensor(st.features, c[None], GRID), 3, 2, 1,
                max_out=90_000)
            return jnp.float32(plan.gather_idx.sum())
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    timed("bitrank 9x(2,5)-window", p_bitrank_win9, coords0)
    timed("bitrank 27tap pad8", lambda c: p_bitrank27(c, 8), coords0)
    timed("bitrank 9x(2,8)-window", lambda c: p_bitrank_win9(c, 8), coords0)
    timed("downplan bitrank k3s2", p_downplan_bitrank, coords0)
    timed("r1 build_subm_plan", p_subm_plan, coords0)
    timed("r1 build_conv_plan s2", p_down_plan, coords0)

    feats = jnp.asarray(rng.randn(N, 16).astype(np.float32))
    gidx = jnp.asarray(
        rng.randint(0, N, size=(27, N)).astype(np.int32))
    timed("conv flat 27x1-row (r1)", p_conv_flat27, feats, gidx)

    starts = jnp.asarray(rng.randint(0, N, size=(9, N)).astype(np.int32))
    sel = jnp.asarray(rng.randint(-1, 3, size=(27, N)).astype(np.int32))
    timed("conv 9x(3C,)-flat-window", p_conv_win9, feats, starts, sel)
    timed("conv 9x(3,C)-2d-window", p_conv_win9_2d, feats, starts, sel)


if __name__ == "__main__":
    main()
