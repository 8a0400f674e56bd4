"""Round-5 probe 3: why does the DOWN-plan rank lookup cost ~13.5 ns/query
(probe 1: 11.1 ms for 8N=819k queries into a 1.45 MB table) when the subm
plan's full 27N-lookup path implies ~3.8 ns/query end to end?

Suspect (CLAUDE.md v5e rule 6): the packed table's PRODUCER (pack_occupancy
= bit packing + block cumsum) fuses into the lookup's gather and gets
re-run per consumer region. Experiments at down st1->2 scale:

  A. baseline: pack_occupancy -> lookup (as shipped)
  B. barrier(packed) between pack and lookup
  C. barrier(q, ok) query streams too
  D. lookup with a PREBUILT (constant) table, same query stream — floor
  E. half-prefix finish variant (row slot 15 = prefix+pop(w0..w6), 7-word
     loop) with barrier — if the finish dominates, this halves it

Also re-times the full build_conv_plan st1->2 with the winning variant
hacked in via keytable.lookup monkeypatch (same math, bit-exact).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

IT = 8
CAPS = (102_400, 73_728)
GRID = (40, 1440, 1440)
PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOX = (0.075, 0.075, 0.2)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from df3d.ops import keytable
    from df3d.ops.sparse import SparseTensor, _INT_MAX
    from df3d.ops.voxelize import voxelize_batch

    cache_dir = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from df3d.utils.synth import make_raycast_frame

    rng = np.random.RandomState(100)
    pts = make_raycast_frame(rng, 260_000)
    points = jnp.asarray(pts[None])
    valid = jnp.ones(points.shape[:2], bool)

    RTT = [0.0]

    def timeit(name, fn, *args, iters=IT):
        t0c = time.perf_counter()
        out = float(fn(*args))
        t1c = time.perf_counter()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per = (best - RTT[0]) / iters
        print(f"{name:52s} {per*1e3:7.2f} ms  (compile {t1c-t0c:.0f}s)",
              flush=True)
        return per

    f = jax.jit(lambda v: v + 1.0)
    float(f(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(f(jnp.float32(0)))
    RTT[0] = (time.perf_counter() - t0) / 20
    print(f"RTT: {RTT[0]*1e3:.2f} ms", flush=True)

    def rt0(s):
        return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)

    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, CAPS[0], 10))(points, valid)
    coords0 = res.coords

    z, y, x = 41, 1440, 1440
    oz, oy, ox = 21, 720, 720
    cells_out = oz * oy * ox
    n = CAPS[0]
    max_out = CAPS[1]
    cand_list = [(a, b, c) for a in range(2) for b in range(2)
                 for c in range(2)]

    def cand_parts(coords):
        valid_ = coords[:, 0] >= 0
        keys = jnp.where(
            valid_, (coords[:, 0] * y + coords[:, 1]) * x + coords[:, 2],
            _INT_MAX)
        tz, ty, tx = coords[:, 0] + 1, coords[:, 1] + 1, coords[:, 2] + 1
        o0z, o0y, o0x = tz // 2, ty // 2, tx // 2
        ckeys = []
        for az, ay, ax in cand_list:
            co_z, co_y, co_x = o0z - az, o0y - ay, o0x - ax
            rz, ry, rx = tz - co_z * 2, ty - co_y * 2, tx - co_x * 2
            ok_c = (valid_ & (rz < 3) & (ry < 3) & (rx < 3)
                    & (co_z >= 0) & (co_y >= 0) & (co_x >= 0)
                    & (co_z < oz) & (co_y < oy) & (co_x < ox))
            ckeys.append(jnp.where(
                ok_c, (co_z * oy + co_y) * ox + co_x, _INT_MAX))
        ck = jnp.stack(ckeys).reshape(-1)
        return ck, valid_, tz, ty, tx, o0z, o0y, o0x

    def occ_pack(valid_, tz, ty, tx, o0z, o0y, o0x):
        ez, ey, ex = oz + 1, oy + 1, ox + 1
        ecells = ez * ey * ex
        r0z, r0y, r0x = tz - o0z * 2, ty - o0y * 2, tx - o0x * 2
        par = (r0z * 2 + r0y) * 2 + r0x
        ekey = (o0z * ey + o0y) * ex + o0x
        pidx = jnp.where(valid_, par * ecells + ekey, 8 * ecells)
        h = jnp.zeros((8 * ecells,), bool).at[pidx].set(
            True, mode="drop").reshape(8, ez, ey, ex)
        occ4 = jnp.zeros((oz, oy, ox), bool)
        for ci, (az, ay, ax) in enumerate(cand_list):
            sl = h[:, az:az + oz, ay:ay + oy, ax:ax + ox]
            for p in range(8):
                pz, py, px = p // 4, (p // 2) % 2, p % 2
                if pz + az * 2 >= 3 or py + ay * 2 >= 3 or px + ax * 2 >= 3:
                    continue
                occ4 = occ4 | sl[p]
        return keytable.pack_occupancy(occ4.reshape(-1), cells_out)

    def chain(fn):
        def run(coords):
            def body(i, carry):
                c, s = carry
                s2 = fn(c)
                return (c + rt0(s2.astype(jnp.float32)), s2)
            return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
        return jax.jit(run)

    # A. baseline
    def f_a(c):
        ck, *occ_args = cand_parts(c[0])
        packed = occ_pack(*occ_args)
        live0 = ck != _INT_MAX
        r = keytable.lookup(packed, jnp.minimum(ck, cells_out - 1), live0,
                            max_out)
        return r[0]

    timeit("A pack->lookup (shipped)", chain(f_a), coords0)

    # B. barrier between pack and lookup
    def f_b(c):
        ck, *occ_args = cand_parts(c[0])
        packed = lax.optimization_barrier(occ_pack(*occ_args))
        live0 = ck != _INT_MAX
        r = keytable.lookup(packed, jnp.minimum(ck, cells_out - 1), live0,
                            max_out)
        return r[0]

    timeit("B barrier(packed)", chain(f_b), coords0)

    # C. barrier queries too
    def f_c(c):
        ck, *occ_args = cand_parts(c[0])
        packed = lax.optimization_barrier(occ_pack(*occ_args))
        live0 = ck != _INT_MAX
        q, live0 = lax.optimization_barrier(
            (jnp.minimum(ck, cells_out - 1), live0))
        r = keytable.lookup(packed, q, live0, max_out)
        return r[0]

    timeit("C barrier(packed)+barrier(q)", chain(f_c), coords0)

    # D. floor: constant table + live query stream
    ck0, *occ_args0 = jax.jit(lambda c: cand_parts(c[0]))(coords0)
    packed0 = jax.jit(lambda c: occ_pack(*cand_parts(c[0])[1:]))(coords0)

    def f_d(c):
        ck, *_ = cand_parts(c[0])
        live0 = ck != _INT_MAX
        r = keytable.lookup(packed0, jnp.minimum(ck, cells_out - 1), live0,
                            max_out)
        return r[0]

    timeit("D constant table", chain(f_d), coords0)

    # E. half-prefix finish (7-word loop), barrier'd table
    W = keytable.BLOCK_CELLS // 32  # 14
    _FULL = np.uint32(0xFFFFFFFF)

    def pack_half(packed):
        words = lax.bitcast_convert_type(packed[:, 1:8], jnp.uint32)
        half = packed[:, 0] + lax.population_count(words).astype(
            jnp.int32).sum(-1)
        return packed.at[:, 15].set(half)

    def lookup_half(packed, q, q_ok, miss):
        nblk = packed.shape[0]
        blk = q // keytable.BLOCK_CELLS
        b = jnp.where(q_ok, blk, nblk)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        row = lax.gather(packed, b[:, None], dn, slice_sizes=(1, 16),
                         mode="clip")
        row = lax.optimization_barrier(row)
        j = q - blk * keytable.BLOCK_CELLS
        jw = j >> 5
        jb = (j & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        hi = jw >= 7
        base = jnp.where(hi, row[15], row[0])
        jw7 = jw - jnp.where(hi, 7, 0)
        rank = base
        hit_word = jnp.uint32(0)
        for i in range(7):
            w_lo = lax.bitcast_convert_type(row[1 + i], jnp.uint32)
            w_hi = lax.bitcast_convert_type(row[8 + i], jnp.uint32)
            wi = jnp.where(hi, w_hi, w_lo)
            mask = jnp.where(jw7 > i, _FULL,
                             jnp.where(jw7 == i, partial, jnp.uint32(0)))
            rank = rank + lax.population_count(wi & mask).astype(jnp.int32)
            hit_word = jnp.where(jw7 == i, wi, hit_word)
        hit = ((hit_word >> jb) & jnp.uint32(1)).astype(bool)
        return jnp.where(q_ok & hit, rank, miss)

    def f_e(c):
        ck, *occ_args = cand_parts(c[0])
        packed = lax.optimization_barrier(pack_half(occ_pack(*occ_args)))
        live0 = ck != _INT_MAX
        r = lookup_half(packed, jnp.minimum(ck, cells_out - 1), live0,
                        max_out)
        return r[0]

    timeit("E half-prefix finish + barrier", chain(f_e), coords0)

    # correctness cross-check of E vs shipped lookup
    ck = np.asarray(ck0)
    got = jax.jit(lambda: lookup_half(
        pack_half(packed0), jnp.minimum(ck0, cells_out - 1),
        ck0 != _INT_MAX, max_out))()
    want = jax.jit(lambda: keytable.lookup(
        packed0, jnp.minimum(ck0, cells_out - 1),
        ck0 != _INT_MAX, max_out))()
    same = bool(jnp.all(got == want))
    print(f"E bit-exact vs shipped: {same}", flush=True)


if __name__ == "__main__":
    main()
