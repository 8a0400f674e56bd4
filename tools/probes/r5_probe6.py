"""Round-5 probe 6: isolate WHY the down-plan rank lookup runs ~12.6 ns/q
while subm-plan lookups run ~3.8 ns/q against same-size tables (probes 3/4
ruled out producer fusion, finish width, and address locality).

Rate matrix over keytable.lookup on the st1->2 output table (23.3k blocks,
1.45 MB), IT-chained with runtime-zero perturbation:
  A. 819k uniform-random distinct queries, all ok
  B. 819k uniform, 70% ok=False (down-like mask fraction)
  C. 2.76M uniform, all ok (subm-like count)
  D. 819k candidate-major structured (8 interleaved sorted streams), all ok
  E. D with 70% masked (== down plan shape)
  F. E but mask applied POST-lookup (q_ok=True for the lookup, fallback
     addresses, results masked after) — if B/E are slow and F fast, the
     q_ok path itself is the poison and the fix is trivial
  G. 16-cell-block mini-table (8B rows: int32 prefix + 16 occupancy bits
     in an int32), 819k down-like queries — engineered fallback variant
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

IT = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from df3d.ops import keytable

    cache_dir = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    rng = np.random.RandomState(0)
    cells = 21 * 720 * 720  # 10.9M, st1->2 output grid
    # ~38.7k occupied cells like the real st2 occupancy
    occ_keys = np.unique(rng.randint(0, cells, 39_000))
    occ = np.zeros(cells, bool)
    occ[occ_keys] = True
    packed = jax.jit(lambda o: keytable.pack_occupancy(o, cells))(
        jnp.asarray(occ))
    max_out = 73_728

    RTT = [0.0]

    def timeit(name, fn, *args, iters=IT, nq=1):
        t0c = time.perf_counter()
        out = float(fn(*args))
        t1c = time.perf_counter()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per = (best - RTT[0]) / iters
        print(f"{name:52s} {per*1e3:7.2f} ms  {per/nq*1e9:6.2f} ns/q"
              f"  (compile {t1c-t0c:.0f}s)", flush=True)
        return per

    f = jax.jit(lambda v: v + 1.0)
    float(f(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(f(jnp.float32(0)))
    RTT[0] = (time.perf_counter() - t0) / 20
    print(f"RTT: {RTT[0]*1e3:.2f} ms", flush=True)

    def chain(q, ok, post_mask=False, table=None, mini=False):
        tbl = packed if table is None else table
        q = jnp.asarray(q)
        ok = jnp.asarray(ok)

        def run(qd):
            def body(i, carry):
                qq, s = carry
                if mini:
                    r = mini_lookup(tbl, qq, ok, max_out)
                elif post_mask:
                    r0 = keytable.lookup(
                        tbl, qq, jnp.ones_like(ok), max_out)
                    r = jnp.where(ok, r0, max_out)
                else:
                    r = keytable.lookup(tbl, qq, ok, max_out)
                s2 = r[0]
                pert = jnp.where(s2 > jnp.int32(2**30), 1, 0)
                return (qq + pert, s2)
            return lax.fori_loop(0, IT, body, (q, jnp.int32(0)))[1]
        return jax.jit(run), q

    # A: uniform distinct-ish, all ok
    qA = rng.randint(0, cells, 819_200).astype(np.int32)
    okA = np.ones(819_200, bool)
    fn, q0 = chain(qA, okA)
    timeit("A uniform 819k all-ok", fn, q0, nq=819_200)

    # B: uniform, 70% masked
    okB = rng.rand(819_200) > 0.7
    fn, q0 = chain(qA, okB)
    timeit("B uniform 819k 70%-masked", fn, q0, nq=819_200)

    # C: uniform 2.76M all ok
    qC = rng.randint(0, cells, 2_764_800).astype(np.int32)
    fn, q0 = chain(qC, np.ones(len(qC), bool))
    timeit("C uniform 2.76M all-ok", fn, q0, nq=len(qC))

    # D: candidate-major structured: 8 interleaved sorted streams
    base = np.sort(rng.randint(0, cells, 102_400)).astype(np.int32)
    qD = np.concatenate([np.clip(base + d, 0, cells - 1)
                         for d in (0, 1, 720, 721, 518400, 518401,
                                   519120, 519121)])
    fn, q0 = chain(qD, np.ones(len(qD), bool))
    timeit("D structured 8x102k all-ok", fn, q0, nq=len(qD))

    # E: D with 70% masked
    okE = rng.rand(len(qD)) > 0.7
    fn, q0 = chain(qD, okE)
    timeit("E structured 70%-masked", fn, q0, nq=len(qD))

    # F: E with post-mask (lookup sees all-ok)
    fn, q0 = chain(qD, okE, post_mask=True)
    timeit("F structured post-masked", fn, q0, nq=len(qD))

    # G: 16-cell mini-table: rows (cells/16, 2) int32 [prefix, bits]
    occ2d = occ.reshape(-1, 16)
    bits = (occ2d * (1 << np.arange(16))).sum(-1).astype(np.int32)
    counts = occ2d.sum(-1)
    pre = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    mini_tbl = jnp.asarray(np.stack([pre, bits], -1))  # (680400, 2)

    def mini_lookup(tbl, q, q_ok, miss):
        nrow = tbl.shape[0]
        row_id = q >> 4
        b = jnp.where(q_ok, row_id, nrow)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        row = lax.gather(tbl, b[:, None], dn, slice_sizes=(1, 2),
                         mode="clip")  # (2, Q)
        row = lax.optimization_barrier(row)
        j = (q & 15).astype(jnp.uint32)
        w = lax.bitcast_convert_type(row[1], jnp.uint32)
        below = w & ((jnp.uint32(1) << j) - jnp.uint32(1))
        rank = row[0] + lax.population_count(below).astype(jnp.int32)
        hit = ((w >> j) & jnp.uint32(1)).astype(bool)
        return jnp.where(q_ok & hit, rank, miss)

    fn, q0 = chain(qD, okE, table=mini_tbl, mini=True)
    timeit("G mini-table structured 70%-masked", fn, q0, nq=len(qD))
    fn, q0 = chain(qD, np.ones(len(qD), bool), table=mini_tbl, mini=True)
    timeit("G2 mini-table all-ok", fn, q0, nq=len(qD))

    # correctness: mini == packed on the E stream
    want = jax.jit(lambda: keytable.lookup(
        packed, jnp.asarray(qD), jnp.asarray(okE), max_out))()
    got = jax.jit(lambda: mini_lookup(
        mini_tbl, jnp.asarray(qD), jnp.asarray(okE), max_out))()
    print("mini bit-exact:", bool(jnp.all(want == got)), flush=True)


if __name__ == "__main__":
    main()
