"""Round-5 probe 1: decompose plan-build time (the ~74 ms half of the
forward — VERDICT r4 #2) into its constituent costs at FITTED-cap scale on
realistic ray-cast frames, so the optimization targets the true whale.

Sections (DF3D_PROBE_SECTIONS env, comma list, default all):
  1  e2e refresher: voxelize / backbone fwd / neck+head+predict at bench
     config (fitted caps, raycast frame)
  2  full plan builds per stage (subm st1-4, down st1->2/2->3/3->4)
  3  subm st1+st2 internals: query gen | row gather only | full lookup |
     pack_keys; plus table-SIZE sensitivity (12 MB st1 table vs 1.5 MB
     st2 table, same query count)
  4  down st1->2 internals: cand gen | occupancy scatter+OR | +pack |
     rank lookup | gidx scatter | out_coords decode loop

Methodology per CLAUDE.md: in-graph fori chains (IT=8), runtime-zero
perturbation threaded into coords (plan builds depend only on coords),
scalar fetch, (T - RTT)/IT.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

SECTIONS = set(
    int(s) for s in os.environ.get("DF3D_PROBE_SECTIONS", "1,2,3,4").split(","))

IT = 8
CAPS = (102_400, 73_728, 27_648, 10_240)
GRID = (40, 1440, 1440)
PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOX = (0.075, 0.075, 0.2)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops import keytable
    from df3d.ops.sparse import (
        SparseTensor, build_conv_plan, build_subm_plan, _INT_MAX,
    )
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
        print(f"{name:42s} {per*1e3:7.2f} ms  (compile {t1c-t0c:.0f}s)",
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
        """Runtime-zero int (perturbs coords without changing them)."""
        return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)

    cfg = CenterPointConfig(max_voxels=CAPS[0], stage_caps=CAPS)

    def vox(p, v):
        return voxelize_batch(p, v, VOX, PC_RANGE, GRID, CAPS[0], 10)

    res = jax.jit(vox)(points, valid)
    st1 = SparseTensor(jnp.zeros((1, CAPS[0], 16), jnp.float32), res.coords,
                       cfg.sparse_shape, rows_sorted=True)

    def chainplans(st):
        d2 = build_conv_plan(st, 3, 2, 1, max_out=CAPS[1])
        st2 = SparseTensor(jnp.zeros((1, CAPS[1], 32)), d2.out_coords,
                           d2.out_spatial_shape, rows_sorted=True)
        d3 = build_conv_plan(st2, 3, 2, 1, max_out=CAPS[2])
        st3 = SparseTensor(jnp.zeros((1, CAPS[2], 64)), d3.out_coords,
                           d3.out_spatial_shape, rows_sorted=True)
        d4 = build_conv_plan(st3, 3, 2, (0, 1, 1), max_out=CAPS[3])
        st4 = SparseTensor(jnp.zeros((1, CAPS[3], 128)), d4.out_coords,
                           d4.out_spatial_shape, rows_sorted=True)
        return st2, st3, st4

    st2, st3, st4 = jax.jit(chainplans)(st1)
    for s, name in ((st1, "st1"), (st2, "st2"), (st3, "st3"), (st4, "st4")):
        print(f"  {name}: {int(s.valid.sum())} voxels, {s.spatial_shape}",
              flush=True)

    # --- section 1: e2e refresher ---------------------------------------
    if 1 in SECTIONS:
        def vox_chain(p0):
            def body(i, carry):
                p, s = carry
                r = vox(p, valid)
                s2 = r.features.sum()
                return (p + s2 * 1e-38, s2)
            return lax.fori_loop(0, IT, body, (p0, jnp.float32(0)))[1]

        timeit("voxelize 260k raycast", jax.jit(vox_chain), points)

        model = CenterPoint(cfg)
        variables = jax.jit(lambda f_, c: model.init(
            jax.random.PRNGKey(0), f_, c, train=False))(
                res.features, res.coords)

        def fwd_chain(p0):
            def body(i, carry):
                p, s = carry
                r = vox(p, valid)
                preds, _ = model.apply(variables, r.features, r.coords,
                                       train=False,
                                       packed_table=r.packed_table)
                out = centerpoint_predict(cfg, preds)
                s2 = out["scores"].sum()
                return (p + s2 * jnp.float32(1e-38), s2)
            return lax.fori_loop(0, IT, body, (points, jnp.float32(0)))[1]

        timeit("e2e fwd (vox+bb+neck+head+pred)", jax.jit(fwd_chain), points)

    # --- section 2: full plan builds ------------------------------------
    def subm_chain(st_):
        grid = st_.spatial_shape

        def run(coords):
            def body(i, carry):
                c, s = carry
                p = build_subm_plan(
                    SparseTensor(st_.features, c, grid, rows_sorted=True), 3)
                s2 = p.gather_idx[0, 0]
                return (c + rt0(s2.astype(jnp.float32)), s2)
            return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
        return jax.jit(run)

    def down_chain(st_, mo, pad=1):
        grid = st_.spatial_shape

        def run(coords):
            def body(i, carry):
                c, s = carry
                p = build_conv_plan(
                    SparseTensor(st_.features, c, grid, rows_sorted=True),
                    3, 2, pad, max_out=mo)
                s2 = p.gather_idx[0, 0]
                return (c + rt0(s2.astype(jnp.float32)), s2)
            return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
        return jax.jit(run)

    if 2 in SECTIONS:
        timeit("subm_plan st1", subm_chain(st1), st1.coords)
        timeit("subm_plan st2", subm_chain(st2), st2.coords)
        timeit("subm_plan st3", subm_chain(st3), st3.coords)
        timeit("subm_plan st4", subm_chain(st4), st4.coords)
        timeit("down_plan st1->2", down_chain(st1, CAPS[1]), st1.coords)
        timeit("down_plan st2->3", down_chain(st2, CAPS[2]), st2.coords)
        timeit("down_plan st3->4", down_chain(st3, CAPS[3], (0, 1, 1)),
               st3.coords)

    # --- section 3: subm internals + table-size sensitivity -------------
    def subm_queries(st_):
        """Static clone of build_subm_plan's query gen for one sample."""
        z, y, x = st_.spatial_shape
        coords, keys, valid_ = st_.coords[0], st_.keys()[0], st_.valid[0]
        cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]
        qs, oks = [], []
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ok_t = valid_
                    if dz:
                        ok_t = ok_t & (cz + dz >= 0) & (cz + dz < z)
                    if dy:
                        ok_t = ok_t & (cy + dy >= 0) & (cy + dy < y)
                    if dx:
                        ok_t = ok_t & (cx + dx >= 0) & (cx + dx < x)
                    qs.append(keys + ((dz * y + dy) * x + dx))
                    oks.append(ok_t)
        return jnp.stack(qs).reshape(-1), jnp.stack(oks).reshape(-1), keys, valid_

    if 3 in SECTIONS:
        for st_, nm in ((st1, "st1"), (st2, "st2")):
            z, y, x = st_.spatial_shape
            cells = z * y * x
            n = st_.num_rows

            def qgen_chain(coords):
                def body(i, carry):
                    c, s = carry
                    stq = SparseTensor(st_.features, c, st_.spatial_shape,
                                       rows_sorted=True)
                    q, ok, keys, valid_ = subm_queries(stq)
                    s2 = (q.sum() + ok.sum()).astype(jnp.int32)
                    return (c + rt0(s2.astype(jnp.float32)), s2)
                return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]

            timeit(f"subm {nm}: query gen only", jax.jit(qgen_chain),
                   st_.coords)

            def pack_chain(coords):
                def body(i, carry):
                    c, s = carry
                    stq = SparseTensor(st_.features, c, st_.spatial_shape,
                                       rows_sorted=True)
                    packed = keytable.pack_keys(stq.keys()[0], stq.valid[0],
                                                cells)
                    s2 = packed[0, 0]
                    return (c + rt0(s2.astype(jnp.float32)), s2)
                return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]

            timeit(f"subm {nm}: pack_keys only", jax.jit(pack_chain),
                   st_.coords)

            # row-gather only vs full lookup, same queries (prebuilt once,
            # perturbed through q)
            q0, ok0, keys0, valid0 = jax.jit(
                lambda c: subm_queries(SparseTensor(
                    st_.features, c, st_.spatial_shape, rows_sorted=True))
            )(st_.coords)
            packed0 = jax.jit(
                lambda k, v: keytable.pack_keys(k, v, cells))(keys0, valid0)
            nblk = packed0.shape[0]

            dn = lax.GatherDimensionNumbers(
                offset_dims=(0,), collapsed_slice_dims=(0,),
                start_index_map=(0,))

            def gather_chain(q):
                def body(i, carry):
                    qq, s = carry
                    blk = jnp.where(ok0, qq // keytable.BLOCK_CELLS, nblk)
                    row = lax.gather(packed0, blk[:, None], dn,
                                     slice_sizes=(1, 16), mode="clip")
                    s2 = row[0].sum()
                    return (qq + rt0(s2.astype(jnp.float32)), s2)
                return lax.fori_loop(0, IT, body, (q, jnp.int32(0)))[1]

            timeit(f"subm {nm}: row gather only (27N)",
                   jax.jit(gather_chain), q0)

            def lookup_chain(q):
                def body(i, carry):
                    qq, s = carry
                    r = keytable.lookup(packed0, qq, ok0, n)
                    s2 = r[0]
                    return (qq + rt0(s2.astype(jnp.float32)), s2)
                return lax.fori_loop(0, IT, body, (q, jnp.int32(0)))[1]

            timeit(f"subm {nm}: full lookup (27N)",
                   jax.jit(lookup_chain), q0)

        # size sensitivity: st1's 2.76M queries against the SMALL st2 table
        q1, ok1, _, _ = jax.jit(
            lambda c: subm_queries(SparseTensor(
                st1.features, c, st1.spatial_shape, rows_sorted=True))
        )(st1.coords)
        z2, y2, x2 = st2.spatial_shape
        cells2 = z2 * y2 * x2
        packed_small = jax.jit(lambda k, v: keytable.pack_keys(
            k, v, cells2))(st2.keys()[0], st2.valid[0])
        n2 = st2.num_rows

        def small_chain(q):
            qmod = q % cells2

            def body(i, carry):
                qq, s = carry
                r = keytable.lookup(packed_small, qq, ok1, n2)
                s2 = r[0]
                return (qq + rt0(s2.astype(jnp.float32)), s2)
            return lax.fori_loop(0, IT, body, (qmod, jnp.int32(0)))[1]

        timeit("st1-count lookups vs SMALL table", jax.jit(small_chain), q1)

    # --- section 4: down st1->2 internals -------------------------------
    if 4 in SECTIONS:
        z, y, x = st1.spatial_shape
        oz, oy, ox = (z + 2 - 3) // 2 + 1, (y + 2 - 3) // 2 + 1, (x + 2 - 3) // 2 + 1
        cells_out = oz * oy * ox
        n = st1.num_rows
        max_out = CAPS[1]
        k_count = 27
        cand_list = [(a, b, c) for a in range(2) for b in range(2)
                     for c in range(2)]

        def cand_parts(coords):
            """Rebuild the candidate streams (clone of build_conv_plan)."""
            valid_ = coords[:, 0] >= 0
            keys = jnp.where(
                valid_, (coords[:, 0] * y + coords[:, 1]) * x + coords[:, 2],
                _INT_MAX)
            tz = coords[:, 0] + 1
            ty = coords[:, 1] + 1
            tx = coords[:, 2] + 1
            o0z, o0y, o0x = tz // 2, ty // 2, tx // 2
            ckeys, taps = [], []
            for az, ay, ax in cand_list:
                co_z, co_y, co_x = o0z - az, o0y - ay, o0x - ax
                rz, ry, rx = tz - co_z * 2, ty - co_y * 2, tx - co_x * 2
                ok_c = (valid_ & (rz < 3) & (ry < 3) & (rx < 3)
                        & (co_z >= 0) & (co_y >= 0) & (co_x >= 0)
                        & (co_z < oz) & (co_y < oy) & (co_x < ox))
                ckeys.append(jnp.where(
                    ok_c, (co_z * oy + co_y) * ox + co_x, _INT_MAX))
                taps.append((rz * 3 + ry) * 3 + rx)
            return (jnp.stack(ckeys).reshape(-1), jnp.stack(taps).reshape(-1),
                    valid_, tz, ty, tx, o0z, o0y, o0x)

        def occ_parts(valid_, tz, ty, tx, o0z, o0y, o0x):
            ez, ey, ex = oz + 1, oy + 1, ox + 1
            ecells = ez * ey * ex
            nplanes = 8
            r0z, r0y, r0x = tz - o0z * 2, ty - o0y * 2, tx - o0x * 2
            par = (r0z * 2 + r0y) * 2 + r0x
            ekey = (o0z * ey + o0y) * ex + o0x
            pidx = jnp.where(valid_, par * ecells + ekey, nplanes * ecells)
            h = jnp.zeros((nplanes * ecells,), bool).at[pidx].set(
                True, mode="drop").reshape(nplanes, ez, ey, ex)
            occ4 = jnp.zeros((oz, oy, ox), bool)
            for az, ay, ax in cand_list:
                sl = h[:, az:az + oz, ay:ay + oy, ax:ax + ox]
                for p in range(nplanes):
                    pz = p // 4
                    py = (p // 2) % 2
                    px = p % 2
                    if pz + az * 2 >= 3 or py + ay * 2 >= 3 or px + ax * 2 >= 3:
                        continue
                    occ4 = occ4 | sl[p]
            return occ4

        def chain(fn):
            def run(coords):
                def body(i, carry):
                    c, s = carry
                    s2 = fn(c)
                    return (c + rt0(s2.astype(jnp.float32)), s2)
                return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
            return jax.jit(run)

        def f_cand(c):
            ck, tp, *_ = cand_parts(c[0])
            return (ck.sum() + tp.sum()).astype(jnp.int32)

        timeit("down st1->2: cand gen only", chain(f_cand), st1.coords)

        def f_occ(c):
            _, _, valid_, tz, ty, tx, o0z, o0y, o0x = cand_parts(c[0])
            occ4 = occ_parts(valid_, tz, ty, tx, o0z, o0y, o0x)
            return occ4.sum(dtype=jnp.int32)

        timeit("down st1->2: +occupancy scatter/OR", chain(f_occ), st1.coords)

        def f_pack(c):
            _, _, valid_, tz, ty, tx, o0z, o0y, o0x = cand_parts(c[0])
            occ4 = occ_parts(valid_, tz, ty, tx, o0z, o0y, o0x)
            packed = keytable.pack_occupancy(occ4.reshape(-1), cells_out)
            return packed[0, 0]

        timeit("down st1->2: +pack_occupancy", chain(f_pack), st1.coords)

        def f_rank(c):
            ck, tp, valid_, tz, ty, tx, o0z, o0y, o0x = cand_parts(c[0])
            occ4 = occ_parts(valid_, tz, ty, tx, o0z, o0y, o0x)
            packed = keytable.pack_occupancy(occ4.reshape(-1), cells_out)
            live0 = ck != _INT_MAX
            rank = keytable.lookup(
                packed, jnp.minimum(ck, cells_out - 1), live0, max_out)
            return rank[0]

        timeit("down st1->2: +rank lookup (8N)", chain(f_rank), st1.coords)

        def f_scatter(c):
            ck, tp, valid_, tz, ty, tx, o0z, o0y, o0x = cand_parts(c[0])
            occ4 = occ_parts(valid_, tz, ty, tx, o0z, o0y, o0x)
            packed = keytable.pack_occupancy(occ4.reshape(-1), cells_out)
            live0 = ck != _INT_MAX
            rank = keytable.lookup(
                packed, jnp.minimum(ck, cells_out - 1), live0, max_out)
            live = live0 & (rank < max_out)
            slot = jnp.where(live, rank, max_out)
            flat_pos = jnp.where(
                live, jnp.clip(tp, 0, k_count - 1) * max_out + slot,
                max_out * k_count)
            rows_src = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None],
                (len(cand_list), n)).reshape(-1)
            gidx = jnp.full((max_out * k_count + 1,), n, jnp.int32).at[
                flat_pos].set(rows_src, mode="drop")[:-1]
            return gidx[0]

        timeit("down st1->2: +gidx scatter", chain(f_scatter), st1.coords)
        print("(deltas between consecutive rows isolate each step)",
              flush=True)


if __name__ == "__main__":
    main()
