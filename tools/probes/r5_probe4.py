"""Round-5 probe 4: is the down-plan rank lookup slow (12.8 ns/q, probe 3)
because DEAD candidate queries (~58% of the 8N stream) clamp to the LAST
table block, shattering the otherwise-monotone gather address stream that
subm lookups enjoy (~3 ns/q)?

  F. floor: constant prebuilt queries + constant table (pure lookup)
  G. F but with dead queries REWRITTEN to the (clamped) floor-div cell of
     their own input — nearby addresses, stream stays locally monotone
  K. live pipeline (cand gen in-graph) with the nearby fallback
  L. K at down st2->3 scale
  M. correctness: ranks with fallback addresses + q_ok masking == shipped
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

IT = 8
CAPS = (102_400, 73_728, 27_648)
GRID = (40, 1440, 1440)
PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOX = (0.075, 0.075, 0.2)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from df3d.ops import keytable
    from df3d.ops.sparse import SparseTensor, _INT_MAX, build_conv_plan
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

    def make_parts(z, y, x, oz, oy, ox, nearby):
        cells_out = oz * oy * ox
        cand_list = [(a, b, c) for a in range(2) for b in range(2)
                     for c in range(2)]

        def cand_parts(coords):
            valid_ = coords[:, 0] >= 0
            tz, ty, tx = coords[:, 0] + 1, coords[:, 1] + 1, coords[:, 2] + 1
            o0z, o0y, o0x = tz // 2, ty // 2, tx // 2
            # clamped floor-div cell: a VALID nearby table address for dead
            # candidates (result still masked by ok)
            fz = jnp.clip(o0z, 0, oz - 1)
            fy = jnp.clip(o0y, 0, oy - 1)
            fx = jnp.clip(o0x, 0, ox - 1)
            fallback = (fz * oy + fy) * ox + fx
            ckeys, oks = [], []
            for az, ay, ax in cand_list:
                co_z, co_y, co_x = o0z - az, o0y - ay, o0x - ax
                rz, ry, rx = tz - co_z * 2, ty - co_y * 2, tx - co_x * 2
                ok_c = (valid_ & (rz < 3) & (ry < 3) & (rx < 3)
                        & (co_z >= 0) & (co_y >= 0) & (co_x >= 0)
                        & (co_z < oz) & (co_y < oy) & (co_x < ox))
                real = (co_z * oy + co_y) * ox + co_x
                if nearby:
                    ckeys.append(jnp.where(ok_c, real, fallback))
                else:
                    ckeys.append(jnp.where(ok_c, real, cells_out - 1))
                oks.append(ok_c)
            return (jnp.stack(ckeys).reshape(-1),
                    jnp.stack(oks).reshape(-1), valid_, tz, ty, tx,
                    o0z, o0y, o0x)

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
            for az, ay, ax in cand_list:
                sl = h[:, az:az + oz, ay:ay + oy, ax:ax + ox]
                for p in range(8):
                    pz, py, px = p // 4, (p // 2) % 2, p % 2
                    if (pz + az * 2 >= 3 or py + ay * 2 >= 3
                            or px + ax * 2 >= 3):
                        continue
                    occ4 = occ4 | sl[p]
            return keytable.pack_occupancy(occ4.reshape(-1), cells_out)

        return cand_parts, occ_pack

    def chain(fn, init):
        def run(coords):
            def body(i, carry):
                c, s = carry
                s2 = fn(c)
                return (c + rt0(s2.astype(jnp.float32)), s2)
            return lax.fori_loop(0, IT, body, (coords, jnp.int32(0)))[1]
        return jax.jit(run)

    # --- st1->2 scale -----------------------------------------------------
    cp_far, op_far = make_parts(41, 1440, 1440, 21, 720, 720, nearby=False)
    cp_near, _ = make_parts(41, 1440, 1440, 21, 720, 720, nearby=True)
    max_out = CAPS[1]

    q_far, ok0, *occ_args0 = jax.jit(lambda c: cp_far(c[0]))(coords0)
    q_near = jax.jit(lambda c: cp_near(c[0])[0])(coords0)
    packed0 = jax.jit(lambda c: op_far(*cp_far(c[0])[2:]))(coords0)

    def f_const(q):
        def g(c):
            # runtime-zero perturbation the compiler cannot fold away
            pert = jnp.where(c[0, 0, 0] > jnp.int32(2**30), 1, 0)
            r = keytable.lookup(packed0, q + pert, ok0, max_out)
            return r[0]
        return g

    timeit("F  const q (far fallback)", chain(f_const(q_far), None), coords0)
    timeit("G  const q (nearby fallback)", chain(f_const(q_near), None),
           coords0)

    def f_live(cp):
        def g(c):
            q, ok, *occ_args = cp(c[0])
            packed = op_far(*occ_args)
            r = keytable.lookup(packed, q, ok, max_out)
            return r[0]
        return g

    timeit("K  live pipeline (nearby)", chain(f_live(cp_near), None), coords0)
    timeit("K' live pipeline (far, = shipped)", chain(f_live(cp_far), None),
           coords0)

    # correctness: identical ranks where ok (and miss elsewhere)
    r_far = jax.jit(lambda: keytable.lookup(packed0, q_far, ok0, max_out))()
    r_near = jax.jit(lambda: keytable.lookup(packed0, q_near, ok0, max_out))()
    print("M  nearby == shipped ranks:", bool(jnp.all(r_far == r_near)),
          flush=True)

    # --- st2->3 scale -----------------------------------------------------
    st1 = SparseTensor(jnp.zeros((1, CAPS[0], 16), jnp.float32), res.coords,
                       (41, 1440, 1440), rows_sorted=True)
    d2 = jax.jit(lambda s: build_conv_plan(s, 3, 2, 1, max_out=CAPS[1]))(st1)
    coords2 = d2.out_coords

    cp2_far, op2_far = make_parts(21, 720, 720, 11, 360, 360, nearby=False)
    cp2_near, _ = make_parts(21, 720, 720, 11, 360, 360, nearby=True)

    def f_live2(cp):
        def g(c):
            q, ok, *occ_args = cp(c[0])
            packed = op2_far(*occ_args)
            r = keytable.lookup(packed, q, ok, CAPS[2])
            return r[0]
        return g

    timeit("L  st2->3 live (nearby)", chain(f_live2(cp2_near), None), coords2)
    timeit("L' st2->3 live (far, = shipped)", chain(f_live2(cp2_far), None),
           coords2)


if __name__ == "__main__":
    main()
