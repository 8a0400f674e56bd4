"""Probe 16: fusion-stack components at full TransFusion-3DDF scale.
Q=30k stage-4 voxels, 6 cams, levels (56,100),(28,50),(14,25), d=64."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

ITERS = 4
rng = np.random.RandomState(0)
_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time(); float(_f0(jnp.float32(1))); RTT = min(RTT, time.time()-t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)

def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time(); s = float(f(*args)); c = time.time()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.time(); s = float(f(*args)); best = min(best, time.time()-t0)
    print(f"{name:44s} {(best-RTT)/ITERS*1000:8.2f} ms/iter (compile {c:.0f}s,"
          f" sink {s:.3g})", flush=True)

def perturb(s):
    return jnp.where(s > jnp.float32(1e30), jnp.float32(1), jnp.float32(0))

N = 30_000
B = 1
xyz0 = jnp.asarray(rng.uniform(-54, 54, (B, N, 3)).astype(np.float32))
feat0 = jnp.asarray(rng.randn(B, N, 64).astype(np.float32) * 0.1)
valid0 = jnp.ones((B, N), bool)

# 1) chunked FPS
from df3d.ops.pointops import ball_query, furthest_point_sample

def p_fps(x0):
    def body(i, carry):
        x, s = carry
        idx = jax.vmap(lambda a, v: furthest_point_sample(a, v, 2048, 64))(
            x, valid0)
        s2 = jnp.float32(idx.sum())
        return (x + s2 * 1e-38, s2)
    return lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0)))[1]

timed("FPS 30k->2048 chunked64", p_fps, xyz0)

# 2) ball query 2048 centers x 30k
cidx = jnp.asarray(rng.randint(0, N, (B, 2048)).astype(np.int32))

def p_ball(x0):
    def body(i, carry):
        x, s = carry
        centers = jax.vmap(lambda a, ii: a[ii])(x, cidx)
        idx, mask = jax.vmap(
            lambda c, a, v: ball_query(c, a, v, 2.0, 32)
        )(centers, x, valid0)
        s2 = jnp.float32(idx.sum()) + jnp.float32(mask.sum())
        return (x + s2 * 1e-38, s2)
    return lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0)))[1]

timed("ball_query 2048x30k k32", p_ball, xyz0)

# 3) MSDA at 6-cam scale: Q=30k queries over B*=6 folded cams?
# module folds (B*6, per-cam Q) — probe the op at (6, 30k) worst case
from df3d.ops.msda import ms_deform_attn_t
SHAPES = ((56, 100), (28, 50), (14, 25))
LEN = sum(h*w for h, w in SHAPES)
val0 = jnp.asarray(rng.randn(6, LEN, 64).astype(np.float32) * 0.1)
BQ = 6 * N
loc0 = jnp.asarray(rng.rand(8*3*4*2, BQ).astype(np.float32))
att0 = jnp.asarray(rng.rand(8*3*4, BQ).astype(np.float32) / 96.0)

def p_msda(v0):
    def body(i, carry):
        v, s = carry
        out = ms_deform_attn_t(v, SHAPES, loc0, att0, 8)
        s2 = out.sum()
        return (v + s2 * 1e-38, s2)
    return lax.fori_loop(0, ITERS, body, (v0, jnp.float32(0)))[1]

timed("MSDA 6x30k q, L3 P4 H8 d8", p_msda, val0)

# 4) LocalTransformer full (fps+ball+encoder+scatter)
from df3d.models.fusion.pointformer import LocalTransformer
lt = LocalTransformer(2048, 2.0, 32, 64, 2)
vs = jax.jit(lambda x, f: lt.init(jax.random.PRNGKey(0), x, f, valid0))(
    xyz0, feat0)

def p_lt(f0):
    def body(i, carry):
        f, s = carry
        out = lt.apply(vs, xyz0, f, valid0)
        s2 = out.sum()
        return (f + s2 * 1e-38, s2)
    return lax.fori_loop(0, ITERS, body, (f0, jnp.float32(0)))[1]

timed("LocalTransformer full 30k", p_lt, feat0)
