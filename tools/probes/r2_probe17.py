"""Probe 17: dense tail costs at CenterPoint 0.075 scale — BEV neck, head,
predict (decode+NMS), voxelize internals; f32 vs bf16 for the dense parts."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8
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
    print(f"{name:40s} {(best-RTT)/ITERS*1000:8.2f} ms/iter (compile {c:.0f}s,"
          f" sink {s:.3g})", flush=True)

from df3d.models.necks import BEVBackbone
from df3d.models.heads.center_head import CenterHead
from df3d.models.detectors.centerpoint import (
    CenterPoint, CenterPointConfig, centerpoint_predict)

cfg = CenterPointConfig(max_voxels=120_000,
                        stage_caps=(120_000, 90_000, 60_000, 30_000))
bev0 = jnp.asarray(rng.randn(1, 180, 180, 256).astype(np.float32) * 0.1)
neck = BEVBackbone(layer_nums=(5, 5), layer_strides=(1, 2),
                   num_filters=(128, 256), upsample_strides=(1, 2),
                   num_upsample_filters=(256, 256))
nv = jax.jit(lambda b: neck.init(jax.random.PRNGKey(0), b, False))(bev0)
neck_out = jax.jit(lambda v, b: neck.apply(v, b, False))(nv, bev0)
head = CenterHead(cfg.tasks)
hv = jax.jit(lambda x: head.init(jax.random.PRNGKey(0), x, False))(neck_out)

def neck_chain(v, b0):
    def body(i, carry):
        b, s = carry
        o = neck.apply(v, b, False)
        s2 = o.astype(jnp.float32).sum()
        return (b + (s2 * 1e-38).astype(b.dtype), s2)
    return lax.fori_loop(0, ITERS, body, (b0, jnp.float32(0)))[1]

nv16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, nv)
timed("neck bf16", neck_chain, nv16, bev0.astype(jnp.bfloat16))

def head_chain(v, x0):
    def body(i, carry):
        x, s = carry
        preds = head.apply(v, x, False)
        s2 = sum(m.astype(jnp.float32).sum() for t in preds for m in t.values())
        return (x + s2 * jnp.float32(1e-38), s2)
    return lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0)))[1]

timed("head f32", head_chain, hv, neck_out)

preds0 = jax.jit(lambda v, x: head.apply(v, x, False))(hv, neck_out)

def pred_chain(p0):
    def body(i, carry):
        p, s = carry
        out = centerpoint_predict(cfg, p)
        s2 = out["scores"].sum()
        return (jax.tree_util.tree_map(
            lambda a: a + s2.astype(a.dtype) * 1e-38, p), s2)
    return lax.fori_loop(0, ITERS, body, (p0, jnp.float32(0)))[1]

timed("predict (decode+NMS)", pred_chain, preds0)

# voxelize internals: sort-only vs full
from df3d.ops.voxelize import voxelize_batch
pts = np.concatenate(
    [rng.uniform(-54, 54, (1, 260_000, 2)),
     rng.uniform(-5, 3, (1, 260_000, 1)),
     rng.uniform(0, 1, (1, 260_000, 2))], -1).astype(np.float32)
points = jnp.asarray(pts)
valid = jnp.ones(points.shape[:2], bool)

def sort_chain(p0):
    def body(i, carry):
        p, s = carry
        key = (p[0, :, 0] * 1000).astype(jnp.int32)
        order = jnp.argsort(key, stable=True)
        s2 = jnp.float32(order.sum())
        return (p + s2 * 1e-38, s2)
    return lax.fori_loop(0, ITERS, body, (p0, jnp.float32(0)))[1]

timed("argsort 260k (voxelize part)", sort_chain, points)
