"""Synthetic lidar frames for cap fitting and realistic-load benching.

Two generators:

- ``make_raycast_frame`` (canonical "realistic" frame): simulates a 32-beam
  spinning lidar over a scene of ground + oriented boxes (cars/trucks/peds,
  some moving) + building facades + poles, accumulated over 10 sweeps with
  ego motion — the same acquisition geometry as a real nuScenes key frame
  (reference det3d loading.py:199 accumulates 10 sweeps; the reference's own
  voxelize caps are 120k train / 160k test at 0.075 m, CenterPoint
  nusc_centerpoint_voxelnet_0075voxel_fix_bn_z.py:145). Points lie on
  surfaces sampled by ray geometry, so per-stage sparse-conv occupancy
  dilates like real scans (sub-linear), not like uniform noise (8x).

- ``make_frame`` (legacy blob variant): gaussian ground rings + point blobs.
  Measured occupancy is HEAVIER than real frames and even than uniform
  noise under strided dilation (227k stage-1 voxels, stage-2 dilates to
  ~487k at 0.075 m) because gaussian blobs are volume-scattered, not
  surfaces. Kept only for stress testing; cap fitting and the bench use
  the raycast frame.
"""

from __future__ import annotations

import numpy as np


def make_frame(rng: np.random.RandomState, n_points: int = 260_000,
               extra_features: int = 2) -> np.ndarray:
    """Legacy blob frame -> (n_points, 3 + extra_features) float32.

    Volume-scattered (NOT surface-like); dilates pathologically under
    strided sparse convs. Use make_raycast_frame for realistic load.
    """
    n_ground = int(n_points * 0.55)
    n_obj = int(n_points * 0.30)
    n_big = n_points - n_ground - n_obj
    # ground: radial density falls off like real rings
    r = 54.0 * rng.rand(n_ground) ** 1.7
    th = rng.rand(n_ground) * 2 * np.pi
    g = np.stack([r * np.cos(th), r * np.sin(th),
                  -1.8 + 0.04 * rng.randn(n_ground) + 0.006 * r], -1)
    # objects: car/pedestrian-ish clusters
    nobj = 180
    c = np.stack(
        [54 * (rng.rand(nobj) ** 1.3) * np.cos(rng.rand(nobj) * 6.28),
         54 * (rng.rand(nobj) ** 1.3) * np.sin(rng.rand(nobj) * 6.28),
         rng.uniform(-1.5, 0.5, nobj)], -1)
    a = rng.randint(0, nobj, n_obj)
    o = c[a] + rng.randn(n_obj, 3) * np.array([0.9, 0.45, 0.45])
    # buildings/vegetation: big blobs
    nbig = 40
    cb = np.stack([rng.uniform(-54, 54, nbig), rng.uniform(-54, 54, nbig),
                   rng.uniform(-1, 2.5, nbig)], -1)
    ab = rng.randint(0, nbig, n_big)
    bpts = cb[ab] + rng.randn(n_big, 3) * np.array([5.0, 5.0, 1.2])
    xyz = np.concatenate([g, o, bpts]).astype(np.float32)
    np.clip(xyz[:, 0], -54, 54, out=xyz[:, 0])
    np.clip(xyz[:, 1], -54, 54, out=xyz[:, 1])
    np.clip(xyz[:, 2], -5, 3, out=xyz[:, 2])
    extra = rng.rand(n_points, extra_features).astype(np.float32)
    return np.concatenate([xyz, extra], -1)


# ---------------------------------------------------------------------------
# ray-cast frame
# ---------------------------------------------------------------------------

_GROUND_Z = -1.8


def _scene(rng: np.random.RandomState):
    """Random urban-ish scene: oriented boxes, facades, poles."""
    # cars / trucks / pedestrians (oriented boxes); ~1/3 of cars move
    n_car, n_trk, n_ped = 52, 9, 18
    n = n_car + n_trk + n_ped
    r = 6.0 + 48.0 * rng.rand(n) ** 1.35
    th = rng.rand(n) * 2 * np.pi
    cx, cy = r * np.cos(th), r * np.sin(th)
    yaw = rng.rand(n) * 2 * np.pi
    dims = np.concatenate([
        np.array([[4.6, 1.9, 1.7]]) * (1 + 0.1 * rng.randn(n_car, 3)),
        np.array([[8.5, 2.6, 3.2]]) * (1 + 0.1 * rng.randn(n_trk, 3)),
        np.array([[0.7, 0.7, 1.7]]) * (1 + 0.1 * rng.randn(n_ped, 3)),
    ])
    cz = _GROUND_Z + dims[:, 2] / 2
    vel = np.zeros((n, 2))
    moving = rng.rand(n) < 0.3
    speed = rng.uniform(2.0, 11.0, n) * moving
    vel[:, 0] = speed * np.cos(yaw)
    vel[:, 1] = speed * np.sin(yaw)
    boxes = dict(c=np.stack([cx, cy, cz], -1), dims=dims, yaw=yaw, vel=vel)

    # building facades: long thin tall boxes at larger radii
    nf = 14
    rf = rng.uniform(22, 52, nf)
    tf = rng.rand(nf) * 2 * np.pi
    fyaw = tf + np.pi / 2 + 0.15 * rng.randn(nf)  # roughly tangential
    fdims = np.stack([rng.uniform(12, 35, nf), np.full(nf, 0.4),
                      rng.uniform(6, 14, nf)], -1)
    fc = np.stack([rf * np.cos(tf), rf * np.sin(tf),
                   _GROUND_Z + fdims[:, 2] / 2], -1)
    facades = dict(c=fc, dims=fdims, yaw=fyaw, vel=np.zeros((nf, 2)))

    # poles / trunks: thin vertical boxes
    npl = 36
    rp = 4.0 + 49.0 * rng.rand(npl) ** 1.2
    tp = rng.rand(npl) * 2 * np.pi
    pdims = np.stack([rng.uniform(0.15, 0.8, npl),
                      rng.uniform(0.15, 0.8, npl),
                      rng.uniform(3.0, 9.0, npl)], -1)
    pc = np.stack([rp * np.cos(tp), rp * np.sin(tp),
                   _GROUND_Z + pdims[:, 2] / 2], -1)
    poles = dict(c=pc, dims=pdims, yaw=np.zeros(npl), vel=np.zeros((npl, 2)))

    c = np.concatenate([boxes["c"], facades["c"], poles["c"]])
    dims = np.concatenate([boxes["dims"], facades["dims"], poles["dims"]])
    yaw = np.concatenate([boxes["yaw"], facades["yaw"], poles["yaw"]])
    vel = np.concatenate([boxes["vel"], facades["vel"], poles["vel"]])
    return c, dims, yaw, vel


def _cast(origin: np.ndarray, dirs: np.ndarray, c, dims, yaw):
    """Min-t ray/box + ray/ground intersection. dirs (R,3) unit."""
    R = len(dirs)
    t_best = np.full(R, np.inf)
    # ground plane
    dz = dirs[:, 2]
    tg = np.where(dz < -1e-6, (_GROUND_Z - origin[2]) / np.minimum(dz, -1e-6),
                  np.inf)
    t_best = np.minimum(t_best, np.where(tg > 0, tg, np.inf))
    # oriented boxes: slab test in box frame, batched (R, B)
    cos, sin = np.cos(yaw), np.sin(yaw)
    rel = c - origin  # (B, 3)
    # ray dir / box-center offset in each box frame (rotate by -yaw:
    # [cos, sin; -sin, cos])
    dx = dirs[:, None, 0] * cos + dirs[:, None, 1] * sin
    dy = -dirs[:, None, 0] * sin + dirs[:, None, 1] * cos
    ox = np.broadcast_to(-(rel[None, :, 0] * cos + rel[None, :, 1] * sin),
                         dx.shape)
    oy = np.broadcast_to(-(-rel[None, :, 0] * sin + rel[None, :, 1] * cos),
                         dx.shape)
    oz = np.broadcast_to(origin[2] - c[None, :, 2], dx.shape)
    dzb = np.broadcast_to(dirs[:, 2][:, None], dx.shape)
    eps = 1e-9
    t_lo = np.full(dx.shape, -np.inf)
    t_hi = np.full(dx.shape, np.inf)
    for o_, d_, h_ in ((ox, dx, dims[:, 0] / 2), (oy, dy, dims[:, 1] / 2),
                       (oz, dzb, dims[:, 2] / 2)):
        d_safe = np.where(np.abs(d_) < eps, eps, d_)
        t1 = (-h_[None, :] - o_) / d_safe
        t2 = (h_[None, :] - o_) / d_safe
        lo, hi = np.minimum(t1, t2), np.maximum(t1, t2)
        # parallel ray outside the slab: no hit
        miss = (np.abs(d_) < eps) & (np.abs(o_) > h_[None, :])
        lo = np.where(miss, np.inf, lo)
        t_lo = np.maximum(t_lo, lo)
        t_hi = np.minimum(t_hi, hi)
    hit = (t_hi >= t_lo) & (t_hi > 0)
    t_box = np.where(hit, np.where(t_lo > 0, t_lo, np.inf), np.inf)
    t_best = np.minimum(t_best, t_box.min(axis=1))
    return t_best


def make_raycast_frame(rng: np.random.RandomState,
                       n_points: int = 260_000,
                       extra_features: int = 2,
                       n_sweeps: int = 10,
                       n_azimuth: int = 1400,
                       n_beams: int = 32,
                       max_range: float = 70.0) -> np.ndarray:
    """Ray-cast 10-sweep lidar frame -> (n_points, 3+extra) float32.

    Surface-sampled points with realistic radial density falloff, moving
    objects smeared across sweeps, ego motion, range noise, and dropout.
    At the CenterPoint 0.075 m operating point a frame lands ~95-120k
    unique stage-1 voxels with surface-like (sub-linear) down-stage
    dilation — see tools/fit_caps.py --synthetic.
    """
    c, dims, yaw, vel = _scene(rng)
    el = np.deg2rad(np.linspace(-30.0, 10.0, n_beams))
    pts = []
    ego_speed = rng.uniform(1.0, 9.0)  # m/s
    dt_sweep = 0.05
    for s in range(n_sweeps):
        t_back = s * dt_sweep  # sweep s is t_back seconds in the past
        ego = np.array([-ego_speed * t_back, 0.0, 0.0])
        az = (np.arange(n_azimuth) + rng.rand()) * (2 * np.pi / n_azimuth)
        azg, elg = np.meshgrid(az, el, indexing="ij")
        dirs = np.stack([np.cos(elg) * np.cos(azg),
                         np.cos(elg) * np.sin(azg),
                         np.sin(elg)], -1).reshape(-1, 3)
        # move dynamic objects back in time
        cs = c.copy()
        cs[:, :2] -= vel * t_back
        t = _cast(ego, dirs, cs, dims, yaw)
        keep = np.isfinite(t) & (t < max_range) & (t > 1.0)
        keep &= rng.rand(len(t)) > 0.06  # dropout
        p = ego + dirs[keep] * (t[keep, None] +
                                0.015 * rng.randn(keep.sum(), 1))
        dtf = np.full((len(p), 1), t_back, np.float32)
        pts.append(np.concatenate([p, dtf], -1))
    allp = np.concatenate(pts).astype(np.float32)
    # crop to range and resample to exactly n_points
    m = ((np.abs(allp[:, 0]) < 54) & (np.abs(allp[:, 1]) < 54)
         & (allp[:, 2] > -5) & (allp[:, 2] < 3))
    allp = allp[m]
    if len(allp) >= n_points:
        sel = rng.choice(len(allp), n_points, replace=False)
    else:
        sel = np.concatenate([np.arange(len(allp)),
                              rng.choice(len(allp), n_points - len(allp))])
    allp = allp[sel]
    out = np.empty((n_points, 3 + extra_features), np.float32)
    out[:, :3] = allp[:, :3]
    if extra_features >= 1:
        out[:, 3] = rng.rand(n_points)  # intensity
    if extra_features >= 2:
        out[:, 4] = allp[:, 3]  # sweep dt, like the real 5th feature
    if extra_features > 2:
        out[:, 5:] = rng.rand(n_points, extra_features - 2)
    return out
