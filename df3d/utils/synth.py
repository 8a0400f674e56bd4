"""Surface-like synthetic lidar frames (ground rings + object clusters +
building blobs), tuned so a frame lands ~90-110k occupied 0.075 m voxels
like a 10-sweep nuScenes key frame.

Uniform-random points (bench.py round 1/2) saturate every static stage cap
and DILATE pathologically under strided sparse convs (down2 of 120k uniform
voxels has ~113k unique outputs; real surfaces don't) — this generator is
the realistic-occupancy counterpart for cap fitting (tools/fit_caps.py) and
the bench's surface variant. Promoted from tools/probes/r2_probe18.py.
"""

from __future__ import annotations

import numpy as np


def make_frame(rng: np.random.RandomState, n_points: int = 260_000,
               extra_features: int = 2) -> np.ndarray:
    """-> (n_points, 3 + extra_features) float32 lidar-like frame."""
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
