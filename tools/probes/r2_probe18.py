"""Probe 18: realistic synthetic lidar generator — measure stage occupancies
to pick honest serving caps (uniform-random points give pathological
downsample behavior: down2 of 120k uniform voxels has ~113k unique outputs,
unlike any real frame)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax
import jax.numpy as jnp


def make_frame(rng, n_points=260_000):
    """Lidar-like frame: ego-concentrated ground rings + object clusters +
    building blobs. Tuned to land ~90-110k occupied 0.075m voxels like a
    10-sweep nuScenes frame."""
    n_ground = int(n_points * 0.55)
    n_obj = int(n_points * 0.30)
    n_big = n_points - n_ground - n_obj
    # ground: radial density falls off like real rings
    r = 54.0 * rng.rand(n_ground) ** 1.7
    th = rng.rand(n_ground) * 2 * np.pi
    g = np.stack([r * np.cos(th), r * np.sin(th),
                  -1.8 + 0.04 * rng.randn(n_ground) + 0.006 * r], -1)
    # objects: 180 car/pedestrian-ish clusters
    nobj = 180
    c = np.stack([54 * (rng.rand(nobj) ** 1.3) * np.cos(rng.rand(nobj) * 6.28),
                  54 * (rng.rand(nobj) ** 1.3) * np.sin(rng.rand(nobj) * 6.28),
                  rng.uniform(-1.5, 0.5, nobj)], -1)
    a = rng.randint(0, nobj, n_obj)
    o = c[a] + rng.randn(n_obj, 3) * np.array([0.9, 0.45, 0.45])
    # buildings/vegetation: 40 big blobs
    nbig = 40
    cb = np.stack([rng.uniform(-54, 54, nbig), rng.uniform(-54, 54, nbig),
                   rng.uniform(-1, 2.5, nbig)], -1)
    ab = rng.randint(0, nbig, n_big)
    bpts = cb[ab] + rng.randn(n_big, 3) * np.array([5.0, 5.0, 1.2])
    xyz = np.concatenate([g, o, bpts]).astype(np.float32)
    np.clip(xyz[:, 0], -54, 54, out=xyz[:, 0])
    np.clip(xyz[:, 1], -54, 54, out=xyz[:, 1])
    np.clip(xyz[:, 2], -5, 3, out=xyz[:, 2])
    extra = rng.rand(n_points, 2).astype(np.float32)
    return np.concatenate([xyz, extra], -1)


def main():
    from df3d.ops.sparse import SparseTensor, build_conv_plan
    from df3d.ops.voxelize import voxelize_batch

    rng = np.random.RandomState(0)
    pts = jnp.asarray(make_frame(rng)[None])
    valid = jnp.ones(pts.shape[:2], bool)
    GRID = (40, 1440, 1440)
    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, (0.075, 0.075, 0.2), (-54, -54, -5, 54, 54, 3), GRID,
        150_000, 10))(pts, valid)
    n1 = int(res.num_voxels[0])
    print(f"stage1 occupancy: {n1}")

    st = SparseTensor(jnp.zeros((1, 150_000, 5)), res.coords, GRID,
                      rows_sorted=True)
    def chain(st):
        outs = []
        caps = (140_000, 140_000, 140_000)
        pads = (1, 1, (0, 1, 1))
        for i in range(3):
            d = build_conv_plan(st, 3, 2, pads[i], max_out=caps[i])
            st = SparseTensor(jnp.zeros((1, caps[i], 5)), d.out_coords,
                              d.out_spatial_shape, rows_sorted=True)
            outs.append(st.valid.sum())
        return outs
    outs = jax.jit(chain)(st)
    for i, o in enumerate(outs):
        print(f"stage{i+2} occupancy: {int(o)}")


if __name__ == "__main__":
    main()
