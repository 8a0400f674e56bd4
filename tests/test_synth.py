"""Ray-cast synthetic lidar frames (df3d/utils/synth.py)."""

import numpy as np

from df3d.utils.synth import make_frame, make_raycast_frame


def _small(seed=0, n=40_000):
    return make_raycast_frame(
        np.random.RandomState(seed), n_points=n, n_sweeps=3,
        n_azimuth=400, n_beams=24)


def test_raycast_shape_and_range():
    f = _small()
    assert f.shape == (40_000, 5) and f.dtype == np.float32
    assert np.abs(f[:, 0]).max() < 54 and np.abs(f[:, 1]).max() < 54
    assert f[:, 2].min() > -5 and f[:, 2].max() < 3
    # 5th feature is the sweep dt (multiples of 0.05)
    dts = np.unique(np.round(f[:, 4] / 0.05).astype(int))
    assert set(dts.tolist()) <= {0, 1, 2}
    # intensity in [0, 1)
    assert f[:, 3].min() >= 0 and f[:, 3].max() < 1


def test_raycast_deterministic_per_seed():
    a, b = _small(3), _small(3)
    np.testing.assert_array_equal(a, b)
    c = _small(4)
    assert np.abs(a[:, :3] - c[:, :3]).max() > 1.0


def test_raycast_is_surface_like():
    """Strided k3/s2 dilation must SHRINK the active set (surfaces), unlike
    volume-scattered blobs which inflate it ~2x (make_frame docstring).
    Needs near-full ray density — at the full 260k/10-sweep operating point
    the ratio is ~0.65; this 80k/2-sweep frame lands ~0.82."""
    f = make_raycast_frame(np.random.RandomState(1), n_points=80_000,
                           n_sweeps=2, n_azimuth=1400, n_beams=32)
    vs = np.array([0.075, 0.075, 0.2])
    c = np.floor((f[:, :3] - np.array([-54, -54, -5.0])) / vs).astype(np.int64)
    c = np.unique(c[:, [2, 1, 0]], axis=0)
    outs = []
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                num = c + np.array([1 - kz, 1 - ky, 1 - kx])
                o = num // 2
                m = (num % 2 == 0).all(1) & (o >= 0).all(1)
                outs.append(o[m])
    down = np.unique(np.concatenate(outs), axis=0)
    assert len(down) < 0.9 * len(c), (len(c), len(down))
    # most points share voxels with others (surface density, not scatter)
    assert len(c) < 0.6 * len(f)


def test_blob_frame_still_works():
    f = make_frame(np.random.RandomState(0), n_points=10_000)
    assert f.shape == (10_000, 5) and f.dtype == np.float32
