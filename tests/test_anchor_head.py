import jax
import jax.numpy as jnp
import numpy as np

from df3d.core.box_coders import ResidualCoder
from df3d.models.heads import anchor_head as AH


CAR = AH.AnchorClassCfg(
    name="Car", size=(3.9, 1.6, 1.56), bottom_height=-1.78,
    matched_threshold=0.6, unmatched_threshold=0.45,
)


def test_generate_anchors_layout():
    a = AH.generate_anchors((4, 6), (0.0, -8.0, -3.0, 16.0, 8.0, 1.0), [CAR])
    assert a.shape == (6, 4, 1, 2, 7)
    # x varies along axis 1, y along axis 0; class axis 2 (location-major)
    assert np.allclose(a[0, :, 0, 0, 0], np.linspace(0, 16, 4))
    assert np.allclose(a[:, 0, 0, 0, 1], np.linspace(-8, 8, 6))
    # rotations
    assert np.allclose(a[0, 0, 0, :, 6], [0.0, 1.5707963])
    # z center = bottom + h/2
    assert np.allclose(a[..., 2], -1.78 + 1.56 / 2)


def test_multiclass_anchor_alignment():
    """Flattened anchors must be location-major (y, x, cls, rot) so they line
    up with the conv head's channel flattening; anchor_class_ids must match."""
    from df3d.models.detectors.voxel_rcnn import (
        VoxelRCNNConfig, anchor_class_ids, build_anchors,
    )

    ped = AH.AnchorClassCfg(
        name="Pedestrian", size=(0.8, 0.6, 1.73), bottom_height=-0.6,
        matched_threshold=0.5, unmatched_threshold=0.35,
    )
    cfg = VoxelRCNNConfig(
        grid_size=(40, 32, 32), anchor_classes=(CAR, ped),
    )
    anchors = np.asarray(build_anchors(cfg))
    ids = np.asarray(anchor_class_ids(cfg))
    ny, nx = cfg.bev_size_xy[1], cfg.bev_size_xy[0]
    assert anchors.shape == (ny * nx * 2 * 2, 7)
    assert ids.shape == (anchors.shape[0],)
    # within one location: [car_rot0, car_rot1, ped_rot0, ped_rot1]
    assert ids[:4].tolist() == [0, 0, 1, 1]
    first_loc = anchors[:4]
    assert np.allclose(first_loc[0, 3:6], CAR.size)
    assert np.allclose(first_loc[2, 3:6], ped.size)
    assert np.allclose(first_loc[:, 0], first_loc[0, 0])  # same x
    assert np.allclose(first_loc[:, 1], first_loc[0, 1])  # same y
    # class sizes agree with ids everywhere
    assert np.allclose(anchors[ids == 0][:, 3:6], CAR.size)
    assert np.allclose(anchors[ids == 1][:, 3:6], ped.size)


def test_assignment_positive_at_gt():
    anchors = jnp.asarray(
        AH.generate_anchors((8, 8), (0.0, -8.0, -3.0, 16.0, 8.0, 1.0), [CAR])
        .reshape(-1, 7)
    )
    gt = jnp.asarray(
        np.array([[8.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0]], np.float32)
    )
    labels, regs, _ = AH.assign_anchor_targets(
        anchors, gt, jnp.array([True]), 0.6, 0.45, ResidualCoder()
    )
    labels = np.asarray(labels)
    assert (labels == 1).sum() >= 1  # at least the force-matched best anchor
    assert (labels == 0).sum() > 0
    # positive anchors' targets decode back to the gt box
    coder = ResidualCoder()
    pos = labels == 1
    dec = coder.decode(regs[pos], anchors[pos])
    np.testing.assert_allclose(
        np.asarray(dec)[:, :6], np.tile(np.asarray(gt)[0, :6], (pos.sum(), 1)),
        atol=1e-3,
    )


def test_anchor_loss_finite_and_decode_shapes():
    rng = np.random.RandomState(0)
    b, a = 2, 128 * 2
    anchors = jnp.asarray(
        AH.generate_anchors((16, 8), (0.0, -8.0, -3.0, 16.0, 8.0, 1.0), [CAR])
        .reshape(-1, 7)
    )
    cls = jnp.asarray(rng.randn(b, a, 1).astype(np.float32))
    box = jnp.asarray(rng.randn(b, a, 7).astype(np.float32) * 0.1)
    dirp = jnp.asarray(rng.randn(b, a, 2).astype(np.float32))
    labels = jnp.asarray(rng.choice([-1, 0, 1], (b, a), p=[0.1, 0.8, 0.1]))
    regs = jnp.asarray(rng.randn(b, a, 7).astype(np.float32) * 0.1)
    gtc = jnp.zeros((b, a), jnp.int32)
    total, logs = AH.anchor_head_loss(
        cls, box, dirp, labels, regs, anchors, gtc, num_classes=1
    )
    assert np.isfinite(float(total))
    scores, boxes = AH.anchor_head_decode(cls, box, dirp, anchors, ResidualCoder())
    assert boxes.shape == (b, a, 7)
    assert np.isfinite(np.asarray(boxes)).all()
