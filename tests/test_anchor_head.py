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
    assert a.shape == (1, 6, 4, 2, 7)
    # x varies along axis 2, y along axis 1
    assert np.allclose(a[0, 0, :, 0, 0], np.linspace(0, 16, 4))
    assert np.allclose(a[0, :, 0, 0, 1], np.linspace(-8, 8, 6))
    # rotations
    assert np.allclose(a[0, 0, 0, :, 6], [0.0, 1.5707963])
    # z center = bottom + h/2
    assert np.allclose(a[0, ..., 2], -1.78 + 1.56 / 2)


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
