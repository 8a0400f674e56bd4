import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.fusion.aux_heads import (
    AuxSegHead, fused_aux_losses, render_fg_from_gt3d,
)
from df3d.models.image.dla import DLA


def test_dla_stage_shapes():
    m = DLA(channels=(8, 8, 16, 16, 32, 32), tree_levels=(1, 1, 1, 1))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(vs, x, mutable=["batch_stats"])
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]  # strides 4..32
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_render_fg_and_aux_losses():
    rng = np.random.RandomState(1)
    proj = jnp.asarray(
        np.array([[[60, -60, 0, 48], [0, -20, -60, 32], [1, 0, 0, 0]]], np.float32)
    )
    gt = jnp.asarray(np.array([[[10.0, 0.0, 0.0, 4, 2, 1.5, 0.0]]], np.float32))
    gt_valid = jnp.ones((1, 1), bool)
    fg = render_fg_from_gt3d(gt, gt_valid, proj, (16, 24), (64, 96))
    assert fg.shape == (1, 16, 24)
    assert float(fg.sum()) > 0  # the box lands in the image

    head = AuxSegHead()
    feat = jnp.asarray(rng.randn(1, 16, 24, 8).astype(np.float32))
    vs = head.init(jax.random.PRNGKey(0), feat)
    logits = head.apply(vs, feat)

    vfeat = jnp.asarray(rng.randn(1, 20, 8).astype(np.float32))
    total, logs = fused_aux_losses(
        logits, gt, gt_valid, proj, (64, 96),
        voxel_feats=vfeat, image_feats_at_voxels=vfeat * 0.9,
        voxel_mask=jnp.ones((1, 20), bool),
    )
    assert np.isfinite(float(total))
    assert "aux_seg_loss" in logs and "aux_consistency_loss" in logs
