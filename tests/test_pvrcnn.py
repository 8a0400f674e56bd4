import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.detectors.pv_rcnn import PVRCNN, PVRCNNConfig, PVRCNNRoIHead
from df3d.models.detectors.voxel_rcnn import VoxelRCNNConfig
from df3d.models.heads.point_head import point_cls_loss, point_fg_labels
from df3d.models.pfe import VSAConfig, VSAScaleCfg
from df3d.ops.voxelize import voxelize_batch

TINY = PVRCNNConfig(
    base=VoxelRCNNConfig(
        pc_range=(0.0, -16.0, -2.4, 32.0, 16.0, 2.4),
        voxel_size=(0.5, 0.5, 0.2),
        grid_size=(24, 64, 64),
        max_voxels=256,
        num_point_features=4,
        stage_caps=(256, 192, 128, 96),
    ),
    vsa=VSAConfig(
        num_keypoints=32,
        scales=(VSAScaleCfg("conv3", 4, 1.2, nsample=4),),
        out_channels=32,
    ),
    roi_grid_size=3,
    roi_max_local=32,
    roi_nsample=4,
)


def test_pvrcnn_forward_and_point_loss():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 31, (1, 400, 1)), rng.uniform(-15, 15, (1, 400, 1)),
             rng.uniform(-1.8, 1.8, (1, 400, 1)), rng.uniform(0, 1, (1, 400, 1))],
            -1,
        ).astype(np.float32)
    )
    valid = jnp.ones((1, 400), bool)
    res = voxelize_batch(
        pts, valid, TINY.base.voxel_size, TINY.base.pc_range,
        TINY.base.grid_size, TINY.base.max_voxels, 5,
    )
    model = PVRCNN(TINY)
    vs = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, pts, valid, train=False
    )
    out = model.apply(vs, res.features, res.coords, pts, valid, train=False)
    assert out["keypoints"].shape == (1, 32, 3)
    assert out["kp_feats"].shape == (1, 32, 32)
    assert np.isfinite(np.asarray(out["kp_feats"])).all()

    gt = jnp.asarray(np.array([[[8.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0]]], np.float32))
    labels = point_fg_labels(out["keypoints"], gt, jnp.ones((1, 1), bool))
    loss = point_cls_loss(out["point_fg_logits"], labels)
    assert np.isfinite(float(loss))

    # ROI head over keypoints
    rois = jnp.asarray(
        np.array([[[8.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0],
                   [20.0, 5.0, 0.0, 4.0, 2.0, 1.6, 0.5]]], np.float32)
    )
    head = PVRCNNRoIHead(TINY)
    hv = head.init(
        jax.random.PRNGKey(1), rois, jnp.ones((1, 2), bool),
        out["keypoints"], out["kp_feats"], train=False,
    )
    cls, reg = head.apply(
        hv, rois, jnp.ones((1, 2), bool), out["keypoints"], out["kp_feats"],
        train=False,
    )
    assert cls.shape == (1, 2, 1) and reg.shape == (1, 2, 7)
