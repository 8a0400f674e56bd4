"""Checkpoint save/prune/auto-resume + one real Runner step on a tiny
CenterPoint (the torchie-Trainer/mmcv-Runner replacement, SURVEY §2.7/5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from df3d.models.detectors.centerpoint import CenterPointConfig
from df3d.train.checkpoint import (
    list_checkpoints, restore_latest, save_checkpoint,
)
from df3d.train.loop import Runner
from df3d.train.schedules import adam_onecycle
from df3d.train.trainer import create_centerpoint_state, make_centerpoint_train_step

TINY = CenterPointConfig(
    pc_range=(-16.0, -16.0, -2.4, 16.0, 16.0, 2.4),
    voxel_size=(0.5, 0.5, 0.2),
    grid_size=(24, 64, 64),
    max_voxels=256,
    num_point_features=4,
    stage_caps=(256, 192, 128, 96),
    tasks=(1, 2),
    max_objs=8,
    nms_pre_max_size=64,
    nms_post_max_size=8,
)


def _batch(rng, b=1, p=300):
    return {
        "points": jnp.asarray(
            np.concatenate(
                [rng.uniform(-15, 15, (b, p, 2)), rng.uniform(-1.8, 1.8, (b, p, 1)),
                 rng.uniform(0, 1, (b, p, 1))], -1,
            ).astype(np.float32)
        ),
        "points_valid": jnp.ones((b, p), bool),
        "gt_boxes": jnp.asarray(
            np.tile(np.array([[[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3, 0, 0]]],
                             np.float32), (b, 4, 1))
        ),
        "gt_classes": jnp.zeros((b, 4), jnp.int32),
        "gt_valid": jnp.ones((b, 4), bool).at[:, 2:].set(False),
    }


def test_checkpoint_roundtrip_and_prune(tmp_path):
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    tx = adam_onecycle(1e-3, 10)
    model, state = create_centerpoint_state(
        TINY, jax.random.PRNGKey(0), tx, batch["points"]
    )
    for step in (1, 2, 3):
        save_checkpoint(tmp_path / "ckpt", state, step, max_keep=2)
    steps = [s for s, _ in list_checkpoints(tmp_path / "ckpt")]
    assert steps == [2, 3]  # pruned to max_keep

    restored, step = restore_latest(tmp_path / "ckpt", state)
    assert step == 3
    w0 = jax.tree_util.tree_leaves(state.params)[0]
    w1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


def test_runner_trains_and_logs(tmp_path):
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    tx = adam_onecycle(1e-3, 4)
    model, state = create_centerpoint_state(
        TINY, jax.random.PRNGKey(0), tx, batch["points"]
    )
    step = jax.jit(make_centerpoint_train_step(model, TINY))
    runner = Runner(step, state, tmp_path / "run", max_epochs=2,
                    log_interval=1)
    loss0 = None

    def data():
        for _ in range(2):
            yield batch

    out_state = runner.run(data)
    assert runner.global_step == 4
    assert (tmp_path / "run" / "train_log.jsonl").exists()
    assert list_checkpoints(tmp_path / "run" / "ckpt")
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).sum()), state.params, out_state.params
    )
    assert sum(jax.tree_util.tree_leaves(d)) > 0

    # auto-resume picks up the checkpoint
    runner2 = Runner(step, state, tmp_path / "run", max_epochs=2)
    runner2.resume()
    assert runner2.global_step == 4


def test_tb_scalar_writer_roundtrip(tmp_path):
    """The hand-rolled events file parses back: TFRecord framing (masked
    crc32c) + Event/Summary proto fields decode to the written scalars."""
    import struct

    from df3d.utils.tb_writer import ScalarWriter, _masked_crc

    w = ScalarWriter(tmp_path)
    w.add_scalar("train/loss", 1.5, 3)
    w.add_scalar("train/lr", 0.01, 3)
    w.close()

    f = next(tmp_path.glob("events.out.tfevents.*"))
    buf = f.read_bytes()
    records, off = [], 0
    while off < len(buf):
        (ln,) = struct.unpack_from("<Q", buf, off)
        (hcrc,) = struct.unpack_from("<I", buf, off + 8)
        assert hcrc == _masked_crc(buf[off:off + 8])
        data = buf[off + 12:off + 12 + ln]
        (dcrc,) = struct.unpack_from("<I", buf, off + 12 + ln)
        assert dcrc == _masked_crc(data)
        records.append(data)
        off += 16 + ln

    assert b"brain.Event:2" in records[0]
    # scalar events: tag bytes and the float payload are present
    assert b"train/loss" in records[1]
    assert struct.pack("<f", 1.5) in records[1]
    # field order is fixed: 0x09 + 8B wall_time, then 0x10 + step varint
    assert records[1][9] == 0x10 and records[1][10] == 3
    assert b"train/lr" in records[2]
    assert struct.pack("<f", 0.01) in records[2]
