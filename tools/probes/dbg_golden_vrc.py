"""Debug the VRC golden e2e failure: train once, then dissect the eval path.

Checks, in order:
  1. recall of eval_step predictions on the TRAIN batch with the IN-MEMORY
     trained state (isolates training quality from everything else)
  2. same with the RESTORED state (isolates checkpoint round-trip)
  3. per-frame eval through the CLI-style loader (bs1, uncropped-but-now-
     precropped clouds) with printed boxes vs gt (isolates loader/collate)
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp

from tests.test_golden_e2e import _write_kitti_fixture, tiny_vrc_preset


def _iou_recall(dets, gts, thr):
    from df3d.data.kitti import recall_counts

    rc = recall_counts(dets, gts)
    return {k: v for k, v in rc.items()}


def main():
    from df3d.data.kitti import KittiDataset
    from df3d.data.pipeline import make_batch
    from df3d.models.build import build_detector
    from df3d.models.detectors.voxel_rcnn import build_anchors, proposal_layer
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.checkpoint import restore_latest, save_checkpoint
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        make_voxelrcnn_eval_step, make_voxelrcnn_train_step,
        recalibrate_batch_stats,
    )

    tmp_path = pathlib.Path(tempfile.mkdtemp())
    root, info_path = _write_kitti_fixture(tmp_path)
    import os

    preset = tiny_vrc_preset()
    n_steps = int(os.environ.get("DBG_STEPS", "150"))
    lr = float(os.environ.get("DBG_LR", "3e-3"))

    built = build_detector(preset, adam_onecycle(lr, n_steps))
    dataset = KittiDataset(root, info_path, training=True)
    batch_np = make_batch([dataset[0], dataset[1]], 2000, 32,
                          preset.num_point_features)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("points", "points_valid", "gt_boxes", "gt_classes",
                      "gt_valid")}

    step = jax.jit(make_voxelrcnn_train_step(built.model, built.head, preset))
    state = built.state
    keys = jax.random.split(jax.random.PRNGKey(3), n_steps)
    state, logs0 = step(state, batch, keys[0])
    for k in keys[1:]:
        state, logs = step(state, batch, k)
    print("loss", float(logs0["loss"]), "->", float(logs["loss"]),
          "cap_overflow", float(logs.get("cap_overflow", -1)), flush=True)

    res = voxelize_batch(
        batch["points"], batch["points_valid"], preset.voxel_size,
        preset.pc_range, preset.grid_size, preset.max_voxels,
        preset.max_points_per_voxel)
    anchors = build_anchors(preset)

    def run_fwd(bs):
        preds, upd = built.model.apply(
            {"params": state.params["rpn"], "batch_stats": bs["rpn"]},
            res.features, res.coords, train=True,
            mutable=["batch_stats", "intermediates"])
        rois, _, mask = proposal_layer(preset, preds, anchors, train=False)
        _, r_upd = built.head.apply(
            {"params": state.params["rcnn"], "batch_stats": bs["rcnn"]},
            rois, mask, preds["ms"], train=True, mutable=["batch_stats"])
        return {"rpn": upd["batch_stats"], "rcnn": r_upd["batch_stats"]}

    state = state.replace(
        batch_stats=recalibrate_batch_stats(jax.jit(run_fwd),
                                            state.batch_stats))
    save_checkpoint(tmp_path / "ckpt", state, step=n_steps)

    eval_step = jax.jit(make_voxelrcnn_eval_step(
        built.model, built.head, preset))

    def report(tag, st, b):
        out = jax.tree_util.tree_map(np.asarray, eval_step(st, b))
        for i in range(out["boxes"].shape[0]):
            v = out["valid"][i]
            gv = np.asarray(b["gt_valid"][i])
            gts = np.asarray(b["gt_boxes"][i])[gv][:, :7]
            dets = out["boxes"][i][v][:, :7]
            rc = _iou_recall(dets, gts, 0.7)
            rois = (out["rois"][i][np.asarray(out["roi_mask"][i])]
                    if "rois" in out else None)
            rrc = _iou_recall(rois, gts, 0.7) if rois is not None else {}
            print(f"[{tag}] frame{i}: {rc} roi={rrc}", flush=True)
            print("   all scores", np.round(np.sort(
                np.asarray(out["scores"][i]))[::-1][:6], 3), flush=True)
            for d, s_ in zip(dets[:4], out["scores"][i][v][:4]):
                print("   det", np.round(d, 2), f"score={s_:.3f}", flush=True)
            for g in gts:
                print("   gt ", np.round(g, 2), flush=True)
            if rois is not None:
                for r in rois[:6]:
                    print("   roi", np.round(np.asarray(r), 2), flush=True)

    print("=== 1. in-memory state, TRAIN batch (bs2) ===", flush=True)
    report("mem/train", state, batch)

    r_state, r_step = restore_latest(tmp_path / "ckpt", built.state)
    print(f"=== 2. restored state (step {r_step}), TRAIN batch ===",
          flush=True)
    report("ckpt/train", r_state, batch)

    print("=== 3. restored state, EVAL loader (bs1, training=False) ===",
          flush=True)
    eval_ds = KittiDataset(root, info_path, training=False)
    for fi in range(2):
        s = eval_ds[fi]
        b1 = make_batch([s], 2000, 500, preset.num_point_features)
        b1 = {k: jnp.asarray(v) for k, v in b1.items()}
        print(f"frame {fi}: eval pts {len(s['points'])} "
              f"gt_in_batch {int(np.asarray(b1['gt_valid']).sum())}",
              flush=True)
        report(f"ckpt/eval{fi}", r_state, b1)


if __name__ == "__main__":
    main()
