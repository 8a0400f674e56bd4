"""Headline benchmark: CenterPoint (0.075 m voxel, nuScenes scale) end-to-end
inference frames/sec on one TPU chip — voxelize + sparse backbone + RPN +
CenterHead + decode + rotated NMS, all on device.

Baseline: the reference's published CenterPoint 0.075-voxel inference speed,
11 FPS on a TITAN RTX at batch 1 (reference CenterPoint/configs/nusc/
README.md:24-30; BASELINE.md). vs_baseline = our_fps / 11.

Workload (round 3): ray-cast 10-sweep lidar frames (df3d/utils/synth.py
make_raycast_frame — surface-sampled, nuScenes-like per-stage occupancy)
with stage caps fitted at p99 + headroom over that distribution
(tools/fit_caps.py --synthetic). This matches the reference's measurement
conditions — real nuScenes val frames, dynamic shapes, voxelize cap 160k at
test time (nusc_centerpoint_voxelnet_0075voxel_fix_bn_z.py:145) — far more
closely than rounds 1-2's uniform-random points, which saturated every
static cap (a strictly heavier-than-real workload; VERDICT r2 weak #7).
The saturated-cap number is still reported as `fps_saturated_caps` for
cross-round comparability, and `fps_exact_semantics` reports the
reference-exact numerics config (f32 convs + sort-based hard_voxelize) so
the serving-config headline is never the only number (ADVICE r3). Round 4:
the headline voxelizer is back to SORT (reference-exact) — probe 20's e2e
A/B showed bitrank loses ~0.8 ms end-to-end despite winning isolated — so
the only headline-vs-exact delta left is bf16 conv bodies (probe 19:
-2.3 ms).

Robustness (round 4, after BENCH_r03 rc=124/parsed=null): a watchdog
THREAD prints whatever has been measured so far and exits 0 when the
wall-clock budget (DF3D_BENCH_BUDGET_S, default 1200 s) expires — a thread,
not SIGALRM, because a hung relay RPC never returns to the bytecode loop.
Sections run headline-first and each later section is skipped unless
enough budget remains; compiled programs persist across runs via a
jax_compilation_cache_dir under .jax_cache/ so a re-run after a cold
(remote-compile-heavy) run is cheap.

Prints exactly ONE JSON line on stdout.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# fitted over 16 ray-cast frames (max observed true dilated occupancy per
# stage x1.1 headroom, rounded up to 1024; spconv-exact dilation enumeration
# — same math as tools/fit_caps.py --synthetic); observed max was
# (92552, 66209, 24424, 8992). Stage-1 cap doubles as the voxelize
# max_voxels. See PARITY.md round-3 notes.
REALISTIC_STAGE_CAPS = (102_400, 73_728, 27_648, 10_240)

# default raised 1200 -> 1500 in r5: the driver tolerated an 1884 s cold
# run (r5) and a 1426 s one (r4); with the persistent .jax_cache warm the
# full section list fits well under this, and the extra headroom keeps the
# KITTI section from being the one skipped after a cold-compile headline
_BUDGET_S = float(os.environ.get("DF3D_BENCH_BUDGET_S", "1500"))
_T0 = time.monotonic()

_emit_lock = threading.Lock()
_emitted = False


def _emit(result):
    """Print the single JSON result line exactly once (main or watchdog)."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
        print(json.dumps(result), flush=True)


def _remaining():
    return _BUDGET_S - (time.monotonic() - _T0)


def main():
    import jax
    import jax.numpy as jnp

    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops.voxelize import voxelize_batch

    # persistent compiled-program cache: cold remote compiles through the
    # relay run 2-6 min per shape; a warm re-run (same HLO + same chip)
    # loads from disk instead. Best-effort — some PJRT plugins cannot
    # serialize executables, in which case this is a silent no-op.
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    # serving numerics: the shared profile knob (df3d/serving.py) — same
    # switch the eval CLI and tests use, so the benched configuration is
    # reachable everywhere (VERDICT r3 #4). DF3D_F32_CONV=1 benches the
    # reference-exact profile instead.
    from df3d.serving import apply_profile

    profile = apply_profile(
        "exact" if os.environ.get("DF3D_F32_CONV") else "tpu_v5e")

    num_points = 260_000  # ~10-sweep nuScenes lidar

    # DF3D_BENCH_SMOKE=1: tiny shapes + forced CPU so the full bench code
    # path is testable off-chip (numbers are meaningless in this mode)
    smoke = bool(os.environ.get("DF3D_BENCH_SMOKE"))
    if smoke:
        jax.config.update("jax_platforms", "cpu")
        num_points = 20_000

    # Voxelize default: SORT (reference-exact hard_voxelize semantics), per
    # the profile. Probe 20 e2e A/B (on-chip, 2026-08-19): bitrank wins
    # isolated (14.8 vs 16.1 ms) but LOSES end-to-end (154.3 vs 153.5 ms
    # full fwd) — the free stage-1 table doesn't pay for the layout it
    # forces downstream. DF3D_BITRANK_VOX=1 re-measures it.
    vox_method = ("bitrank" if os.environ.get("DF3D_BITRANK_VOX")
                  else profile.vox_method)

    def centerpoint_fps(cfg, frame_list, iters=10, vox=None):
        """Best-of-2 async-dispatch throughput over cycled frames."""
        vox = vox or vox_method
        points0, valid0 = frame_list[0]
        ss = cfg.sparse_shape
        tcells = ss[0] * ss[1] * ss[2]

        def voxelize(points, valid):
            return voxelize_batch(
                points, valid, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
                cfg.max_voxels, cfg.max_points_per_voxel,
                method=vox,
                table_cells=tcells if vox == "bitrank" else None,
            )

        res = jax.jit(voxelize)(points0, valid0)
        model = CenterPoint(cfg)
        variables = jax.jit(
            lambda f, c: model.init(jax.random.PRNGKey(0), f, c, train=False)
        )(res.features, res.coords)

        @jax.jit
        def infer(variables, points, valid):
            res = voxelize(points, valid)
            preds, _ = model.apply(
                variables, res.features, res.coords, train=False,
                packed_table=res.packed_table)
            return centerpoint_predict(cfg, preds)

        # compile + warmup; fetch a scalar to the host (block_until_ready
        # alone does not guarantee execution through the remote-TPU relay)
        float(infer(variables, points0, valid0)["scores"].sum())

        # throughput timing: dispatch asynchronously and force ONCE at the
        # end (each scalar fetch through the relay costs ~30ms of pure round
        # trip, which a co-located serving host never pays; dispatches queue
        # on the device and the final fetch transitively forces them all)
        fps_runs = []
        for _ in range(2):  # best-of-2: the relay occasionally stalls a run
            t0 = time.perf_counter()
            outs = [infer(variables, *frame_list[i % len(frame_list)])
                    for i in range(iters)]
            s = 0.0
            for o in outs:
                s += o["scores"].sum()
            float(s)
            dt = time.perf_counter() - t0
            fps_runs.append(round(iters / dt, 3))
        return max(fps_runs), fps_runs, variables

    # --- realistic workload (headline): ray-cast frames + fitted caps ---
    from df3d.utils.synth import make_raycast_frame

    real_caps = ((12_000, 8_000, 4_000, 2_000) if smoke
                 else REALISTIC_STAGE_CAPS)
    real_cfg = CenterPointConfig(
        max_voxels=real_caps[0], stage_caps=real_caps,
    )
    real_frames = []
    for i in range(2 if smoke else 3):
        f = make_raycast_frame(
            np.random.RandomState(100 + i), num_points,
            **(dict(n_sweeps=2, n_azimuth=300, n_beams=16) if smoke else {}))
        real_frames.append((jnp.asarray(f[None]),
                            jnp.ones((1, num_points), bool)))

    result = {
        "metric": "centerpoint_0075voxel_infer_fps_bs1",
        "value": 0.0,
        "unit": "frames/sec",
        "vs_baseline": 0.0,
        "workload": ("raycast_smoke" if smoke
                     else "raycast_10sweep_fitted_caps"),
        "stage_caps": list(real_caps),
        "headline_config": profile.name + "+" + vox_method + "_vox",
    }

    # watchdog: if anything below hangs (relay stall, runaway remote
    # compile), print what we have and exit before the driver's timeout
    watchdog = threading.Timer(
        max(_remaining(), 1.0),
        lambda: (result.__setitem__(
            "watchdog", f"budget {_BUDGET_S:.0f}s expired"),
            _emit(result), os._exit(0)))
    watchdog.daemon = True
    watchdog.start()

    fps, fps_runs, variables = centerpoint_fps(
        real_cfg, real_frames, iters=2 if smoke else 10)
    result["value"] = round(fps, 3)
    result["vs_baseline"] = round(fps / 11.0, 3)
    # both timing loops, so the best-of-2 choice is auditable (ADVICE r2)
    result["fps_runs"] = fps_runs

    # saturated-workload inputs (also reused by the train section)
    sat_caps = ((16_000, 12_000, 8_000, 4_000) if smoke
                else (120_000, 90_000, 55_000, 30_000))
    cfg = CenterPointConfig(max_voxels=sat_caps[0], stage_caps=sat_caps)
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [
            rng.uniform(-54, 54, (1, num_points, 2)),
            rng.uniform(-5, 3, (1, num_points, 1)),
            rng.uniform(0, 1, (1, num_points, 2)),
        ],
        axis=-1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)

    if smoke:  # train/fused/KITTI sections are separately tested
        try:
            sat_fps, sat_runs, _ = centerpoint_fps(
                cfg, [(points, valid)], iters=2)
            result["fps_saturated_caps"] = sat_fps
            result["vs_baseline_saturated"] = round(sat_fps / 11.0, 3)
            result["fps_saturated_runs"] = sat_runs
        except Exception as e:  # pragma: no cover
            result["saturated_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        _emit(result)
        return

    # --- Section order (VERDICT r4 #3): the fused, train, and KITTI
    # sections come BEFORE the exact/saturated A/Bs so a budget expiry
    # trims comparability numbers, not primary coverage metrics. ---

    # fused-model forward (TransFusion-3DDF, 6 cams 448x800, full scale) —
    # second driver-visible metric so fusion-path regressions show up in
    # BENCH_r*.json (VERDICT r2 weak #6). Guarded: a failure or slow
    # compile never loses the headline metric.
    try:
        if _remaining() < 420:
            raise TimeoutError(f"skipped: {_remaining():.0f}s budget left")
        from df3d.models.detectors.fused import FusedConfig, TransFusion3DDF
        from df3d.models.detectors.transfusion import (
            TransFusionConfig, transfusion_predict,
        )
        from df3d.models.fusion.actr import ACTRConfig

        # realistic workload here too: SparseEncoder's down-conv dilation
        # chain (pads 1, 1, (0,1,1)) matches the CenterPoint one the caps
        # were fitted on; lidar input is a ray-cast frame
        tcfg = TransFusionConfig(
            max_voxels=REALISTIC_STAGE_CAPS[0],
            stage_caps=REALISTIC_STAGE_CAPS,
        )
        f_points, f_valid = real_frames[0]
        fcfg = FusedConfig(
            image_shape=(448, 800), image_branch="resnet_fpn", num_cams=6,
            actr=ACTRConfig(n_levels=3, model_name="ACTRv2", hybrid=True),
        )
        images = jnp.asarray(rng.rand(1, 6, 448, 800, 3).astype(np.float32))
        proj = np.zeros((1, 6, 3, 4), np.float32)
        proj[:, :] = np.array([[1266.0, 0.0, 400.0, 0.2],
                               [0.0, 1266.0, 224.0, 0.1],
                               [0.0, 0.0, 1.0, 0.0]], np.float32)
        proj = jnp.asarray(proj)

        t_ss = tcfg.sparse_shape
        t_tcells = t_ss[0] * t_ss[1] * t_ss[2]

        def t_voxelize(p, v):
            return voxelize_batch(
                p, v, tcfg.voxel_size, tcfg.pc_range, tcfg.grid_size,
                tcfg.max_voxels, tcfg.max_points_per_voxel,
                method=vox_method,
                table_cells=t_tcells if vox_method == "bitrank" else None)

        tres = jax.jit(t_voxelize)(f_points, f_valid)
        fmodel = TransFusion3DDF(tcfg, fcfg)
        fvars = jax.jit(lambda f, c, im, pr: fmodel.init(
            jax.random.PRNGKey(0), f, c, im, pr, train=False
        ))(tres.features, tres.coords, images, proj)

        @jax.jit
        def fused_infer(fvars, p, v, im, pr):
            r = t_voxelize(p, v)
            preds, _ = fmodel.apply(
                fvars, r.features, r.coords, im, pr, train=False,
                packed_table=r.packed_table)
            return transfusion_predict(tcfg, preds)["scores"].sum()

        float(fused_infer(fvars, f_points, f_valid, images, proj))  # compile
        fiters = 5
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(fiters):
            s += fused_infer(fvars, f_points, f_valid, images, proj)
        float(s)
        result["fused_workload"] = "raycast_fitted_caps"
        result["fused_transfusion3ddf_ms_frame"] = round(
            (time.perf_counter() - t0) / fiters * 1000.0, 1)
    except Exception as e:  # pragma: no cover
        result["fused_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    # training throughput (driver-visible; guarded so a failure or slow
    # compile can never lose the headline metric). Runs under the EXACT
    # profile: the serving bf16 globals are inference-only — r4 bench run 1
    # showed the bf16 conv outputs reaching the dense tail break the train
    # step's backward (conv_general_dilated dtype mismatch), and training
    # numerics should match the reference's f32 anyway.
    try:
        apply_profile("exact")
        from df3d.train.schedules import adam_onecycle
        from df3d.train.trainer import (
            create_centerpoint_state, make_centerpoint_train_step,
        )

        rng2 = np.random.RandomState(1)
        for bs in (1, 2):
            if _remaining() < 420:
                break
            tr_pts = jnp.asarray(np.tile(pts, (bs, 1, 1)))
            tr_valid = jnp.ones(tr_pts.shape[:2], bool)
            m = 64
            batch = {
                "points": tr_pts,
                "points_valid": tr_valid,
                "gt_boxes": jnp.asarray(
                    np.concatenate(
                        [rng2.uniform(-50, 50, (bs, m, 2)),
                         rng2.uniform(-2, 0, (bs, m, 1)),
                         rng2.uniform(1, 5, (bs, m, 3)),
                         rng2.uniform(-3, 3, (bs, m, 1)),
                         rng2.uniform(-2, 2, (bs, m, 2))], -1,
                    ).astype(np.float32)
                ),
                "gt_classes": jnp.asarray(
                    rng2.randint(0, 10, (bs, m)).astype(np.int32)),
                "gt_valid": jnp.ones((bs, m), bool),
            }
            if bs == 1:
                tx = adam_onecycle(1e-3, 100)
                model_t, state = create_centerpoint_state(
                    cfg, jax.random.PRNGKey(0), tx, tr_pts[:1, :4096])
                step = jax.jit(make_centerpoint_train_step(model_t, cfg))
            state_b = state
            state_b, logs = step(state_b, batch)  # compile + warmup
            float(logs["loss"])
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                state_b, logs = step(state_b, batch)
                float(logs["loss"])
            result[f"train_step_sec_bs{bs}"] = round(
                (time.perf_counter() - t0) / n, 3)
    except Exception as e:  # pragma: no cover
        result["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    finally:
        apply_profile(profile.name)

    # --- KITTI VoxelRCNN e2e (closes r3 probe 16; VERDICT r4 #3): the
    # two-stage family gets a driver-visible on-chip latency. Single-sweep
    # forward-FOV ray-cast frame at the reference operating point
    # (voxel_rcnn_car.yaml: 0.05 m voxels, 16k voxel cap). ---
    try:
        if _remaining() < 360:
            raise TimeoutError(f"skipped: {_remaining():.0f}s budget left")
        from df3d.config import get_preset
        from df3d.train.trainer import make_voxelrcnn_eval_step

        import optax

        from df3d.models.build import build_detector

        kpreset = get_preset("voxel_rcnn_car_kitti")
        kframe = make_raycast_frame(
            np.random.RandomState(7), 120_000, extra_features=1,
            n_sweeps=1, max_range=70.0)
        # crop to the KITTI forward FOV the config assumes
        kmask = ((kframe[:, 0] > 0.0) & (kframe[:, 0] < 70.4)
                 & (np.abs(kframe[:, 1]) < 40.0))
        k_pts = jnp.asarray(kframe[None])
        k_valid = jnp.asarray(kmask[None])
        kb = build_detector(kpreset, optax.adam(1e-4), example_points=4096)
        k_eval = jax.jit(make_voxelrcnn_eval_step(kb.model, kb.head, kpreset))
        k_batch = {"points": k_pts, "points_valid": k_valid}
        float(k_eval(kb.state, k_batch)["scores"].sum())  # compile+warmup
        kiters = 5
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(kiters):
            s += k_eval(kb.state, k_batch)["scores"].sum()
        float(s)
        result["voxelrcnn_ms_frame"] = round(
            (time.perf_counter() - t0) / kiters * 1000.0, 1)
        result["voxelrcnn_workload"] = "raycast_1sweep_kitti_fov"
    except Exception as e:  # pragma: no cover
        result["voxelrcnn_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- reference-exact numerics (f32 convs + sort hard_voxelize), same
    # frames + caps: the like-for-like A/B that gates the serving defaults
    # (ADVICE r3 medium). Skipped only when the headline ran exact already.
    if _remaining() > 420 and (
            result["headline_config"] != "exact+sort_vox"):
        try:
            apply_profile("exact")
            exact_fps, exact_runs, _ = centerpoint_fps(
                real_cfg, real_frames, iters=10, vox="sort")
            result["fps_exact_semantics"] = exact_fps
            result["vs_baseline_exact"] = round(exact_fps / 11.0, 3)
            result["fps_exact_runs"] = exact_runs
        except Exception as e:  # pragma: no cover
            result["exact_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        finally:
            apply_profile(profile.name)

    # --- saturated workload (rounds 1-2 conditions, for comparability) ---
    if _remaining() > 420:
        try:
            sat_fps, sat_runs, _ = centerpoint_fps(
                cfg, [(points, valid)], iters=10)
            result["fps_saturated_caps"] = sat_fps
            result["vs_baseline_saturated"] = round(sat_fps / 11.0, 3)
            result["fps_saturated_runs"] = sat_runs
        except Exception as e:  # pragma: no cover
            result["saturated_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    result["bench_wall_s"] = round(time.monotonic() - _T0, 1)
    _emit(result)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        _emit({
            "metric": "centerpoint_0075voxel_infer_fps_bs1",
            "value": 0.0,
            "unit": "frames/sec",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:400],
        })
        sys.exit(0)
