#!/usr/bin/env python
"""Headline benchmark: online SLAM train-mode throughput (frames/sec) at
Replica resolution on the synthetic oracle scene.

The reference's headline claim is >150 fps system throughput
(README.md:9); Replica runs are 1200x680 (SURVEY §6).  Real Replica data
is not available in this image, so the bench runs the identical pipeline
(TSDF fuse every frame + raycast/spawn/optimize/prune every
local_opt_interval frames, gt poses — the release-config default) over the
procedurally generated scene at the same resolution.

Prints exactly one JSON line:
  {"metric": "slam_train_fps_1200x680", "value": N, "unit": "fps",
   "vs_baseline": N/150}

Env knobs: BENCH_FRAMES (default 60), BENCH_W/BENCH_H.
BENCH_TRACKED=1 benches the online-SLAM path instead (ICP tracking on,
gt poses only recorded for ATE — the BASELINE.md room0 configuration):
the metric becomes slam_tracked_fps_* and the line carries ate_cm.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    width = int(os.environ.get("BENCH_W", "1200"))
    height = int(os.environ.get("BENCH_H", "680"))

    import jax

    # persistent compile cache: repeat bench runs (driver + manual) skip
    # the multi-minute first-compile pass.  Best-effort — the axon remote
    # compiler may not participate, in which case this is a no-op.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from gps_slam_tpu.config import Config
    from gps_slam_tpu.data import synthetic
    from gps_slam_tpu.gs.model import GaussianModel
    from gps_slam_tpu.slam.pipeline import SLAMPipeline
    from gps_slam_tpu.tsdf.engine import TsdfEngine

    tracked_env = os.environ.get("BENCH_TRACKED", "0") == "1"
    # gt-pose mode sweeps a wide orbit for fusion coverage; tracked mode
    # uses Replica-like inter-frame motion (~0.5 deg/frame — the release
    # datasets are 2000-frame smooth trajectories, replica_preprocess.py)
    # so ICP operates in its designed regime.  The wide orbit's 6-15
    # deg/frame jumps are outside any frame-to-frame ICP basin; reference
    # behavior is the same (ITMExtendedTracker has no global relocalizer
    # in the loop).
    arc = float(os.environ.get("BENCH_ARC", "0.08" if tracked_env else "0.75"))
    cams = synthetic.make_cameras(n_frames=n_frames, width=width,
                                  height=height, arc=arc)
    cam0 = cams[0]
    node = {
        "input_dir": "mem", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": n_frames - 1, "frame_step": 1,
        "intrinsics": [cam0.fx, cam0.fy, cam0.cx, cam0.cy],
        "image_shape": [width, height], "downscale_factor": 1,
        "test_split_interval": -1,
    }
    cfg_dict = synthetic.default_config_dict("/tmp/gps_bench", node)
    # Replica release-config equivalents (configs/release/replica/office0.yaml)
    cfg_dict["PIPE"].update(
        localframe_cam_window_length=2, localframe_cam_window_interval=5,
        local_opt_iters=20, local_opt_interval=10, keyframe_select_max=7,
        keyframe_theta_thres=30, keyframe_trans_thres=0.3,
    )
    cfg_dict["PIPE"]["TSDF"].update(voxel_size=0.005, trunc_dist=0.02)
    cfg_dict["MODEL"].update(sh_degree=3)
    cfg_dict["TPU"] = {
        "gaussian_capacity": 2 ** 18, "hash_size": 2 ** 21,
        "block_capacity": 2 ** 17, "visible_block_capacity": 2 ** 13,
        # 64-deep tile lists + 3x3 tile spans: the r4 trace showed the
        # splat kernels + segment-sum gathers scale with A*L (19.3 ->
        # 11.8 ms/iter at the micro-bench); the psnr/ssim fields of the
        # output line and the [BIN OVERFLOW] counter audit the caps
        "max_isects": 2 ** 20, "tile_gaussian_cap": 64,
        "raycast_lb": 16, "tiles_per_gaussian_cap": 9,
        # stride-3 allocation candidates: -3.4 ms/frame of dedup sort at
        # identical raycast quality (tools/bench_fuse.py sweep); blocks
        # are >=25 px at 1 m so a 3-px grid still names every surface
        # block, and a missed sliver re-candidates next frame
        "alloc_stride": int(os.environ.get("BENCH_ALLOC_STRIDE", "3")),
        # the 8192 cap covers this scene's visible set (PSNR in the output
        # line audits it: 24.49, identical to the 2^14 run) — skip the
        # nearest-first overflow sort's ~5 ms/frame
        "visible_sort_overflow": False,
    }
    tracked = tracked_env
    if tracked:
        cfg_dict["PIPE"]["TSDF"]["use_gt_pose"] = False
    cfg = Config.from_dict(cfg_dict)
    os.makedirs(cfg.workspace_dir, exist_ok=True)

    def make_engine():
        e = TsdfEngine(cfg, width, height, cam0.K)
        e.set_gt_poses([c.c2w for c in cams])
        if tracked:
            from gps_slam_tpu.slam.tracker import make_tracker

            e.attach_tracker(make_tracker(cfg, width, height))
        else:
            e.turn_off_tracking()
        return e

    engine = make_engine()
    model = GaussianModel(cfg, width, height)
    pipe = SLAMPipeline(cfg, engine, cfg.workspace_dir, is_train=True)

    # first pass compiles every path; the second identical run measures
    # steady state
    pipe.slam_train_cams(model, cams)

    engine2 = make_engine()
    model2 = GaussianModel(cfg, width, height)
    pipe2 = SLAMPipeline(cfg, engine2, cfg.workspace_dir, is_train=False)
    # preload frames to HBM before timing — the reference's FPS likewise
    # excludes data loading (frames are preconverted into RAM up front,
    # CLIEngine.cpp:13-33, and its PCIe uploads are negligible; this rig's
    # host<->device tunnel is ~12 MB/s and would otherwise dominate)
    pipe2.frame_cache.capacity = max(pipe2.frame_cache.capacity, n_frames + 4)
    import jax

    for c in cams:
        pipe2.frame_cache.get(c)
    jax.block_until_ready(pipe2.frame_cache.get(cams[-1])[0])
    t0 = time.monotonic()
    pipe2.slam_train_cams(model2, cams)
    # close the timing window with real value fetches: block_until_ready
    # is a no-op over the axon tunnel once the dispatch queue is deep
    # (PERF.md), so any queued fusion/optimizer work must drain into the
    # measured interval via these fetches (n_blocks depends on the last
    # fuse_frame, n_alive on the last prune)
    int(engine2.vol.n_blocks)
    int(model2.pool.n_alive)
    steady_s = time.monotonic() - t0
    fps = n_frames / steady_s

    # honest per-phase timing pass (LOG_PIPELINE_TIME equivalent): a short
    # sync-mode run where every phase ends in a value fetch, so the
    # [PIPELINE AVG TIME] columns below are true device-time attribution
    # (the async run's columns are wall-clock-true in total only).  Kept
    # separate from the headline: per-frame hard syncs serialize the
    # pipeline ~3x (PERF.md), mirroring the reference's
    # profiling-vs-artifacts exclusivity (slam_pipeline.cpp:204-219).
    n_sync = min(30, n_frames)
    engine3 = make_engine()
    model3 = GaussianModel(cfg, width, height)
    pipe3 = SLAMPipeline(cfg, engine3, cfg.workspace_dir, is_train=False)
    pipe3.log_pipeline_time = True
    pipe3.frame_cache = pipe2.frame_cache  # frames already on device
    print("[SYNC PHASE TIMING] (value-fetch-bracketed phases, "
          f"{n_sync} frames)")
    pipe3.slam_train_cams(model3, cams[:n_sync])

    import numpy as np

    from gps_slam_tpu.eval import metrics as M

    def eval_quality(engine_q, model_q):
        """Mean PSNR/SSIM of the trained model's GES render over the FIXED
        eval set (every n_frames//10-th frame, 10 frames)."""
        psnrs, ssims = [], []
        for c in cams[:: max(1, n_frames // 10)][:10]:
            ray = engine_q.run_raycast(c.c2w, c.K, width, height)
            res = model_q.forward(
                c.c2w, c.K, ray["depth_map"][..., 0], ray["color_map"]
            )
            img = np.clip(np.asarray(res["rgb"]), 0, 1)
            psnrs.append(M.psnr(img, c.image))
            ssims.append(M.ssim(img, c.image))
        return float(np.mean(psnrs)), float(np.mean(ssims))

    def det_quality_run(cfg_q):
        """Deterministic (pinned) quality run: fixed RNG seeds already come
        from the config (dev_id), and sync_counts removes the one
        timing-dependent input — the async live-count caches whose
        staleness varies run-to-run and moved the cap buckets (and with
        them PSNR by several dB across same-code runs, VERDICT r4 #5).
        Off-clock; the headline psnr/ssim come from here so the quality
        ratchet is reproducible."""
        e = TsdfEngine(cfg_q, width, height, cam0.K)
        e.set_gt_poses([c.c2w for c in cams])
        if tracked:
            from gps_slam_tpu.slam.tracker import make_tracker

            e.attach_tracker(make_tracker(cfg_q, width, height))
        else:
            e.turn_off_tracking()
        e.sync_counts = True
        m = GaussianModel(cfg_q, width, height)
        m.sync_counts = True
        pq = SLAMPipeline(cfg_q, e, cfg_q.workspace_dir, is_train=False)
        pq.frame_cache = pipe2.frame_cache
        pq.slam_train_cams(m, cams)
        p_, s_ = eval_quality(e, m)
        return p_, s_, m.num_gaussians

    psnr_det, ssim_det, gs_det = det_quality_run(cfg)

    # binning/spawn cap audit (VERDICT r4 #5): re-run the deterministic
    # pipeline with every quality-relevant cap DOUBLED and assert the
    # shipped caps are quality-neutral.  ΔPSNR > 0.1 dB prints a loud
    # warning (the r4 history shows cap clipping once cost 0.66 dB).
    if os.environ.get("BENCH_CAP_AUDIT", "1") == "1":
        import copy

        cd2 = copy.deepcopy(cfg_dict)
        cd2["TPU"]["tile_gaussian_cap"] = 2 * cfg.tpu.tile_gaussian_cap
        cd2["TPU"]["tiles_per_gaussian_cap"] = (
            2 * cfg.tpu.tiles_per_gaussian_cap)
        cd2["TPU"]["active_tile_cap"] = 2 * cfg.tpu.active_tile_cap
        cd2["TPU"]["max_new_gaussians"] = 2 * cfg.tpu.max_new_gaussians
        cfg2x = Config.from_dict(cd2)
        psnr_2x, ssim_2x, gs_2x = det_quality_run(cfg2x)
        d = psnr_2x - psnr_det
        tag = ("OK" if abs(d) < 0.1 else "WARNING: caps are biting quality")
        print(f"[CAP AUDIT] psnr 1x={psnr_det:.2f} 2x={psnr_2x:.2f} "
              f"delta={d:+.2f} dB ssim 1x={ssim_det:.4f} 2x={ssim_2x:.4f} "
              f"gs 1x={gs_det} 2x={gs_2x} -> {tag}")

    # async-run quality (the timed pipeline's model) kept for continuity
    psnr_async, ssim_async = eval_quality(engine2, model2)

    out = {
        "metric": (f"slam_tracked_fps_{width}x{height}" if tracked
                   else f"slam_train_fps_{width}x{height}"),
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 150.0, 4),
        "psnr": round(psnr_det, 2),
        "ssim": round(ssim_det, 4),
        "gs_num": gs_det,
        "psnr_async": round(psnr_async, 2),
        "ssim_async": round(ssim_async, 4),
        "gs_num_async": model2.num_gaussians,
    }
    if tracked:
        # trajectory quality of the ICP-tracked run vs the synthetic orbit's
        # exact poses (ate_general.py Horn alignment)
        est = [np.asarray(p) for p in engine2.cam_poses]
        gt_poses = [c.c2w for c in cams[: len(est)]]
        out["ate_cm"] = round(M.ate_rmse_cm(est, gt_poses), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
