#!/usr/bin/env python
"""Standalone device/wall micro-bench for TSDF fusion and raycast.

Times, at bench scale (1200x680 synthetic frames):
  1. per-frame fuse_frame dispatches (the tracking-mode path),
  2. chunked fuse_frames_scan (the gt-pose fast path, TPU.fuse_chunk),
  3. a single-camera raycast and an M-camera raycast_batch.

Every timing window closes with a value fetch (the only true sync over
the axon tunnel, PERF.md).  Use to iterate on fusion/raycast kernels
without paying a full bench run per experiment.

Env knobs: FUSE_FRAMES (default 24), FUSE_CHUNK (8), FUSE_W/FUSE_H,
RAY_M (batch cameras, default 5), REPS (3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x) -> None:
    np.asarray(jax.device_get(x))


def main() -> None:
    n_frames = int(os.environ.get("FUSE_FRAMES", "24"))
    chunk = int(os.environ.get("FUSE_CHUNK", "8"))
    W = int(os.environ.get("FUSE_W", "1200"))
    H = int(os.environ.get("FUSE_H", "680"))
    ray_m = int(os.environ.get("RAY_M", "5"))
    reps = int(os.environ.get("REPS", "3"))

    from gps_slam_tpu.config import Config
    from gps_slam_tpu.data import synthetic
    from gps_slam_tpu.tsdf import integrate
    from gps_slam_tpu.tsdf.engine import TsdfEngine

    cams = synthetic.make_cameras(n_frames=n_frames, width=W, height=H)
    cam0 = cams[0]
    node = {
        "input_dir": "mem", "image_path": "c", "pose_path": "c",
        "depth_path": "d", "pcd_name": "n", "depth_scale": 6553.5,
        "scene_scale": 1.0, "start_frame": 0, "end_frame": n_frames - 1,
        "frame_step": 1, "intrinsics": [cam0.fx, cam0.fy, cam0.cx, cam0.cy],
        "image_shape": [W, H], "downscale_factor": 1,
        "test_split_interval": -1,
    }
    cfg_dict = synthetic.default_config_dict("/tmp/fuse_bench_ws", node)
    cfg_dict["TPU"] = {
        "gaussian_capacity": 2 ** 14, "hash_size": 2 ** 21,
        "block_capacity": 2 ** 17, "visible_block_capacity": 2 ** 13,
        "raycast_lb": int(os.environ.get("RAY_LB", "16")),
        "raycast_samples": int(os.environ.get("RAY_SAMPLES", "4")),
        "alloc_steps": int(os.environ.get("ALLOC_STEPS", "4")),
        "alloc_stride": int(os.environ.get("ALLOC_STRIDE", "2")),
        "alloc_candidate_cap": int(os.environ.get("ALLOC_CAP", str(2 ** 15))),
        "raycast_bisect": int(os.environ.get("RAY_BISECT", "6")),
        "raycast_tiles_per_step": int(os.environ.get("RAY_C", "8")),
        "visible_sort_overflow": False,
    }
    cfg = Config.from_dict(cfg_dict)
    os.makedirs(cfg.workspace_dir, exist_ok=True)

    depths = [jnp.asarray(c.depth[..., 0]) for c in cams]
    rgbs = [jnp.asarray(c.image) for c in cams]
    poses = [np.asarray(c.c2w, np.float32) for c in cams]
    jax.block_until_ready(depths[-1])

    def fresh_engine() -> TsdfEngine:
        e = TsdfEngine(cfg, W, H, cam0.K)
        e.set_gt_poses([c.c2w for c in cams])
        e.turn_off_tracking()
        return e

    def _refresh_cursor(eng) -> None:
        # mirror engine.process_frame's async count refresh so the
        # visible-pass prefix + visible-list bucket grow with the scene
        # (a pinned bootstrap bucket would under-measure the passes)
        eng._refresh_counts_async()

    # -- per-frame dispatches ------------------------------------------------
    for tag in ["compile"] + [f"rep{r}" for r in range(reps)]:
        eng = fresh_engine()
        t0 = time.monotonic()
        for i in range(n_frames):
            eng.vol = integrate.fuse_frame(
                eng.vol, depths[i], rgbs[i], jnp.asarray(poses[i]),
                eng._K_dev, False, eng._use_pallas_raycast(),
                pool_prefix=eng._pool_prefix(), vis_cap=eng._vis_cap())
            _refresh_cursor(eng)
        _fetch(eng.vol.n_blocks)
        dt = (time.monotonic() - t0) * 1000 / n_frames
        print(f"[fuse per-frame {tag}] {dt:.2f} ms/frame", flush=True)

    # -- chunked scan ----------------------------------------------------------
    for tag in ["compile"] + [f"rep{r}" for r in range(reps)]:
        eng = fresh_engine()
        t0 = time.monotonic()
        for i in range(0, n_frames, chunk):
            f = min(chunk, n_frames - i)
            eng.vol = integrate.fuse_frames_scan(
                eng.vol, jnp.stack(depths[i:i + f]), jnp.stack(rgbs[i:i + f]),
                jnp.asarray(np.stack(poses[i:i + f])), eng._K_dev,
                False, eng._use_pallas_raycast(),
                pool_prefix=eng._pool_prefix(stale_frames=2 * f),
                vis_cap=eng._vis_cap(stale_frames=2 * f))
            _refresh_cursor(eng)
        _fetch(eng.vol.n_blocks)
        dt = (time.monotonic() - t0) * 1000 / n_frames
        print(f"[fuse chunk={chunk} {tag}] {dt:.2f} ms/frame", flush=True)

    # -- raycast ---------------------------------------------------------------
    eng = fresh_engine()
    for i in range(n_frames):
        eng.process_frame(rgbs[i], depths[i])
    _fetch(eng.vol.n_blocks)
    for tag in ["compile"] + [f"rep{r}" for r in range(reps)]:
        t0 = time.monotonic()
        maps = eng.run_raycast(poses[n_frames // 2], quality=False)
        _fetch(maps["depth_map"][0, 0])
        print(f"[raycast single {tag}] "
              f"{(time.monotonic() - t0) * 1000:.2f} ms/camera", flush=True)
    batch_poses = np.stack(poses[:ray_m])
    for tag in ["compile"] + [f"rep{r}" for r in range(reps)]:
        t0 = time.monotonic()
        maps = eng.run_raycast_batch(batch_poses, quality=False)
        _fetch(maps["depth_map"][0, 0, 0])
        dt = (time.monotonic() - t0) * 1000 / ray_m
        print(f"[raycast batch M={ray_m} {tag}] {dt:.2f} ms/camera", flush=True)

    # quality audit at the current knob settings: depth-vs-gt on the
    # window-quality (k=1) march — makes every raycast speed experiment
    # auditable from the same run
    cam = cams[n_frames // 2]
    maps = eng.run_raycast(poses[n_frames // 2], quality=False)
    d = np.asarray(maps["depth_map"])[..., 0]
    gt = np.asarray(cam.depth)[..., 0]
    hit = d > 0
    err = np.abs(d - gt)[hit & (gt > 0)]
    cerr = np.abs(np.asarray(maps["color_map"])[hit] - cam.image[hit]).mean()
    print(f"[raycast quality] hit={hit.mean():.4f} "
          f"med_err={np.median(err) * 1000:.3f}mm "
          f"p99_err={np.quantile(err, 0.99) * 1000:.2f}mm "
          f"color_err={cerr:.4f}", flush=True)


if __name__ == "__main__":
    main()
