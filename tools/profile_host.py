#!/usr/bin/env python
"""Host-side attribution for the SLAM hot loop.

The xplane trace (tools/profile_phases.py) gives device milliseconds; this
tool answers the complementary question — where does the *Python thread*
block?  Device time at the round-3 checkpoint was ~63 ms/frame while bench
wall time was ~124 ms/frame: the missing half is host logic, dispatch, or
transfer stalls, and cProfile's cumulative view over a steady segment
pinpoints which.

Usage: PROF_FRAMES=40 PROF_W=1200 PROF_H=680 python tools/profile_host.py
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_frames = int(os.environ.get("PROF_FRAMES", "40"))
    width = int(os.environ.get("PROF_W", "1200"))
    height = int(os.environ.get("PROF_H", "680"))

    from gps_slam_tpu.config import Config
    from gps_slam_tpu.data import synthetic
    from gps_slam_tpu.gs.model import GaussianModel
    from gps_slam_tpu.slam.pipeline import SLAMPipeline
    from gps_slam_tpu.tsdf.engine import TsdfEngine

    cams = synthetic.make_cameras(n_frames=n_frames, width=width, height=height)
    cam0 = cams[0]
    node = {
        "input_dir": "mem", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": n_frames - 1, "frame_step": 1,
        "intrinsics": [cam0.fx, cam0.fy, cam0.cx, cam0.cy],
        "image_shape": [width, height], "downscale_factor": 1,
        "test_split_interval": -1,
    }
    cfg_dict = synthetic.default_config_dict("/tmp/gps_prof", node)
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
        "max_isects": 2 ** 20, "tile_gaussian_cap": 128,
        "raycast_lb": 16, "tiles_per_gaussian_cap": 16,
        "visible_sort_overflow": False,
    }
    cfg = Config.from_dict(cfg_dict)
    os.makedirs(cfg.workspace_dir, exist_ok=True)

    def run(tag):
        import jax

        engine = TsdfEngine(cfg, width, height, cam0.K)
        engine.set_gt_poses([c.c2w for c in cams])
        engine.turn_off_tracking()
        model = GaussianModel(cfg, width, height)
        pipe = SLAMPipeline(cfg, engine, cfg.workspace_dir, is_train=False)
        pipe.frame_cache.capacity = max(pipe.frame_cache.capacity, n_frames + 4)
        for c in cams:
            pipe.frame_cache.get(c)
        jax.block_until_ready(pipe.frame_cache.get(cams[-1])[0])
        t0 = time.monotonic()
        pipe.slam_train_cams(model, cams)
        int(engine.vol.n_blocks)
        int(model.pool.n_alive)
        dt = time.monotonic() - t0
        print(f"[{tag}] {n_frames} frames in {dt:.2f}s = "
              f"{1000 * dt / n_frames:.1f} ms/frame", flush=True)
        return engine, model

    run("warmup/compile")

    pr = cProfile.Profile()
    pr.enable()
    run("steady")
    pr.disable()
    s = io.StringIO()
    st = pstats.Stats(pr, stream=s)
    st.sort_stats("cumulative").print_stats(45)
    # keep only the table, drop the header noise
    print(s.getvalue())


if __name__ == "__main__":
    main()
