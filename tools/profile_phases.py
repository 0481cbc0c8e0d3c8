#!/usr/bin/env python
"""Device-time attribution for the SLAM hot loop via xplane traces.

`jax.block_until_ready` returns early over the axon tunnel once the
dispatch queue is deep (PERF.md), so wall-clock phase timers lie.  This
tool runs a steady-state segment of the bench pipeline under
`jax.profiler.trace` and reports per-jit-module device milliseconds from
the xplane proto ("XLA Modules" line = per-module device spans; "XLA Ops"
= per-HLO) — the only trustworthy breakdown on this rig.

Usage:
  python tools/profile_phases.py              # full loop, per-module table
  python tools/profile_phases.py --ops MODULE # per-HLO top-k inside MODULE
  PROF_FRAMES=30 PROF_W=1200 PROF_H=680 ...   # env knobs
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(trace_dir: str):
    """Returns (modules, ops): module -> [total_ms, count]; (module, op) ->
    total_ms.  Device planes only."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    modules = defaultdict(lambda: [0.0, 0])
    ops = defaultdict(float)
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            mod_line = None
            op_line = None
            for line in plane.lines:
                if line.name == "XLA Modules":
                    mod_line = line
                elif line.name == "XLA Ops":
                    op_line = line
            if mod_line is None:
                continue
            # module spans
            mod_spans = []  # (start_ps, end_ps, name)
            for ev in mod_line.events:
                name = ev_meta[ev.metadata_id].name
                # strip the fingerprint suffix jit_foo(fingerprint)
                base = name.split("(")[0]
                dur_ms = ev.duration_ps / 1e9
                modules[base][0] += dur_ms
                modules[base][1] += 1
                mod_spans.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, base))
            mod_spans.sort()
            if op_line is not None:
                starts = [s for s, _, _ in mod_spans]
                import bisect

                for ev in op_line.events:
                    name = ev_meta[ev.metadata_id].name
                    k = bisect.bisect_right(starts, ev.offset_ps) - 1
                    mod = "?"
                    if 0 <= k < len(mod_spans) and ev.offset_ps < mod_spans[k][1]:
                        mod = mod_spans[k][2]
                    ops[(mod, name)] += ev.duration_ps / 1e9
    return modules, ops


def run_loop(n_frames: int, width: int, height: int, trace_dir: str) -> None:
    """The bench pipeline: warm-up run (compiles), then a traced run."""
    import jax

    # share bench.py's persistent compile cache — repeat profile runs skip
    # the multi-minute first-compile wall
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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
        "max_isects": 2 ** 20, "tile_gaussian_cap": 64,
        "raycast_lb": 16, "tiles_per_gaussian_cap": 9,
        "alloc_stride": int(os.environ.get("BENCH_ALLOC_STRIDE", "3")),
        "visible_sort_overflow": False,
    }
    cfg = Config.from_dict(cfg_dict)
    os.makedirs(cfg.workspace_dir, exist_ok=True)

    def one_run(trace: bool):
        engine = TsdfEngine(cfg, width, height, cam0.K)
        engine.set_gt_poses([c.c2w for c in cams])
        engine.turn_off_tracking()
        model = GaussianModel(cfg, width, height)
        pipe = SLAMPipeline(cfg, engine, cfg.workspace_dir, is_train=False)
        pipe.frame_cache.capacity = max(pipe.frame_cache.capacity, n_frames + 4)
        for c in cams:
            pipe.frame_cache.get(c)
        jax.block_until_ready(pipe.frame_cache.get(cams[-1])[0])
        if trace:
            with jax.profiler.trace(trace_dir):
                pipe.slam_train_cams(model, cams)
                int(engine.vol.n_blocks)
                int(model.pool.n_alive)
        else:
            pipe.slam_train_cams(model, cams)
            int(engine.vol.n_blocks)
            int(model.pool.n_alive)

    one_run(trace=False)   # compile everything
    one_run(trace=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=None, metavar="MODULE",
                    help="print per-HLO top-k for this module (substring)")
    ap.add_argument("--parse-only", default=None, metavar="DIR",
                    help="skip the run; parse an existing trace dir")
    ap.add_argument("--topk", type=int, default=25)
    args = ap.parse_args()

    n_frames = int(os.environ.get("PROF_FRAMES", "30"))
    width = int(os.environ.get("PROF_W", "1200"))
    height = int(os.environ.get("PROF_H", "680"))

    trace_dir = args.parse_only or "/tmp/gps_prof_trace"
    if not args.parse_only:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
        run_loop(n_frames, width, height, trace_dir)

    modules, ops = parse_xplane(trace_dir)
    total = sum(v[0] for v in modules.values())
    print(f"\n=== XLA Modules (device ms over {n_frames} frames; "
          f"total {total:.1f} ms = {total / n_frames:.2f} ms/frame) ===")
    for name, (ms, cnt) in sorted(modules.items(), key=lambda kv: -kv[1][0]):
        print(f"{ms:9.1f} ms  {ms / n_frames:7.2f} ms/frame  x{cnt:<5d} {name}")

    if args.ops:
        print(f"\n=== XLA Ops in modules matching '{args.ops}' ===")
        sel = [(k, v) for k, v in ops.items() if args.ops in k[0]]
        for (mod, op), ms in sorted(sel, key=lambda kv: -kv[1])[: args.topk]:
            print(f"{ms:9.2f} ms  {op}   [{mod}]")


if __name__ == "__main__":
    main()
