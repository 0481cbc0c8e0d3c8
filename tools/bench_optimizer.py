#!/usr/bin/env python
"""Standalone device-time micro-bench for the window optimizer.

Builds a realistic window_optimize call at bench scale (N gaussians spread
over a 1200x680 view, 9-camera batch, 20 scanned Adam iterations) and
times it with a terminal value fetch (the only true sync on this rig,
PERF.md).  Use to iterate on rasterizer/optimizer kernels without paying
a full pipeline run per experiment.

Env knobs: OPT_N (default 20000), OPT_W/OPT_H, OPT_ITERS, OPT_CAP
(opt bucket), OPT_REPS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    N = int(os.environ.get("OPT_N", "20000"))
    W = int(os.environ.get("OPT_W", "1200"))
    H = int(os.environ.get("OPT_H", "680"))
    iters = int(os.environ.get("OPT_ITERS", "20"))
    reps = int(os.environ.get("OPT_REPS", "5"))

    from gps_slam_tpu.config import Config
    from gps_slam_tpu.data import synthetic
    from gps_slam_tpu.gs import model as gmodel
    from gps_slam_tpu.gs.model import GaussianModel

    cams = synthetic.make_cameras(n_frames=9, width=W, height=H)
    cam0 = cams[0]
    node = {
        "input_dir": "mem", "image_path": "c", "pose_path": "c",
        "depth_path": "d", "pcd_name": "n", "depth_scale": 6553.5,
        "scene_scale": 1.0, "start_frame": 0, "end_frame": 8,
        "frame_step": 1, "intrinsics": [cam0.fx, cam0.fy, cam0.cx, cam0.cy],
        "image_shape": [W, H], "downscale_factor": 1,
        "test_split_interval": -1,
    }
    cfg_dict = synthetic.default_config_dict("/tmp/opt_bench_ws", node)
    cfg_dict["MODEL"].update(sh_degree=3)
    cfg_dict["TPU"] = {
        "gaussian_capacity": 2 ** 18, "max_isects": 2 ** 20,
        "tile_gaussian_cap": int(os.environ.get("OPT_TILE_CAP", "128")),
        "tiles_per_gaussian_cap": int(os.environ.get("OPT_TPG", "16")),
        "active_tile_cap": int(os.environ.get("OPT_ACT_CAP", "2048")),
    }
    cfg = Config.from_dict(cfg_dict)
    os.makedirs(cfg.workspace_dir, exist_ok=True)
    model = GaussianModel(cfg, W, H)

    # seed N gaussians from the synthetic scene's backprojected surface
    rng = np.random.default_rng(0)
    d = np.asarray(cam0.depth)[..., 0]
    ys, xs = np.nonzero(d > 0)
    pick = rng.choice(len(ys), size=N, replace=len(ys) < N)
    z = d[ys[pick], xs[pick]]
    pts_c = np.stack(
        [(xs[pick] - cam0.cx) / cam0.fx * z,
         (ys[pick] - cam0.cy) / cam0.fy * z, z], -1)
    pts_w = pts_c @ cam0.c2w[:3, :3].T + cam0.c2w[:3, 3]
    nrm = np.zeros_like(pts_w)
    nrm[:, 2] = 1.0
    rgb = rng.random((N, 3)).astype(np.float32)
    from gps_slam_tpu.gs import params as pmod

    attrs = pmod.init_attributes(
        jnp.asarray(pts_w, jnp.float32), jnp.asarray(rgb),
        jnp.asarray(nrm, jnp.float32), model.pool.sh_degree,
        cfg.model.default_opacities,
        cfg.model.max_init_scale, cfg.model.min_init_scale,
    )
    model.pool = pmod.add(model.pool, attrs, jnp.asarray(N, jnp.int32))
    model.refresh_count_async()

    batch = {
        "c2w": jnp.stack([jnp.asarray(c.c2w) for c in cams]),
        "K": jnp.stack([jnp.asarray(c.K) for c in cams]),
        "gt_rgb": jnp.stack([jnp.asarray(c.image) for c in cams]),
        "ref_depth": jnp.stack([jnp.asarray(np.asarray(c.depth)[..., 0])
                                for c in cams]),
        "base_color": jnp.stack([jnp.asarray(c.image) * 0.5 for c in cams]),
        "cam_id": jnp.arange(9, dtype=jnp.int32),
    }
    iter_idx = jnp.arange(iters, dtype=jnp.int32) % 9
    opt_cap = int(os.environ.get("OPT_CAP", "0")) or model.opt_cap(
        extra=0, cached=True)
    impl = os.environ.get("OPT_IMPL", "")
    if impl:
        valid = ("xla", "pallas", "pallas_interpret")
        if impl not in valid:
            raise SystemExit(
                f"OPT_IMPL={impl!r} not in {valid}")
        model.statics = model.statics._replace(splat_impl=impl)
    m = cfg.model
    print(f"N={N} opt_cap={opt_cap} iters={iters} {W}x{H} "
          f"impl={model.statics.splat_impl}")

    def run():
        # window_optimize donates its pool arg — hand it a fresh copy
        # each rep (copy queued outside the timed fetch is ~free)
        pool_in = jax.tree.map(jnp.copy, model.pool)
        pool, aux = gmodel.window_optimize(
            pool_in, batch, iter_idx, model.statics,
            gmodel.tx_cfg_tuple(m), 100, 0.2, 0.0, opt_cap,
            jnp.asarray(3, jnp.int32),
        )
        return aux["loss_hist"]

    h = run()
    float(np.asarray(h)[-1])  # compile + drain
    trace_dir = os.environ.get("OPT_TRACE", "")
    if trace_dir:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            h = run()
            float(np.asarray(h)[-1])
        print(f"trace written to {trace_dir}")
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        h = run()
        float(np.asarray(h)[-1])  # value fetch = true sync
        ts.append(time.monotonic() - t0)
    best = min(ts)
    print(f"window_optimize: best {best*1e3:.1f} ms "
          f"({best/iters*1e3:.2f} ms/iter), all "
          f"{[round(t*1e3) for t in ts]}")


if __name__ == "__main__":
    main()
