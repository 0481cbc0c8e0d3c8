"""Full-loop tests: the SLAM pipeline end-to-end on the synthetic scene
(the reference's only oracle is `run Replica and check PSNR`, SURVEY §4 —
this is the minutes-to-seconds CI equivalent)."""

import os

import numpy as np
import pytest
import yaml

from gps_slam_tpu.config import Config
from gps_slam_tpu.data import synthetic


@pytest.fixture(scope="module")
def trained_workspace(tmp_path_factory):
    """Run `train` mode over the synthetic dataset via the CLI module."""
    tmp = tmp_path_factory.mktemp("slam")
    node = synthetic.write_dataset(str(tmp / "scene"), n_frames=13, width=160, height=120)
    cfg_dict = synthetic.default_config_dict(str(tmp / "scene"), node)
    cfg_dict["PIPE"]["eval_after_train"] = True
    # debug-artifact mode (reference #ifndef LOG_PIPELINE_TIME writes):
    # exercises per-window raycast comps + before_opt renders
    cfg_dict["PIPE"]["log_slam_state"] = True
    cfg_path = str(tmp / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    import slam_trainer

    slam_trainer.main(cfg_path)
    return cfg_dict["workspace_dir"], cfg_dict


def test_train_artifacts(trained_workspace):
    ws, cfg = trained_workspace
    assert os.path.exists(os.path.join(ws, "time_log.txt"))
    log = open(os.path.join(ws, "time_log.txt")).read()
    assert "[PIPELINE AVG TIME]" in log and "FPS:" in log
    assert os.path.exists(os.path.join(ws, "tsdf_mesh.ply"))
    assert os.path.exists(os.path.join(ws, "tsdf_engine", "scene.npz"))
    assert os.path.exists(os.path.join(ws, "gs_model", "model.npz"))
    assert os.path.exists(os.path.join(ws, "gs_model", "model.pt"))
    assert os.path.exists(os.path.join(ws, "gs_model", "point_cloud.ply"))
    assert os.path.exists(os.path.join(ws, "gs_model", "cameras.json"))
    assert os.path.exists(os.path.join(ws, "gs_model", "cfg_args"))
    assert len(os.listdir(os.path.join(ws, "pose"))) == 13
    # eval renders
    renders = os.listdir(os.path.join(ws, "val", "render"))
    assert any(n.endswith(".color.jpg") for n in renders)
    assert len(os.listdir(os.path.join(ws, "val", "gt"))) > 0
    # per-window debug artifacts (slam_pipeline.cpp:429-446, 499-504),
    # written because the fixture sets log_slam_state and profiling is off
    saved = os.listdir(os.path.join(ws, cfg["PIPE"]["TSDF"]["saved_images"]))
    assert any(n.endswith(".color.jpg") for n in saved), saved
    assert any(n.endswith(".depth.jpg") for n in saved), saved
    assert len(os.listdir(os.path.join(ws, "before_opt"))) > 0


def test_train_quality(trained_workspace):
    """Rendered eval images must beat a trivial baseline by a wide margin.

    Thresholds are deliberately loose: the 13-frame orbit leaves early
    frames under-optimized (spawning lags the trajectory) and run-to-run
    spawn randomness moves per-frame PSNR by several dB.  The strong
    quality gates live in the kernel-level tests (rasterizer vs dense
    oracle, raycast depth vs analytic scene)."""
    import cv2

    ws, cfg = trained_workspace
    render_dir = os.path.join(ws, "val", "render")
    gt_dir = os.path.join(ws, "val", "gt")
    names = sorted(n for n in os.listdir(render_dir) if n.endswith(".color.jpg"))
    psnrs = []
    for n in names:
        r = cv2.imread(os.path.join(render_dir, n)).astype(np.float32) / 255
        g = cv2.imread(os.path.join(gt_dir, n)).astype(np.float32) / 255
        mse = ((r - g) ** 2).mean()
        psnrs.append(-10 * np.log10(max(mse, 1e-12)))
    mean_psnr = float(np.mean(psnrs))
    # full-frame floor: image borders are observed only once in the orbit
    # and fusion skips a 1-2 px rim, so unobserved pixels render black
    # (the reference instead hallucinates crossings into uninitialized
    # space there); render quality on observed regions is checked by the
    # interior PSNR below
    assert mean_psnr > 15.0, f"PSNR {mean_psnr} (per-frame {psnrs})"
    interior = []
    for n in names:
        r = cv2.imread(os.path.join(render_dir, n)).astype(np.float32) / 255
        g = cv2.imread(os.path.join(gt_dir, n)).astype(np.float32) / 255
        mse = ((r - g)[12:-12, 12:-12] ** 2).mean()
        interior.append(-10 * np.log10(max(mse, 1e-12)))
    mean_interior = float(np.mean(interior))
    assert mean_interior > 17.5, f"interior PSNR {mean_interior} ({interior})"


def test_eval_mode_roundtrip(trained_workspace, tmp_path):
    """`eval` work mode: load model + engine, render again."""
    ws, cfg_dict = trained_workspace
    cfg2 = dict(cfg_dict)
    cfg2["work_mode"] = "eval"
    import shutil

    val = os.path.join(ws, "val")
    shutil.rmtree(val)
    cfg_path = str(tmp_path / "eval.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg2, f)
    import slam_trainer

    slam_trainer.main(cfg_path)
    assert len(os.listdir(os.path.join(ws, "val", "render"))) > 0


def test_recon_mode(tmp_path):
    node = synthetic.write_dataset(str(tmp_path / "scene"), n_frames=5, width=96, height=72)
    cfg_dict = synthetic.default_config_dict(str(tmp_path / "scene"), node, work_mode="recon")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)
    import slam_trainer

    slam_trainer.main(cfg_path)
    ws = cfg_dict["workspace_dir"]
    assert os.path.exists(os.path.join(ws, "tsdf_mesh.ply"))
    # recon mode trains no gaussians
    assert not os.path.exists(os.path.join(ws, "gs_model", "model.npz"))


def test_count_cache_bootstraps(tmp_path):
    """The async live-count cache must refresh past its 0 start: with a
    stuck cache remove_redundant never prunes, init_new_gaussians stays on
    the empty-pool branch, and opt_cap(cached=True) computes from 0
    (advisor round-2 high finding)."""
    from gps_slam_tpu.gs.model import GaussianModel
    from gps_slam_tpu.slam.pipeline import SLAMPipeline
    from gps_slam_tpu.tsdf.engine import TsdfEngine

    n_frames = 25  # covers window frames 10 and 20 (local_opt_interval 10)
    cams = synthetic.make_cameras(n_frames=n_frames, width=96, height=64)
    cam0 = cams[0]
    node = {
        "input_dir": "m", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": n_frames - 1, "frame_step": 1,
        "intrinsics": [cam0.fx, cam0.fy, cam0.cx, cam0.cy],
        "image_shape": [96, 64], "downscale_factor": 1, "test_split_interval": -1,
    }
    cfg = Config.from_dict(
        synthetic.default_config_dict(str(tmp_path / "ws"), node)
    )
    engine = TsdfEngine(cfg, 96, 64, cam0.K)
    engine.set_gt_poses([c.c2w for c in cams])
    engine.turn_off_tracking()
    model = GaussianModel(cfg, 96, 64)
    pipe = SLAMPipeline(cfg, engine, cfg.workspace_dir, is_train=False)
    pipe.slam_train_cams(model, cams)
    assert model.num_gaussians > 0
    # the cache must have left its 0 bootstrap value and caught up with
    # the true count (it lags at most one window = the last prune's value)
    assert model.num_gaussians_cached > 0
    assert model.num_gaussians_cached == model.num_gaussians


def test_keyframe_error_bookkeeping_ours(tmp_path):
    """kf_sample_method='ours' parity (slam_pipeline.cpp:130,293-317,538):
    keyframes are minted and tracked in keyframe_loss_dict, but the opt
    set holds ONLY the local window — the reference adds sampled
    keyframes exclusively in 'random' mode, so its checkKeyFrameError
    re-evaluation loop runs over an empty slice (vestigial path,
    mirrored exactly)."""
    from gps_slam_tpu.gs.model import GaussianModel
    from gps_slam_tpu.slam.pipeline import SLAMPipeline
    from gps_slam_tpu.tsdf.engine import TsdfEngine

    n_frames = 13
    cams = synthetic.make_cameras(n_frames=n_frames, width=96, height=64)
    cam0 = cams[0]
    node = {
        "input_dir": "m", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": n_frames - 1, "frame_step": 1,
        "intrinsics": [cam0.fx, cam0.fy, cam0.cx, cam0.cy],
        "image_shape": [96, 64], "downscale_factor": 1, "test_split_interval": -1,
    }
    cfg_dict = synthetic.default_config_dict(str(tmp_path / "ws"), node)
    cfg_dict["PIPE"]["keyframe_sample_configs"]["sample_method"] = "ours"
    # low motion thresholds: the slow orbit must still mint keyframes
    cfg_dict["PIPE"].update(keyframe_theta_thres=1, keyframe_trans_thres=0.01)
    cfg = Config.from_dict(cfg_dict)
    engine = TsdfEngine(cfg, 96, 64, cam0.K)
    engine.set_gt_poses([c.c2w for c in cams])
    engine.turn_off_tracking()
    model = GaussianModel(cfg, 96, 64)
    pipe = SLAMPipeline(cfg, engine, cfg.workspace_dir, is_train=False)
    pipe.slam_train_cams(model, cams)
    assert len(pipe.keyframe_cam_list) >= 2
    # every minted keyframe got a bookkeeping entry at creation
    assert len(pipe.keyframe_loss_dict) == len(pipe.keyframe_cam_list)
    # the opt set never included sampled keyframes (reference 'ours'
    # behavior): only the local window was optimized
    n_local = len(pipe.localframe_cam_window)
    assert len(pipe.opt_cam_list) == n_local
    # hence no re-evaluated (4-element) entries exist
    assert all(len(v) == 5 for v in pipe.keyframe_loss_dict.values())


def test_icp_tracker_converges():
    """ICP must recover a small pose perturbation against raycast maps."""
    import jax.numpy as jnp

    from gps_slam_tpu.slam.tracker import ICPTracker, TrackerQuality
    from gps_slam_tpu.utils.se3 import compute_normal_map, compute_vertex_map, transform_points

    cams = synthetic.make_cameras(n_frames=2, width=160, height=120)
    cam = cams[0]
    node = {
        "input_dir": "x", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": 1, "frame_step": 1,
        "intrinsics": [cam.fx, cam.fy, cam.cx, cam.cy],
        "image_shape": [160, 120], "downscale_factor": 1, "test_split_interval": -1,
    }
    cfg = Config.from_dict(synthetic.default_config_dict("/tmp/x", node))

    # "raycast" maps = exact maps of the reference pose
    vmap_c = compute_vertex_map(jnp.asarray(cam.depth), cam.fx, cam.fy, cam.cx, cam.cy)
    vmap_w = transform_points(vmap_c.reshape(-1, 3), jnp.asarray(cam.c2w)).reshape(vmap_c.shape)
    maps = {"vertex_map": vmap_w, "normal_map": compute_normal_map(vmap_w)}

    # new frame: true pose = slightly moved, render exact depth there.
    # NOTE: this view sees only vertical walls, so translation along y is
    # unobservable for point-to-plane ICP — perturb x/z only.
    true_pose = cam.c2w.copy()
    true_pose[:3, 3] += np.array([0.015, 0.0, 0.02], np.float32)
    _, depth_new = synthetic.render_frame(
        true_pose, cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy
    )

    tracker = ICPTracker(cfg, cam.width, cam.height)
    # start from the OLD pose; tracker must move toward the true one
    est, quality = tracker.track(cam.c2w, depth_new, maps, cam.K)
    err_before = np.linalg.norm(cam.c2w[:3, 3] - true_pose[:3, 3])
    err_after = np.linalg.norm(est[:3, 3] - true_pose[:3, 3])
    assert quality != TrackerQuality.FAILED
    assert err_after < 0.35 * err_before, (err_before, err_after)


def test_window_megastep_matches_eager(tmp_path):
    """The one-dispatch window megastep (slam/megastep.py) must reproduce
    the eager per-phase path: identical RNG draw order by construction, so
    gaussian counts match exactly and the trained renders agree to
    float-reassociation noise (the megastep fuses the same ops into one
    XLA module)."""
    import jax.numpy as jnp

    from gps_slam_tpu.gs.model import GaussianModel
    from gps_slam_tpu.slam.pipeline import SLAMPipeline
    from gps_slam_tpu.tsdf.engine import TsdfEngine

    n_frames = 25
    cams = synthetic.make_cameras(n_frames=n_frames, width=96, height=64)
    cam0 = cams[0]
    node = {
        "input_dir": "m", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": n_frames - 1, "frame_step": 1,
        "intrinsics": [cam0.fx, cam0.fy, cam0.cx, cam0.cy],
        "image_shape": [96, 64], "downscale_factor": 1, "test_split_interval": -1,
    }

    def run(disable_megastep):
        cfg = Config.from_dict(
            synthetic.default_config_dict(str(tmp_path / "ws"), node))
        engine = TsdfEngine(cfg, 96, 64, cam0.K)
        engine.set_gt_poses([c.c2w for c in cams])
        engine.turn_off_tracking()
        engine.sync_counts = True  # deterministic cap buckets
        model = GaussianModel(cfg, 96, 64)
        model.sync_counts = True
        pipe = SLAMPipeline(cfg, engine, cfg.workspace_dir, is_train=False)
        pipe.disable_megastep = disable_megastep
        pipe.slam_train_cams(model, cams)
        if not disable_megastep:
            assert pipe._megastep_ran, "megastep gate never fired"
        cam = cams[12]
        ray = engine.run_raycast(cam.c2w, cam.K, cam.width, cam.height)
        res = model.forward(cam.c2w, cam.K, ray["depth_map"][..., 0],
                            ray["color_map"])
        return model.num_gaussians, np.asarray(jnp.clip(res["rgb"], 0, 1))

    n_eager, img_eager = run(True)
    n_mega, img_mega = run(False)
    assert n_mega == n_eager, (n_mega, n_eager)
    mse = float(((img_mega - img_eager) ** 2).mean())
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 45.0, f"megastep render diverged: {psnr:.1f} dB"
