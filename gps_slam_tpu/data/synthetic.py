"""Procedural synthetic RGB-D micro-scene (test fixture + offline bench).

The reference system has no automated tests and uses real Replica sequences
as its only oracle (SURVEY.md §4).  This module provides the analytically
exact substitute: a textured rectangular room with an inner box obstacle,
rendered with closed-form ray-plane/ray-box intersection — perfect RGB,
depth, and poses, generated in milliseconds.

Can emit frames in-memory (fast path for unit tests) or write a dataset in
the reference's on-disk format (frameNNNNNN.jpg / poseNNNNNN.txt /
depthNNNNNN.png — exercising the real DatasetReader end-to-end).
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import io as uio
from ..utils.camera import Camera

# room interior: [0, L]^3 with an inner axis-aligned box
ROOM = np.array([4.0, 3.0, 4.0], dtype=np.float32)
BOX_MIN = np.array([1.4, 0.0, 1.6], dtype=np.float32)
BOX_MAX = np.array([2.4, 1.2, 2.6], dtype=np.float32)


def _texture(p: np.ndarray, wall_id: np.ndarray) -> np.ndarray:
    """Deterministic smooth + checker texture keyed by hit position and
    surface id -> RGB in [0,1]."""
    u = p[..., 0] * 1.7 + p[..., 1] * 0.9
    v = p[..., 2] * 1.3 + p[..., 1] * 0.5
    checker = ((np.floor(u * 2.0) + np.floor(v * 2.0)) % 2.0).astype(np.float32)
    base = np.stack(
        [
            0.5 + 0.35 * np.sin(1.9 * u + 0.7 * wall_id),
            0.5 + 0.35 * np.sin(2.3 * v + 1.3 * wall_id),
            0.5 + 0.35 * np.sin(1.1 * (u + v) + 2.1 * wall_id),
        ],
        axis=-1,
    )
    return np.clip(base * (0.75 + 0.25 * checker[..., None]), 0.0, 1.0).astype(np.float32)


def _ray_room(origins: np.ndarray, dirs: np.ndarray):
    """Exit distance of rays starting inside the room, hitting its walls.
    Returns (t, wall_id)."""
    eps = 1e-9
    inv = 1.0 / np.where(np.abs(dirs) < eps, eps, dirs)
    # distance to each of the 6 planes, only in the ray direction
    t_lo = (0.0 - origins) * inv        # planes x=0,y=0,z=0
    t_hi = (ROOM - origins) * inv       # planes x=L,...
    t_all = np.concatenate([t_lo, t_hi], axis=-1)  # [..., 6]
    t_all = np.where(t_all <= 1e-6, np.inf, t_all)
    wall_id = np.argmin(t_all, axis=-1)
    t = np.min(t_all, axis=-1)
    return t.astype(np.float32), wall_id.astype(np.float32)


def _ray_box(origins: np.ndarray, dirs: np.ndarray):
    """Entry distance of rays into the inner box (inf when missed)."""
    eps = 1e-9
    inv = 1.0 / np.where(np.abs(dirs) < eps, eps, dirs)
    t0 = (BOX_MIN - origins) * inv
    t1 = (BOX_MAX - origins) * inv
    t_near = np.max(np.minimum(t0, t1), axis=-1)
    t_far = np.min(np.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far > 1e-6) & (t_near > 1e-6)
    return np.where(hit, t_near, np.inf).astype(np.float32)


def render_frame(
    c2w: np.ndarray, width: int, height: int, fx: float, fy: float, cx: float, cy: float
) -> tuple[np.ndarray, np.ndarray]:
    """Render (rgb [H,W,3], depth [H,W,1]) with exact geometry."""
    i = np.arange(width, dtype=np.float32)[None, :]
    j = np.arange(height, dtype=np.float32)[:, None]
    x = np.broadcast_to((i - cx) / fx, (height, width))
    y = np.broadcast_to((j - cy) / fy, (height, width))
    dirs_c = np.stack([x, y, np.ones_like(x)], axis=-1)
    dirs_w = dirs_c @ c2w[:3, :3].T
    origin = np.broadcast_to(c2w[:3, 3], dirs_w.shape)

    t_room, wall_id = _ray_room(origin, dirs_w)
    t_box = _ray_box(origin, dirs_w)
    use_box = t_box < t_room
    t = np.where(use_box, t_box, t_room)
    surf_id = np.where(use_box, 6.0, wall_id)

    p = origin + t[..., None] * dirs_w
    rgb = _texture(p, surf_id)
    # depth = z in camera frame = t * dirs_c.z = t (dirs_c z-component is 1)
    depth = t[..., None].astype(np.float32)
    return rgb, depth


def orbit_poses(n_frames: int, radius: float = 0.8,
                look: str = "out", arc: float = 0.75) -> list[np.ndarray]:
    """Camera trajectory: slow orbit around the room center, with slight
    height bob.  Look-at construction with y-down camera convention
    (x right, y down, z forward).

    look="out": at the walls (the texture-rich render fixture).
    look="in":  across the room at the inner box — every view contains
    the box corners plus floor and the far wall, so point-to-plane ICP is
    fully constrained (the outward orbit stares at single planes, which
    is rank-deficient geometry by construction)."""
    center = ROOM * 0.5
    poses = []
    for k in range(n_frames):
        ang = 2.0 * np.pi * k / max(n_frames, 1) * arc
        if look == "in":
            eye = center + np.array(
                [1.6 * np.cos(ang), 0.4 + 0.1 * np.sin(3 * ang), 1.6 * np.sin(ang)],
                dtype=np.float32,
            )
            target = np.array([2.0, 1.0, 2.1], dtype=np.float32)  # box top
        else:
            eye = center + np.array(
                [radius * np.cos(ang), 0.15 * np.sin(3 * ang), radius * np.sin(ang)],
                dtype=np.float32,
            )
            # look outward toward the wall in the orbit direction
            target = center + np.array(
                [2.5 * np.cos(ang + 0.35), 0.3 * np.sin(2 * ang), 2.5 * np.sin(ang + 0.35)],
                dtype=np.float32,
            )
        z = target - eye
        z = z / np.linalg.norm(z)
        up = np.array([0.0, -1.0, 0.0], dtype=np.float32)  # y-down convention
        xaxis = np.cross(up, z)
        xaxis /= np.linalg.norm(xaxis)
        yaxis = np.cross(z, xaxis)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = xaxis, yaxis, z, eye
        poses.append(c2w)
    return poses


def make_cameras(
    n_frames: int = 24,
    width: int = 160,
    height: int = 120,
    fov_scale: float = 1.0,
    look: str = "out",
    arc: float = 0.75,
) -> list[Camera]:
    """In-memory synthetic sequence (fast unit-test path)."""
    fx = fy = 0.75 * width * fov_scale
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    cams = []
    for k, c2w in enumerate(orbit_poses(n_frames, look=look, arc=arc)):
        cam = Camera(width, height, fx, fy, cx, cy, True, c2w, f"mem/frame{k:06d}.jpg", "", k)
        cam.image, cam.depth = render_frame(c2w, width, height, fx, fy, cx, cy)
        cams.append(cam)
    return cams


def write_dataset(out_dir: str, n_frames: int = 12, width: int = 160, height: int = 120,
                  depth_scale: float = 6553.5) -> dict:
    """Write the synthetic scene in the reference's on-disk dataset format
    and return a READER config node for it."""
    import cv2

    cam_dir = os.path.join(out_dir, "camera")
    depth_dir = os.path.join(out_dir, "depth")
    os.makedirs(cam_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)
    cams = make_cameras(n_frames, width, height)
    for k, cam in enumerate(cams):
        fid = uio.id_to_filename(k)
        cv2.imwrite(
            os.path.join(cam_dir, f"frame{fid}.jpg"),
            cv2.cvtColor((cam.image * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 98],
        )
        cv2.imwrite(
            os.path.join(depth_dir, f"depth{fid}.png"),
            np.clip(cam.depth[..., 0] * depth_scale, 0, 65535).astype(np.uint16),
        )
        uio.save_pose_txt(cam.c2w, os.path.join(cam_dir, f"pose{fid}.txt"))
    return {
        "input_dir": out_dir,
        "image_path": "camera",
        "pose_path": "camera",
        "depth_path": "depth",
        "pcd_name": "none.ply",
        "depth_scale": depth_scale,
        "scene_scale": 1.0,
        "start_frame": 0,
        "end_frame": n_frames - 1,
        "frame_step": 1,
        "intrinsics": [cams[0].fx, cams[0].fy, cams[0].cx, cams[0].cy],
        "image_shape": [width, height],
        "downscale_factor": 1,
        "test_split_interval": -1,
    }


def default_config_dict(out_dir: str, reader_node: dict, work_mode: str = "train") -> dict:
    """A full config dict mirroring configs/release/replica/office0.yaml but
    pointed at a synthetic dataset with small TPU capacities."""
    return {
        "workspace_dir": os.path.join(out_dir, "workspace"),
        "dev_id": 0,
        "work_mode": work_mode,
        "READER": reader_node,
        "PIPE": {
            "train_mode": "ges",
            "max_iterations": 100,
            "enable_densify": False,
            "eval_after_train": False,
            "save_after_train": True,
            "selected_cam_idx": -1,
            "model_path": "/gs_model",
            "log_path": "/log",
            "eval_path": "/val",
            "log_iter": 50,
            "weight_configs": {"ssim_weight": 0.0, "depth_weight": 0.0},
            "vis_configs": {
                "color_error_max": 0.1,
                "depth_error_max": 0.1,
                "depth_vis_max": 5,
                "depth_vis_min": 0,
                "alpha_vis_max": 5,
            },
            "log_slam_state": False,
            "new_gs_sample_ratio": 0.25,
            "color_error_thres": 0.05,
            "localframe_cam_window_length": 2,
            "localframe_cam_window_interval": 2,
            "local_opt_iters": 10,
            "local_opt_interval": 4,
            "keyframe_theta_thres": 10,
            "keyframe_trans_thres": 0.1,
            "keyframe_select_max": 3,
            "keyframe_sample_configs": {
                "weight_intervel": 0.01,
                "loss_thres": 0.02,
                "opt_thres": 50,
                "sample_method": "random",
            },
            "remove_configs": {
                "large_scale_thres": 0.5,
                "small_scale_thres": 0.0005,
                "low_opac_thres": 0.005,
            },
            "TSDF": {
                "voxel_size": 0.02,
                "trunc_dist": 0.08,
                "viewFrustum_min": 0.2,
                "viewFrustum_max": 10,
                "load_images": True,
                "use_gt_pose": True,
                "saved_mesh": "tsdf_mesh.ply",
                "saved_engine": "tsdf_engine/",
                "saved_images": "raycasted",
            },
        },
        "MODEL": {
            "render_method": "ges",
            "max_gs_radii": 100,
            "delta_depth": 0.1,
            "sh_degree": 1,
            "sh_degree_interval": 0,
            "max_init_scale": 0.05,
            "min_init_scale": -1,
            "default_opacities": 0.5,
            "means_lr": 0.00016,
            "means_lr_final": 0.0000016,
            "scales_lr": 0.005,
            "quats_lr": 0.001,
            "featuresDc_lr": 0.0025,
            "featuresRest_lr": 0.0005,
            "opacities_lr": 5e-2,
            "exposure_lr": 0.003,
            "use_exposure": False,
            "densify_start_iter": 500,
            "densify_end_iter": 6000,
            "densify_interval": 100,
            "densify_grad_thres": 0.0002,
            "densify_large_thres": 0.01,
            "split_screen_size": 0.05,
            "reset_opacity_interval": 3000,
            "prune_opacity_thres": 0.005,
        },
        "TPU": {
            "gaussian_capacity": 2 ** 14,
            "hash_size": 2 ** 16,
            "block_capacity": 2 ** 13,
            "visible_block_capacity": 2 ** 12,
            "max_isects": 2 ** 17,
            "tile_gaussian_cap": 256,
            "raycast_max_steps": 64,
            "raycast_lb": 32,
            "tiles_per_gaussian_cap": 64,
        },
    }
