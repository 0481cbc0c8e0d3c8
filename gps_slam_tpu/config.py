"""YAML config schema — verbatim-compatible with the reference's config files.

The reference parses a single YAML per run with yaml-cpp and *no defaults*:
missing keys throw (see reference slam_trainer.cpp:9-41,
src/dataset_reader.cpp:217-259, src/pipeline.cpp:5-36,
slam/slam_pipeline.cpp:175-193, src/raw_gs_model.cpp:11-40,
slam/InfiniTAM_tools.cpp:48-63).  We mirror that: every key the reference
reads is required here and raises ``KeyError`` when absent, so reference
YAMLs run unchanged.

One *additional, optional* section exists: ``TPU:`` — capacities and tile
sizes for the fixed-shape pools that replace the reference's dynamically
sized tensors.  All its keys have defaults, so reference configs need no
edits.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any

import yaml


def _req(node: dict, key: str, ctx: str) -> Any:
    if key not in node:
        raise KeyError(f"missing required config key '{key}' in section '{ctx}'")
    return node[key]


@dataclass(frozen=True)
class ReaderConfig:
    """Mirrors the READER section (reference configs/release/replica/office0.yaml:5-22)."""

    input_dir: str
    image_path: str
    pose_path: str
    depth_path: str
    pcd_name: str
    depth_scale: float
    scene_scale: float
    start_frame: int
    end_frame: int
    frame_step: int
    intrinsics: tuple[float, float, float, float]  # fx, fy, cx, cy
    image_shape: tuple[int, int]  # width, height
    downscale_factor: float
    test_split_interval: int
    # depth decoding: "affine" (raw/depth_scale, the reference release
    # configs' only mode) or "kinect_disparity" (raw disparity ->
    # 8*c2*fx/(c1-raw); ITMViewBuilder ConvertDisparityToDepth parity)
    depth_mode: str = "affine"
    disparity_calib: tuple[float, float] = (0.0, 0.0)

    @staticmethod
    def from_node(n: dict) -> "ReaderConfig":
        return ReaderConfig(
            input_dir=str(_req(n, "input_dir", "READER")),
            image_path=str(_req(n, "image_path", "READER")),
            pose_path=str(_req(n, "pose_path", "READER")),
            depth_path=str(_req(n, "depth_path", "READER")),
            pcd_name=str(_req(n, "pcd_name", "READER")),
            depth_scale=float(_req(n, "depth_scale", "READER")),
            scene_scale=float(_req(n, "scene_scale", "READER")),
            start_frame=int(_req(n, "start_frame", "READER")),
            end_frame=int(_req(n, "end_frame", "READER")),
            frame_step=int(_req(n, "frame_step", "READER")),
            intrinsics=tuple(float(x) for x in _req(n, "intrinsics", "READER")),
            image_shape=tuple(int(x) for x in _req(n, "image_shape", "READER")),
            downscale_factor=float(_req(n, "downscale_factor", "READER")),
            test_split_interval=int(_req(n, "test_split_interval", "READER")),
            depth_mode=str(n.get("depth_mode", "affine")),
            disparity_calib=tuple(
                float(x) for x in n.get("disparity_calib", (0.0, 0.0))
            ),
        )


@dataclass(frozen=True)
class TsdfConfig:
    """Mirrors the PIPE.TSDF block (office0.yaml:60-72; consumed at
    reference slam/InfiniTAM_tools.cpp:48-63)."""

    voxel_size: float
    trunc_dist: float  # mu
    viewFrustum_min: float
    viewFrustum_max: float
    load_images: bool
    use_gt_pose: bool
    saved_mesh: str
    saved_engine: str
    saved_images: str

    @staticmethod
    def from_node(n: dict) -> "TsdfConfig":
        return TsdfConfig(
            voxel_size=float(_req(n, "voxel_size", "PIPE.TSDF")),
            trunc_dist=float(_req(n, "trunc_dist", "PIPE.TSDF")),
            viewFrustum_min=float(_req(n, "viewFrustum_min", "PIPE.TSDF")),
            viewFrustum_max=float(_req(n, "viewFrustum_max", "PIPE.TSDF")),
            load_images=bool(_req(n, "load_images", "PIPE.TSDF")),
            use_gt_pose=bool(_req(n, "use_gt_pose", "PIPE.TSDF")),
            saved_mesh=str(_req(n, "saved_mesh", "PIPE.TSDF")),
            saved_engine=str(_req(n, "saved_engine", "PIPE.TSDF")),
            saved_images=str(_req(n, "saved_images", "PIPE.TSDF")),
        )


@dataclass(frozen=True)
class PipeConfig:
    """Mirrors the PIPE section (office0.yaml:25-78; consumed at reference
    src/pipeline.cpp:5-36 and slam/slam_pipeline.cpp:175-193)."""

    train_mode: str
    max_iterations: int
    enable_densify: bool
    eval_after_train: bool
    save_after_train: bool
    selected_cam_idx: int
    model_path: str
    log_path: str
    eval_path: str
    log_iter: int
    # weight_configs
    ssim_weight: float
    depth_weight: float
    # vis_configs
    color_error_max: float
    depth_error_max: float
    depth_vis_max: float
    depth_vis_min: float
    alpha_vis_max: float
    # SLAM settings
    log_slam_state: bool
    new_gs_sample_ratio: float
    color_error_thres: float
    localframe_cam_window_length: int
    localframe_cam_window_interval: int
    local_opt_iters: int
    local_opt_interval: int
    keyframe_theta_thres: float
    keyframe_trans_thres: float
    keyframe_select_max: int
    # keyframe_sample_configs
    kf_weight_intervel: float
    kf_loss_thres: float
    kf_opt_thres: float
    kf_sample_method: str
    # remove_configs
    remove_large_scale_thres: float
    remove_small_scale_thres: float
    remove_low_opac_thres: float
    tsdf: TsdfConfig = field(repr=False, default=None)  # type: ignore

    @staticmethod
    def from_node(n: dict) -> "PipeConfig":
        w = _req(n, "weight_configs", "PIPE")
        v = _req(n, "vis_configs", "PIPE")
        k = _req(n, "keyframe_sample_configs", "PIPE")
        r = _req(n, "remove_configs", "PIPE")
        # the reference's gps_slam configs spell this key `train_method`
        # (configs/release/gps_slam/*.yaml) while replica uses `train_mode`
        # — accept both
        train_mode = n.get("train_mode", n.get("train_method"))
        if train_mode is None:
            raise KeyError("missing required config key 'train_mode' in section 'PIPE'")
        return PipeConfig(
            train_mode=str(train_mode),
            max_iterations=int(_req(n, "max_iterations", "PIPE")),
            enable_densify=bool(_req(n, "enable_densify", "PIPE")),
            eval_after_train=bool(_req(n, "eval_after_train", "PIPE")),
            save_after_train=bool(_req(n, "save_after_train", "PIPE")),
            selected_cam_idx=int(_req(n, "selected_cam_idx", "PIPE")),
            model_path=str(_req(n, "model_path", "PIPE")),
            log_path=str(_req(n, "log_path", "PIPE")),
            eval_path=str(_req(n, "eval_path", "PIPE")),
            log_iter=int(_req(n, "log_iter", "PIPE")),
            ssim_weight=float(_req(w, "ssim_weight", "PIPE.weight_configs")),
            depth_weight=float(_req(w, "depth_weight", "PIPE.weight_configs")),
            color_error_max=float(_req(v, "color_error_max", "PIPE.vis_configs")),
            depth_error_max=float(_req(v, "depth_error_max", "PIPE.vis_configs")),
            depth_vis_max=float(_req(v, "depth_vis_max", "PIPE.vis_configs")),
            depth_vis_min=float(_req(v, "depth_vis_min", "PIPE.vis_configs")),
            alpha_vis_max=float(_req(v, "alpha_vis_max", "PIPE.vis_configs")),
            log_slam_state=bool(_req(n, "log_slam_state", "PIPE")),
            new_gs_sample_ratio=float(_req(n, "new_gs_sample_ratio", "PIPE")),
            color_error_thres=float(_req(n, "color_error_thres", "PIPE")),
            localframe_cam_window_length=int(_req(n, "localframe_cam_window_length", "PIPE")),
            localframe_cam_window_interval=int(_req(n, "localframe_cam_window_interval", "PIPE")),
            local_opt_iters=int(_req(n, "local_opt_iters", "PIPE")),
            local_opt_interval=int(_req(n, "local_opt_interval", "PIPE")),
            keyframe_theta_thres=float(_req(n, "keyframe_theta_thres", "PIPE")),
            keyframe_trans_thres=float(_req(n, "keyframe_trans_thres", "PIPE")),
            keyframe_select_max=int(_req(n, "keyframe_select_max", "PIPE")),
            kf_weight_intervel=float(_req(k, "weight_intervel", "PIPE.keyframe_sample_configs")),
            kf_loss_thres=float(_req(k, "loss_thres", "PIPE.keyframe_sample_configs")),
            kf_opt_thres=float(_req(k, "opt_thres", "PIPE.keyframe_sample_configs")),
            kf_sample_method=str(_req(k, "sample_method", "PIPE.keyframe_sample_configs")),
            remove_large_scale_thres=float(_req(r, "large_scale_thres", "PIPE.remove_configs")),
            remove_small_scale_thres=float(_req(r, "small_scale_thres", "PIPE.remove_configs")),
            remove_low_opac_thres=float(_req(r, "low_opac_thres", "PIPE.remove_configs")),
            tsdf=TsdfConfig.from_node(_req(n, "TSDF", "PIPE")),
        )


@dataclass(frozen=True)
class ModelConfig:
    """Mirrors the MODEL section (office0.yaml:80-112; consumed at reference
    src/raw_gs_model.cpp:11-40)."""

    render_method: str
    max_gs_radii: int
    delta_depth: float
    sh_degree: int
    sh_degree_interval: int
    max_init_scale: float
    min_init_scale: float
    default_opacities: float
    means_lr: float
    means_lr_final: float
    scales_lr: float
    quats_lr: float
    featuresDc_lr: float
    featuresRest_lr: float
    opacities_lr: float
    exposure_lr: float
    use_exposure: bool
    densify_start_iter: int
    densify_end_iter: int
    densify_interval: int
    densify_grad_thres: float
    densify_large_thres: float
    split_screen_size: float
    reset_opacity_interval: int
    prune_opacity_thres: float

    @staticmethod
    def from_node(n: dict) -> "ModelConfig":
        return ModelConfig(
            render_method=str(_req(n, "render_method", "MODEL")),
            max_gs_radii=int(_req(n, "max_gs_radii", "MODEL")),
            delta_depth=float(_req(n, "delta_depth", "MODEL")),
            sh_degree=int(_req(n, "sh_degree", "MODEL")),
            sh_degree_interval=int(_req(n, "sh_degree_interval", "MODEL")),
            max_init_scale=float(_req(n, "max_init_scale", "MODEL")),
            min_init_scale=float(_req(n, "min_init_scale", "MODEL")),
            default_opacities=float(_req(n, "default_opacities", "MODEL")),
            means_lr=float(_req(n, "means_lr", "MODEL")),
            means_lr_final=float(_req(n, "means_lr_final", "MODEL")),
            scales_lr=float(_req(n, "scales_lr", "MODEL")),
            quats_lr=float(_req(n, "quats_lr", "MODEL")),
            featuresDc_lr=float(_req(n, "featuresDc_lr", "MODEL")),
            featuresRest_lr=float(_req(n, "featuresRest_lr", "MODEL")),
            opacities_lr=float(_req(n, "opacities_lr", "MODEL")),
            exposure_lr=float(_req(n, "exposure_lr", "MODEL")),
            use_exposure=bool(_req(n, "use_exposure", "MODEL")),
            densify_start_iter=int(_req(n, "densify_start_iter", "MODEL")),
            densify_end_iter=int(_req(n, "densify_end_iter", "MODEL")),
            densify_interval=int(_req(n, "densify_interval", "MODEL")),
            densify_grad_thres=float(_req(n, "densify_grad_thres", "MODEL")),
            densify_large_thres=float(_req(n, "densify_large_thres", "MODEL")),
            split_screen_size=float(_req(n, "split_screen_size", "MODEL")),
            reset_opacity_interval=int(_req(n, "reset_opacity_interval", "MODEL")),
            prune_opacity_thres=float(_req(n, "prune_opacity_thres", "MODEL")),
        )


@dataclass(frozen=True)
class TpuConfig:
    """TPU-specific capacities for the fixed-shape pool design.

    These replace the reference's dynamically resized tensors (the Gaussian
    tensors grown/shrunk with torch::cat / boolean indexing at reference
    src/raw_gs_model.cpp:558-644, and InfiniTAM's SDF_BUCKET_NUM /
    SDF_LOCAL_BLOCK_NUM constants at
    InfiniTAM/ITMLib/Objects/Scene/ITMVoxelBlockHash.h:15-31).  All optional
    — defaults are sized for Replica-scale scenes on one v5e chip.
    """

    gaussian_capacity: int = 2 ** 19          # max live Gaussians in the pool
    hash_size: int = 2 ** 21                  # open-addressing table slots
    block_capacity: int = 2 ** 18             # voxel-block pool (8^3 voxels each)
    max_probes: int = 8                       # linear-probe chain length
    visible_block_capacity: int = 2 ** 15     # per-frame visible block list
    tile_size: int = 16                       # rasterizer tile edge (pixels)
    tiles_per_gaussian_cap: int = 36          # per-Gaussian tile-overlap cap
    visible_gaussian_cap: int = 2 ** 16       # visible set considered per render
    tile_gaussian_cap: int = 512              # per-tile Gaussian list length
    max_isects: int = 2 ** 21                 # total intersection capacity
    raycast_max_steps: int = 96               # sphere-trace step budget
    max_weight: int = 100                     # TSDF running-average clamp (ITM maxW)
    alloc_steps: int = 4                      # mu-band march steps for allocation
    alloc_stride: int = 2                     # pixel-grid subsample for candidates
    max_new_gaussians: int = 2 ** 14          # spawn cap per optimization window
    raycast_lb: int = 16                      # tile raycaster: blocks per tile (16 == 24 on the oracle scene, -12% raycast)
    raycast_samples: int = 4                  # coarse samples per (ray, block)
    raycast_bisect: int = 6                   # bisection refinement iterations
    raycast_tiles_per_step: int = 8           # tiles per Mosaic grid step
    alloc_candidate_cap: int = 2 ** 15        # deduped block candidates per frame
    visible_sort_overflow: bool = True        # nearest-first visible-list overflow
    active_tile_cap: int = 2048               # Gaussian-occupied tiles per render
    # host-swapping analog (InfiniTAM Engines/Swapping, default-disabled
    # like the reference, ITMLibSettings.cpp:33)
    enable_swapping: bool = False
    swap_check_interval: int = 10             # frames between cursor checks
    swap_high_water: float = 0.85             # spill when n_blocks exceeds this
    swap_low_water: float = 0.70              # pool occupancy after a spill
    # spatial sharding of the voxel pools across a device mesh
    # (parallel/spatial.py); 1 = single-volume path
    space_shards: int = 1
    # frames fused per device dispatch (lax.scan chunk) when poses are
    # known ahead (gt-pose / recon mode).  Amortizes the per-dispatch
    # host<->device control cost — dominant on high-latency links; 1 =
    # per-frame dispatch (always used while tracking: the pose of frame
    # i+1 depends on frame i's raycast)
    fuse_chunk: int = 8
    # fusion groups between host-side block_until_ready calls in the
    # async loop (run-ahead bound).  Over a high-latency tunnel each call
    # can cost a round trip; raise to let the host run further ahead.
    # 0 = never sync inside the loop (the opt-frame bookkeeping and the
    # end-of-run fetch still drain the queue)
    host_sync_stride: int = 1
    # cameras per batched eval-render dispatch (render_eval_imgs): one
    # raycast program + one forward program per chunk, next chunk
    # dispatched before this one's images are encoded
    eval_chunk: int = 8
    # surface extraction: "mt" (marching tetrahedra) or "mc" (classic
    # 256-case marching cubes — reference-topology mode,
    # ITMMeshingEngine_Shared.h; table derived in tsdf/meshing.py)
    mesh_algo: str = "mt"

    @staticmethod
    def from_node(n: dict | None) -> "TpuConfig":
        n = n or {}
        base = TpuConfig()
        kwargs = {}
        for f in dataclasses.fields(TpuConfig):
            default = getattr(base, f.name)
            cast = type(default)  # bool/int/float by the field's default
            kwargs[f.name] = cast(n.get(f.name, default))
        return TpuConfig(**kwargs)


@dataclass(frozen=True)
class Config:
    """Top-level config: workspace_dir / dev_id / work_mode + the four
    sections (reference slam_trainer.cpp:9-41)."""

    workspace_dir: str
    dev_id: int
    work_mode: str  # train | recon | eval
    reader: ReaderConfig
    pipe: PipeConfig
    model: ModelConfig
    tpu: TpuConfig
    raw: dict = field(repr=False, default_factory=dict)

    @staticmethod
    def from_yaml(path: str) -> "Config":
        with open(path) as f:
            node = yaml.safe_load(f)
        return Config.from_dict(node)

    @staticmethod
    def from_dict(node: dict) -> "Config":
        return Config(
            workspace_dir=str(_req(node, "workspace_dir", "<top>")),
            dev_id=int(_req(node, "dev_id", "<top>")),
            work_mode=str(_req(node, "work_mode", "<top>")),
            reader=ReaderConfig.from_node(_req(node, "READER", "<top>")),
            pipe=PipeConfig.from_node(_req(node, "PIPE", "<top>")),
            model=ModelConfig.from_node(_req(node, "MODEL", "<top>")),
            tpu=TpuConfig.from_node(node.get("TPU")),
            raw=node,
        )


def create_workspace(cfg: Config, config_path: str | None = None) -> str:
    """Create the workspace dir and copy the config into it for provenance
    (reference src/file_utils.cpp:150-161 createWorkSpace)."""
    ws = cfg.workspace_dir
    os.makedirs(ws, exist_ok=True)
    if config_path is not None:
        import shutil

        shutil.copy(config_path, os.path.join(ws, "config.yaml"))
    else:
        with open(os.path.join(ws, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg.raw, f)
    return ws
