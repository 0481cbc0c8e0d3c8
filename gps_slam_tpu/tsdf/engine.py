"""TSDF engine facade — the role of ITMBasicEngine + CLIEngine +
InfiniTAM_tools in the reference (ITMBasicEngine.tpp:261-384 ProcessFrame,
:501 runRaycast; CLIEngine.cpp:13-77; InfiniTAM_tools.cpp:3-68
createTsdfEngine).

Per frame: view build (depth already metric from the reader) -> camera
track (ICP, or ground-truth pose injection when use_gt_pose — matching the
fork's gt-pose path, ITMBasicEngine.tpp:274-279) -> fuse -> record the
frame's pose/intrinsics for later raycast replay (the fork's
camPoses/camIntrincs recording, ITMBasicEngine.tpp:381-384).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from . import integrate, raycast as rc, raycast_tiles as rc_tiles
from .volume import TsdfParams, TsdfVolume, create


class TrackingResult:
    """behaviourOnFailure policy surface (ITMLibSettings.cpp:42,
    ITMBasicEngine.tpp:283-333)."""

    GOOD = 2
    POOR = 1
    FAILED = 0


class TsdfEngine:
    def __init__(self, cfg: Config, width: int, height: int, K: np.ndarray):
        t = cfg.pipe.tsdf
        tpu = cfg.tpu
        self.params = TsdfParams(
            voxel_size=t.voxel_size,
            mu=t.trunc_dist,
            max_w=tpu.max_weight,
            frustum_min=t.viewFrustum_min,
            frustum_max=t.viewFrustum_max,
            hash_size=tpu.hash_size,
            block_capacity=tpu.block_capacity,
            max_probes=tpu.max_probes,
            visible_capacity=tpu.visible_block_capacity,
            alloc_steps=tpu.alloc_steps,
            raycast_steps=tpu.raycast_max_steps,
            alloc_candidate_cap=tpu.alloc_candidate_cap,
            raycast_lb=tpu.raycast_lb,
            visible_sort_overflow=bool(tpu.visible_sort_overflow),
            raycast_samples=tpu.raycast_samples,
            raycast_bisect=tpu.raycast_bisect,
        )
        self.vol: TsdfVolume = create(self.params)
        self.width, self.height = int(width), int(height)
        self.K = np.asarray(K, dtype=np.float32)
        self.use_gt_pose = bool(t.use_gt_pose)
        self.tracking_active = not self.use_gt_pose
        self.gt_c2w_poses: list[np.ndarray] = []
        self.cam_poses: list[np.ndarray] = []          # estimated c2w per frame
        self.cam_intrinsics: list[np.ndarray] = []
        self.current_frame = 0
        self._last_pose: np.ndarray = np.eye(4, dtype=np.float32)
        self._tracker = None  # set by attach_tracker (slam.tracker)
        self._last_raycast_for_tracking = None
        # tracking-failure policy (ITMLibSettings behaviourOnFailure,
        # default IGNORE; ITMBasicEngine.tpp:283-333).  Optional YAML key
        # PIPE.TSDF.behaviour_on_failure extends the reference schema.
        self.failure_policy = str(
            (cfg.raw.get("PIPE", {}).get("TSDF", {}) or {}).get(
                "behaviour_on_failure", "ignore"
            )
        )
        # ViewBuilder depth filtering (ITMLibSettings useBilateralFilter,
        # default false in the reference, ITMLibSettings.cpp:39);
        # optional YAML key PIPE.TSDF.use_bilateral_filter
        self.use_bilateral_filter = bool(
            (cfg.raw.get("PIPE", {}).get("TSDF", {}) or {}).get(
                "use_bilateral_filter", False
            )
        )
        self.relocalizer = None
        if self.failure_policy == "relocalise":
            from ..slam.relocalizer import FernRelocalizer

            self.relocalizer = FernRelocalizer()
        self._tracking_quality = 2

    # -- configuration -------------------------------------------------------

    def set_gt_poses(self, poses: list[np.ndarray]) -> None:
        self.gt_c2w_poses = [np.asarray(p, dtype=np.float32) for p in poses]

    def turn_off_tracking(self) -> None:
        self.tracking_active = False

    def attach_tracker(self, tracker) -> None:
        self._tracker = tracker
        self.tracking_active = not self.use_gt_pose

    # -- per-frame processing -------------------------------------------------

    def process_frame(self, rgb, depth) -> np.ndarray:
        """Track (or inject gt pose) + fuse one RGB-D frame; returns the
        estimated c2w pose (ITMBasicEngine::ProcessFrame).  `rgb`/`depth`
        may be host numpy or device arrays (callers should prefer
        device-cached frames, data/device_cache.py — the host link here
        is slow)."""
        i = self.current_frame
        skip_fusion = False
        if self.use_bilateral_filter:
            from ..utils.se3 import bilateral_filter_depth

            d_ = jnp.asarray(depth)
            if d_.ndim == 3:
                d_ = d_[..., 0]
            depth = bilateral_filter_depth(d_)
        if self.tracking_active and self._tracker is not None and i > 0:
            pose, quality = self._tracker.track(
                self._last_pose,
                depth,
                self._last_raycast_for_tracking,
                self.K,
            )
            self._tracking_quality = quality
            if quality == TrackingResult.FAILED:
                pose = self._last_pose  # pose revert (ITMBasicEngine.tpp:365-366)
                if self.failure_policy == "stop_integration":
                    skip_fusion = True
                elif self.failure_policy == "relocalise" and self.relocalizer:
                    # Fern retrieval + re-track from the retrieved pose
                    # (ITMBasicEngine.tpp:302-333)
                    cand = self.relocalizer.relocalize(depth)
                    if cand is not None:
                        reloc_maps = self.run_raycast(cand)
                        pose, quality = self._tracker.track(
                            cand, depth, reloc_maps, self.K
                        )
                        if quality == TrackingResult.FAILED:
                            pose = self._last_pose
                            skip_fusion = True
            if self.relocalizer is not None:
                self.relocalizer.process_frame(
                    depth, pose, quality == TrackingResult.GOOD
                )
        elif self.gt_c2w_poses:
            # frames beyond the supplied gt trajectory keep the last pose
            pose = self.gt_c2w_poses[min(i, len(self.gt_c2w_poses) - 1)]
        else:
            pose = self._last_pose

        if not skip_fusion:
            d = jnp.asarray(depth)
            if d.ndim == 3:
                d = d[..., 0]
            c = jnp.asarray(rgb)
            self.vol = integrate.fuse_frame(
                self.vol, d, c, jnp.asarray(pose), jnp.asarray(self.K),
                False, self._use_pallas_raycast(),
            )
        self._last_pose = np.asarray(pose, dtype=np.float32)
        self.cam_poses.append(self._last_pose.copy())
        self.cam_intrinsics.append(self.K.copy())
        self.current_frame += 1

        if self.tracking_active and self._tracker is not None:
            # raycast-prepare for the next frame's ICP
            # (TrackingController::Prepare, ITMTrackingController.h:66)
            self._last_raycast_for_tracking = self.run_raycast(self._last_pose)
        return self._last_pose

    # -- raycast service -------------------------------------------------------

    def run_raycast(self, c2w: np.ndarray, K: np.ndarray | None = None,
                    width: int | None = None, height: int | None = None) -> dict:
        """Raycast from an arbitrary pose (the fork's runRaycast service,
        ITMBasicEngine.tpp:501; consumed by SLAMPipeline::runRaycastByCam,
        slam_pipeline.cpp:362-415)."""
        K = jnp.asarray(self.K if K is None else K, dtype=jnp.float32)
        width = width or self.width
        height = height or self.height
        p = self.vol.params
        if self._use_pallas_raycast():
            from . import raycast_pallas as rc_pallas

            return rc_pallas.raycast(
                self.vol, jnp.asarray(np.asarray(c2w, np.float32)), K,
                width, height, p.raycast_lb, p.raycast_samples,
                max(p.raycast_bisect, 8), 2, 8,
            )
        return rc_tiles.raycast(
            self.vol, jnp.asarray(np.asarray(c2w, np.float32)), K,
            width, height, p.raycast_lb, p.raycast_samples,
            max(p.raycast_bisect, 8), p.raycast_chunk,
        )

    def _use_pallas_raycast(self) -> bool:
        """The Mosaic march kernel needs a real TPU backend; the XLA
        formulation serves every other platform (and remains the oracle
        the kernel is tested against)."""
        if getattr(self, "_pallas_override", None) is not None:
            return self._pallas_override
        try:
            # check where the volume actually lives, NOT
            # jax.default_backend(): the axon TPU plugin reports 'tpu'
            # even when JAX_PLATFORMS/jax_default_device pin CPU
            return next(iter(self.vol.sdf.devices())).platform == "tpu"
        except Exception:
            return False

    # -- persistence -----------------------------------------------------------

    def save_scene(self, out_dir: str) -> None:
        """Scene checkpoint (ITMBasicEngine::SaveToFile equivalent,
        ITMBasicEngine.tpp:120-135) as one npz."""
        os.makedirs(out_dir, exist_ok=True)
        np.savez_compressed(
            os.path.join(out_dir, "scene.npz"),
            table_keys=np.asarray(self.vol.table_keys),
            table_ptrs=np.asarray(self.vol.table_ptrs),
            block_coords=np.asarray(self.vol.block_coords),
            sdf=np.asarray(self.vol.sdf),
            w_depth=np.asarray(self.vol.w_depth),
            color=np.asarray(self.vol.color),
            w_color=np.asarray(self.vol.w_color),
            n_blocks=np.asarray(self.vol.n_blocks),
            mip=np.asarray(self.vol.mip),
            block_min_sdf=np.asarray(self.vol.block_min_sdf),
            block_max_w=np.asarray(self.vol.block_max_w),
            cam_poses=np.stack(self.cam_poses) if self.cam_poses else np.zeros((0, 4, 4)),
            cam_intrinsics=np.stack(self.cam_intrinsics)
            if self.cam_intrinsics
            else np.zeros((0, 3, 3)),
        )

    def load_scene(self, in_dir: str) -> None:
        """ITMBasicEngine::LoadFromFile equivalent (ITMBasicEngine.tpp:138-171):
        reset then load."""
        z = np.load(os.path.join(in_dir, "scene.npz"))
        self.vol = self.vol.replace(
            table_keys=jnp.asarray(z["table_keys"]),
            table_ptrs=jnp.asarray(z["table_ptrs"]),
            block_coords=jnp.asarray(z["block_coords"]),
            sdf=jnp.asarray(z["sdf"]),
            w_depth=jnp.asarray(z["w_depth"]),
            color=jnp.asarray(z["color"]),
            w_color=jnp.asarray(z["w_color"]),
            n_blocks=jnp.asarray(z["n_blocks"]),
            mip=jnp.asarray(z["mip"]) if "mip" in z else self.vol.mip,
            block_min_sdf=jnp.asarray(z["block_min_sdf"])
            if "block_min_sdf" in z else self.vol.block_min_sdf,
            block_max_w=jnp.asarray(z["block_max_w"])
            if "block_max_w" in z else self.vol.block_max_w,
        )
        self.cam_poses = [p.astype(np.float32) for p in z["cam_poses"]]
        self.cam_intrinsics = [k.astype(np.float32) for k in z["cam_intrinsics"]]
        self.current_frame = len(self.cam_poses)

    def save_mesh(self, path: str) -> None:
        """Marching-tetrahedra surface -> colored PLY
        (ITMBasicEngine::SaveSceneToMesh, ITMBasicEngine.tpp:105-117)."""
        from ..utils import io as uio
        from .meshing import extract_mesh

        verts, cols = extract_mesh(self.vol)
        uio.save_mesh_ply(path, verts, cols)

    @property
    def voxel_size(self) -> float:
        return self.params.voxel_size
