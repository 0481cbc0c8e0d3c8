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


def _track_fuse_step_impl(vol, T_prev, depth, rgb, ref_vertex, ref_normal,
                          K, level_iters, use_pallas, pool_prefix, vis_cap):
    """Device-pure track + fuse for ONE frame — the tracked-mode megastep
    body.  The ICP pyramid (slam.tracker.track_pyramid), the in-graph
    pose-revert on hard tracking failure (the host policy's FAILED branch,
    ITMBasicEngine.tpp:365-366), and the frame's TSDF fusion run as one
    program; nothing touches the host.  Callers fetch (pose, inlier,
    residual) AFTER dispatching the next raycast so the fetch RTT overlaps
    the march (PERF.md: the per-frame host fetch was why tracked mode ran
    at 0.4 fps over the ~30 ms-RTT tunnel)."""
    from ..slam import tracker as trk

    cam0 = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
    T, inl, mr = trk.track_pyramid(
        T_prev, depth, ref_vertex, ref_normal, cam0, level_iters)
    bad = ((~jnp.all(jnp.isfinite(T)))
           | (inl < trk.FAIL_MIN_INLIER) | (mr > trk.FAIL_MAX_RESIDUAL))
    pose = jnp.where(bad, T_prev, T)
    vol = integrate._fuse_frame_impl(
        vol, depth, rgb, pose, K, False, use_pallas, None, 1, None,
        pool_prefix, vis_cap)
    return vol, pose, inl, mr


_track_fuse_step = jax.jit(
    _track_fuse_step_impl, static_argnums=(7, 8, 9, 10), donate_argnums=(0,))


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
            alloc_stride=tpu.alloc_stride,
            raycast_tiles_per_step=tpu.raycast_tiles_per_step,
            raycast_steps=tpu.raycast_max_steps,
            alloc_candidate_cap=tpu.alloc_candidate_cap,
            raycast_lb=tpu.raycast_lb,
            visible_sort_overflow=bool(tpu.visible_sort_overflow),
            raycast_samples=tpu.raycast_samples,
            raycast_bisect=tpu.raycast_bisect,
        )
        # spatial sharding (SURVEY §2.4 second multi-chip axis): with
        # TPU.space_shards = S > 1 the voxel pools split S-ways by key-hash
        # ownership (parallel/spatial.py) — per-shard capacities divide by
        # S, fusion needs no collectives, raycast merges by nearest hit.
        # Leaves are placed over a ("space",) mesh when S devices exist;
        # on fewer devices the stacked [S, ...] form still runs (vmap).
        self.mesh_algo = str(tpu.mesh_algo)
        self.space_shards = int(tpu.space_shards)
        if self.space_shards > 1:
            assert not tpu.enable_swapping, (
                "enable_swapping and space_shards are mutually exclusive")
            S = self.space_shards
            self.params = self.params.replace(
                hash_size=max(self.params.hash_size // S, 1 << 12),
                block_capacity=max(self.params.block_capacity // S, 1 << 9),
            )
            from ..parallel import spatial

            self.vol = spatial.create_sharded(self.params, S)
            devs = jax.devices()
            if len(devs) >= S:
                from jax.sharding import Mesh

                mesh = Mesh(np.asarray(devs[:S]), ("space",))
                self.vol = spatial.shard_volume(self.vol, mesh)
        else:
            self.vol: TsdfVolume = create(self.params)
        self.width, self.height = int(width), int(height)
        self.K = np.asarray(K, dtype=np.float32)
        # device-resident copy: K is re-used every frame (fusion) and every
        # raycast — re-uploading a constant per call costs one tunnel
        # transfer each time
        self._K_dev = jnp.asarray(self.K)
        self.use_gt_pose = bool(t.use_gt_pose)
        self.tracking_active = not self.use_gt_pose
        self.gt_c2w_poses: list[np.ndarray] = []
        self.cam_poses: list[np.ndarray] = []          # estimated c2w per frame
        self.cam_intrinsics: list[np.ndarray] = []
        self.current_frame = 0
        self._last_pose: np.ndarray = np.eye(4, dtype=np.float32)
        self._last_pose_dev = None  # device pose chain (tracked megastep)
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
        # host-swapping analog (Engines/Swapping; default-off like the
        # reference, ITMLibSettings.cpp:33) — gated by TPU.enable_swapping
        self.swap = None
        self.swap_check_interval = int(tpu.swap_check_interval)
        if tpu.enable_swapping:
            from .swapping import HostSwapEngine

            self.swap = HostSwapEngine(
                high_water=tpu.swap_high_water,
                low_water=tpu.swap_low_water,
            )

    # -- configuration -------------------------------------------------------

    def set_gt_poses(self, poses: list[np.ndarray]) -> None:
        self.gt_c2w_poses = [np.asarray(p, dtype=np.float32) for p in poses]

    def turn_off_tracking(self) -> None:
        self.tracking_active = False

    def attach_tracker(self, tracker) -> None:
        self._tracker = tracker
        self.tracking_active = not self.use_gt_pose

    # -- per-frame processing -------------------------------------------------

    # visible-scan prefix buckets: smallest power-of-two bucket covering
    # the cached block cursor (+ margin for staleness); keeps the
    # per-frame visible pass O(allocated), not O(capacity).  The margin
    # per stale frame ADAPTS to the measured allocation rate — a flat
    # worst-case margin (round-3: 4096/frame) blew the bucket to full
    # capacity under chunked fusion (stale_frames=2*chunk), making every
    # visible scan + in-band gather run over the whole pool
    _PREFIX_MARGIN = 4096  # bootstrap margin until the first rate sample

    def _consume_counts(self) -> None:
        """NON-blocking consume of the async [n_blocks, n_visible]
        future: a hard int(fut) before the queued fuse drains is a ~30 ms
        RTT sync that serializes the pipeline (measured 8.2 -> 6.0 fps).
        A stale-low cache only delays new blocks' first integration (or
        clips one frame's visible list) by a frame; margins cover it."""
        fut = getattr(self, "_nb_future", None)
        if fut is None:
            return
        if getattr(self, "sync_counts", False):
            # deterministic mode (bench quality audits): block until the
            # count lands so cap buckets never depend on host timing
            ready = True
        else:
            try:
                ready = fut.is_ready()
            except Exception:
                ready = True
        if not ready:
            return
        try:
            arr = np.asarray(fut)
            nb = int(arr) if arr.ndim == 0 else int(arr[0])
            prev_nb = getattr(self, "_nb_cache", 0)
            prev_at = getattr(self, "_nb_cache_frame", 0)
            df = max(self.current_frame - prev_at, 1)
            if nb > prev_nb and prev_at > 0:
                self._alloc_rate = max((nb - prev_nb) / df, 1.0)
            self._nb_cache = nb
            self._nb_cache_frame = self.current_frame
            if arr.ndim > 0:
                self._nvis_cache = int(arr[1])
        except Exception:
            pass  # deleted/donated buffer: keep the stale cache
        self._nb_future = None

    def _refresh_counts_async(self) -> None:
        """Start ONE outstanding async device->host copy of
        [n_blocks, n_visible] (an unconsumed future ages until ready —
        overwriting it every frame under a deep dispatch queue would keep
        the cache at its bootstrap value forever)."""
        if getattr(self, "_nb_future", None) is not None:
            return
        a = jnp.stack([self.vol.n_blocks, self.vol.n_visible])
        try:
            a.copy_to_host_async()
        except Exception:
            pass
        self._nb_future = a

    def _pool_prefix(self, stale_frames: int = 1) -> int:
        """`stale_frames` scales the staleness margin: chunked fusion
        refreshes the cursor once per chunk, so blocks allocated inside a
        chunk must still land under the prefix bucket."""
        B = self.params.block_capacity
        self._consume_counts()
        rate = getattr(self, "_alloc_rate", None)
        per_frame = (self._PREFIX_MARGIN if rate is None
                     else max(256, int(2.5 * rate)))
        n = (getattr(self, "_nb_cache", 0)
             + per_frame * max(stale_frames, 1))
        b = 1 << 14
        while b < n and b < B:
            b <<= 1
        return min(b, B)

    def _vis_cap(self, stale_frames: int = 1) -> int:
        """Visible-list bucket from the cached per-frame visible count:
        the integrate/window/scatter passes all scale with it (the static
        visible_capacity worst case ran the pallas integrate at 4-8x the
        real on-screen block count).  Sized with headroom + the
        allocation-rate margin; an undersized bucket degrades gracefully
        (nearest-first overflow under visible_sort_overflow, and the
        bucket grows as soon as the count future lands)."""
        cap = self.params.visible_capacity
        self._consume_counts()
        nvis = getattr(self, "_nvis_cache", None)
        if nvis is None:
            return cap
        rate = getattr(self, "_alloc_rate", None) or self._PREFIX_MARGIN
        n = int(1.5 * nvis) + max(256, int(rate)) * max(stale_frames, 1)
        b = 1 << 10
        while b < n and b < cap:
            b <<= 1
        return min(b, cap)

    def _can_fast_track(self) -> bool:
        """The tracked-mode megastep applies when the per-frame host hooks
        are all no-ops: depth-only device-pure tracker, the default
        'ignore' failure policy (whose only host action — pose revert on
        FAILED — the megastep performs in-graph), no swapping / sharding.
        Everything else keeps the reference-shaped per-phase path."""
        return (
            self.tracking_active
            and getattr(self._tracker, "device_pure", False)
            and self.failure_policy == "ignore"
            and self.swap is None
            and self.space_shards == 1
        )

    def _process_frame_fast_tracked(self, rgb, depth) -> np.ndarray:
        """One-dispatch tracked frame: track + pose-revert + fuse as ONE
        device program, then the next frame's tracking-prepare raycast is
        dispatched BEFORE the (pose, inlier, residual) fetch so the fetch
        RTT rides under the march instead of serializing the loop."""
        i = self.current_frame
        d = jnp.asarray(depth)
        if d.ndim == 3:
            d = d[..., 0]
        if self.use_bilateral_filter:
            from ..utils.se3 import bilateral_filter_depth

            d = bilateral_filter_depth(d)
        c = jnp.asarray(rgb)
        rc_prev = self._last_raycast_for_tracking
        tr = self._tracker
        self.vol, pose_dev, inl, mr = _track_fuse_step(
            self.vol, self._last_pose_dev, d, c,
            rc_prev["vertex_map"], rc_prev["normal_map"], self._K_dev,
            tuple(tr.level_iters), self._use_pallas_raycast(),
            self._pool_prefix(), self._vis_cap(),
        )
        self._refresh_counts_async()
        self._last_pose_dev = pose_dev
        need_rgb = bool(getattr(tr, "needs_color", False))
        self._last_raycast_for_tracking = self.run_raycast(
            pose_dev, quality=False, need_color=need_rgb)
        from ..slam.tracker import TrackerQuality

        T, inlier, mean_r = jax.device_get((pose_dev, inl, mr))
        inlier, mean_r = float(inlier), float(mean_r)
        tr.last_inlier, tr.last_residual = inlier, mean_r
        if (not np.all(np.isfinite(T)) or inlier < 0.08 or mean_r > 0.05):
            self._tracking_quality = TrackerQuality.FAILED
        elif inlier > 0.2 and mean_r < 0.015:
            self._tracking_quality = TrackerQuality.GOOD
        else:
            self._tracking_quality = TrackerQuality.POOR
        self._last_pose = np.asarray(T, dtype=np.float32)
        self.cam_poses.append(self._last_pose.copy())
        self.cam_intrinsics.append(self.K.copy())
        self.current_frame = i + 1
        return self._last_pose

    def process_frame(self, rgb, depth) -> np.ndarray:
        """Track (or inject gt pose) + fuse one RGB-D frame; returns the
        estimated c2w pose (ITMBasicEngine::ProcessFrame).  `rgb`/`depth`
        may be host numpy or device arrays (callers should prefer
        device-cached frames, data/device_cache.py — the host link here
        is slow)."""
        i = self.current_frame
        if (i > 0 and self._tracker is not None
                and self._last_raycast_for_tracking is not None
                and getattr(self, "_last_pose_dev", None) is not None
                and self._can_fast_track()):
            return self._process_frame_fast_tracked(rgb, depth)
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
                rgb=rgb,
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
                            cand, depth, reloc_maps, self.K, rgb=rgb
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
            if self.space_shards > 1:
                from ..parallel import spatial

                self.vol = spatial.fuse_frame_sharded(
                    self.vol, d, c, jnp.asarray(pose), self._K_dev,
                    self.space_shards, False,
                )
            else:
                self.vol = integrate.fuse_frame(
                    self.vol, d, c, jnp.asarray(pose), self._K_dev,
                    False, self._use_pallas_raycast(),
                    frame_idx=(jnp.asarray(i, jnp.int32)
                               if self.swap is not None else None),
                    pool_prefix=self._pool_prefix(),
                    vis_cap=self._vis_cap(),
                )
                # async count refresh consumed by a later frame's
                # _pool_prefix/_vis_cap (jnp.stack detaches from the
                # donated volume pytree)
                self._refresh_counts_async()
            if self.swap is not None and i % self.swap_check_interval == 0:
                # cold path: spill cold blocks / merge re-seen ones back
                # (sync fetches inside — only runs when swapping is on)
                self.vol = self.swap.maybe_reload(self.vol)
                self.vol = self.swap.maybe_spill(self.vol)
        self._last_pose = np.asarray(pose, dtype=np.float32)
        self._last_pose_dev = jnp.asarray(self._last_pose)
        self.cam_poses.append(self._last_pose.copy())
        self.cam_intrinsics.append(self.K.copy())
        self.current_frame += 1

        if self.tracking_active and self._tracker is not None:
            # raycast-prepare for the next frame's ICP
            # (TrackingController::Prepare, ITMTrackingController.h:66).
            # Depth-only trackers consume vertex/normal maps; skip the
            # color payload unless the attached tracker wants rgb
            need_rgb = bool(getattr(self._tracker, "needs_color", False))
            self._last_raycast_for_tracking = self.run_raycast(
                self._last_pose, quality=False, need_color=need_rgb)
        return self._last_pose

    def can_chunk_fusion(self) -> bool:
        """True when fusion may batch multiple frames into one device
        program (integrate.fuse_frames_scan): every pose must be known up
        front and no per-frame host-side engine hook may fire.  Tracking
        (pose of frame i+1 needs frame i's raycast), swapping (sync
        host<->device traffic between frames) and spatial sharding
        (shard_map wrapper, parallel/spatial.py) all force per-frame
        dispatch; the bilateral filter is fine (applied in-scan)."""
        return (
            not self.tracking_active
            and bool(self.gt_c2w_poses)
            and self.swap is None
            and self.space_shards == 1
        )

    def process_frames_gt(self, frames: list[tuple[jax.Array, jax.Array]]
                          ) -> list[np.ndarray]:
        """Fuse a chunk of consecutive frames in ONE dispatch (gt-pose
        mode; see can_chunk_fusion).  `frames` = [(rgb f32 [H,W,3], depth
        f32 [H,W])] device arrays, ordered.  Returns the per-frame poses
        (host numpy — no device fetch: they are the gt inputs) and
        records them exactly like per-frame process_frame."""
        i0 = self.current_frame
        n = len(frames)
        poses = [
            np.asarray(
                self.gt_c2w_poses[min(i0 + k, len(self.gt_c2w_poses) - 1)],
                dtype=np.float32)
            for k in range(n)
        ]
        depths = jnp.stack(
            [f[1][..., 0] if f[1].ndim == 3 else f[1] for f in frames])
        rgbs = jnp.stack([f[0] for f in frames])
        if self.use_bilateral_filter:
            from ..utils.se3 import bilateral_filter_depth

            depths = jax.vmap(bilateral_filter_depth)(depths)
        self.vol = integrate.fuse_frames_scan(
            self.vol, depths, rgbs, jnp.asarray(np.stack(poses)),
            self._K_dev, False, self._use_pallas_raycast(),
            # cursor refreshes once per chunk: the margin must cover up to
            # ~2 chunks of allocation lag, not one frame
            pool_prefix=self._pool_prefix(stale_frames=2 * n),
            vis_cap=self._vis_cap(stale_frames=2 * n),
        )
        # async count refresh, once per chunk (same single-outstanding-
        # future discipline as process_frame)
        self._refresh_counts_async()
        for p_ in poses:
            self._last_pose = p_
            self.cam_poses.append(p_.copy())
            self.cam_intrinsics.append(self.K.copy())
        self.current_frame += n
        return poses

    # -- raycast service -------------------------------------------------------

    def run_raycast(self, c2w: np.ndarray, K: np.ndarray | None = None,
                    width: int | None = None, height: int | None = None,
                    quality: bool = True, need_color: bool = True) -> dict:
        """Raycast from an arbitrary pose (the fork's runRaycast service,
        ITMBasicEngine.tpp:501; consumed by SLAMPipeline::runRaycastByCam,
        slam_pipeline.cpp:362-415).

        `quality` selects the refine budget of the Mosaic march: the
        per-frame window raycasts refine k_blocks=1 candidate per pixel
        (costs ~0.4% of hits on the oracle scene, halves the kernel);
        eval renders keep k=2."""
        K = self._K_dev if K is None else jnp.asarray(K, dtype=jnp.float32)
        width = width or self.width
        height = height or self.height
        p = self.vol.params
        # device poses pass straight through (the tracked megastep chains
        # pose -> raycast on device); np.asarray on a device array would
        # fetch 64 bytes at a full RTT and serialize the loop
        c2w_dev = (c2w if isinstance(c2w, jax.Array)
                   else jnp.asarray(np.asarray(c2w, np.float32)))
        if self.swap is not None:
            # per-view swap-in (ITMSwappingEngine IntegrateGlobalIntoLocal
            # analog): spilled blocks visible from this pose come back
            # before the march, so arbitrary-view renders see no holes
            self.vol = self.swap.reload_visible(
                self.vol, np.asarray(c2w, np.float32), np.asarray(K),
                width, height)
        if self.space_shards > 1:
            # per-shard XLA tile raycast + nearest-hit merge (the Mosaic
            # march kernel does not vmap over the shard axis; the sharded
            # path is about capacity, not single-camera latency)
            from ..parallel import spatial

            return spatial.raycast_sharded(
                self.vol, c2w_dev, K,
                width, height, p.raycast_lb, p.raycast_samples,
                max(p.raycast_bisect, 3), p.raycast_chunk,
            )
        if self._use_pallas_raycast():
            from . import raycast_pallas as rc_pallas

            return rc_pallas.raycast(
                self.vol, c2w_dev, K,
                width, height, p.raycast_lb, p.raycast_samples,
                max(p.raycast_bisect, 3), 2 if quality else 1,
                p.raycast_tiles_per_step,
                pool_prefix=self._pool_prefix(),
                need_color=need_color,
            )
        return rc_tiles.raycast(
            self.vol, c2w_dev, K,
            width, height, p.raycast_lb, p.raycast_samples,
            max(p.raycast_bisect, 3), p.raycast_chunk,
            pool_prefix=self._pool_prefix(),
        )

    def run_raycast_batch(self, c2ws: np.ndarray, K: np.ndarray | None = None,
                          quality: bool = False,
                          need_normals: bool = False) -> dict:
        """Raycast M poses in ONE device program (stacked [M, ...] map
        dict).  The opt window's local + keyframe raycasts
        (slam_pipeline.cpp:417-448/528-561) go through here; swapping and
        spatial sharding need per-pose host work and fall back to a
        stacked per-pose loop.  Batch consumers (training targets, eval
        renders) use color/depth/conf only — normal maps default off on
        the Mosaic path (the spawn path computes its own, the tracker uses
        the per-frame single raycast)."""
        c2ws = np.asarray(c2ws, np.float32)
        K_dev = self._K_dev if K is None else jnp.asarray(
            np.asarray(K), jnp.float32)
        p = self.vol.params
        if self.swap is not None or self.space_shards > 1:
            outs = [self.run_raycast(c2ws[i], K, quality=quality)
                    for i in range(len(c2ws))]
            return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}
        if self._use_pallas_raycast():
            from . import raycast_pallas as rc_pallas

            return rc_pallas.raycast_batch(
                self.vol, jnp.asarray(c2ws), K_dev,
                self.width, self.height, p.raycast_lb, p.raycast_samples,
                max(p.raycast_bisect, 3), 2 if quality else 1,
                p.raycast_tiles_per_step,
                pool_prefix=self._pool_prefix(),
                need_normals=need_normals,
            )
        return rc_tiles.raycast_batch(
            self.vol, jnp.asarray(c2ws), K_dev,
            self.width, self.height, p.raycast_lb, p.raycast_samples,
            max(p.raycast_bisect, 3), p.raycast_chunk,
            pool_prefix=self._pool_prefix(),
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
            return next(iter(self.vol.state.devices())).platform == "tpu"
        except Exception:
            return False

    # -- persistence -----------------------------------------------------------

    def save_scene(self, out_dir: str) -> None:
        """Scene checkpoint (ITMBasicEngine::SaveToFile equivalent,
        ITMBasicEngine.tpp:120-135) as one npz."""
        os.makedirs(out_dir, exist_ok=True)
        st_np = np.asarray(self.vol.state)
        sdf_i = (st_np & 0xFFFF).astype(np.int32)
        sdf_i = np.where(sdf_i >= 32768, sdf_i - 65536, sdf_i).astype(np.int16)
        np.savez_compressed(
            os.path.join(out_dir, "scene.npz"),
            # stored flat [H] for on-disk stability across the bucket-major
            # in-memory layout
            table_keys=np.asarray(self.vol.table_keys).reshape(-1),
            table_ptrs=np.asarray(self.vol.table_ptrs).reshape(-1),
            block_coords=np.asarray(self.vol.block_coords),
            # on-disk format keeps the reference's separate voxel fields
            # (stable across the packed in-memory layout)
            sdf=sdf_i,
            w_depth=((st_np >> 16) & 0xFF).astype(np.uint8),
            color=np.asarray(self.vol.color),
            w_color=(st_np >> 24).astype(np.uint8),
            n_blocks=np.asarray(self.vol.n_blocks),
            mip=np.asarray(self.vol.summary[:, :64]),
            block_min_sdf=np.asarray(self.vol.summary[:, 64]),
            block_max_w=np.asarray(
                self.vol.summary[:, 65]).astype(np.int32),
            last_seen=np.asarray(self.vol.last_seen),
            cam_poses=np.stack(self.cam_poses) if self.cam_poses else np.zeros((0, 4, 4)),
            cam_intrinsics=np.stack(self.cam_intrinsics)
            if self.cam_intrinsics
            else np.zeros((0, 3, 3)),
        )

    def load_scene(self, in_dir: str) -> None:
        """ITMBasicEngine::LoadFromFile equivalent (ITMBasicEngine.tpp:138-171):
        reset then load."""
        z = np.load(os.path.join(in_dir, "scene.npz"))
        # back-compat: pre-int16 checkpoints stored f32 sdf / i16 weights /
        # u8[...,3] colors
        sdf_np = z["sdf"]
        if sdf_np.dtype != np.int16:
            sdf_np = np.round(np.clip(sdf_np, -1, 1) * 32767.0).astype(np.int16)
        col_np = z["color"]
        if col_np.ndim == 3:
            c = col_np.astype(np.uint32)
            col_np = c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)
        # flat on-disk slot order is layout-stable: reshape to the current
        # in-memory row width (volume.table_width)
        from .volume import table_width

        tw_ = table_width(self.params)
        summary = self.vol.summary
        if "mip" in z:
            B = summary.shape[0]
            s_np = np.array(summary)  # writable copy
            s_np[:, :64] = z["mip"]
            if "block_min_sdf" in z:
                s_np[:, 64] = z["block_min_sdf"]
            if "block_max_w" in z:
                s_np[:, 65] = z["block_max_w"].astype(np.float32)
            summary = jnp.asarray(s_np)
        su = sdf_np.astype(np.int32)
        su = np.where(su < 0, su + 65536, su).astype(np.uint32)
        state_np = (su
                    | (z["w_depth"].astype(np.uint32) << 16)
                    | (z["w_color"].astype(np.uint32) << 24))
        self.vol = self.vol.replace(
            table_keys=jnp.asarray(z["table_keys"].reshape(-1, tw_)),
            table_ptrs=jnp.asarray(z["table_ptrs"].reshape(-1, tw_)),
            block_coords=jnp.asarray(z["block_coords"]),
            state=jnp.asarray(state_np),
            color=jnp.asarray(col_np),
            n_blocks=jnp.asarray(z["n_blocks"]),
            summary=summary,
            last_seen=jnp.asarray(z["last_seen"])
            if "last_seen" in z else self.vol.last_seen,
        )
        self.cam_poses = [p.astype(np.float32) for p in z["cam_poses"]]
        self.cam_intrinsics = [k.astype(np.float32) for k in z["cam_intrinsics"]]
        self.current_frame = len(self.cam_poses)

    def save_mesh(self, path: str) -> None:
        """Iso-surface -> colored PLY
        (ITMBasicEngine::SaveSceneToMesh, ITMBasicEngine.tpp:105-117);
        algorithm per TPU.mesh_algo ("mt" default, "mc" reference-topology).
        Sharded volumes mesh per shard and concatenate (blocks are
        disjoint by ownership; cells whose neighbor block lives in
        another shard are skipped by the require_weight guard — a
        sub-voxel seam, not duplicated surface)."""
        from ..utils import io as uio
        from .meshing import extract_mesh

        if self.space_shards > 1:
            parts = []
            for s in range(self.space_shards):
                shard = jax.tree.map(
                    lambda x: x[s] if hasattr(x, "shape") else x, self.vol)
                parts.append(extract_mesh(shard, algo=self.mesh_algo))
            verts = np.concatenate([v for v, _ in parts], 0)
            cols = np.concatenate([c for _, c in parts], 0)
        else:
            verts, cols = extract_mesh(self.vol, algo=self.mesh_algo)
        uio.save_mesh_ply(path, verts, cols)

    @property
    def voxel_size(self) -> float:
        return self.params.voxel_size
