"""SLAM orchestration — the online loop coupling TSDF fusion with targeted
Gaussian refinement.

Re-expression of the reference SLAMPipeline (slam/slam_pipeline.cpp):
per frame: TSDF fuse + pose estimate -> local-window / keyframe
bookkeeping (updateFrameList :319-360) -> every `local_opt_interval`
frames: raycast the window (localFrameRaycast :417-448) and sampled
keyframes (keyFrameRaycast :528-561), spawn Gaussians where color error is
high (initNewGaussians :450-526), run `local_opt_iters` Adam steps
(localOptimize :195-291), prune (removeRedundantGs :564-586).  Emits the
reference's `time_log.txt` format (:144-172) so run/read_results.py-style
tooling keeps working, plus TensorBoard scalars (src/pipeline.cpp:130-152).

TPU shape discipline: the optimization camera set is padded to the static
size window_length + keyframe_select_max; iteration camera indices are
drawn host-side over the valid prefix, so the 20-step Adam scan compiles
exactly once.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.device_cache import DeviceFrameCache
from ..data.reader import DatasetReader, RandomSelector
from ..gs import losses, model as gmodel
from ..gs.model import GaussianModel
from ..tsdf.engine import TsdfEngine
from ..utils import io as uio, vis
from ..utils.camera import Camera
from ..utils.se3 import compute_normal_map


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(1,))
def _slice_map_rows(maps: dict, n: int) -> list[dict]:
    """Split stacked [M, ...] raycast maps into M per-camera dicts in ONE
    device program (n x keys eager slices would each pay a dispatch)."""
    return [{k: v[i] for k, v in maps.items()} for i in range(n)]


@jax.jit
def _assemble_opt_batch(c2w, K, cam_id, gt_rgb, ref_depth, base_color):
    """Stack the per-camera window tensors in ONE device program.

    c2w/K/cam_id arrive pre-stacked (one small host->device upload each);
    gt_rgb/ref_depth/base_color are tuples of M device-resident maps.
    Assembling with eager jnp.stack/slice calls costs ~40 tiny dispatches
    per window; over the axon tunnel every dispatch carries fixed
    submission latency that adds up to milliseconds per frame."""
    return {
        "c2w": c2w,
        "K": K,
        "cam_id": cam_id,
        "gt_rgb": jnp.stack(gt_rgb),
        "ref_depth": jnp.stack([d[..., 0] for d in ref_depth]),
        "base_color": jnp.stack(base_color),
    }


# spawn-mask programs live in megastep.py (shared by the eager per-phase
# path below and the one-dispatch window megastep)
from .megastep import _spawn_mask, _spawn_mask_bootstrap  # noqa: E402


class SLAMPipeline:
    def __init__(self, cfg: Config, tsdf_engine: TsdfEngine, workspace_dir: str,
                 is_train: bool = True):
        self.cfg = cfg
        self.pipe = cfg.pipe
        self.engine = tsdf_engine
        self.workspace_dir = workspace_dir
        self.eval_path = workspace_dir + cfg.pipe.eval_path
        self.model_path = workspace_dir + cfg.pipe.model_path
        self.log_path = workspace_dir + cfg.pipe.log_path
        self.curr_iter = 0
        self.curr_frame_id = 0
        self.curr_cam: Camera | None = None
        self.localframe_cam_window: list[Camera] = []
        self.localframe_raycast_window: list[dict] = []
        self.keyframe_cam_list: list[Camera] = []
        self.opt_cam_list: list[Camera] = []
        self.opt_raycast_list: list[dict] = []
        self.keyframe_loss_dict: dict[str, list[float]] = {}
        self._rng = np.random.default_rng(cfg.dev_id + 1)
        self.frame_cache = DeviceFrameCache()
        self._tb = None
        if is_train:
            os.makedirs(self.log_path, exist_ok=True)
            os.makedirs(
                os.path.join(workspace_dir, cfg.pipe.tsdf.saved_images), exist_ok=True
            )
            os.makedirs(os.path.join(workspace_dir, "before_opt"), exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(self.log_path)
            except Exception:
                self._tb = None
        self.scene_scale = 1.0
        self._pose_idx: dict[int, int] = {}  # cam.id -> cam_poses index
        self._spawn_overflow = None  # device i32: spawn samples clipped by max_new
        self._bin_overflow = None    # device i32: optimizer binning-cap drops
        # LOG_PIPELINE_TIME equivalent (slam_pipeline.cpp:7,54-66): the
        # reference brackets each phase with cudaDeviceSynchronize; the
        # only true sync over the axon tunnel is a value fetch
        # (block_until_ready returns early once the dispatch queue is
        # deep), so this mode ends every phase in a tiny scalar fetch.
        # Default off: per-frame hard syncs serialize the async pipeline
        # (~3x wall-clock, PERF.md) — honest phase columns cost throughput,
        # exactly like the reference's profiling-vs-artifacts exclusivity.
        self.log_pipeline_time = bool(
            (cfg.raw.get("PIPE", {}) or {}).get("log_pipeline_time", False)
        )
        self._last_loss_hist = None
        self._megastep_ran = False
        self._dp_render = None  # cached (key, mesh, fn) for DP eval renders
        # timing accumulators (LOG_PIPELINE_TIME equivalents)
        self.t_fusion = self.t_local_raycast = self.t_key_raycast = 0.0
        self.t_init_gs = self.t_opt = self.t_remove = 0.0

    # ------------------------------------------------------------------ loop

    def _phase_sync(self, x) -> None:
        """End a timed phase in a real device-value fetch (honest-timing
        mode only).  A scalar slice of a dependent array forces the queued
        device work to drain before the clock is read — the equivalent of
        the reference's cudaDeviceSynchronize brackets
        (slam_pipeline.cpp:54-66)."""
        if x is None:
            return
        a = jnp.asarray(x)
        float(a.ravel()[0])

    def _calibrate_sync_rtt(self) -> float:
        """Median host<->device round-trip of fetching an already-computed
        scalar (ms).  On the axon tunnel this is ~30 ms — three orders of
        magnitude above a local cudaDeviceSynchronize — so honest-timing
        phase columns subtract it; otherwise every phase would carry a
        constant +RTT that is transport cost, not device work."""
        x = jnp.zeros(())
        float(x)  # materialize before timing
        samples = []
        for _ in range(5):
            t = time.monotonic()
            float(x + 0)
            samples.append((time.monotonic() - t) * 1000.0)
        samples.sort()
        return samples[len(samples) // 2]

    def _fusion_groups(self, total: int, p, can_chunk: bool, chunk_n: int):
        """Partition frame indices into fusion-dispatch groups.  A group
        never crosses an optimization-boundary frame (i % interval == 0,
        i > 0): the boundary frame's spawn/optimize phases must observe
        exactly the frames fused so far, so it terminates its group."""
        i = 0
        while i < total:
            if not can_chunk:
                yield [i]
                i += 1
                continue
            group = []
            for j in range(i, min(i + chunk_n, total)):
                group.append(j)
                if (self.cfg.work_mode != "recon" and j > 0
                        and j % p.local_opt_interval == 0):
                    break
            yield group
            i = group[-1] + 1

    def slam_train_cams(self, model: GaussianModel, cams: list[Camera]) -> None:
        """SLAMTrainCams (slam_pipeline.cpp:52-173)."""
        p = self.pipe
        total = len(cams)
        sync = self.log_pipeline_time
        rtt = self._calibrate_sync_rtt() if sync else 0.0
        if sync:
            print(f"[SYNC RTT] {rtt:.1f} ms/fetch subtracted per phase")
        # seed the async live-count cache (nonzero when a loaded model
        # resumes; the windowed loop keeps it fresh from here on)
        model.refresh_count_async()
        # chunked fusion: in gt-pose / recon mode the per-frame loop's
        # dispatch + control round trips dominate over a high-latency
        # link; groups of fuse_chunk frames run as ONE device program
        # (integrate.fuse_frames_scan).  Honest-timing mode stays
        # per-frame — its contract is per-phase sync brackets.
        chunk_n = max(int(getattr(self.cfg.tpu, "fuse_chunk", 1)), 1)
        can_chunk = (
            not sync and chunk_n > 1 and self.engine.can_chunk_fusion()
        )
        sync_stride = int(getattr(self.cfg.tpu, "host_sync_stride", 1))
        n_groups = 0
        t_start = time.monotonic()
        for group in self._fusion_groups(total, p, can_chunk, chunk_n):
            t0 = time.monotonic()
            i = group[-1]
            if len(group) == 1 and not can_chunk:
                cam = cams[i]
                rgb_dev, depth_dev = self.frame_cache.get(cam)
                poses = [self.engine.process_frame(rgb_dev, depth_dev)]
            else:
                frames = [self.frame_cache.get(cams[k]) for k in group]
                poses = self.engine.process_frames_gt(frames)
            # issue the next frames' host->device uploads now so the (slow)
            # link overlaps this group's fusion compute — depth covers the
            # NEXT group's full size even after a short boundary group
            for ahead in range(1, (chunk_n if can_chunk else 2) + 1):
                if i + ahead < total:
                    self.frame_cache.get(cams[i + ahead])
            n_groups += 1
            if sync:
                int(jnp.sum(self.engine.vol.n_blocks))  # [S] when sharded
            elif sync_stride > 0 and n_groups % sync_stride == 0:
                jax.block_until_ready(self.engine.vol.n_blocks)
            base = len(self.engine.cam_poses) - len(group)
            for k, idx in enumerate(group):
                cam = cams[idx]
                self.curr_frame_id = idx
                cam.c2w_slam = np.asarray(poses[k])
                # cam.id is a global read index over train+val; cam_poses
                # only accumulates PROCESSED (train) frames — record the
                # mapping so run_raycast_by_cam picks the right recorded
                # pose when test_split_interval > 0 (slam_pipeline.cpp
                # keys by frame id)
                self._pose_idx[cam.id] = base + k
                self.curr_cam = cam
                self.update_frame_list()
            self.t_fusion += max((time.monotonic() - t0) * 1000.0 - rtt, 0.0)

            if self.cfg.work_mode == "recon":
                continue
            if i % p.local_opt_interval == 0 and i > 0:
                t1 = time.monotonic()
                if not sync and self._can_megastep(model):
                    # ONE device program for the whole window (raycast ->
                    # spawn -> optimize -> prune; slam/megastep.py); the
                    # per-phase wall columns don't decompose — the total
                    # lands in localOptimize
                    self._run_window_megastep(model)
                    self.t_opt += (time.monotonic() - t1) * 1000
                    continue
                if sync:
                    # honest-timing mode keeps the two-phase per-camera
                    # path so the localFrame/keyFrame columns stay real
                    self.local_frame_raycast()
                    self._phase_sync(
                        self.localframe_raycast_window[-1]["depth_map"])
                    t2 = time.monotonic()
                    self.key_frame_raycast()
                    self._phase_sync(self.opt_raycast_list[-1]["depth_map"])
                else:
                    # one scanned dispatch for the whole opt set; the
                    # combined cost lands in the localFrameRaycast column
                    self._raycast_opt_set()
                    t2 = time.monotonic()
                self._write_window_raycast_artifacts()
                t3 = time.monotonic()
                self.init_new_gaussians(model, self.localframe_raycast_window[-1])
                if sync:
                    int(model.pool.n_alive)
                t4 = time.monotonic()
                self.local_optimize(model)
                if sync:
                    self._phase_sync(self._last_loss_hist)
                t5 = time.monotonic()
                self.remove_redundant(model)
                if self.pipe.kf_sample_method == "ours":
                    self.check_key_frame_error(model)
                if sync:
                    int(model.pool.n_alive)
                else:
                    jax.block_until_ready(model.pool.n_alive)
                t6 = time.monotonic()
                self.t_local_raycast += max((t2 - t1) * 1000 - rtt, 0.0)
                self.t_key_raycast += max((t3 - t2) * 1000 - rtt, 0.0)
                self.t_init_gs += max((t4 - t3) * 1000 - rtt, 0.0)
                self.t_opt += max((t5 - t4) * 1000 - rtt, 0.0)
                self.t_remove += max((t6 - t5) * 1000 - rtt, 0.0)

        total_ms = (time.monotonic() - t_start) * 1000.0
        self.write_time_log(model, total, total_ms)

    def write_time_log(self, model: GaussianModel, total_frames: int,
                       total_ms: float) -> None:
        """[PIPELINE AVG TIME] line (slam_pipeline.cpp:166-172)."""
        n = max(total_frames, 1)
        fps = total_frames / (total_ms / 1000.0) if total_ms > 0 else 0.0
        line = (
            "[PIPELINE AVG TIME] GS num: %d, per frame fusion time: %f, "
            "localFrameRaycast time: %f, keyFrameRaycast time: %f, "
            "initNewGaussians time: %f, localOptimize time: %f, FPS: %f\n"
            % (
                model.num_gaussians, self.t_fusion / n, self.t_local_raycast / n,
                self.t_key_raycast / n, self.t_init_gs / n, self.t_opt / n, fps,
            )
        )
        mem_mb = 0
        try:
            stats = jax.devices()[0].memory_stats() or {}
            mem_mb = int(stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) // 2**20)
        except Exception:
            pass
        if mem_mb == 0:
            # memory_stats() returns nothing over the axon tunnel — fall
            # back to summing live device buffers (committed arrays only;
            # an under-estimate of peak, but a real number instead of the
            # dead 0 the NVML column would otherwise report)
            try:
                mem_mb = int(sum(
                    x.size * x.dtype.itemsize for x in jax.live_arrays()
                ) // 2**20)
            except Exception:
                pass
        overflow = (
            int(self._spawn_overflow) if self._spawn_overflow is not None else 0
        )
        if self._tb is not None:
            self._tb.add_scalar("opt_state/spawn_overflow", overflow, self.curr_iter)
        print(line, end="")
        print(f"GPU memory usage: {mem_mb} MB")
        if overflow > 0:
            print(f"[SPAWN OVERFLOW] {overflow} masked samples beyond "
                  f"max_new_gaussians were dropped")
        if self._bin_overflow is not None:
            tile_o, span_o, act_o = (int(v) for v in self._bin_overflow)
        else:
            tile_o = span_o = act_o = 0
        bin_overflow = tile_o + span_o + act_o
        if bin_overflow > 0:
            print(f"[BIN OVERFLOW] {bin_overflow} optimizer binning entries "
                  f"dropped (tile cap: {tile_o}, span cap: {span_o}, "
                  f"active cap: {act_o})")
        os.makedirs(self.workspace_dir, exist_ok=True)
        with open(os.path.join(self.workspace_dir, "time_log.txt"), "w") as f:
            f.write(line)
            f.write(f"GPU memory usage: {mem_mb} MB\n")
            f.write(f"Spawn overflow: {overflow}\n")
            f.write(f"Bin overflow: {bin_overflow}\n")

    # --------------------------------------------------------------- windows

    def update_frame_list(self) -> None:
        """(updateFrameList, slam_pipeline.cpp:319-360)."""
        p = self.pipe
        if self.curr_frame_id == 0:
            return
        if self.curr_frame_id % p.localframe_cam_window_interval == 0:
            self.localframe_cam_window.append(self.curr_cam)
            if len(self.localframe_cam_window) == p.localframe_cam_window_length + 1:
                self.localframe_cam_window.pop(0)
        is_keyframe = not self.keyframe_cam_list
        if not is_keyframe:
            last = self.keyframe_cam_list[-1]
            prev_R, prev_t = last.c2w_slam[:3, :3], last.c2w_slam[:3, 3]
            cur_R, cur_t = self.curr_cam.c2w_slam[:3, :3], self.curr_cam.c2w_slam[:3, 3]
            cos = np.clip((np.trace(prev_R.T @ cur_R) - 1) / 2, -1, 1)
            theta = np.degrees(np.arccos(cos))
            trans = float(np.linalg.norm(prev_t - cur_t))
            if theta > p.keyframe_theta_thres or trans > p.keyframe_trans_thres:
                is_keyframe = True
        if is_keyframe:
            self.keyframe_cam_list.append(self.curr_cam)
            self.keyframe_loss_dict[self.curr_cam.get_frame_id()] = [
                0.1, float(self.curr_frame_id), 0.0, 0.0, 0.0,
            ]

    # --------------------------------------------------------------- raycast

    def run_raycast_by_cam(self, cam: Camera, use_cam_depth: bool = False,
                           quality: bool = False) -> dict:
        """(runRaycastByCam, slam_pipeline.cpp:362-415): raycast with the
        engine-recorded pose when available, else the camera's gt pose."""
        k = self._pose_idx.get(cam.id, -1)
        if self.engine.cam_poses and 0 <= k < len(self.engine.cam_poses):
            pose = self.engine.cam_poses[k]
        else:
            pose = cam.c2w
        maps = self.engine.run_raycast(pose, cam.K, cam.width, cam.height,
                                       quality=quality)
        res = dict(maps)
        if use_cam_depth:
            res["depth_map"] = jnp.asarray(cam.depth)
        return res

    def local_frame_raycast(self) -> None:
        """(localFrameRaycast :417-448)."""
        self.localframe_raycast_window = [
            self.run_raycast_by_cam(c, False) for c in self.localframe_cam_window
        ]

    def _raycast_opt_set(self) -> None:
        """localFrameRaycast + keyFrameRaycast as ONE scanned device
        dispatch (engine.run_raycast_batch) plus one slice program —
        replaces ~(window + keyframe_select_max) per-camera dispatches.
        Keyframe sampling order matches key_frame_raycast exactly (same
        rng draw per window)."""
        self.opt_cam_list = list(self.localframe_cam_window)
        n_sel = (min(self.pipe.keyframe_select_max, len(self.keyframe_cam_list))
                 if self.pipe.kf_sample_method == "random" else 0)
        if n_sel > 0:
            sel = self._rng.permutation(len(self.keyframe_cam_list))[:n_sel]
            for k in sel:
                self.opt_cam_list.append(self.keyframe_cam_list[int(k)])
        n_local = len(self.localframe_cam_window)
        if not self.opt_cam_list:
            self.localframe_raycast_window = []
            self.opt_raycast_list = []
            return
        # the batch raycasts every pose with the ENGINE's K/width/height;
        # a camera with its own intrinsics/dimensions (e.g. downscaled
        # split cams) must keep the per-camera path or it would silently
        # train against a misprojected target
        uniform = all(
            cam.width == self.engine.width and cam.height == self.engine.height
            and np.allclose(np.asarray(cam.K), self.engine.K)
            for cam in self.opt_cam_list
        )
        if not uniform:
            self.localframe_raycast_window = [
                self.run_raycast_by_cam(c, False)
                for c in self.localframe_cam_window]
            self.opt_raycast_list = list(self.localframe_raycast_window) + [
                self.run_raycast_by_cam(c, False)
                for c in self.opt_cam_list[n_local:]]
            return
        poses = []
        for cam in self.opt_cam_list:
            k = self._pose_idx.get(cam.id, -1)
            if self.engine.cam_poses and 0 <= k < len(self.engine.cam_poses):
                poses.append(self.engine.cam_poses[k])
            else:
                poses.append(np.asarray(cam.c2w, np.float32))
        maps = self.engine.run_raycast_batch(np.stack(poses))
        rows = _slice_map_rows(maps, len(self.opt_cam_list))
        self.localframe_raycast_window = rows[:n_local]
        self.opt_raycast_list = rows

    def key_frame_raycast(self) -> None:
        """(keyFrameRaycast :528-561): opt set = local window + up to
        keyframe_select_max randomly sampled keyframes.  Keyframes join
        ONLY in 'random' mode — the reference's 'ours' mode optimizes the
        local window alone and keeps the loss bookkeeping
        (slam_pipeline.cpp:538-552)."""
        self.opt_cam_list = list(self.localframe_cam_window)
        self.opt_raycast_list = list(self.localframe_raycast_window)
        if self.pipe.kf_sample_method != "random":
            return
        n_sel = min(self.pipe.keyframe_select_max, len(self.keyframe_cam_list))
        if n_sel > 0:
            sel = self._rng.permutation(len(self.keyframe_cam_list))[:n_sel]
            for k in sel:
                cam = self.keyframe_cam_list[int(k)]
                self.opt_cam_list.append(cam)
                self.opt_raycast_list.append(self.run_raycast_by_cam(cam, False))

    def _debug_artifacts_on(self) -> bool:
        """The reference writes per-window debug images only when NOT
        profiling (#ifndef LOG_PIPELINE_TIME, slam_pipeline.cpp:429,499);
        PIPE.log_slam_state is our runtime switch for the same exclusive
        pair (the release reference compiles the writes out)."""
        return self.pipe.log_slam_state and not self.log_pipeline_time

    def _write_window_raycast_artifacts(self) -> None:
        """Per-window raycast comparison images into PIPE.TSDF.saved_images
        (slam_pipeline.cpp:429-446): [raycast | gt | jet err] color + depth
        comps, named frame{curr}_{local}."""
        if not self._debug_artifacts_on():
            return
        p = self.pipe
        out_dir = os.path.join(self.workspace_dir, p.tsdf.saved_images)
        cur = self.curr_cam.get_frame_id()
        for cam, rays in zip(self.localframe_cam_window,
                             self.localframe_raycast_window):
            rc = np.clip(np.asarray(rays["color_map"]), 0, 1)
            fid = cam.get_frame_id()
            vis.imwrite_rgb(
                os.path.join(out_dir, f"frame{cur}_{fid}.color.jpg"),
                vis.color_comp_img(rc, cam.image, 0, p.color_error_max))
            vis.imwrite_rgb(
                os.path.join(out_dir, f"frame{cur}_{fid}.depth.jpg"),
                vis.depth_comp_img(np.asarray(rays["depth_map"]), cam.depth,
                                   0, p.depth_vis_max, 0, p.depth_error_max))

    # -------------------------------------------------------------- megastep

    def _can_megastep(self, model: GaussianModel) -> bool:
        """The one-dispatch window (slam/megastep.py) applies when every
        per-window host hook is a no-op: no debug artifacts / TB state
        logging (they need the raycast maps on host), no exposure
        optimization (needs real cam ids), engine-uniform intrinsics, no
        swapping / spatial sharding (per-pose host work inside raycast),
        and the model is past its bootstrap window (the gs==0 branch keeps
        the reference-shaped eager path).  The current frame must own the
        window's last raycast slot (it does whenever local_opt_interval is
        a multiple of the window interval, as in every release config)."""
        eng = self.engine
        if getattr(self, "disable_megastep", False):
            return False
        if model.statics.use_exposure or self.pipe.depth_weight > 0:
            return False
        if self._debug_artifacts_on() or (
                self._tb is not None and self.pipe.log_slam_state):
            return False
        if eng.swap is not None or eng.space_shards > 1:
            return False
        if model.num_gaussians_cached == 0:
            return False
        if (not self.localframe_cam_window
                or self.localframe_cam_window[-1] is not self.curr_cam):
            return False
        cams = self.localframe_cam_window + self.keyframe_cam_list
        return all(
            cam.width == eng.width and cam.height == eng.height
            and np.allclose(np.asarray(cam.K), eng.K) for cam in cams
        )

    def _run_window_megastep(self, model: GaussianModel) -> None:
        """Host half of the window megastep: draw the keyframe sample and
        the iteration camera sequence (same RNG stream and order as the
        eager path), pick the static buckets, dispatch ONE program."""
        from . import megastep as ms

        p = self.pipe
        eng = self.engine
        # keyframe sampling — identical draw to _raycast_opt_set
        self.opt_cam_list = list(self.localframe_cam_window)
        n_sel = (min(p.keyframe_select_max, len(self.keyframe_cam_list))
                 if p.kf_sample_method == "random" else 0)
        if n_sel > 0:
            sel = self._rng.permutation(len(self.keyframe_cam_list))[:n_sel]
            for k in sel:
                self.opt_cam_list.append(self.keyframe_cam_list[int(k)])
        n_local = len(self.localframe_cam_window)
        n_valid = len(self.opt_cam_list)
        M = p.localframe_cam_window_length + p.keyframe_select_max
        idx_pad = [min(i, n_valid - 1) for i in range(M)]
        poses = []
        for i in idx_pad:
            cam = self.opt_cam_list[i]
            k = self._pose_idx.get(cam.id, -1)
            if eng.cam_poses and 0 <= k < len(eng.cam_poses):
                poses.append(np.asarray(eng.cam_poses[k], np.float32))
            else:
                poses.append(np.asarray(cam.c2w, np.float32))
        gt_rgb = tuple(
            self.frame_cache.get(self.opt_cam_list[i])[0] for i in idx_pad)
        # spawn RNG (model stream) + iteration sequence (pipeline stream),
        # drawn in the eager path's order
        spawn_key = model.next_rng()
        idx_seq: list[int] = []
        while len(idx_seq) < p.local_opt_iters:
            idx_seq.extend(int(v) for v in self._rng.permutation(n_valid))
        iter_idx = jnp.asarray(np.asarray(idx_seq[: p.local_opt_iters]),
                               jnp.int32)
        m = self.cfg.model
        tpu = self.cfg.tpu
        sc = ms.WindowScalars(
            depth_vis_min=p.depth_vis_min, depth_vis_max=p.depth_vis_max,
            color_error_thres=p.color_error_thres,
            alpha_vis_max=p.alpha_vis_max,
            new_gs_sample_ratio=p.new_gs_sample_ratio,
            max_new=tpu.max_new_gaussians,
            default_opacity=m.default_opacities,
            min_init_scale=m.min_init_scale, max_init_scale=m.max_init_scale,
            remove_small=p.remove_small_scale_thres,
            remove_large=p.remove_large_scale_thres,
            remove_low_opac=p.remove_low_opac_thres,
            ssim_weight=p.ssim_weight, depth_weight=p.depth_weight,
            max_iterations=p.max_iterations,
        )
        vp = eng.vol.params
        rk = ms.RayKnobs(
            width=eng.width, height=eng.height, lb=vp.raycast_lb,
            samples=vp.raycast_samples, bisect=max(vp.raycast_bisect, 3),
            tiles_per_step=vp.raycast_tiles_per_step, chunk=vp.raycast_chunk,
            use_pallas=eng._use_pallas_raycast(),
        )
        opt_cap = model.opt_cap(extra=tpu.max_new_gaussians, cached=True)
        st = model.statics
        tile_w = -(-st.width // st.tile_size)
        tile_h = -(-st.height // st.tile_size)
        # spawn-render statics mirror model.eval_slice's cap handling
        st_spawn = st._replace(
            visible_cap=min(st.visible_cap, opt_cap),
            active_tile_cap=min(tile_w * tile_h,
                                max(st.active_tile_cap, opt_cap // 8)),
        )
        model.pool, aux = ms.window_megastep(
            eng.vol, model.pool, jnp.asarray(np.stack(poses)), eng._K_dev,
            gt_rgb, iter_idx, spawn_key,
            st=st, st_spawn=st_spawn,
            tx_cfg=gmodel.tx_cfg_tuple(m), sc=sc, rk=rk,
            spawn_idx=n_local - 1, pool_prefix=eng._pool_prefix(),
            opt_cap=opt_cap,
        )
        self.localframe_raycast_window = []
        self.opt_raycast_list = []
        self.curr_iter += p.local_opt_iters
        self._last_loss_hist = aux["loss_hist"]
        ofl = jnp.stack([aux["n_tile_overflow"], aux["n_span_overflow"],
                         aux["n_active_overflow"]])
        self._bin_overflow = (
            ofl if self._bin_overflow is None else self._bin_overflow + ofl)
        self._spawn_overflow = (
            aux["n_spawn_overflow"] if self._spawn_overflow is None
            else self._spawn_overflow + aux["n_spawn_overflow"])
        jax.block_until_ready(model.pool.n_alive)
        model.refresh_count_async()
        self._megastep_ran = True

    # ----------------------------------------------------------------- spawn

    def init_new_gaussians(self, model: GaussianModel, raycast_maps: dict) -> None:
        """(initNewGaussians :450-526)."""
        p = self.pipe
        cam = self.curr_cam
        depth = raycast_maps["depth_map"][..., 0]
        vertex = raycast_maps["vertex_map"]
        color = raycast_maps["color_map"]
        gt, _ = self.frame_cache.get(cam)

        if model.num_gaussians_cached == 0:
            mask, normal = _spawn_mask_bootstrap(
                depth, vertex, color, gt, p.depth_vis_min, p.depth_vis_max,
                p.color_error_thres,
            )
        else:
            res = model.forward(cam.c2w_slam, cam.K, depth, color)
            mask, normal = _spawn_mask(
                depth, vertex, res["rgb"], res["alpha"], gt, p.depth_vis_min,
                p.depth_vis_max, p.color_error_thres, p.alpha_vis_max,
            )
            if self._debug_artifacts_on():
                # pre-optimization render comp (slam_pipeline.cpp:499-504)
                vis.imwrite_rgb(
                    os.path.join(self.workspace_dir, "before_opt",
                                 f"frame{cam.get_frame_id()}.jpg"),
                    vis.color_comp_img(np.clip(np.asarray(res["rgb"]), 0, 1),
                                       cam.image, 0, p.color_error_max))
        raycast_maps["normal_map"] = normal
        model.pool, n_added, n_overflow = gmodel.add_gaussians(
            model.pool, vertex, gt, normal, mask,
            p.new_gs_sample_ratio, self.cfg.tpu.max_new_gaussians,
            self.cfg.model.default_opacities,
            (self.cfg.model.min_init_scale, self.cfg.model.max_init_scale),
            model.next_rng(),
        )
        # no-silent-caps accounting: device-side accumulation (a per-window
        # sync fetch would cost ~30 ms RTT); fetched once in write_time_log
        self._spawn_overflow = (
            n_overflow if self._spawn_overflow is None
            else self._spawn_overflow + n_overflow
        )

    # -------------------------------------------------------------- optimize

    def local_optimize(self, model: GaussianModel) -> None:
        """(localOptimize :195-291): static-shape batch, scanned Adam over
        the compact pool prefix with per-window binning reuse."""
        p = self.pipe
        n_valid = len(self.opt_cam_list)
        if n_valid == 0:
            return
        M = p.localframe_cam_window_length + p.keyframe_select_max
        idx_pad = [min(i, n_valid - 1) for i in range(M)]

        # single-program batch assembly (see _assemble_opt_batch); pose/K
        # cross host->device as one [M, 4, 4] / [M, 3, 3] upload each
        batch = _assemble_opt_batch(
            jnp.asarray(np.stack(
                [self.opt_cam_list[i].c2w_slam for i in idx_pad])),
            jnp.asarray(np.stack(
                [self.opt_cam_list[i].K for i in idx_pad])),
            jnp.asarray(np.asarray(
                [self.opt_cam_list[i].id for i in idx_pad], np.int32)),
            tuple(self.frame_cache.get(self.opt_cam_list[i])[0] for i in idx_pad),
            tuple(self.opt_raycast_list[i]["depth_map"] for i in idx_pad),
            tuple(self.opt_raycast_list[i]["color_map"] for i in idx_pad),
        )
        if p.depth_weight > 0:
            def get_depth(i):
                d = self.frame_cache.get(self.opt_cam_list[i])[1]
                return d[..., 0] if d.ndim == 3 else d
            batch["gt_depth"] = jnp.stack([get_depth(i) for i in idx_pad])
        # per-iteration camera choice: shuffled WITHOUT replacement with
        # epoch reset (RandomSelector semantics, dataset_reader.h:65-99 —
        # the reference cycles the opt set evenly; iid sampling can starve
        # a window camera within one short window)
        idx_seq: list[int] = []
        while len(idx_seq) < p.local_opt_iters:
            idx_seq.extend(int(v) for v in self._rng.permutation(n_valid))
        iter_idx = jnp.asarray(
            np.asarray(idx_seq[: p.local_opt_iters]), jnp.int32
        )
        # the SLAM window optimizer always renders FULL SH — updateSH(-1)
        # at slam_pipeline.cpp:242 resolves to degreesToUse = maxSH
        # (raw_gs_model.h:26-32); the iteration warm-up ramp belongs to
        # the OFFLINE trainer (pipeline.cpp:196,294 -> slam/offline.py).
        # None compiles the band-mask-free eval_sh form.
        m = self.cfg.model
        # cached count staleness: the cache was refreshed after the LAST
        # window's prune, and this window's spawn (init_new_gaussians runs
        # just before) adds at most max_new rows — so max_new of margin is
        # exact, not conservative (the round-3 profile showed the old
        # 2*max_new margin pushing the whole optimizer into a 2x bucket)
        model.pool, aux = gmodel.window_optimize(
            model.pool, batch, iter_idx, model.statics,
            gmodel.tx_cfg_tuple(m), p.max_iterations, p.ssim_weight,
            p.depth_weight,
            model.opt_cap(extra=self.cfg.tpu.max_new_gaussians,
                          cached=True),
            None,
        )
        self.curr_iter += p.local_opt_iters
        self._last_loss_hist = aux["loss_hist"]
        # accumulate binning-cap overflows device-side as a [3] vector
        # (tile, span, active); fetched once in write_time_log (no
        # per-window sync)
        ofl = jnp.stack([aux["n_tile_overflow"], aux["n_span_overflow"],
                         aux["n_active_overflow"]])
        self._bin_overflow = (
            ofl if self._bin_overflow is None else self._bin_overflow + ofl)
        if self._tb is not None and p.log_slam_state:
            hist = np.asarray(aux["loss_hist"])
            for k, v in enumerate(hist):
                self._tb.add_scalar("loss/total", float(v), self.curr_iter - len(hist) + k)
            self._tb.add_scalar("opt_state/opt_gs_num", model.num_gaussians, self.curr_iter)

    def check_key_frame_error(self, model: GaussianModel) -> None:
        """(checkKeyFrameError, slam_pipeline.cpp:293-317): after each
        optimization window re-evaluate the sampled keyframes' masked loss
        and record [loss, frame_id, mean confidence, opt_count] — the
        bookkeeping behind the `ours` sampling method.

        NOTE: under exact reference semantics this loop is empty — 'ours'
        mode never adds keyframes to the opt set (keyFrameRaycast adds
        them only in 'random' mode, :538-552), so opt_cam_list[n_local:]
        is always [].  The body is kept correct and batched (one device
        program, one host fetch) for direct callers and any future
        loss-weighted sampler, mirroring the reference keeping its own
        vestigial implementation."""
        p = self.pipe
        n_local = len(self.localframe_cam_window)
        kf = list(zip(self.opt_cam_list[n_local:],
                      self.opt_raycast_list[n_local:]))
        if not kf:
            return
        # gt images come from the device cache (a per-keyframe
        # jnp.asarray(cam.image) re-uploaded ~10 MB over the slow host
        # link every window), and the per-keyframe scalar results drain in
        # ONE host fetch instead of 2 sync round trips per keyframe
        vals = []
        for cam, ray in kf:
            res = model.forward(
                cam.c2w_slam, cam.K, ray["depth_map"][..., 0], ray["color_map"]
            )
            mask = (ray["depth_map"][..., 0] > 0)[..., None]
            gt = self.frame_cache.get(cam)[0]
            vals.append(jnp.stack([
                losses.l1(gt, res["rgb"], mask),
                ray["confidence_map"].mean(),
            ]))
        arr = np.asarray(jnp.stack(vals))
        for k, (cam, _) in enumerate(kf):
            loss = float(arr[k, 0])
            fid = cam.get_frame_id()
            prev = self.keyframe_loss_dict.get(fid, [0.1, 0.0, 0.0, 0.0, 0.0])
            opt_count = prev[3] + (1.0 if loss > p.kf_loss_thres else 0.0)
            self.keyframe_loss_dict[fid] = [
                loss, float(self.curr_frame_id), float(arr[k, 1]), opt_count,
            ]

    def remove_redundant(self, model: GaussianModel) -> None:
        """(removeRedundantGs :564-586)."""
        if model.num_gaussians_cached == 0:
            # still refresh: the cache must bootstrap off 0 after the first
            # window's spawn, or this early-return becomes permanent (the
            # empty-pool skip itself matches the reference, which never
            # prunes an empty model)
            model.refresh_count_async()
            return
        p = self.pipe
        model.pool, _ = gmodel.remove_redundant(
            model.pool,
            jnp.asarray(p.remove_small_scale_thres),
            jnp.asarray(p.remove_large_scale_thres),
            jnp.asarray(p.remove_low_opac_thres),
        )
        # restore the compact-prefix invariant the window optimizer relies on
        from ..gs import params as pmod

        model.pool = pmod.compact(model.pool)
        # kick off the async live-count refresh consumed next window
        model.refresh_count_async()

    # ------------------------------------------------------------------ eval

    def render_eval_imgs(self, model: GaussianModel, cams: list[Camera],
                         names: tuple = ("rgb",), chunk: int = 0) -> None:
        """(renderEvalImgs :588-695): writes val/{gt,render,comp,
        raycast_color,raycast_depth} artifacts with reference-compatible
        names.

        Unlike the reference's per-frame loop (one raycast + one render +
        one sync each), cameras go through in CHUNKS: one batched raycast
        program + one batched forward program per chunk (DP-sharded over
        the mesh when >1 device), with the next chunk dispatched before
        the current one's images are encoded — device compute overlaps
        host JPEG/PNG work."""
        p = self.pipe
        for sub in ("gt", "render", "comp", "raycast_color", "raycast_depth"):
            os.makedirs(os.path.join(self.eval_path, sub), exist_ok=True)
        if not cams:
            return
        chunk = chunk or int(getattr(self.cfg.tpu, "eval_chunk", 8))
        n_gs = model.num_gaussians  # ONE sync fetch, not one per camera

        def dispatch(cs: list[Camera]):
            poses = []
            for cam in cs:
                k = self._pose_idx.get(cam.id, -1)
                if self.engine.cam_poses and 0 <= k < len(self.engine.cam_poses):
                    poses.append(self.engine.cam_poses[k])
                else:
                    poses.append(cam.c2w)
            rays = self.engine.run_raycast_batch(
                np.stack(poses).astype(np.float32), K=np.asarray(cs[0].K),
                quality=True)
            res = None
            if n_gs > 0:
                batch = {
                    "c2w": jnp.stack([jnp.asarray(c.c2w_slam) for c in cs]),
                    "K": jnp.stack([jnp.asarray(c.K) for c in cs]),
                    "ref_depth": rays["depth_map"][..., 0],
                    "base_color": rays["color_map"],
                    "cam_id": jnp.full((len(cs),), -1, jnp.int32),
                }
                res = self._eval_render_batch(model, batch)
            return rays, res

        chunks = [cams[i:i + chunk] for i in range(0, len(cams), chunk)]
        pending = None  # (cams, rays, res) dispatched but not yet written
        for cs in chunks + [None]:
            nxt = dispatch(cs) if cs is not None else None
            if pending is not None:
                self._write_eval_chunk(pending[0], pending[1], pending[2], names)
            pending = (cs, nxt[0], nxt[1]) if cs is not None else None

    def _eval_render_batch(self, model: GaussianModel, batch: dict):
        """Forward a stacked camera batch: DP over the device mesh when
        >1 device (SURVEY §2.4 axis (a)), else one lax.map program."""
        n_dev = len(jax.devices())
        if n_dev <= 1:
            return model.forward_batch(batch)
        from ..parallel import mesh as pmesh

        H, W = batch["ref_depth"].shape[1:3]
        params, alive, st = model.eval_slice(H, W)
        key = (st, n_dev)
        if self._dp_render is None or self._dp_render[0] != key:
            m = pmesh.make_mesh(n_dev)
            self._dp_render = (key, m, pmesh.dp_render_fn(m, st))
        _, m, fn = self._dp_render
        M = batch["c2w"].shape[0]
        pad = (-M) % n_dev
        if pad:
            batch = {k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)])
                     for k, v in batch.items()}
        out = fn(pmesh.replicate(m, params), pmesh.replicate(m, alive),
                 pmesh.shard_batch(m, batch))
        if pad:
            out = {k: v[:M] for k, v in out.items()}
        return out

    def _write_eval_chunk(self, cs: list[Camera], rays: dict, res: dict | None,
                          names: tuple) -> None:
        """Host side of render_eval_imgs: fetch a chunk's stacked maps and
        encode the reference-named artifacts."""
        import cv2

        p = self.pipe
        rc_color_b = np.asarray(rays["color_map"])
        rc_depth_b = np.asarray(rays["depth_map"])
        res_np = (None if res is None
                  else {k: np.asarray(v) for k, v in res.items()})
        for i, cam in enumerate(cs):
            fid = cam.get_frame_id()
            fname = f"frame{fid}_iter{self.curr_iter}"
            rc_color = rc_color_b[i]
            rc_depth = rc_depth_b[i]
            vis.imwrite_rgb(
                os.path.join(self.eval_path, "raycast_color", f"frame{fid}.color.jpg"),
                vis.to_u8_rgb(np.clip(rc_color, 0, 1)),
            )
            vis.imwrite_rgb(
                os.path.join(self.eval_path, "raycast_color", f"frame{fid}_comp.color.jpg"),
                vis.color_comp_img(np.clip(rc_color, 0, 1), cam.image, 0, p.color_error_max),
            )
            cv2.imwrite(
                os.path.join(self.eval_path, "raycast_depth", f"frame{fid}.depth.png"),
                vis.depth_to_png16(rc_depth),
            )
            vis.imwrite_rgb(
                os.path.join(self.eval_path, "raycast_depth", f"frame{fid}_comp.depth.png"),
                vis.depth_comp_img(rc_depth, cam.depth, 0, p.depth_vis_max, 0, p.depth_error_max),
            )
            if res_np is not None:
                if "rgb" in names:
                    rendered = np.clip(res_np["rgb"][i], 0, 1)
                    vis.imwrite_rgb(
                        os.path.join(self.eval_path, "gt", fname + ".color.jpg"),
                        vis.to_u8_rgb(cam.image),
                    )
                    vis.imwrite_rgb(
                        os.path.join(self.eval_path, "render", fname + ".color.jpg"),
                        vis.to_u8_rgb(rendered),
                    )
                    vis.imwrite_rgb(
                        os.path.join(self.eval_path, "comp", fname + ".color.jpg"),
                        vis.color_comp_img(rendered, cam.image, 0, p.color_error_max),
                    )
                if "alpha" in names:
                    vis.imwrite_rgb(
                        os.path.join(self.eval_path, "render", fname + ".alpha.jpg"),
                        vis.jet(res_np["alpha"][i], 0, 1),
                    )
                if "depth" in names:
                    vis.imwrite_rgb(
                        os.path.join(self.eval_path, "render", fname + ".depth.jpg"),
                        vis.jet(res_np["depth"][i], 0, p.depth_vis_max, True),
                    )

    # ------------------------------------------------------------------ save

    def save(self, model: GaussianModel, reader: DatasetReader) -> None:
        """Model + viewer artifacts (Pipeline::save, src/pipeline.cpp:38-54)."""
        model.save(self.model_path)
        uio.save_cameras_json(
            reader.train_vec, os.path.join(self.model_path, "cameras.json")
        )
        uio.save_cfg_args(
            os.path.join(self.model_path, "cfg_args"), self.cfg.model.sh_degree
        )

    def save_mesh(self) -> None:
        self.engine.save_mesh(
            os.path.join(self.workspace_dir, self.pipe.tsdf.saved_mesh)
        )

    def save_engine(self) -> None:
        self.engine.save_scene(
            os.path.join(self.workspace_dir, self.pipe.tsdf.saved_engine)
        )

    def load_engine(self) -> None:
        self.engine.load_scene(
            os.path.join(self.workspace_dir, self.pipe.tsdf.saved_engine)
        )
