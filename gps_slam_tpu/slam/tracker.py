"""ICP camera tracker — TPU re-expression of InfiniTAM's depth-only
extended tracker (ITMExtendedTracker.cpp:470-665 TrackCamera; per-pixel
terms ITMDepthTracker_Shared.h:8-104 / ITMExtendedTracker_Shared.h; CUDA
reductions ITMExtendedTracker_CUDA.cu; config string
`type=rgb,levels=rrbb,...` at ITMLibSettings.cpp:54-57).

Point-to-plane ICP against the previous frame's raycast maps, over a
coarse-to-fine depth pyramid, Gauss-Newton with Levenberg-Marquardt
damping.  TPU shape: each level's GN loop is one jitted `lax.fori_loop` —
per-pixel 6-vector Jacobians are reduced with `jnp.sum` (VPU), the 6x6
solve and SE3 exp stay inside the jit (no per-iteration host sync, unlike
the reference which reads the 6x6 system back every iteration,
ITMExtendedTracker.cpp:642-655).

Deviation: the reference gates tracking quality with a hand-trained SVM
over Hessian/residual features (ITMExtendedTracker.cpp:398-468); we use
inlier-fraction + residual thresholds for the GOOD/POOR/FAILED decision,
which feeds the same behaviourOnFailure policy surface.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..utils.precision import mm
from ..utils.se3 import se3_exp

# per-level GN iterations, coarse -> fine (numiterC=20 -> numiterF=50
# interpolation in the reference; we run fewer, fully on-device)
LEVEL_ITERS = (12, 10, 8, 6)
SPACE_THRESH = (0.1, 0.06, 0.03, 0.015)  # outlier distance per level (:54-57)


def _subsample_depth(depth: jax.Array) -> jax.Array:
    """Stride-2 subsample keeping holes (FilterSubsampleWithHoles,
    Engines/LowLevel): average of the valid pixels of each 2x2 block."""
    H, W = depth.shape
    H2, W2 = H // 2, W // 2
    d = depth[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2)
    valid = d > 0
    s = jnp.sum(jnp.where(valid, d, 0.0), axis=(1, 3))
    c = jnp.sum(valid, axis=(1, 3))
    return jnp.where(c > 0, s / jnp.maximum(c, 1), 0.0)


@partial(jax.jit, static_argnums=(5,))
def _track_level(
    T0: jax.Array,          # [4,4] current c2w estimate
    depth: jax.Array,       # [h, w] this level's depth
    ref_vertex: jax.Array,  # [H, W, 3] world vertices from previous raycast
    ref_normal: jax.Array,  # [H, W, 3] world normals
    cam: jax.Array,         # [8]: fx, fy, cx, cy (level), fx0, fy0, cx0, cy0 (full)
    n_iters: int,
    ref_pose_inv: jax.Array = None,  # [4,4] w2c of the raycast camera
    space_thresh: jax.Array = None,
):
    """GN iterations at one pyramid level.  Returns (T, inlier_frac,
    mean_residual)."""
    h, w = depth.shape
    Hf, Wf = ref_vertex.shape[:2]
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    fx0, fy0, cx0, cy0 = cam[4], cam[5], cam[6], cam[7]

    i = jnp.arange(w, dtype=jnp.float32)[None, :]
    j = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = (i - cx) / fx
    y = (j - cy) / fy
    pts_cam = jnp.stack(
        [jnp.broadcast_to(x, (h, w)), jnp.broadcast_to(y, (h, w)), jnp.ones((h, w))],
        -1,
    ) * depth[..., None]
    has_depth = depth > 0

    def gn_iter(_, state):
        T, _, _ = state
        # current points -> world
        p_w = mm(pts_cam.reshape(-1, 3), T[:3, :3].T) + T[:3, 3]
        # project into the reference (raycast) camera to associate
        p_ref = mm(p_w, ref_pose_inv[:3, :3].T) + ref_pose_inv[:3, 3]
        z = p_ref[:, 2]
        u = fx0 * p_ref[:, 0] / jnp.maximum(z, 1e-6) + cx0
        v = fy0 * p_ref[:, 1] / jnp.maximum(z, 1e-6) + cy0
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, Wf - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, Hf - 1)
        in_img = (z > 0) & (u >= 0) & (u <= Wf - 1) & (v >= 0) & (v <= Hf - 1)
        vt = ref_vertex[vi, ui]
        nt = ref_normal[vi, ui]
        has_ref = jnp.abs(nt).sum(-1) > 0.1
        diff = p_w - vt
        dist2 = jnp.sum(diff * diff, -1)
        r = jnp.sum(nt * diff, -1)
        ok = (
            has_depth.reshape(-1)
            & in_img
            & has_ref
            & (dist2 < space_thresh * space_thresh)
        )
        wgt = ok.astype(jnp.float32)
        # point-to-plane jacobian wrt left-multiplied twist on T:
        # d r / d xi = [ n ; p_w x n ]
        Jt = jnp.concatenate([nt, jnp.cross(p_w, nt)], axis=-1)  # [N, 6]
        Jw = Jt * wgt[:, None]
        Hm = mm(Jw.T, Jt)                       # [6, 6]
        g = jnp.sum(Jw * r[:, None], axis=0)    # [6]
        n_ok = jnp.sum(wgt)
        # LM damping: diagonal-relative + an absolute floor scaled to the
        # mean diagonal — views of parallel walls make H exactly rank
        # deficient (zero normal component along the wall plane), and a
        # purely diagonal damp adds nothing along that null direction
        mean_diag = jnp.trace(Hm) / 6.0 + 1e-6
        damp = 1e-3 * jnp.diag(jnp.diagonal(Hm)) + 1e-2 * mean_diag * jnp.eye(6)
        delta = jnp.linalg.solve(Hm + damp, -g)
        ok_solve = jnp.all(jnp.isfinite(delta)) & (n_ok > 50)
        delta = jnp.where(ok_solve, delta, 0.0)
        T_new = mm(se3_exp(delta), T)
        mean_r = jnp.sum(jnp.abs(r) * wgt) / jnp.maximum(n_ok, 1.0)
        inlier = n_ok / (h * w)
        return T_new, inlier, mean_r

    state = (T0, jnp.zeros(()), jnp.zeros(()))
    return jax.lax.fori_loop(0, n_iters, gn_iter, state)


class TrackerQuality:
    GOOD, POOR, FAILED = 2, 1, 0


class ICPTracker:
    def __init__(self, cfg: Config, width: int, height: int, n_levels: int = 4):
        self.cfg = cfg
        self.width, self.height = width, height
        self.n_levels = n_levels

    def track(self, last_pose: np.ndarray, depth: np.ndarray,
              raycast_maps: dict | None, K: np.ndarray):
        """Track the new depth frame against the previous raycast.
        Returns (c2w pose [4,4] np, quality)."""
        if raycast_maps is None:
            return last_pose, TrackerQuality.POOR
        d0 = jnp.asarray(np.asarray(depth).reshape(self.height, self.width))
        pyramid = [d0]
        for _ in range(self.n_levels - 1):
            pyramid.append(_subsample_depth(pyramid[-1]))
        fx0, fy0, cx0, cy0 = K[0, 0], K[1, 1], K[0, 2], K[0 + 1, 2]
        ref_v = raycast_maps["vertex_map"]
        ref_n = raycast_maps["normal_map"]
        ref_pose_inv = jnp.asarray(np.linalg.inv(last_pose))

        T = jnp.asarray(last_pose)
        inlier, mean_r = 0.0, 0.0
        for lvl in range(self.n_levels - 1, -1, -1):
            s = 2 ** lvl
            cam = jnp.asarray(
                [fx0 / s, fy0 / s, (cx0 + 0.5) / s - 0.5, (cy0 + 0.5) / s - 0.5,
                 fx0, fy0, cx0, cy0], jnp.float32
            )
            T, inl, mr = _track_level(
                T, pyramid[lvl], ref_v, ref_n, cam,
                LEVEL_ITERS[min(lvl, len(LEVEL_ITERS) - 1)],
                ref_pose_inv=ref_pose_inv,
                space_thresh=jnp.asarray(SPACE_THRESH[min(lvl, 3)]),
            )
            inlier, mean_r = float(inl), float(mr)

        # quality policy (replaces the SVM gate,
        # ITMExtendedTracker.cpp:398-468)
        if not np.all(np.isfinite(np.asarray(T))):
            return last_pose, TrackerQuality.FAILED
        if inlier < 0.1 or mean_r > 0.05:
            return last_pose, TrackerQuality.FAILED
        quality = TrackerQuality.GOOD if (inlier > 0.3 and mean_r < 0.02) else TrackerQuality.POOR
        return np.asarray(T), quality
