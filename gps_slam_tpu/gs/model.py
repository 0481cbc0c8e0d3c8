"""Gaussian model — forward dispatch, loss, training step, spawn/prune.

TPU re-expression of RawGaussianModel / SLAMGaussianModel
(src/raw_gs_model.cpp, slam/slam_gs_model.cpp): the `ges` render path
(gesForward, raw_gs_model.cpp:188-367), loss (computeLoss :369-417),
SLAM-mode Gaussian spawning from masked pixels (addGaussians,
slam_gs_model.cpp:5-56), redundancy pruning (slam_pipeline.cpp:564-586),
and the per-window Adam optimization loop (localOptimize,
slam_pipeline.cpp:195-291) compiled as one scanned jit.

Everything device-side is functional: `GaussianPool` + optax state thread
through jitted steps; the `GaussianModel` class is a thin host wrapper.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..utils.se3 import pose_inv
from . import losses, optim, params as pmod, projection, rasterize, sh
from .params import GaussianPool


class RenderStatics(NamedTuple):
    """Static (compile-time) render settings, from MODEL config
    (raw_gs_model.cpp:11-40 loadConfig)."""

    width: int
    height: int
    sh_degree: int
    tile_size: int
    max_gs_radii: int
    delta_depth: float
    use_exposure: bool
    visible_cap: int
    tiles_per_gaussian_cap: int
    tile_cap: int
    eps2d: float = 0.3
    near_plane: float = 0.01
    far_plane: float = 1e10
    radius_clip: float = 0.0
    active_tile_cap: int = 2048   # static bound on Gaussian-occupied tiles
    bin_margin_px: float = 2.0    # radius inflation when bins are reused
    # tile-splat implementation: "xla" (scanned einsums — CPU path + test
    # oracle), "pallas" (in-VMEM Mosaic kernels, gs/splat_pallas.py), or
    # "pallas_interpret" (kernel semantics on CPU, for tests)
    splat_impl: str = "xla"


def _project_and_colors(params, alive, c2w, K, st, active_sh_degree=None):
    """Shared projection + SH head of the GES/raw forwards."""
    viewmat = pose_inv(c2w)
    proj = projection.project(
        params["means"], params["quats"], jnp.exp(params["scales"]),
        viewmat, K, st.width, st.height,
        eps2d=st.eps2d, near_plane=st.near_plane, far_plane=st.far_plane,
        radius_clip=st.radius_clip, valid=alive,
    )
    radii = proj.radii
    if st.max_gs_radii > 0:
        radii = jnp.minimum(radii, st.max_gs_radii)  # :241-242

    # SH -> rgb (:250-257)
    coeffs = jnp.concatenate(
        [params["features_dc"][:, None, :], params["features_rest"]], axis=1
    )
    viewdirs = params["means"] - c2w[:3, 3]
    colors = sh.eval_sh(st.sh_degree, viewdirs, coeffs, mask=radii > 0,
                        active_degree=active_sh_degree)
    colors = jnp.maximum(colors + 0.5, 0.0)
    return proj, radii, colors


def ges_bin(params, alive, c2w, K, st: RenderStatics,
            margin_px: float = 0.0) -> rasterize.ActiveBins:
    """Active-tile binning for the current parameters — split out so one
    binning can be reused across a window's optimization iterations
    (the reference re-bins every iteration, isect_tiles_no_depth.cu; the
    sub-pixel parameter drift over 20 Adam steps makes that redundant —
    `margin_px` keeps the lists conservative)."""
    proj, radii, _ = _project_and_colors(params, alive, c2w, K, st)
    tile_w = -(-st.width // st.tile_size)
    tile_h = -(-st.height // st.tile_size)
    return rasterize.bin_gaussians_active(
        proj.means2d, radii, st.tile_size, tile_w, tile_h,
        st.visible_cap, st.tiles_per_gaussian_cap, st.tile_cap,
        st.active_tile_cap, margin_px=margin_px,
    )


def ges_forward(
    params: dict,
    alive: jax.Array,
    c2w: jax.Array,        # [4, 4] camera-to-world (c2w_slam)
    K: jax.Array,          # [3, 3]
    ref_depth: jax.Array,  # [H, W] SDF raycast depth (0 = no surface)
    base_color: jax.Array, # [H, W, 3] SDF raycast color
    cam_id: jax.Array,     # int32 scalar (exposure index)
    st: RenderStatics,
    bins: rasterize.ActiveBins | None = None,
    active_sh_degree: jax.Array | None = None,
) -> dict:
    """The GES render (gesForward, raw_gs_model.cpp:188-367):
    project -> SH -> bin -> weighted-sum rasterize -> blend with the SDF
    base layer.  Pass `bins` to reuse a previous binning (window loop)."""
    ref = ref_depth
    ref_clamped = jnp.where(ref < 0.01, 1000.0, ref)  # :205-208

    proj, radii, colors = _project_and_colors(
        params, alive, c2w, K, st, active_sh_degree
    )

    # depth blended like a color channel (:286)
    colors4 = jnp.concatenate([colors, proj.depths[:, None]], axis=1)

    tile_w = -(-st.width // st.tile_size)
    tile_h = -(-st.height // st.tile_size)
    if bins is None:
        bins = rasterize.bin_gaussians_active(
            proj.means2d, radii, st.tile_size, tile_w, tile_h,
            st.visible_cap, st.tiles_per_gaussian_cap, st.tile_cap,
            st.active_tile_cap,
        )
    raw, weight_sum = rasterize.ges_rasterize_active(
        proj.means2d, proj.conics, colors4,
        jax.nn.sigmoid(params["opacities"][:, 0]),
        bins, ref_clamped, proj.depths, st.delta_depth,
        st.width, st.height, st.tile_size, impl=st.splat_impl,
        tiles_per_gaussian_cap=st.tiles_per_gaussian_cap,
    )

    # SDF base-layer blend (:317-326)
    raw_rgb, raw_depth = raw[..., :3], raw[..., 3]
    rgb = (raw_rgb + base_color) / (weight_sum[..., None] + 1.0)
    depth_w = (ref > 0).astype(jnp.float32)
    den = weight_sum + depth_w
    depth = jnp.where(den > 0, (raw_depth + ref * depth_w) / jnp.maximum(den, 1e-12), 0.0)

    if st.use_exposure:
        E = params["exposure"].shape[0]
        idx = jnp.clip(cam_id, 0, E - 1)
        exp = params["exposure"][idx]
        rgb_exposed = rgb @ exp[:, :3].T + exp[:, 3]
        rgb = jnp.where(cam_id < E, rgb_exposed, rgb)

    return {
        "rgb": rgb,
        "depth": depth,
        "alpha": weight_sum,
        "radii": radii,
        "means2d": proj.means2d,
        "n_pairs": bins.n_pairs,
        "n_tile_overflow": bins.n_tile_overflow,
        "n_span_overflow": bins.n_span_overflow,
        "n_active_overflow": bins.n_active_overflow,
    }


def raw_forward(
    params: dict,
    alive: jax.Array,
    c2w: jax.Array,
    K: jax.Array,
    cam_id: jax.Array,
    st: RenderStatics,
    means2d_probe: jax.Array | None = None,
    active_sh_degree: jax.Array | None = None,
) -> dict:
    """Classic 3DGS render (rawForward, raw_gs_model.cpp:43-185):
    depth-sorted front-to-back alpha compositing, expected depth =
    blended depth / alpha.  `means2d_probe` (zeros [C,2]) is added to the
    projected means so callers can take d(loss)/d(means2d) for densify
    statistics (the reference retains the intermediate's grad instead,
    pipeline.cpp:200)."""
    from . import rasterize_classic as rcl

    viewmat = pose_inv(c2w)
    proj = projection.project(
        params["means"], params["quats"], jnp.exp(params["scales"]),
        viewmat, K, st.width, st.height,
        eps2d=st.eps2d, near_plane=st.near_plane, far_plane=st.far_plane,
        radius_clip=st.radius_clip, valid=alive,
    )
    radii = proj.radii
    if st.max_gs_radii > 0:
        radii = jnp.minimum(radii, st.max_gs_radii)
    means2d = proj.means2d
    if means2d_probe is not None:
        means2d = means2d + means2d_probe

    coeffs = jnp.concatenate(
        [params["features_dc"][:, None, :], params["features_rest"]], axis=1
    )
    viewdirs = params["means"] - c2w[:3, 3]
    colors = sh.eval_sh(st.sh_degree, viewdirs, coeffs, mask=radii > 0,
                        active_degree=active_sh_degree)
    colors = jnp.maximum(colors + 0.5, 0.0)
    colors4 = jnp.concatenate([colors, proj.depths[:, None]], axis=1)

    tile_w = -(-st.width // st.tile_size)
    tile_h = -(-st.height // st.tile_size)
    bins = rcl.bin_gaussians_depth(
        means2d, radii, proj.depths, st.tile_size, tile_w, tile_h,
        st.visible_cap, st.tiles_per_gaussian_cap, st.tile_cap,
    )
    render, alpha = rcl.classic_rasterize(
        means2d, proj.conics, colors4,
        jax.nn.sigmoid(params["opacities"][:, 0]),
        bins, st.width, st.height, st.tile_size,
    )
    rgb, raw_depth = render[..., :3], render[..., 3]
    depth = raw_depth / jnp.maximum(alpha, 1e-10)
    return {
        "rgb": rgb, "depth": depth, "alpha": alpha, "radii": radii,
        "means2d": means2d,
        "n_pairs": bins.n_pairs,
        "n_tile_overflow": bins.n_tile_overflow,
        "n_span_overflow": bins.n_span_overflow,
    }


ges_forward_jit = jax.jit(ges_forward, static_argnums=(7,))
raw_forward_jit = jax.jit(raw_forward, static_argnums=(5,))


@partial(jax.jit, static_argnums=(3,))
def render_eval_batch(params, alive, cam_batch: dict, st: RenderStatics):
    """Eval renders for a CHUNK of stacked cameras as ONE device program
    (lax.map over ges_forward) — the batched path behind
    SLAMPipeline.render_eval_imgs (renderEvalImgs, slam_pipeline.cpp:
    588-695, whose per-camera loop costs one dispatch + sync each over a
    high-latency host link).  cam_batch: stacked [M, ...] c2w/K/ref_depth/
    base_color/cam_id.  Returns stacked rgb/alpha/depth."""

    def one(cam):
        res = ges_forward(
            params, alive, cam["c2w"], cam["K"], cam["ref_depth"],
            cam["base_color"], cam["cam_id"], st,
        )
        return {
            "rgb": jnp.clip(res["rgb"], 0.0, 1.0),
            "alpha": res["alpha"],
            "depth": res["depth"],
        }

    return jax.lax.map(one, cam_batch)


# ---------------------------------------------------------------------------
# jitted training step over an optimization camera set
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8), donate_argnums=(0,))
def window_optimize(
    pool: GaussianPool,
    cam_batch: dict,      # stacked [M, ...]: c2w, K, gt_rgb, gt_depth,
                          # ref_depth, base_color, cam_id
    iter_cam_idx: jax.Array,  # int32 [iters] which camera each iteration uses
    st: RenderStatics,
    tx_cfg: tuple,        # hashable ModelConfig-derived tuple for optimizer
    max_iterations: int,
    ssim_weight: float,
    depth_weight: float,
    opt_cap: int,         # static prefix of the (compact) pool to optimize
    active_sh_degree: jax.Array = None,
) -> tuple[GaussianPool, dict]:
    """The localOptimize loop (slam_pipeline.cpp:195-291): `iters` Adam
    steps, each on one random camera from the optimization set, compiled as
    one lax.scan.  Optimizer state is created fresh inside (the reference
    re-inits every window, slam_pipeline.cpp:202).

    TPU design vs the reference loop:
      * The pool is kept compact (alive rows first, params.compact), so all
        per-iteration math runs on the `opt_cap`-row prefix instead of the
        full capacity — cost scales with the live Gaussian count.
      * Each camera is binned ONCE per window (ges_bin with a pixel margin)
        instead of every iteration; only projection/SH/rasterization rerun.
      * `depth_weight`/`ssim_weight` follow computeLoss
        (raw_gs_model.cpp:369-417).
    """
    tx = optim.make_optimizer(_TxCfg(*tx_cfg), max_iterations)
    tile_w = -(-st.width // st.tile_size)
    tile_h = -(-st.height // st.tile_size)
    # static bound on Gaussian-occupied tiles: the configured cap, never
    # the full grid (SLAM-mode Gaussians cover a minority of tiles; the
    # rasterize scans cost O(act_cap), and the profiler showed the old
    # opt_cap-coupled fallback silently re-dense-ifying the whole image).
    # n_active_overflow in the result reports any clipping.
    act_cap = min(tile_w * tile_h, st.active_tile_cap)
    st = st._replace(
        visible_cap=min(st.visible_cap, opt_cap),
        active_tile_cap=act_cap,
    )
    cparams = {
        k: (v if k == "exposure" else v[:opt_cap])
        for k, v in pool.params.items()
    }
    calive = pool.alive[:opt_cap]
    opt_state = tx.init(cparams)

    # one binning per window camera, stacked [M, ...].  vmap (not lax.map):
    # the 9 cameras' pair sorts batch into ONE multi-row sort call — the
    # sequential lax.map version cost ~7 ms/camera of serialized sort +
    # compaction (round-3 xplane trace)
    def make_bins(cam):
        return ges_bin(cparams, calive, cam["c2w"], cam["K"], st,
                       margin_px=st.bin_margin_px)

    bins = jax.vmap(
        make_bins)({"c2w": cam_batch["c2w"], "K": cam_batch["K"]})

    # tile-space L1 loss path (release-config loss: ssim_weight = 0,
    # depth_weight = 0, no exposure — configs/release/*/*.yaml): inactive
    # tiles render the exact base layer every iteration, so their L1 sum
    # is a per-window constant and each Adam step evaluates only the
    # active tiles (see rasterize.hoist_window_tiles).  SSIM needs the
    # assembled image (its 11x11 window crosses tile borders) and
    # exposure differentiates through INACTIVE pixels too — both keep the
    # image-space path.
    fast_tile = (ssim_weight == 0.0 and depth_weight == 0.0
                 and not st.use_exposure)
    N_rows = calive.shape[0]
    if fast_tile:
        def make_hoist(cam, b):
            ref_clamped = jnp.where(
                cam["ref_depth"] < 0.01, 1000.0, cam["ref_depth"])
            return rasterize.hoist_window_tiles(
                b, ref_clamped, cam["gt_rgb"], cam["base_color"],
                st.width, st.height, st.tile_size, 64, N_rows)

        hoists = jax.vmap(make_hoist)(
            {"ref_depth": cam_batch["ref_depth"],
             "gt_rgb": cam_batch["gt_rgb"],
             "base_color": cam_batch["base_color"]},
            bins,
        )
        n_px = float(st.width * st.height * 3)

    # gt-image SSIM blur moments are constant across the window's
    # iterations — precompute per camera (the gt was 2 of the 5 stacked
    # stencil channels per color re-blurred every Adam step)
    gt_moments = (jax.vmap(losses.ssim_gt_moments)(cam_batch["gt_rgb"])
                  if ssim_weight > 0 else None)

    def step(carry, cam_i):
        prms, ostate = carry
        b = jax.tree.map(lambda x: x[cam_i], bins)

        def loss_fn_tile(p):
            h = jax.tree.map(lambda x: x[cam_i], hoists)
            proj, radii, colors = _project_and_colors(
                p, calive, cam_batch["c2w"][cam_i], cam_batch["K"][cam_i],
                st, active_sh_degree)
            colors4 = jnp.concatenate(
                [colors, proj.depths[:, None]], axis=1)
            out = rasterize.ges_splat_tiles(
                proj.means2d, proj.conics, colors4,
                jax.nn.sigmoid(p["opacities"][:, 0]), proj.depths, h,
                st.delta_depth,
                impl=st.splat_impl,
                tiles_per_gaussian_cap=st.tiles_per_gaussian_cap,
            )                                            # [A_pad, 5, P]
            rgb_t = (out[:, :3] + h["base_t"]) / (out[:, 4:5] + 1.0)
            diff = jnp.abs(rgb_t - h["gt_t"]) * h["pxmask"][:, None, :]
            lval = (jnp.sum(diff) + h["inactive_sum"]) / n_px
            return lval, {"total": lval, "rgb": lval, "l1": lval}

        def loss_fn(p):
            res = ges_forward(
                p, calive,
                cam_batch["c2w"][cam_i], cam_batch["K"][cam_i],
                cam_batch["ref_depth"][cam_i], cam_batch["base_color"][cam_i],
                cam_batch["cam_id"][cam_i], st,
                bins=b, active_sh_degree=active_sh_degree,
            )
            gt_depth = (
                cam_batch["gt_depth"][cam_i] if "gt_depth" in cam_batch else None
            )
            loss = losses.compute_loss(
                res["rgb"], res["depth"], cam_batch["gt_rgb"][cam_i],
                gt_depth, ssim_weight, depth_weight,
                gt_ssim_moments=(
                    None if gt_moments is None
                    else jax.tree.map(lambda x: x[cam_i], gt_moments)),
            )
            return loss["total"], loss

        (lval, ldict), grads = jax.value_and_grad(
            loss_fn_tile if fast_tile else loss_fn, has_aux=True)(prms)
        updates, ostate = tx.update(grads, ostate, prms)
        prms = optax.apply_updates(prms, updates)
        return (prms, ostate), lval

    (cparams, opt_state), loss_hist = jax.lax.scan(
        step, (cparams, opt_state), iter_cam_idx
    )

    new_params = {
        k: (cparams[k] if k == "exposure"
            else jax.lax.dynamic_update_slice_in_dim(v, cparams[k], 0, axis=0))
        for k, v in pool.params.items()
    }
    return pool.with_params(new_params), {
        "loss_hist": loss_hist,
        # binning-cap audit (no silent caps): pairs dropped by the L-deep
        # tile lists, gaussians whose tile bbox was clipped, active tiles
        # beyond the cap — summed over the window's cameras
        "n_tile_overflow": jnp.sum(bins.n_tile_overflow),
        "n_span_overflow": jnp.sum(bins.n_span_overflow),
        "n_active_overflow": jnp.sum(bins.n_active_overflow),
    }


class _TxCfg(NamedTuple):
    means_lr: float
    means_lr_final: float
    scales_lr: float
    quats_lr: float
    featuresDc_lr: float
    featuresRest_lr: float
    opacities_lr: float
    exposure_lr: float
    use_exposure: bool


def tx_cfg_tuple(mcfg) -> tuple:
    return tuple(
        _TxCfg(
            mcfg.means_lr, mcfg.means_lr_final, mcfg.scales_lr, mcfg.quats_lr,
            mcfg.featuresDc_lr, mcfg.featuresRest_lr, mcfg.opacities_lr,
            mcfg.exposure_lr, mcfg.use_exposure,
        )
    )


# ---------------------------------------------------------------------------
# spawn / prune (device-side)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(5, 6, 7, 8), donate_argnums=(0,))
def add_gaussians(
    pool: GaussianPool,
    vertex_map: jax.Array,   # [H, W, 3] world
    color_map: jax.Array,    # [H, W, 3]
    normal_map: jax.Array,   # [H, W, 3]
    sample_mask: jax.Array,  # [H, W] bool
    sample_ratio: float,
    max_new: int,
    default_opacity: float,
    scale_limits: tuple,     # (min_init_scale, max_init_scale)
    rng_key: jax.Array = None,
) -> tuple[GaussianPool, jax.Array]:
    """SLAM-mode spawning (SLAMGaussianModel::addGaussians,
    slam_gs_model.cpp:5-56): take `sample_ratio` of masked pixels at random,
    init attributes from vertex/color/normal maps, scatter into the pool.
    Returns (pool, n_added, n_overflow) where n_overflow counts wanted
    samples clipped by the `max_new` static cap (no silent caps)."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    flat_mask = sample_mask.reshape(-1)
    # the spawn cap cannot exceed the number of pixels
    max_new = min(max_new, flat_mask.shape[0])
    n_valid = jnp.sum(flat_mask.astype(jnp.int32))
    # random priority per pixel; masked-out pixels get +inf so the top
    # `max_new` candidates are a uniform sample of the masked set
    prio = jax.random.uniform(rng_key, flat_mask.shape)
    prio = jnp.where(flat_mask, prio, jnp.inf)
    idx = jnp.argsort(prio)[:max_new]
    n_want = (n_valid.astype(jnp.float32) * sample_ratio).astype(jnp.int32)
    n_select = jnp.minimum(n_want, max_new)
    n_overflow = n_want - n_select
    xyz = vertex_map.reshape(-1, 3)[idx]
    rgb = color_map.reshape(-1, 3)[idx]
    nrm = normal_map.reshape(-1, 3)[idx]
    # park non-selected rows far away so they don't contaminate the kNN
    # scale estimate of the real samples
    taken = (jnp.arange(max_new) < n_select)[:, None]
    xyz = jnp.where(taken, xyz, 1e6)
    min_s, max_s = scale_limits
    attrs = pmod.init_attributes(
        xyz, rgb, nrm, pool.sh_degree, default_opacity, max_s, min_s
    )
    return pmod.add(pool, attrs, n_select), n_select, n_overflow


@partial(jax.jit, donate_argnums=(0,))
def remove_redundant(
    pool: GaussianPool,
    small_scale_thres: jax.Array,
    large_scale_thres: jax.Array,
    low_opac_thres: jax.Array,
) -> tuple[GaussianPool, jax.Array]:
    """(removeRedundantGs, slam_pipeline.cpp:564-586)."""
    max_scale = jnp.exp(pool.scales).max(axis=-1)
    opac = jax.nn.sigmoid(pool.opacities[:, 0])
    mask = (
        (max_scale < small_scale_thres)
        | (max_scale > large_scale_thres)
        | (opac < low_opac_thres)
    ) & pool.alive
    n = jnp.sum(mask.astype(jnp.int32))
    return pmod.remove(pool, mask), n


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

class GaussianModel:
    """Host-side facade holding pool + config (RawGaussianModel role)."""

    # prefix-size buckets for the compact-pool fast path: the smallest
    # bucket >= n_alive bounds per-step cost by the live count while keeping
    # compiled shapes to a handful
    BUCKETS = (4096, 16384, 32768, 65536, 131072)

    def __init__(self, cfg: Config, width: int, height: int, exposure_num: int = 0):
        m = cfg.model
        self.cfg = cfg
        self.pool = pmod.create(cfg.tpu.gaussian_capacity, m.sh_degree, exposure_num)
        # splat kernel dispatch by where the pool actually lives — NOT
        # jax.default_backend() (the axon plugin answers 'tpu' even when
        # CPU is pinned); mirrors TsdfEngine._use_pallas_raycast
        try:
            on_tpu = next(
                iter(self.pool.params["means"].devices())).platform == "tpu"
        except Exception:
            on_tpu = False
        self.statics = RenderStatics(
            splat_impl="pallas" if on_tpu else "xla",
            width=width, height=height, sh_degree=m.sh_degree,
            tile_size=cfg.tpu.tile_size, max_gs_radii=m.max_gs_radii,
            delta_depth=m.delta_depth, use_exposure=m.use_exposure,
            visible_cap=min(cfg.tpu.gaussian_capacity, cfg.tpu.visible_gaussian_cap),
            tiles_per_gaussian_cap=cfg.tpu.tiles_per_gaussian_cap,
            tile_cap=cfg.tpu.tile_gaussian_cap,
            active_tile_cap=cfg.tpu.active_tile_cap,
        )
        self.tx = optim.make_optimizer(m, cfg.pipe.max_iterations)
        self.opt_state = None
        self._rng = jax.random.PRNGKey(cfg.dev_id)
        # the SLAM path keeps the pool compact (spawn appends into the free
        # tail, prune is followed by pmod.compact); offline densify breaks
        # the invariant (its Adam state is aligned to fixed rows)
        self.pool_compact = True

    @property
    def num_gaussians(self) -> int:
        return int(self.pool.n_alive)

    # -- async count cache: int(n_alive) is a synchronous host round trip
    # (~30 ms over the axon tunnel); the SLAM loop instead starts an async
    # device->host copy at the end of each window and reads it the NEXT
    # window.  Staleness is bounded by one window's spawns, covered by the
    # `extra` margin at the opt_cap call site.

    def refresh_count_async(self) -> None:
        a = self.pool.n_alive
        try:
            a.copy_to_host_async()
        except Exception:
            pass
        self._count_future = a

    @property
    def num_gaussians_cached(self) -> int:
        if getattr(self, "sync_counts", False):
            # deterministic mode (bench quality audits): a live count so
            # cap buckets never depend on when an async future landed
            return self.num_gaussians
        fut = getattr(self, "_count_future", None)
        if fut is not None:
            self._count_cache = int(fut)
            self._count_future = None
        return getattr(self, "_count_cache", 0)

    def opt_cap(self, extra: int = 0, cached: bool = False) -> int:
        """Smallest bucket covering the live prefix (+`extra` upcoming
        spawns); full capacity when the pool is not compact.  With
        `cached`, uses the async count (one window stale — pass the
        per-window spawn bound as `extra`)."""
        cap = self.pool.capacity
        if not self.pool_compact:
            return cap
        n = self.num_gaussians_cached if cached else self.num_gaussians
        need = n + extra
        for b in self.BUCKETS:
            if b >= need and b <= cap:
                return b
        return cap

    def init_optimizers(self) -> None:
        """Fresh Adam state (the reference re-inits every window,
        slam_pipeline.cpp:202)."""
        self.opt_state = self.tx.init(self.pool.params)

    def eval_slice(self, height: int | None = None, width: int | None = None):
        """(params, alive, statics) with the compact-prefix cap slicing the
        renderers rely on — shared by forward(), forward_batch() and the
        DP eval path (parallel.mesh.dp_render_fn)."""
        st = self.statics
        if height is not None and (height, width) != (st.height, st.width):
            # off-size request (e.g. remote viewer): recompile for the new
            # resolution; RenderStatics is hashable so the jit cache keeps
            # one entry per distinct size
            st = st._replace(height=height, width=width)
        cap = self.opt_cap()
        tile_w = -(-st.width // st.tile_size)
        tile_h = -(-st.height // st.tile_size)
        st = st._replace(active_tile_cap=min(
            tile_w * tile_h, max(st.active_tile_cap, cap // 8)
        ))
        if cap < self.pool.capacity:
            params = {k: (v if k == "exposure" else v[:cap])
                      for k, v in self.pool.params.items()}
            alive = self.pool.alive[:cap]
            st = st._replace(visible_cap=min(st.visible_cap, cap))
        else:
            params, alive = self.pool.params, self.pool.alive
        return params, alive, st

    def forward(self, c2w, K, ref_depth, base_color, cam_id: int = -1) -> dict:
        ref = jnp.asarray(ref_depth)
        if ref.ndim == 3:
            ref = ref[..., 0]
        params, alive, st = self.eval_slice(ref.shape[0], ref.shape[1])
        return ges_forward_jit(
            params, alive,
            jnp.asarray(c2w), jnp.asarray(K), ref,
            jnp.asarray(base_color), jnp.asarray(cam_id, jnp.int32), st,
        )

    def forward_batch(self, cam_batch: dict) -> dict:
        """Eval renders for stacked [M, ...] cameras as ONE device program
        (render_eval_batch) with forward()'s cap slicing applied."""
        H, W = cam_batch["ref_depth"].shape[1:3]
        params, alive, st = self.eval_slice(H, W)
        return render_eval_batch(params, alive, cam_batch, st)

    def next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    # -- persistence ---------------------------------------------------------

    def save(self, model_dir: str) -> None:
        """npz + torch-archive model.pt + 3DGS-viewer binary PLY
        (saveTensor raw_gs_param.cpp:220-238 / savePly :159-218).  model.pt
        is readable by the reference's RawGaussianParams::loadTensor."""
        os.makedirs(model_dir, exist_ok=True)
        alive = np.asarray(self.pool.alive)
        sel = np.nonzero(alive)[0]
        arrs = {k: np.asarray(v)[sel] if v.shape[0] == alive.shape[0] else np.asarray(v)
                for k, v in self.pool.params.items()}
        np.savez(os.path.join(model_dir, "model.npz"), **arrs)
        from ..utils import io as uio

        try:
            uio.save_model_pt(os.path.join(model_dir, "model.pt"), arrs)
        except Exception as e:  # torch missing/broken: npz+ply still written
            print(f"[WARN] model.pt not written ({e})")
        uio.save_gaussian_ply(
            os.path.join(model_dir, "point_cloud.ply"),
            arrs["means"], arrs["scales"], arrs["quats"],
            arrs["features_dc"], arrs["features_rest"], arrs["opacities"],
        )

    def _load_attrs(self, attrs: dict) -> None:
        n = attrs["means"].shape[0]
        attrs = dict(attrs)
        if attrs["opacities"].ndim == 1:   # pool convention is [N, 1]
            attrs["opacities"] = attrs["opacities"][:, None]
        exposure = attrs.pop("exposure", None)
        self.pool = pmod.create(self.pool.capacity, self.pool.sh_degree,
                                exposure.shape[0] if exposure is not None else 0)
        if exposure is not None:
            self.pool = self.pool.replace(exposure=jnp.asarray(exposure))
        self.pool = pmod.add(
            self.pool,
            {k: jnp.asarray(attrs[k]) for k in
             ("means", "scales", "quats", "features_dc", "features_rest",
              "opacities")},
            jnp.asarray(n, jnp.int32))

    def load(self, model_dir: str) -> None:
        """Open model.npz (ours), model.pt (ours or reference-written torch
        archive, raw_gs_param.cpp:240-254), or point_cloud.ply (any 3DGS
        model) — whichever exists, in that order."""
        from ..utils import io as uio

        npz = os.path.join(model_dir, "model.npz")
        pt = os.path.join(model_dir, "model.pt")
        ply = os.path.join(model_dir, "point_cloud.ply")
        if os.path.exists(npz):
            z = np.load(npz)
            attrs = {k: z[k] for k in z.files}
        elif os.path.exists(pt):
            attrs = uio.load_model_pt(pt)
        elif os.path.exists(ply):
            attrs = uio.load_gaussian_ply(ply)
        else:
            raise FileNotFoundError(
                f"no model.npz / model.pt / point_cloud.ply under {model_dir}")
        self._load_attrs(attrs)
