"""Offline trainer base — the reference's Pipeline (src/pipeline.cpp):

rawTrainCams (:155-226): classic 3DGS training — max_iterations Adam steps,
one random camera each, optional densify (clone/split/prune + opacity
reset) driven by accumulated screen-space gradient statistics.

gesTrainCams (:229-319): the same loop but rendering with the GES method
against precomputed raycast targets (SDF depth + color per camera).

TPU shape: one jitted iteration step (value_and_grad incl. a means2d grad
probe for densify stats) that is reused across iterations; densify runs as
its own jitted step every densify_interval iters, with optimizer-state
rows zeroed for touched pool slots (the fixed-pool analog of the
reference's optimizer surgery).
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.reader import DatasetReader, RandomSelector
from ..gs import densify as dmod, losses, model as gmodel, optim
from ..gs.model import GaussianModel
from ..utils import io as uio


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7),
         static_argnames=("want_probe_grad",), donate_argnums=(0, 1))
def _train_iter(
    pool, opt_state, cam, st, tx_cfg, max_iterations, ssim_weight, method,
    ref_depth=None, base_color=None, want_probe_grad=False,
    active_sh_degree=None,
):
    """One offline training iteration.  Returns (pool, opt_state, loss,
    probe_grad, radii).  `active_sh_degree` carries the offline SH
    warm-up ramp (updateSH(curr_iter), include/raw_gs_model.h:26-32 via
    src/pipeline.cpp:196,294) as a traced scalar so the ramp never
    recompiles."""
    tx = optim.make_optimizer(gmodel._TxCfg(*tx_cfg), max_iterations)
    probe = jnp.zeros((pool.capacity, 2))

    def loss_fn(params, probe):
        if method == "raw":
            res = gmodel.raw_forward(params, pool.alive, cam["c2w"], cam["K"],
                                     cam["cam_id"], st, means2d_probe=probe,
                                     active_sh_degree=active_sh_degree)
        else:
            res = gmodel.ges_forward(params, pool.alive, cam["c2w"], cam["K"],
                                     ref_depth, base_color, cam["cam_id"], st,
                                     active_sh_degree=active_sh_degree)
        loss = losses.compute_loss(res["rgb"], res["depth"], cam["gt_rgb"],
                                   None, ssim_weight, 0.0)
        return loss["total"], res["radii"]

    if method == "raw" and want_probe_grad:
        (lval, radii), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            pool.params, probe
        )
        param_grads, probe_grad = grads
    else:
        (lval, radii), param_grads = jax.value_and_grad(loss_fn, has_aux=True)(
            pool.params, probe
        )
        probe_grad = probe
    updates, opt_state = tx.update(param_grads, opt_state, pool.params)
    params = optax.apply_updates(pool.params, updates)
    return pool.with_params(params), opt_state, lval, probe_grad, radii


class OfflinePipeline:
    """Pipeline base (src/pipeline.cpp:5-54 loadConfig/save)."""

    def __init__(self, cfg: Config, workspace_dir: str):
        self.cfg = cfg
        self.workspace_dir = workspace_dir
        self.model_path = workspace_dir + cfg.pipe.model_path
        self.eval_path = workspace_dir + cfg.pipe.eval_path
        self.log_path = workspace_dir + cfg.pipe.log_path
        self.curr_iter = 0
        self.scene_scale = 1.0
        self._rng = np.random.default_rng(cfg.dev_id + 7)
        os.makedirs(self.log_path, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.log_path)
        except Exception:
            self._tb = None
        self._loss_buf: list = []  # (iter, device scalar) pairs

    # -- logging (logResults / logScalars, src/pipeline.cpp:57-152) -----------

    def _log_scalar_lazy(self, lval) -> None:
        """Buffer the device loss scalar; bulk-fetch at image-log points
        (fetching every iteration would serialize the async dispatch
        queue on a ~25 ms host<->device round trip)."""
        self._loss_buf.append((self.curr_iter, lval))

    def _flush_scalars(self) -> None:
        if self._tb is None:
            self._loss_buf.clear()
            return
        for it, lv in self._loss_buf:
            self._tb.add_scalar("loss/total", float(np.asarray(lv)), it)
        self._loss_buf.clear()

    def log_results(self, model: GaussianModel, cam, render_res: dict,
                    log_mode: str = "auto") -> None:
        """(logResults, src/pipeline.cpp:57-129): TB scalars every call;
        comparison images (color comp, alpha jet, depth comp) to log_path
        as frame{ID}_iter{N}.*.jpg every log_iter iterations."""
        from ..utils import vis

        p = self.cfg.pipe
        self._flush_scalars()
        if self._tb is not None:
            self._tb.add_scalar("gs_num", model.num_gaussians, self.curr_iter)
        if log_mode == "only scalar":
            return
        log_image = (
            log_mode == "scaler and image"
            or (log_mode == "auto"
                and (self.curr_iter % p.log_iter == 0
                     or self.curr_iter + 1 == p.max_iterations))
        )
        if not log_image:
            return
        frame_id = getattr(cam, "get_frame_id", lambda: str(getattr(cam, "id", 0)))()
        base = os.path.join(
            self.log_path, f"frame{frame_id}_iter{self.curr_iter}")
        rgb = np.clip(np.asarray(render_res["rgb"]), 0.0, 1.0)
        gt = np.asarray(cam.image)
        vis.imwrite_rgb(base + ".color.jpg",
                        vis.color_comp_img(rgb, gt, 0.0, p.color_error_max))
        if "alpha" in render_res and render_res["alpha"] is not None:
            alpha = np.asarray(render_res["alpha"])
            vis.imwrite_rgb(base + ".alpha.jpg",
                            vis.jet(alpha, 0.0, p.alpha_vis_max))
        if "depth" in render_res and render_res["depth"] is not None:
            dep = np.asarray(render_res["depth"])
            if getattr(cam, "depth", None) is not None:
                gtd = np.asarray(cam.depth)
                gtd = gtd[..., 0] if gtd.ndim == 3 else gtd
                vis.imwrite_rgb(
                    base + ".depth.jpg",
                    vis.depth_comp_img(dep, gtd, p.depth_vis_min,
                                       p.depth_vis_max, 0.0,
                                       p.depth_error_max))
            else:
                vis.imwrite_rgb(base + ".depth.jpg",
                                vis.jet(dep, p.depth_vis_min, p.depth_vis_max))

    # -- raw mode -------------------------------------------------------------

    def raw_train_cams(self, model: GaussianModel, cams: list) -> None:
        cfg = self.cfg
        m = cfg.model
        model.init_optimizers()
        selector = RandomSelector(list(range(len(cams))), self._rng)
        grad_2d = jnp.zeros((model.pool.capacity,))
        vis_count = jnp.zeros((model.pool.capacity,))
        tx_cfg = gmodel.tx_cfg_tuple(m)
        densify_on = cfg.pipe.enable_densify
        if densify_on:
            # densify's Adam-moment surgery is aligned to fixed pool rows —
            # the compact-prefix fast path must not permute them
            model.pool_compact = False

        cam_dev = [
            {
                "c2w": jnp.asarray(c.c2w), "K": jnp.asarray(c.K),
                "gt_rgb": jnp.asarray(c.image),
                "cam_id": jnp.asarray(c.id, jnp.int32),
            }
            for c in cams
        ]
        while self.curr_iter < cfg.pipe.max_iterations:
            it = self.curr_iter
            if cfg.pipe.selected_cam_idx >= 0:
                ci = cfg.pipe.selected_cam_idx
            else:
                ci, _ = selector.get_next()
            want_grad = densify_on and it < m.densify_end_iter
            model.pool, model.opt_state, lval, probe_grad, radii = _train_iter(
                model.pool, model.opt_state, cam_dev[ci], model.statics, tx_cfg,
                cfg.pipe.max_iterations, cfg.pipe.ssim_weight, "raw",
                want_probe_grad=want_grad,
                active_sh_degree=jnp.asarray(
                    min(it // max(m.sh_degree_interval, 1), m.sh_degree),
                    jnp.int32),
            )
            self._log_scalar_lazy(lval)
            if (it % cfg.pipe.log_iter == 0 or it + 1 == cfg.pipe.max_iterations):
                res = gmodel.raw_forward_jit(
                    model.pool.params, model.pool.alive, cam_dev[ci]["c2w"],
                    cam_dev[ci]["K"], cam_dev[ci]["cam_id"], model.statics,
                    active_sh_degree=jnp.asarray(
                        min(it // max(m.sh_degree_interval, 1), m.sh_degree),
                        jnp.int32))
                self.log_results(model, cams[ci],
                                 {"rgb": res["rgb"], "depth": res.get("depth"),
                                  "alpha": res.get("alpha")})
            if want_grad:
                # updateDensifyGrad (raw_gs_model.cpp:459-503)
                vis = radii > 0
                img_scale = jnp.asarray(
                    [model.statics.width / 2.0, model.statics.height / 2.0]
                )
                gnorm = jnp.linalg.norm(probe_grad * img_scale, axis=-1)
                grad_2d = jnp.where(vis, grad_2d + gnorm, grad_2d)
                vis_count = jnp.where(vis, vis_count + 1.0, vis_count)
                if it % m.densify_interval == 0 and it > m.densify_start_iter:
                    pause = it % m.reset_opacity_interval < dmod.PAUSE_REFINE_AFTER_RESET
                    if not pause:
                        model.pool, touched, stats = dmod.densify_step(
                            model.pool, grad_2d, vis_count, model.next_rng(),
                            jnp.asarray(self.scene_scale),
                            jnp.asarray([
                                m.densify_grad_thres, m.densify_large_thres,
                                m.split_screen_size, m.prune_opacity_thres,
                            ]),
                            self.cfg.tpu.max_new_gaussians,
                            jnp.asarray(it > m.reset_opacity_interval),
                        )
                        model.opt_state = optim.zero_state_rows(model.opt_state, touched)
                    grad_2d = jnp.zeros_like(grad_2d)
                    vis_count = jnp.zeros_like(vis_count)
                if it > 0 and it % m.reset_opacity_interval == 0:
                    model.pool = dmod.reset_opacities(
                        model.pool, jnp.asarray(2.0 * m.prune_opacity_thres)
                    )
            self.curr_iter += 1

    # -- ges mode (offline, precomputed raycast targets) -----------------------

    def ges_train_cams(self, model: GaussianModel, cams: list,
                       raycast_targets: list[dict]) -> None:
        """(gesTrainCams, pipeline.cpp:229-319): like raw training but with
        the GES renderer against per-camera SDF raycast depth/color."""
        cfg = self.cfg
        model.init_optimizers()
        m = cfg.model
        selector = RandomSelector(list(range(len(cams))), self._rng)
        tx_cfg = gmodel.tx_cfg_tuple(cfg.model)
        cam_dev = [
            {
                "c2w": jnp.asarray(c.c2w), "K": jnp.asarray(c.K),
                "gt_rgb": jnp.asarray(c.image),
                "cam_id": jnp.asarray(c.id, jnp.int32),
            }
            for c in cams
        ]
        while self.curr_iter < cfg.pipe.max_iterations:
            if cfg.pipe.selected_cam_idx >= 0:
                ci = cfg.pipe.selected_cam_idx
            else:
                ci, _ = selector.get_next()
            rt = raycast_targets[ci]
            model.pool, model.opt_state, lval, _, _ = _train_iter(
                model.pool, model.opt_state, cam_dev[ci], model.statics, tx_cfg,
                cfg.pipe.max_iterations, cfg.pipe.ssim_weight, "ges",
                ref_depth=rt["depth_map"][..., 0] if rt["depth_map"].ndim == 3
                else rt["depth_map"],
                base_color=rt["color_map"],
                active_sh_degree=jnp.asarray(
                    min(self.curr_iter // max(m.sh_degree_interval, 1),
                        m.sh_degree), jnp.int32),
            )
            self._log_scalar_lazy(lval)
            if (self.curr_iter % cfg.pipe.log_iter == 0
                    or self.curr_iter + 1 == cfg.pipe.max_iterations):
                res = gmodel.ges_forward_jit(
                    model.pool.params, model.pool.alive, cam_dev[ci]["c2w"],
                    cam_dev[ci]["K"],
                    rt["depth_map"][..., 0] if rt["depth_map"].ndim == 3
                    else rt["depth_map"],
                    rt["color_map"], cam_dev[ci]["cam_id"], model.statics,
                    active_sh_degree=jnp.asarray(
                        min(self.curr_iter // max(m.sh_degree_interval, 1),
                            m.sh_degree), jnp.int32))
                self.log_results(model, cams[ci],
                                 {"rgb": res["rgb"], "depth": res.get("depth"),
                                  "alpha": res.get("alpha")})
            self.curr_iter += 1

    def save(self, model: GaussianModel, reader: DatasetReader) -> None:
        self._flush_scalars()
        model.save(self.model_path)
        uio.save_cameras_json(reader.train_vec,
                              os.path.join(self.model_path, "cameras.json"))
        uio.save_cfg_args(os.path.join(self.model_path, "cfg_args"),
                          self.cfg.model.sh_degree)
