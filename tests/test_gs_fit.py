"""End-to-end Gaussian optimization: spawn Gaussians on a synthetic frame
and check that the local-window Adam loop drives the photometric loss down
(the offline analog of SLAMPipeline::localOptimize)."""

import jax
import jax.numpy as jnp
import numpy as np

from gps_slam_tpu.config import Config
from gps_slam_tpu.data import synthetic
from gps_slam_tpu.gs import losses, model as gmodel
from gps_slam_tpu.gs.model import GaussianModel


def _cfg(tmp="/tmp/x"):
    node = {
        "input_dir": "x", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": 3, "frame_step": 1,
        "intrinsics": [120.0, 120.0, 79.5, 59.5],
        "image_shape": [160, 120], "downscale_factor": 1, "test_split_interval": -1,
    }
    return Config.from_dict(synthetic.default_config_dict(tmp, node))


def test_spawn_and_optimize_reduces_loss(tmp_path):
    cams = synthetic.make_cameras(n_frames=3, width=160, height=120)
    cfg = _cfg(str(tmp_path))
    m = GaussianModel(cfg, 160, 120)

    cam = cams[0]
    fm = cam.get_frame_maps()
    # spawn from every 3rd pixel (mask), no SDF base (pure gaussian fit)
    mask = jnp.zeros((120, 160), bool).at[::2, ::2].set(True)
    m.pool, n_added, _ = gmodel.add_gaussians(
        m.pool, fm["vertex_map"], fm["color_map"], fm["normal_map"], mask,
        0.25, 2048, cfg.model.default_opacities,
        (cfg.model.min_init_scale, cfg.model.max_init_scale), m.next_rng(),
    )
    assert int(n_added) > 500
    assert int(m.pool.n_alive) == int(n_added)

    # optimization batch: one camera, empty SDF layer
    zero_depth = jnp.zeros((120, 160))
    black = jnp.zeros((120, 160, 3))
    batch = {
        "c2w": jnp.asarray(cam.c2w)[None],
        "K": jnp.asarray(cam.K)[None],
        "gt_rgb": jnp.asarray(cam.image)[None],
        "ref_depth": zero_depth[None],
        "base_color": black[None],
        "cam_id": jnp.zeros((1,), jnp.int32),
    }
    res0 = m.forward(cam.c2w, cam.K, zero_depth, black)
    loss0 = float(jnp.abs(res0["rgb"] - batch["gt_rgb"][0]).mean())

    idxs = jnp.zeros((60,), jnp.int32)
    m.pool, aux = gmodel.window_optimize(
        m.pool, batch, idxs, m.statics,
        gmodel.tx_cfg_tuple(cfg.model), cfg.pipe.max_iterations, 0.0, 0.0,
        m.opt_cap(), jnp.asarray(3, jnp.int32),
    )
    hist = np.asarray(aux["loss_hist"])
    assert hist[-1] < hist[0] * 0.7, hist[[0, -1]]

    res1 = m.forward(cam.c2w, cam.K, zero_depth, black)
    loss1 = float(jnp.abs(res1["rgb"] - batch["gt_rgb"][0]).mean())
    assert loss1 < loss0 * 0.75, (loss0, loss1)
    # overflow counters exposed
    assert int(res1["n_pairs"]) > 0


def test_window_optimize_pallas_interpret(tmp_path):
    """The full window optimizer must run and converge with the Mosaic
    splat kernels (interpret mode) — the exact configuration the TPU path
    dispatches (gs/splat_pallas.py), exercised through window_optimize's
    scan/custom-VJP/segment-sum plumbing rather than the bare rasterizer.
    Small shapes: interpret mode executes the kernel per-tile in Python."""
    W, H = 64, 48
    cams = synthetic.make_cameras(n_frames=1, width=W, height=H)
    cfg = _cfg(str(tmp_path))
    m = GaussianModel(cfg, W, H)
    m.statics = m.statics._replace(splat_impl="pallas_interpret")

    cam = cams[0]
    fm = cam.get_frame_maps()
    mask = jnp.zeros((H, W), bool).at[::4, ::4].set(True)
    m.pool, n_added, _ = gmodel.add_gaussians(
        m.pool, fm["vertex_map"], fm["color_map"], fm["normal_map"], mask,
        0.5, 512, cfg.model.default_opacities,
        (cfg.model.min_init_scale, cfg.model.max_init_scale), m.next_rng(),
    )
    assert int(n_added) > 50
    zero_depth = jnp.zeros((H, W))
    black = jnp.zeros((H, W, 3))
    batch = {
        "c2w": jnp.asarray(cam.c2w)[None],
        "K": jnp.asarray(cam.K)[None],
        "gt_rgb": jnp.asarray(cam.image)[None],
        "ref_depth": zero_depth[None],
        "base_color": black[None],
        "cam_id": jnp.zeros((1,), jnp.int32),
    }
    idxs = jnp.zeros((10,), jnp.int32)
    m.pool, aux = gmodel.window_optimize(
        m.pool, batch, idxs, m.statics,
        gmodel.tx_cfg_tuple(cfg.model), cfg.pipe.max_iterations, 0.0, 0.0,
        m.opt_cap(), jnp.asarray(cfg.model.sh_degree, jnp.int32),
    )
    hist = np.asarray(aux["loss_hist"])
    assert np.all(np.isfinite(hist)), hist
    assert hist[-1] < hist[0], hist[[0, -1]]


def test_tile_space_loss_matches_image_space(tmp_path):
    """The tile-space L1 path (rasterize.hoist_window_tiles +
    ges_splat_tiles, used by window_optimize when ssim/depth weights are 0)
    must produce the SAME loss value and parameter gradients as the
    image-space ges_forward + compute_loss composition, including edge
    tiles that overhang the image and the inactive-tile constant."""
    W, H = 100, 72  # NOT multiples of 16: exercises the crop mask
    cams = synthetic.make_cameras(n_frames=1, width=W, height=H)
    cfg = _cfg(str(tmp_path))
    m = GaussianModel(cfg, W, H)
    cam = cams[0]
    fm = cam.get_frame_maps()
    mask = jnp.zeros((H, W), bool).at[::5, ::5].set(True)
    m.pool, n_added, _ = gmodel.add_gaussians(
        m.pool, fm["vertex_map"], fm["color_map"], fm["normal_map"], mask,
        0.5, 512, cfg.model.default_opacities,
        (cfg.model.min_init_scale, cfg.model.max_init_scale), m.next_rng(),
    )
    assert int(n_added) > 50
    st = m.statics
    opt_cap = m.opt_cap()
    cparams = {k: (v if k == "exposure" else v[:opt_cap])
               for k, v in m.pool.params.items()}
    calive = m.pool.alive[:opt_cap]
    rng = np.random.default_rng(7)
    ref_depth = jnp.asarray(
        rng.uniform(0.5, 3.0, (H, W)).astype(np.float32))
    base_color = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    gt = jnp.asarray(cam.image)
    c2w, K = jnp.asarray(cam.c2w), jnp.asarray(cam.K)

    bins = gmodel.ges_bin(cparams, calive, c2w, K, st,
                          margin_px=st.bin_margin_px)

    def loss_image(p):
        res = gmodel.ges_forward(
            p, calive, c2w, K, ref_depth, base_color,
            jnp.zeros((), jnp.int32), st, bins=bins)
        return jnp.abs(res["rgb"] - gt).mean()

    from gps_slam_tpu.gs import rasterize

    ref_clamped = jnp.where(ref_depth < 0.01, 1000.0, ref_depth)
    hoist = rasterize.hoist_window_tiles(
        bins, ref_clamped, gt, base_color, W, H, st.tile_size, 64,
        calive.shape[0])

    def loss_tile(p):
        proj, radii, colors = gmodel._project_and_colors(
            p, calive, c2w, K, st)
        colors4 = jnp.concatenate([colors, proj.depths[:, None]], axis=1)
        out = rasterize.ges_splat_tiles(
            proj.means2d, proj.conics, colors4,
            jax.nn.sigmoid(p["opacities"][:, 0]), proj.depths, hoist,
            st.delta_depth,
            impl=st.splat_impl,
            tiles_per_gaussian_cap=st.tiles_per_gaussian_cap)
        rgb_t = (out[:, :3] + hoist["base_t"]) / (out[:, 4:5] + 1.0)
        diff = jnp.abs(rgb_t - hoist["gt_t"]) * hoist["pxmask"][:, None, :]
        return (jnp.sum(diff) + hoist["inactive_sum"]) / float(W * H * 3)

    v0, g0 = jax.value_and_grad(loss_image)(cparams)
    v1, g1 = jax.value_and_grad(loss_tile)(cparams)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for k in ("means", "scales", "quats", "features_dc", "opacities"):
        np.testing.assert_allclose(
            np.asarray(g0[k]), np.asarray(g1[k]), atol=1e-6, rtol=1e-4,
            err_msg=k)


def test_model_save_load_roundtrip(tmp_path):
    cams = synthetic.make_cameras(n_frames=1, width=160, height=120)
    cfg = _cfg(str(tmp_path))
    m = GaussianModel(cfg, 160, 120)
    fm = cams[0].get_frame_maps()
    mask = jnp.zeros((120, 160), bool).at[::4, ::4].set(True)
    m.pool, _, _ = gmodel.add_gaussians(
        m.pool, fm["vertex_map"], fm["color_map"], fm["normal_map"], mask,
        1.0, 512, 0.5, (-1.0, 0.05), m.next_rng(),
    )
    zd, bc = jnp.zeros((120, 160)), jnp.zeros((120, 160, 3))
    r0 = m.forward(cams[0].c2w, cams[0].K, zd, bc)

    m.save(str(tmp_path / "gs_model"))
    assert (tmp_path / "gs_model" / "point_cloud.ply").exists()

    m2 = GaussianModel(cfg, 160, 120)
    m2.load(str(tmp_path / "gs_model"))
    assert m2.num_gaussians == m.num_gaussians
    r1 = m2.forward(cams[0].c2w, cams[0].K, zd, bc)
    np.testing.assert_allclose(
        np.asarray(r0["rgb"]), np.asarray(r1["rgb"]), atol=1e-5
    )


def test_remove_redundant(tmp_path):
    cfg = _cfg(str(tmp_path))
    m = GaussianModel(cfg, 160, 120)
    from gps_slam_tpu.gs import params as pmod

    n = 20
    attrs = pmod.init_attributes(
        jnp.asarray(np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)),
        jnp.full((n, 3), 0.5), None, cfg.model.sh_degree, 0.5, 0.05, -1.0,
    )
    # make some too small / too large / too transparent
    attrs["scales"] = attrs["scales"].at[0:3].set(jnp.log(1e-5))
    attrs["scales"] = attrs["scales"].at[3:6].set(jnp.log(10.0))
    attrs["opacities"] = attrs["opacities"].at[6:9].set(-20.0)
    m.pool = pmod.add(m.pool, attrs, jnp.asarray(n, jnp.int32))
    m.pool, removed = gmodel.remove_redundant(
        m.pool,
        jnp.asarray(cfg.pipe.remove_small_scale_thres),
        jnp.asarray(cfg.pipe.remove_large_scale_thres),
        jnp.asarray(cfg.pipe.remove_low_opac_thres),
    )
    assert int(removed) == 9
    assert int(m.pool.n_alive) == n - 9
