"""Classic (raw) 3DGS path: depth-ordered compositing, densify, offline
trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from gps_slam_tpu.config import Config
from gps_slam_tpu.data import synthetic
from gps_slam_tpu.gs import densify as dmod, params as pmod, rasterize_classic as rcl
from gps_slam_tpu.gs.model import GaussianModel
from gps_slam_tpu.slam.offline import OfflinePipeline


def test_classic_compositing_order():
    """A nearer opaque gaussian must occlude a farther one at the center."""
    means2d = jnp.array([[8.0, 8.0], [8.0, 8.0]])
    conics = jnp.tile(jnp.array([[0.5, 0.0, 0.5]]), (2, 1))
    # gaussian 0 red at depth 1; gaussian 1 green at depth 3
    colors4 = jnp.array([[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 3.0]])
    opac = jnp.array([0.95, 0.95])
    radii = jnp.full((2,), 8, jnp.int32)
    depths = jnp.array([1.0, 3.0])
    bins = rcl.bin_gaussians_depth(means2d, radii, depths, 16, 1, 1, 8, 16, 8)
    render, alpha = rcl.classic_rasterize(means2d, conics, colors4, opac, bins, 16, 16)
    center = np.asarray(render[8, 8])
    # at the center pixel alpha = 0.95*exp(-0.125) = 0.838: front-to-back
    # gives red 0.838, green only (1-0.838)*0.838 = 0.136
    assert center[0] > 0.8
    assert center[1] < 0.2
    assert center[0] > 4 * center[1]
    # and with reversed declared depths the green wins
    bins2 = rcl.bin_gaussians_depth(means2d, radii, jnp.array([3.0, 1.0]), 16, 1, 1, 8, 16, 8)
    render2, _ = rcl.classic_rasterize(means2d, conics, colors4, opac, bins2, 16, 16)
    c2 = np.asarray(render2[8, 8])
    assert c2[1] > 0.8 and c2[1] > 4 * c2[0]


def test_classic_matches_dense_reference(rng):
    """Tiled classic compositing vs a dense sorted numpy oracle."""
    H, W = 32, 48
    n = 20
    means2d = np.stack([rng.uniform(2, W - 2, n), rng.uniform(2, H - 2, n)], -1).astype(np.float32)
    a = rng.uniform(0.15, 0.5, n)
    c = rng.uniform(0.15, 0.5, n)
    conics = np.stack([a, np.zeros(n), c], -1).astype(np.float32)
    colors4 = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    depths = rng.uniform(0.5, 5.0, n).astype(np.float32)
    radii = np.full(n, 10, np.int32)

    bins = rcl.bin_gaussians_depth(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        16, 3, 2, 32, 16, 32,
    )
    render, alpha = rcl.classic_rasterize(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors4),
        jnp.asarray(opac), bins, W, H, 16, chunk=2,
    )
    # dense oracle: global front-to-back order
    order = np.argsort(depths)
    out = np.zeros((H, W, 4))
    T = np.ones((H, W))
    px, py = np.arange(W) + 0.5, np.arange(H) + 0.5
    for g in order:
        dx = means2d[g, 0] - px[None, :]
        dy = means2d[g, 1] - py[:, None]
        sig = 0.5 * (conics[g, 0] * dx ** 2 + conics[g, 2] * dy ** 2)
        al = np.minimum(0.999, opac[g] * np.exp(-sig))
        keep = (al >= 1 / 255) & (T >= 1e-4)
        al = np.where(keep, al, 0.0)
        out += (al * T)[..., None] * colors4[g]
        T = T * (1 - al)
    np.testing.assert_allclose(np.asarray(render), out[..., :4], atol=2e-3)
    np.testing.assert_allclose(np.asarray(alpha), 1 - T, atol=2e-3)


def test_densify_step(rng):
    pool = pmod.create(256, sh_degree=1)
    attrs = pmod.init_attributes(
        jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32)),
        jnp.full((20, 3), 0.5), None, 1, 0.5, 0.5, -1.0,
    )
    # gaussians 0-4 small (clone candidates), 5-9 large (split candidates)
    attrs["scales"] = attrs["scales"].at[:5].set(jnp.log(0.001))
    attrs["scales"] = attrs["scales"].at[5:10].set(jnp.log(0.5))
    pool = pmod.add(pool, attrs, jnp.asarray(20, jnp.int32))
    grad2d = jnp.zeros(256).at[:10].set(1.0)  # high grad on first 10
    viscnt = jnp.ones(256)
    pool, touched, stats = dmod.densify_step(
        pool, grad2d, viscnt, jax.random.PRNGKey(0), jnp.asarray(1.0),
        jnp.asarray([0.5, 0.01, 0.05, 0.005]), 64, jnp.asarray(False),
    )
    assert int(stats["n_dup"]) == 5
    assert int(stats["n_split"]) == 5
    assert int(stats["n_pruned"]) == 5  # split originals pruned
    # net: 20 + 5 clones + 10 split-children - 5 originals = 30
    assert int(pool.n_alive) == 30
    assert bool(touched.any())


def test_offline_raw_training_reduces_loss(tmp_path):
    cams = synthetic.make_cameras(n_frames=3, width=96, height=72)
    node = {
        "input_dir": "x", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": 2, "frame_step": 1,
        "intrinsics": [cams[0].fx, cams[0].fy, cams[0].cx, cams[0].cy],
        "image_shape": [96, 72], "downscale_factor": 1, "test_split_interval": -1,
    }
    cfg_dict = synthetic.default_config_dict(str(tmp_path), node)
    cfg_dict["MODEL"]["render_method"] = "raw"
    cfg_dict["PIPE"]["max_iterations"] = 50
    cfg_dict["PIPE"]["enable_densify"] = True
    cfg_dict["MODEL"]["densify_start_iter"] = 10
    cfg_dict["MODEL"]["densify_interval"] = 20
    cfg_dict["MODEL"]["densify_end_iter"] = 45
    cfg_dict["MODEL"]["reset_opacity_interval"] = 1000
    cfg = Config.from_dict(cfg_dict)

    model = GaussianModel(cfg, 96, 72)
    # init from frame-0 backprojection
    from gps_slam_tpu.gs import model as gmodel

    fm = cams[0].get_frame_maps()
    mask = jnp.zeros((72, 96), bool).at[::3, ::3].set(True)
    model.pool, _, _ = gmodel.add_gaussians(
        model.pool, fm["vertex_map"], fm["color_map"], fm["normal_map"], mask,
        1.0, 1024, 0.5, (-1.0, 0.05), model.next_rng(),
    )
    n0 = model.num_gaussians

    pipe = OfflinePipeline(cfg, str(tmp_path))
    from gps_slam_tpu.gs.losses import psnr

    r0 = gmodel.raw_forward(model.pool.params, model.pool.alive,
                            jnp.asarray(cams[0].c2w), jnp.asarray(cams[0].K),
                            jnp.asarray(0), model.statics)
    p0 = float(psnr(jnp.clip(r0["rgb"], 0, 1), jnp.asarray(cams[0].image)))
    pipe.raw_train_cams(model, cams)
    r1 = gmodel.raw_forward(model.pool.params, model.pool.alive,
                            jnp.asarray(cams[0].c2w), jnp.asarray(cams[0].K),
                            jnp.asarray(0), model.statics)
    p1 = float(psnr(jnp.clip(r1["rgb"], 0, 1), jnp.asarray(cams[0].image)))
    assert p1 > p0 + 1.0, (p0, p1)
