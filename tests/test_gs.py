import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gps_slam_tpu.gs import losses, params as pmod, projection, rasterize, sh
from gps_slam_tpu.gs.knn import mean_dist_sq_3nn
from gps_slam_tpu.gs.model import RenderStatics, ges_forward


def test_sh_degree0_is_constant(rng):
    n = 32
    coeffs = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    c0 = sh.eval_sh(0, dirs, coeffs)
    np.testing.assert_allclose(
        np.asarray(c0), np.asarray(sh.C0 * coeffs[:, 0]), atol=1e-6
    )
    # rgb -> sh -> rgb roundtrip
    rgb = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6
    )


def test_sh_rotation_invariance_of_dc_plus_band1(rng):
    """Band-1 SH must reproduce a linear function of direction."""
    n = 8
    coeffs = jnp.zeros((n, 4, 3)).at[:, 1, :].set(1.0)
    d1 = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    out = sh.eval_sh(1, d1, coeffs)
    np.testing.assert_allclose(np.asarray(out[:, 0]), -sh.C1, atol=1e-6)


def test_knn_regular_grid():
    # points on a grid with spacing h: mean squared 3NN distance = h^2
    h = 0.25
    g = np.stack(np.meshgrid(*[np.arange(5) * h] * 3, indexing="ij"), -1).reshape(-1, 3)
    d2 = np.asarray(mean_dist_sq_3nn(jnp.asarray(g.astype(np.float32))))
    np.testing.assert_allclose(d2, h * h, rtol=1e-4)


def _single_gaussian_setup():
    means = jnp.array([[0.0, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.array([[0.1, 0.1, 0.1]])
    viewmat = jnp.eye(4)
    K = jnp.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1.0]])
    return means, quats, scales, viewmat, K


def test_projection_single_gaussian():
    means, quats, scales, viewmat, K = _single_gaussian_setup()
    proj = projection.project(means, quats, scales, viewmat, K, 64, 64)
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [32.0, 32.0], atol=1e-5)
    np.testing.assert_allclose(float(proj.depths[0]), 2.0, atol=1e-6)
    # isotropic gaussian: 2d cov = (s*f/z)^2 = 25 (+0.3 blur); radius = 3*sqrt
    expected_r = np.ceil(3 * np.sqrt(25.0 + 0.3))
    assert int(proj.radii[0]) == int(expected_r)
    # conic = 1 / (25 + 0.3) on diagonal
    np.testing.assert_allclose(
        np.asarray(proj.conics[0]), [1 / 25.3, 0.0, 1 / 25.3], atol=1e-6
    )


def test_projection_culling():
    means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 2.0], [10.0, 0.0, 0.5]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (3, 1))
    scales = jnp.full((3, 3), 0.05)
    viewmat = jnp.eye(4)
    K = jnp.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1.0]])
    proj = projection.project(means, quats, scales, viewmat, K, 64, 64)
    r = np.asarray(proj.radii)
    assert r[0] == 0      # behind camera
    assert r[1] > 0       # visible
    assert r[2] == 0      # far off screen


def _dense_reference_render(means2d, conics, colors4, opac, depths, ref_clamped,
                            delta_depth, H, W):
    """O(N*H*W) dense GES render — the oracle for the tiled implementation."""
    px = np.arange(W) + 0.5
    py = np.arange(H) + 0.5
    out = np.zeros((H, W, 4))
    wsum = np.zeros((H, W))
    for g in range(means2d.shape[0]):
        dx = means2d[g, 0] - px[None, :]
        dy = means2d[g, 1] - py[:, None]
        A, B, C = conics[g]
        sigma = 0.5 * (A * dx ** 2 + C * dy ** 2) + B * dx * dy
        alpha = np.minimum(0.999, opac[g] * np.exp(-sigma))
        keep = (sigma >= 0) & (alpha >= 1 / 255) & (depths[g] <= ref_clamped + delta_depth)
        a = np.where(keep, alpha, 0.0)
        out += a[..., None] * colors4[g]
        wsum += a
    return out, wsum


def test_tiled_rasterizer_matches_dense_reference(rng):
    H, W = 48, 64
    n = 60
    means2d = jnp.asarray(
        np.stack([rng.uniform(-5, W + 5, n), rng.uniform(-5, H + 5, n)], -1).astype(np.float32)
    )
    # random PSD conics; lower bound chosen so alpha < 1/255 beyond the
    # 12-px binning radius (tile truncation at the bbox is inherent to
    # tile-based rasterization — the reference truncates at 3 sigma too)
    a = rng.uniform(0.09, 0.5, n)
    c = rng.uniform(0.09, 0.5, n)
    b = rng.uniform(-1, 1, n) * np.sqrt((a - 0.08) * (c - 0.08)) * 0.8
    conics = jnp.asarray(np.stack([a, b, c], -1).astype(np.float32))
    colors4 = jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 3.0, n).astype(np.float32))
    radii = jnp.full((n,), 12, jnp.int32)
    ref = jnp.asarray(rng.uniform(0.4, 4.0, (H, W)).astype(np.float32))

    tw, th = -(-W // 16), -(-H // 16)
    bins = rasterize.bin_gaussians(means2d, radii, 16, tw, th, 128, 16, 64)
    assert int(bins.n_tile_overflow) == 0
    out, wsum = rasterize.ges_rasterize(
        means2d, conics, colors4, opac, bins, ref, depths, 0.1, W, H, 16, chunk=4
    )
    ref_out, ref_wsum = _dense_reference_render(
        *(np.asarray(x) for x in (means2d, conics, colors4, opac, depths, ref)),
        0.1, H, W,
    )
    np.testing.assert_allclose(np.asarray(wsum), ref_wsum, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4)


def test_rasterizer_depth_cut():
    """A Gaussian behind the SDF surface must not contribute."""
    H = W = 16
    means2d = jnp.array([[8.0, 8.0]])
    conics = jnp.array([[0.5, 0.0, 0.5]])
    colors4 = jnp.array([[1.0, 0.0, 0.0, 5.0]])  # depth channel 5
    opac = jnp.array([0.9])
    radii = jnp.full((1,), 8, jnp.int32)
    bins = rasterize.bin_gaussians(means2d, radii, 16, 1, 1, 8, 16, 8)
    # surface at depth 1 -> gaussian at depth 5 is cut
    out, wsum = rasterize.ges_rasterize(
        means2d, conics, colors4, opac, bins, jnp.full((H, W), 1.0),
        jnp.array([5.0]), 0.1, W, H, 16,
    )
    assert float(jnp.abs(wsum).max()) == 0.0
    # no surface (ref clamped to 1000) -> contributes
    out2, wsum2 = rasterize.ges_rasterize(
        means2d, conics, colors4, opac, bins, jnp.full((H, W), 1000.0),
        jnp.array([5.0]), 0.1, W, H, 16,
    )
    assert float(wsum2.max()) > 0.5


def _dense_jnp_render(means2d, conics, colors4, opac, depths, ref, delta, H, W):
    """Differentiable dense GES render (no binning) — autodiff oracle."""
    px = jnp.arange(W) + 0.5
    py = jnp.arange(H) + 0.5
    dx = means2d[:, 0][:, None, None] - px[None, None, :]
    dy = means2d[:, 1][:, None, None] - py[None, :, None]
    A, B, C = conics[:, 0, None, None], conics[:, 1, None, None], conics[:, 2, None, None]
    sigma = 0.5 * (A * dx ** 2 + C * dy ** 2) + B * dx * dy
    alpha = jnp.minimum(0.999, opac[:, None, None] * jnp.exp(-sigma))
    keep = (sigma >= 0) & (alpha >= 1 / 255) & (
        depths[:, None, None] <= ref[None] + delta
    )
    a = jnp.where(keep, alpha, 0.0)
    out = jnp.einsum("ghw,gc->hwc", a, colors4)
    return out, a.sum(0)


def test_rasterizer_gradients_match_dense_autodiff(rng):
    """The tiled gather/scatter machinery must produce the same gradients
    as direct autodiff of the dense math.  (The alpha cutoff at 1/255 is a
    true discontinuity — inherited from the reference kernel — so plain
    finite differences are only valid for the continuous color path,
    which is spot-checked at the end.)"""
    H, W = 32, 32
    n = 8
    means2d0 = np.stack(
        [rng.uniform(4, W - 4, n), rng.uniform(4, H - 4, n)], -1
    ).astype(np.float32)
    conics0 = np.tile(np.array([0.25, 0.02, 0.3], np.float32), (n, 1))
    colors0 = rng.uniform(0.2, 0.8, (n, 4)).astype(np.float32)
    opac0 = rng.uniform(0.3, 0.9, n).astype(np.float32)
    depths = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))
    radii = jnp.full((n,), 24, jnp.int32)  # large: every tile covered
    ref = jnp.full((H, W), 1000.0)
    tw, th = 2, 2
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 4)).astype(np.float32))

    bins = rasterize.bin_gaussians(jnp.asarray(means2d0), radii, 16, tw, th, 32, 16, 32)

    def loss_tiled(m2d, cn, col, op):
        out, wsum = rasterize.ges_rasterize(
            m2d, cn, col, op, bins, ref, depths, 0.1, W, H, 16, chunk=2
        )
        return jnp.sum((out - target) ** 2) + 0.3 * jnp.sum(wsum)

    def loss_dense(m2d, cn, col, op):
        out, wsum = _dense_jnp_render(m2d, cn, col, op, depths, ref, 0.1, H, W)
        return jnp.sum((out - target) ** 2) + 0.3 * jnp.sum(wsum)

    args = tuple(jnp.asarray(a) for a in (means2d0, conics0, colors0, opac0))
    g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(*args)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    for gt, gd in zip(g_tiled, g_dense):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gd), rtol=2e-4, atol=1e-4)

    # FD spot-check on the continuous color path
    g_col = np.asarray(g_tiled[2])
    for j in rng.choice(colors0.size, size=4, replace=False):
        eps = 2e-3
        cp, cm = colors0.reshape(-1).copy(), colors0.reshape(-1).copy()
        cp[j] += eps
        cm[j] -= eps
        lp = float(loss_tiled(args[0], args[1], jnp.asarray(cp.reshape(colors0.shape)), args[3]))
        lm = float(loss_tiled(args[0], args[1], jnp.asarray(cm.reshape(colors0.shape)), args[3]))
        fd = (lp - lm) / (2 * eps)
        an = float(g_col.reshape(-1)[j])
        assert abs(fd - an) <= 2e-2 * max(1.0, abs(fd), abs(an)), (j, fd, an)


def test_pool_add_remove(rng):
    pool = pmod.create(64, sh_degree=1)
    attrs = pmod.init_attributes(
        jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(10, 3)).astype(np.float32)),
        None, 1, 0.5, 0.1, -1.0,
    )
    pool = pmod.add(pool, attrs, jnp.asarray(10, jnp.int32))
    assert int(pool.n_alive) == 10
    # remove half
    mask = jnp.zeros(64, bool).at[:5].set(True)
    pool = pmod.remove(pool, mask)
    assert int(pool.n_alive) == 5
    # re-add into freed slots
    pool = pmod.add(pool, attrs, jnp.asarray(10, jnp.int32))
    assert int(pool.n_alive) == 15
    # capacity overflow drops
    big = {k: jnp.tile(v[:1], (100,) + (1,) * (v.ndim - 1)) for k, v in attrs.items()}
    pool = pmod.add(pool, big, jnp.asarray(100, jnp.int32))
    assert int(pool.n_alive) == 64


def test_ges_forward_end_to_end_blend(rng):
    """With zero gaussians the render must equal the SDF base layer /(0+1)."""
    H = W = 32
    pool = pmod.create(32, sh_degree=1)
    st = RenderStatics(
        width=W, height=H, sh_degree=1, tile_size=16, max_gs_radii=100,
        delta_depth=0.1, use_exposure=False, visible_cap=32,
        tiles_per_gaussian_cap=16, tile_cap=16,
    )
    base = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    refd = jnp.asarray(rng.uniform(0.5, 2.0, (H, W)).astype(np.float32))
    res = ges_forward(
        pool.params, pool.alive, jnp.eye(4),
        jnp.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]]),
        refd, base, jnp.asarray(0, jnp.int32), st,
    )
    np.testing.assert_allclose(np.asarray(res["rgb"]), np.asarray(base), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["depth"]), np.asarray(refd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["alpha"]), 0.0, atol=1e-7)


def test_ssim_identity(rng):
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    m = losses.ssim_map(img, img)
    np.testing.assert_allclose(np.asarray(m), 1.0, atol=1e-4)
    # different images -> < 1
    img2 = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert float(losses.ssim_map(img, img2).mean()) < 0.9


def test_active_rasterize_matches_dense(rng):
    """ges_rasterize_active over active tiles == dense ges_rasterize over
    the full grid (inactive tiles contribute exact zeros)."""
    H, W = 64, 96
    tw, th = W // 16, H // 16
    n = 40
    means2d = jnp.asarray(
        rng.uniform([8, 8], [W - 8, H - 8], (n, 2)).astype(np.float32)
    )
    conics = jnp.tile(jnp.asarray([[0.08, 0.0, 0.08]], jnp.float32), (n, 1))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    radii = jnp.full((n,), 10, jnp.int32)
    ref = jnp.full((H, W), 1000.0)

    dense = rasterize.bin_gaussians(means2d, radii, 16, tw, th, 64, 16, 32)
    act = rasterize.bin_gaussians_active(
        means2d, radii, 16, tw, th, 64, 16, 32, active_cap=tw * th
    )
    img_d, ws_d = rasterize.ges_rasterize(
        means2d, conics, colors, opac, dense, ref, depths, 0.1, W, H, 16
    )
    img_a, ws_a = rasterize.ges_rasterize_active(
        means2d, conics, colors, opac, act, ref, depths, 0.1, W, H, 16
    )
    np.testing.assert_allclose(np.asarray(img_d), np.asarray(img_a),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(ws_d), np.asarray(ws_a),
                               atol=2e-2, rtol=2e-2)
    # the small-cap path drops overflowing tiles and reports it
    act_small = rasterize.bin_gaussians_active(
        means2d, radii, 16, tw, th, 64, 16, 32, active_cap=2
    )
    assert int(act_small.n_active_overflow) > 0


def test_morton_knn_matches_exact(rng):
    from gps_slam_tpu.gs import knn

    pts = jnp.asarray(rng.uniform(size=(800, 3)).astype(np.float32))
    exact = np.asarray(knn.mean_dist_sq_3nn(pts))
    approx = np.asarray(knn.mean_dist_sq_3nn_morton(pts, 64))
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    # morton-window kNN is exact for the majority of points and only
    # overestimates at curve discontinuities
    assert np.median(rel) < 0.05, np.median(rel)
    assert np.mean(rel < 0.5) > 0.85, np.mean(rel < 0.5)
    # sentinel rows must not destroy the quantization of real points
    pts2 = jnp.concatenate([pts, jnp.full((200, 3), 1e6)], 0)
    valid = jnp.concatenate([jnp.ones(800, bool), jnp.zeros(200, bool)])
    a2 = np.asarray(knn.mean_dist_sq_3nn_morton(pts2, 64, valid=valid))[:800]
    rel2 = np.abs(a2 - exact) / np.maximum(exact, 1e-12)
    assert np.median(rel2) < 0.05, np.median(rel2)


def test_pool_compact_preserves_rows(rng):
    pool = pmod.create(64, sh_degree=1)
    n = 20
    attrs = {
        "means": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "scales": jnp.zeros((n, 3)), "quats": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        "features_dc": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "features_rest": jnp.zeros((n, 3, 3)), "opacities": jnp.zeros((n, 1)),
    }
    pool = pmod.add(pool, attrs, jnp.asarray(n, jnp.int32))
    kill = jnp.zeros(64, bool).at[jnp.asarray([2, 5, 11])].set(True)
    pool = pmod.remove(pool, kill)
    pool_c = pmod.compact(pool)
    assert int(pool_c.n_alive) == n - 3
    # prefix fully alive, tail dead
    assert bool(pool_c.alive[: n - 3].all())
    assert not bool(pool_c.alive[n - 3:].any())
    # surviving rows preserved (stable order)
    keep = [i for i in range(n) if i not in (2, 5, 11)]
    np.testing.assert_allclose(
        np.asarray(pool_c.means[: n - 3]), np.asarray(pool.means)[keep]
    )


def test_splat_pallas_interpret_matches_xla(rng):
    """The Mosaic splat kernels (gs/splat_pallas.py, interpret mode) must
    match the dense f32 autodiff oracle in forward values AND gradients —
    the gate that lets the TPU path dispatch to impl='pallas'.  (The XLA
    scan path contracts in bf16, so the oracle, not it, is the yardstick:
    the kernel is f32 end-to-end.)"""
    H, W = 32, 32
    n = 8
    means2d0 = np.stack(
        [rng.uniform(4, W - 4, n), rng.uniform(4, H - 4, n)], -1
    ).astype(np.float32)
    conics0 = np.tile(np.array([0.25, 0.02, 0.3], np.float32), (n, 1))
    colors0 = rng.uniform(0.2, 0.8, (n, 4)).astype(np.float32)
    opac0 = rng.uniform(0.3, 0.9, n).astype(np.float32)
    depths = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))
    radii = jnp.full((n,), 24, jnp.int32)  # large: every tile covered
    ref = jnp.full((H, W), 1000.0)
    tw, th = 2, 2
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 4)).astype(np.float32))
    act = rasterize.bin_gaussians_active(
        jnp.asarray(means2d0), radii, 16, tw, th, 32, 16, 32,
        active_cap=tw * th)

    def loss_pallas(m2d, cn, col, op):
        out, wsum = rasterize.ges_rasterize_active(
            m2d, cn, col, op, act, ref, depths, 0.1, W, H, 16,
            impl="pallas_interpret")
        return jnp.sum((out - target) ** 2) + 0.3 * jnp.sum(wsum)

    def loss_dense(m2d, cn, col, op):
        out, wsum = _dense_jnp_render(m2d, cn, col, op, depths, ref, 0.1, H, W)
        return jnp.sum((out - target) ** 2) + 0.3 * jnp.sum(wsum)

    args = tuple(jnp.asarray(a) for a in (means2d0, conics0, colors0, opac0))
    out_p, ws_p = rasterize.ges_rasterize_active(
        *args, act, ref, depths, 0.1, W, H, 16, impl="pallas_interpret")
    out_d, ws_d = _dense_jnp_render(*args, depths, ref, 0.1, H, W)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ws_p), np.asarray(ws_d),
                               rtol=2e-4, atol=1e-4)
    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    for gp, gd in zip(g_p, g_d):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   rtol=2e-4, atol=1e-4)
