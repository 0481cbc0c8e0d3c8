"""Multi-chip sharding paths on the virtual 8-device CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dp_train_matches_single_device():
    """One DP step over 8 devices with identical cameras must equal the
    single-device step (pmean of equal grads is a no-op)."""
    import __graft_entry__ as g
    from gps_slam_tpu.gs import optim
    from gps_slam_tpu.parallel import mesh as pmesh

    pool, st, c2w, K, ref_depth, base_color = g._tiny_setup()
    tx_cfg = (0.00016, 1.6e-6, 0.005, 0.001, 0.0025, 0.0005, 0.05, 0.003, False)
    rng = np.random.default_rng(3)
    gt = jnp.asarray(rng.uniform(0, 1, (st.height, st.width, 3)).astype(np.float32))

    def batch_of(n):
        return {
            "c2w": jnp.tile(c2w[None], (n, 1, 1)),
            "K": jnp.tile(K[None], (n, 1, 1)),
            "gt_rgb": jnp.tile(gt[None], (n, 1, 1, 1)),
            "ref_depth": jnp.tile(ref_depth[None], (n, 1, 1)),
            "base_color": jnp.tile(base_color[None], (n, 1, 1, 1)),
            "cam_id": jnp.zeros((n,), jnp.int32),
        }

    tx = optim.make_optimizer(pmesh.optim_cfg(tx_cfg), 100)

    mesh8 = pmesh.make_mesh(8)
    step8 = pmesh.dp_train_step_fn(mesh8, st, tx_cfg, 100, 0.0)
    p8, _, l8 = step8(
        pmesh.replicate(mesh8, pool.params),
        pmesh.replicate(mesh8, pool.alive),
        pmesh.replicate(mesh8, tx.init(pool.params)),
        pmesh.shard_batch(mesh8, batch_of(8)),
    )

    mesh1 = pmesh.make_mesh(1)
    step1 = pmesh.dp_train_step_fn(mesh1, st, tx_cfg, 100, 0.0)
    p1, _, l1 = step1(
        pmesh.replicate(mesh1, pool.params),
        pmesh.replicate(mesh1, pool.alive),
        pmesh.replicate(mesh1, tx.init(pool.params)),
        pmesh.shard_batch(mesh1, batch_of(1)),
    )
    assert abs(float(l8) - float(l1)) < 1e-5
    for k in p1:
        # Adam's first step is ~ lr*sign(grad): elements whose gradient is
        # at summation-noise level can flip sign between the pmean-of-8 and
        # single-device paths and move by 2*lr.  Require near-exact
        # agreement everywhere except a <1% tail of such elements.
        a, b = np.asarray(p8[k]), np.asarray(p1[k])
        mism = np.abs(a - b) > 1e-5
        assert mism.mean() < 0.01, (k, mism.mean())
        assert np.abs(a - b).max() < 5e-4, (k, np.abs(a - b).max())


def test_dp_render_sharding():
    import __graft_entry__ as g
    from gps_slam_tpu.parallel import mesh as pmesh

    pool, st, c2w, K, ref_depth, base_color = g._tiny_setup()
    mesh = pmesh.make_mesh(8)
    render = pmesh.dp_render_fn(mesh, st)
    n = 8
    batch = pmesh.shard_batch(mesh, {
        "c2w": jnp.tile(c2w[None], (n, 1, 1)),
        "K": jnp.tile(K[None], (n, 1, 1)),
        "ref_depth": jnp.tile(ref_depth[None], (n, 1, 1)),
        "base_color": jnp.tile(base_color[None], (n, 1, 1, 1)),
        "cam_id": jnp.zeros((n,), jnp.int32),
    })
    imgs = render(
        pmesh.replicate(mesh, pool.params), pmesh.replicate(mesh, pool.alive), batch
    )
    assert imgs.shape == (8, st.height, st.width, 3)
    # identical cameras -> identical images across shards
    a = np.asarray(imgs)
    np.testing.assert_allclose(a[0], a[7], atol=1e-6)
