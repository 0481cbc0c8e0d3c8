import jax
import jax.numpy as jnp
import numpy as np

from gps_slam_tpu.utils import se3


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(se3.quat_to_rotmat(jnp.asarray(q, dtype=jnp.float32)))


def test_pose_inv(rng):
    R = random_rotation(rng)
    t = rng.normal(size=3)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    Tinv = np.asarray(se3.pose_inv(jnp.asarray(T)))
    np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-5)


def test_quat_roundtrip(rng):
    for _ in range(16):
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = se3.quat_to_rotmat(jnp.asarray(q))
        q2 = np.asarray(se3.rotmat_to_quat(R))
        if q2[0] < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-4)


def test_quat_between(rng):
    z = jnp.array([[0.0, 0.0, 1.0]])
    n = rng.normal(size=(1, 3)).astype(np.float32)
    n /= np.linalg.norm(n)
    q = se3.quat_between(z, jnp.asarray(n))
    R = se3.quat_to_rotmat(q[0])
    rotated = np.asarray(R @ np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(rotated, n[0], atol=1e-5)


def test_se3_exp_identity():
    T = np.asarray(se3.se3_exp(jnp.zeros(6)))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


def test_se3_exp_translation():
    T = np.asarray(se3.se3_exp(jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])))
    np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_se3_exp_rotation():
    # 90 deg about z
    T = np.asarray(se3.se3_exp(jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(T[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-5)


def test_vertex_normal_maps():
    # planar depth wall at z = 2: normals should be -z (facing camera)
    H, W = 32, 40
    depth = jnp.full((H, W), 2.0)
    vmap = se3.compute_vertex_map(depth, 40.0, 40.0, W / 2, H / 2)
    assert vmap.shape == (H, W, 3)
    np.testing.assert_allclose(vmap[..., 2], 2.0, atol=1e-6)
    nmap = np.asarray(se3.compute_normal_map(vmap))
    interior = nmap[4:-4, 4:-4]
    np.testing.assert_allclose(np.abs(interior[..., 2]), 1.0, atol=1e-3)


def test_rot_trans_compare(rng):
    R = jnp.eye(3)
    R90 = se3.quat_to_rotmat(jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]))
    assert abs(float(se3.rot_angle_deg(R, R90)) - 90.0) < 1e-3
    assert abs(float(se3.trans_dist(jnp.zeros(3), jnp.array([3.0, 4.0, 0.0]))) - 5.0) < 1e-5


def test_bilateral_filter_depth():
    """ViewBuilder depth filter: smooths noise, preserves edges, keeps
    holes (ITMViewBuilder_Shared.h:39-67)."""
    import jax.numpy as jnp
    import numpy as np

    from gps_slam_tpu.utils.se3 import bilateral_filter_depth

    rng = np.random.default_rng(3)
    base = np.full((40, 60), 2.0, np.float32)
    base[:, 30:] = 1.0                       # depth edge
    noisy = base + rng.normal(0, 0.004, base.shape).astype(np.float32)
    noisy[5, 5] = 0.0                        # hole
    out = np.asarray(bilateral_filter_depth(jnp.asarray(noisy)))
    # noise reduced away from the edge
    assert out[10:30, 5:25].std() < 0.65 * noisy[10:30, 5:25].std()
    # edge magnitude preserved (no blur across the jump)
    assert abs(out[20, 28] - out[20, 32]) > 0.9
    # holes stay holes; valid pixels stay valid
    assert out[5, 5] == 0.0
    assert (out[base > 0] >= 0).all()
