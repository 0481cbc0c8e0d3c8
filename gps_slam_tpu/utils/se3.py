"""SE(3)/quaternion helpers on JAX arrays.

TPU-native equivalent of the reference's tensor_math component
(src/tensor_math.cpp, include/tensor_math.h:8-48): pose inversion,
quaternion <-> rotation matrix, quaternion-from-normal, vertex/normal map
computation, and the keyframe rotation/translation novelty metrics.

All functions are pure jnp and jit/vmap/grad-compatible.  Quaternions use
the (w, x, y, z) convention, matching the reference renderer
(gsplat/rasterizer/utils.cuh:14 quat_to_rotmat reads quat[0] as w).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pose_inv(c2w: jax.Array) -> jax.Array:
    """Invert a rigid 4x4 transform analytically (reference
    src/tensor_math.cpp:56-67 poseInv)."""
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.matmul(Rt, t, precision=jax.lax.Precision.HIGHEST)
    top = jnp.concatenate([Rt, t_inv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=c2w.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """(w,x,y,z) quaternion (not necessarily normalized) -> 3x3 rotation.

    Same normalization-inside convention as the reference renderer
    (gsplat/rasterizer/utils.cuh:14-37), so gradients flow through the
    normalization exactly like the CUDA backward does.
    Supports leading batch dimensions.
    """
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    inv_norm = jax.lax.rsqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w * inv_norm, x * inv_norm, y * inv_norm, z * inv_norm
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (y2 + z2), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (x2 + z2), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (x2 + y2),
        ],
        axis=-1,
    )
    return m.reshape(*quat.shape[:-1], 3, 3)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """3x3 rotation -> (w,x,y,z) quaternion, branch-free (jit-safe).

    Uses the 4-candidate construction: all four quaternion component sets
    are computed and the one keyed to the largest diagonal combination is
    selected with `jnp.where`.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # candidate 0: trace dominant
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # candidate 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # candidate 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # candidate 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond_tr = (tr > 0.0)[..., None]
    cond_0 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond_1 = (m11 >= m22)[..., None]
    q = jnp.where(cond_tr, q0, jnp.where(cond_0, q1, jnp.where(cond_1, q2, q3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """(reference src/tensor_math.cpp:193-201 quaternionFromAxisAngle).

    axis [..., 3], angle [..., 1] -> quat [..., 4] (w,x,y,z).
    """
    naxis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), naxis * jnp.sin(half)], axis=-1)


def quat_between(init_vec: jax.Array, target_vec: jax.Array) -> jax.Array:
    """Quaternion rotating init_vec onto target_vec (reference
    src/tensor_math.cpp:184-191 computeQuat).  Both [..., 3], unit-norm
    target expected (normals)."""
    axis = jnp.cross(init_vec, target_vec)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    cosang = jnp.clip(jnp.sum(init_vec * target_vec, axis=-1, keepdims=True), -1.0, 1.0)
    angle = jnp.arccos(cosang)
    return quat_from_axis_angle(axis, angle)


def se3_exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential map: xi = [rho(3), phi(3)] -> 4x4 transform.

    Used by the ICP tracker to apply Gauss-Newton increments
    (equivalent of ORUtils SE3Pose ln/exp, ORUtils/SE3Pose.cpp).
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    a = phi / theta
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    zeros = jnp.zeros_like(ax)
    K = jnp.stack(
        [zeros, -az, ay, az, zeros, -ax, -ay, ax, zeros], axis=-1
    ).reshape(*phi.shape[:-1], 3, 3)
    th = theta[..., None]
    eye = jnp.eye(3, dtype=xi.dtype)
    sin_t, cos_t = jnp.sin(th), jnp.cos(th)
    small = (theta < 1e-8)[..., None]
    R = jnp.where(small, eye, eye + sin_t * K + (1.0 - cos_t) * (K @ K))
    V = jnp.where(
        small,
        eye,
        eye + ((1.0 - cos_t) / th) * K + ((th - sin_t) / th) * (K @ K),
    )
    t = (V @ rho[..., None])
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rot_angle_deg(prev_R: jax.Array, curr_R: jax.Array) -> jax.Array:
    """Angle (degrees) between two rotations (reference
    src/tensor_math.cpp:302-316 rotCompare)."""
    diff = jnp.matmul(prev_R.T, curr_R, precision=jax.lax.Precision.HIGHEST)
    cos_theta = jnp.clip((jnp.trace(diff) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(cos_theta))


def trans_dist(prev_t: jax.Array, curr_t: jax.Array) -> jax.Array:
    """L2 translation distance (reference src/tensor_math.cpp:318-327)."""
    return jnp.linalg.norm(prev_t - curr_t)


def compute_vertex_map(depth: jax.Array, fx, fy, cx, cy) -> jax.Array:
    """Back-project a depth map [H, W] or [H, W, 1] to camera-space vertices
    [H, W, 3] (reference src/tensor_math.cpp:250-276 computeVertexMap)."""
    if depth.ndim == 3:
        depth = depth[..., 0]
    H, W = depth.shape
    i = jnp.arange(W, dtype=depth.dtype)[None, :]
    j = jnp.arange(H, dtype=depth.dtype)[:, None]
    x = (i - cx) / fx
    y = (j - cy) / fy
    xg, yg = jnp.broadcast_to(x, (H, W)), jnp.broadcast_to(y, (H, W))
    return jnp.stack([xg, yg, jnp.ones_like(xg)], axis=-1) * depth[..., None]


def _sobel(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Replicate-padded Sobel gradients per channel, [H,W,C] -> dx, dy
    (reference src/tensor_math.cpp:218-248 featureGradient, no
    normalization)."""
    wx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=img.dtype)
    wy = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=img.dtype)
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    # [1, C, H, W] conv with depthwise 3x3
    x = pad.transpose(2, 0, 1)[:, None]  # [C,1,H+2,W+2]
    kx = wx[None, None]
    ky = wy[None, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    dx = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID", dimension_numbers=dn)
    dy = jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID", dimension_numbers=dn)
    return dx[:, 0].transpose(1, 2, 0), dy[:, 0].transpose(1, 2, 0)


def compute_normal_map(vertex_map: jax.Array) -> jax.Array:
    """Normals from a vertex map via Sobel gradients + cross product
    (reference src/tensor_math.cpp:278-300 computeNormalMap).  Pixels with
    z <= 0 get zero normals."""
    dx, dy = _sobel(vertex_map)
    normal = jnp.cross(dy.reshape(-1, 3), dx.reshape(-1, 3))
    normal = normal.reshape(vertex_map.shape)
    mag = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / (mag + 1e-8)
    invalid = vertex_map[..., 2:3] <= 0
    return jnp.where(invalid, jnp.zeros_like(normal), normal)


def transform_points(points: jax.Array, T: jax.Array) -> jax.Array:
    """Apply a 4x4 transform to [..., 3] points."""
    return jnp.matmul(points, T[:3, :3].T, precision=jax.lax.Precision.HIGHEST) + T[:3, 3]


@jax.jit
def bilateral_filter_depth(depth: jax.Array) -> jax.Array:
    """Edge-preserving 5x5 bilateral depth filter — the reference's
    ViewBuilder depth filtering (filterDepth,
    InfiniTAM/ITMLib/Engines/ViewBuilding/Shared/ITMViewBuilder_Shared.h:39-67,
    enabled by useBilateralFilter; same spatial kernel exp(-0.5 (|i|+|j|)
    sigma_L^2) and Kinect noise-model range sigma).

    TPU shape: the 25 taps are static shifted slices of a padded plane —
    no gathers; invalid (<= 0) depths pass through as 0."""
    z = depth
    valid = z > 0.0
    SIG_L = 1.2232
    sigma_z = 1.0 / (
        0.0012
        + 0.0019 * (z - 0.4) ** 2
        + 0.0001 / jnp.sqrt(jnp.maximum(z, 1e-3)) * 0.25
    )
    H, W = z.shape
    zp = jnp.pad(z, 2)
    wsum = jnp.zeros_like(z)
    acc = jnp.zeros_like(z)
    for i in range(-2, 3):
        for j in range(-2, 3):
            nb = jax.lax.dynamic_slice(zp, (2 + i, 2 + j), (H, W))
            ok = nb > 0.0
            dz2 = (nb - z) ** 2
            w = jnp.exp(
                -0.5 * ((abs(i) + abs(j)) * SIG_L * SIG_L
                        + dz2 * sigma_z * sigma_z)
            ) * ok.astype(z.dtype)
            wsum = wsum + w
            acc = acc + w * nb
    out = acc / jnp.maximum(wsum, 1e-12)
    return jnp.where(valid, out, 0.0)
