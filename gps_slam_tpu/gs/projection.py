"""Fully fused 3D Gaussian projection — TPU equivalent of the reference's
projection kernels (gsplat/rasterizer/fully_fused_projection_fwd.cu:20-190 /
_bwd.cu; math helpers persp_proj / add_blur / quat_scale_to_covar_preci in
gsplat/rasterizer/utils.cuh).

Pure vectorized jnp over the Gaussian pool: world->camera transform,
quat/scale -> 3D covariance, clamped-Jacobian perspective projection of
mean+covariance, 0.3-px low-pass blur (eps2d), conic + 3-sigma radius,
near/far and off-screen culling.  `jax.grad` provides the backward pass;
radii and culling decisions are stop-gradient (non-differentiable in the
reference too).  Camera-pose gradients exist but are simply unused by
callers — the reference computes and discards them
(gsplat_wapper.hpp:209-210).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import mm
from ..utils.se3 import quat_to_rotmat


class Projection(NamedTuple):
    radii: jax.Array    # int32 [N] screen radius in px; 0 = culled
    means2d: jax.Array  # f32 [N, 2]
    depths: jax.Array   # f32 [N] camera z
    conics: jax.Array   # f32 [N, 3] upper-triangular inverse 2D covariance


def quat_scale_to_covar(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """C = R S S^T R^T (utils.cuh:65-96).  quats (w,x,y,z) unnormalized,
    scales linear (not log)."""
    R = quat_to_rotmat(quats)             # [N, 3, 3]
    M = R * scales[..., None, :]          # R @ diag(s)
    return mm(M, jnp.swapaxes(M, -1, -2))


def _covar_cam_cols(quats, scales, R):
    """Camera-frame covariance Rc (Rq S S^T Rq^T) Rc^T as six [N] columns
    (c00, c01, c02, c11, c12, c22).

    Scalar-expanded on purpose: the batched [N, 3, 3] matmul chain makes
    XLA emit padded tiny-matmul loops on TPU; as ~100 fused [N]-wide
    elementwise ops the whole thing is VPU-bound and effectively free."""
    w, x, y, z = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    inv = jax.lax.rsqrt(w * w + x * x + y * y + z * z + 1e-20)
    w, x, y, z = w * inv, x * inv, y * inv, z * inv
    r = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    s = [scales[:, 0], scales[:, 1], scales[:, 2]]
    m = [[r[i][k] * s[k] for k in range(3)] for i in range(3)]
    # world covariance (symmetric): cw[i][j] = sum_k m[i][k] m[j][k]
    cw = [[sum(m[i][k] * m[j][k] for k in range(3)) for j in range(3)]
          for i in range(3)]
    # a = Rc @ Cw   (Rc rows are traced scalars)
    a = [[sum(R[i, k] * cw[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]
    # c = a @ Rc^T, upper triangle
    def cc(i, j):
        return sum(a[i][k] * R[j, k] for k in range(3))

    return cc(0, 0), cc(0, 1), cc(0, 2), cc(1, 1), cc(1, 2), cc(2, 2)


def project(
    means: jax.Array,    # [N, 3] world
    quats: jax.Array,    # [N, 4]
    scales: jax.Array,   # [N, 3] linear
    viewmat: jax.Array,  # [4, 4] world-to-camera
    K: jax.Array,        # [3, 3]
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    valid: jax.Array | None = None,  # [N] pool-alive mask
) -> Projection:
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    mean_c = mm(means, R.T) + t
    z = mean_c[..., 2]

    c00, c01, c02, c11, c12, c22 = _covar_cam_cols(quats, scales, R)

    # perspective projection with clamped Jacobian (persp_proj,
    # utils.cuh:253-292)
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy

    zsafe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    rz = 1.0 / zsafe
    rz2 = rz * rz
    x, y = mean_c[..., 0], mean_c[..., 1]
    tx = z * jnp.clip(x * rz, -lim_x_neg, lim_x_pos)
    ty = z * jnp.clip(y * rz, -lim_y_neg, lim_y_pos)

    # J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2
    # cov2d = J C J^T, expanded (C symmetric)
    a00 = j00 * j00 * c00 + 2.0 * j00 * j02 * c02 + j02 * j02 * c22
    a01 = (
        j00 * j11 * c01
        + j00 * j12 * c02
        + j02 * j11 * c12
        + j02 * j12 * c22
    )
    a11 = j11 * j11 * c11 + 2.0 * j11 * j12 * c12 + j12 * j12 * c22

    # low-pass blur (add_blur, utils.cuh:603-611); compensation unused
    # (calc_compensations=false in the reference model)
    a00 = a00 + eps2d
    a11 = a11 + eps2d
    det = a00 * a11 - a01 * a01
    det_ok = det > 0
    det_safe = jnp.where(det_ok, det, 1.0)

    # conic = inverse of blurred covariance
    conic = jnp.stack([a11 / det_safe, -a01 / det_safe, a00 / det_safe], -1)

    # 3-sigma radius from the larger eigenvalue (fwd.cu:157-161),
    # non-differentiable
    b = 0.5 * (a00 + a11)
    v1 = b + jnp.sqrt(jnp.maximum(0.01, b * b - det_safe))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))
    radius = jax.lax.stop_gradient(radius)

    mean2d = jnp.stack([fx * x * rz + cx, fy * y * rz + cy], -1)
    m2d_s = jax.lax.stop_gradient(mean2d)
    cull = (
        (z < near_plane)
        | (z > far_plane)
        | ~det_ok
        | (radius <= radius_clip)
        | (m2d_s[..., 0] + radius <= 0)
        | (m2d_s[..., 0] - radius >= width)
        | (m2d_s[..., 1] + radius <= 0)
        | (m2d_s[..., 1] - radius >= height)
    )
    if valid is not None:
        cull = cull | ~valid
    radii = jnp.where(cull, 0, radius.astype(jnp.int32))
    return Projection(radii=radii, means2d=mean2d, depths=z, conics=conic)
