"""Training losses: L1, fused SSIM map, depth L1
(reference computeLoss, src/raw_gs_model.cpp:369-417; SSIM CUDA kernel
gsplat/rasterizer/ssim.cu — on TPU a conv-based map needs no custom kernel,
XLA fuses the separable 11x11 Gaussian window convolutions)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1(a: jax.Array, b: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    d = jnp.abs(a - b)
    if mask is None:
        return d.mean()
    m = jnp.broadcast_to(mask, d.shape)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim_map(img1: jax.Array, img2: jax.Array, c1: float = 0.01 ** 2,
             c2: float = 0.03 ** 2) -> jax.Array:
    """SSIM map with 'valid' padding, [H, W, C] inputs
    (FusedSSIMMap equivalent, gsplat_wapper.hpp:622-677)."""
    w = _gaussian_window()

    def blur(x):
        # separable 11x1 then 1x11, channels independent: [H, W, C]
        xt = x.transpose(2, 0, 1)[:, None]  # [C,1,H,W]
        k1 = w.reshape(1, 1, -1, 1)
        k2 = w.reshape(1, 1, 1, -1)
        dn = jax.lax.conv_dimension_numbers(xt.shape, k1.shape, ("NCHW", "OIHW", "NCHW"))
        y = jax.lax.conv_general_dilated(xt, k1, (1, 1), "VALID", dimension_numbers=dn)
        y = jax.lax.conv_general_dilated(y, k2, (1, 1), "VALID", dimension_numbers=dn)
        return y[:, 0].transpose(1, 2, 0)

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    return ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )


def psnr(a: jax.Array, b: jax.Array) -> jax.Array:
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def compute_loss(
    rendered_rgb: jax.Array,
    rendered_depth: jax.Array,
    gt_rgb: jax.Array,
    gt_depth: jax.Array | None,
    ssim_weight: float,
    depth_weight: float,
    mask: jax.Array | None = None,
) -> dict:
    """(raw_gs_model.cpp:369-417 computeLoss)."""
    l1_loss = l1(gt_rgb, rendered_rgb, mask)
    if ssim_weight > 0:
        ssim_loss = 1.0 - ssim_map(rendered_rgb, gt_rgb).mean()
        rgb_loss = (1.0 - ssim_weight) * l1_loss + ssim_weight * ssim_loss
    else:
        rgb_loss = l1_loss
    loss = {"total": rgb_loss, "rgb": rgb_loss, "l1": l1_loss}
    if depth_weight > 0 and gt_depth is not None:
        valid = (gt_depth > 0) & (rendered_depth > 0)
        depth_loss = l1(gt_depth, rendered_depth, valid)
        loss["depth"] = depth_loss
        loss["total"] = loss["total"] + depth_weight * depth_loss
    return loss
