"""Pallas TPU kernels for the GES tile splat (forward + Gaussian-parallel
backward).

The XLA formulation (rasterize._splat_fwd_impl / _ges_splat_bwd) scans
chunks of active tiles and materializes the [chunk, L, P] pair arrays
(w, ce, dx, dy, e, ...) through HBM between fused regions — matmul
operands cannot stay inside a fusion, so every iteration of the window
optimizer's Adam scan pays the staging traffic.  These kernels run the
ENTIRE pair computation for a tile inside VMEM:

  forward : out[k, p]    = sum_l w[l, p] * ce[l, k]      (k = C+1 channels)
  backward: contrib[l, :] = per-pair gradient components reduced over the
            tile's pixels — the segment-sum pairs->gaussians stays outside
            (one loop-invariant sorted cumsum, rasterize._ges_splat_bwd).

Layout rules (see raycast_pallas.py and the Mosaic notes in PERF.md):
the tile's P=256 pixels live in the LANE dimension of every pair array
[L, P]; per-gaussian scalars are [L, 1] columns sliced from the packed
attribute rows and broadcast across lanes.  Per-channel contractions are
elementwise multiplies + sublane/lane reductions — no MXU needed at
these shapes.

Reference semantics: rasterize_to_pixels_fwd_ges.cu:18-220 and
rasterize_to_pixels_bwd_ges_new_parallel.cu:18-206 (no gradient through
the depth cut or the 0.999 alpha clamp, exactly like the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed-attribute row layout (must match rasterize._pack_attrs):
# 0:x 1:y 2:cnA 3:cnB 4:cnC 5..5+C-1:colors 5+C:depth 6+C:opac 7+C:one
GMIN_ALPHA = 1.0 / 255.0


def _pair_core(g, px, py, ref, C, delta_depth):
    """Shared forward recomputation: returns (w, e, raw_alpha, live_mask,
    dx, dy, cnA, cnB) with every array [L, P] or [L, 1].  Validity is
    implicit: invalid slots were sanitized to the null attribute row
    (opacity 0) at binning time, so the alpha >= 1/255 test excludes
    them — no separate mask column."""
    x = g[:, 0:1]
    y = g[:, 1:2]
    cnA = g[:, 2:3]
    cnB = g[:, 3:4]
    cnC = g[:, 4:5]
    gd = g[:, 5 + C:6 + C]
    op = g[:, 6 + C:7 + C]

    dx = x - px                       # [L, P]
    dy = y - py
    sigma = 0.5 * (cnA * dx * dx + cnC * dy * dy) + cnB * dx * dy
    e = jnp.exp(-sigma)
    raw_alpha = op * e
    alpha = jnp.minimum(raw_alpha, 0.999)
    keep = (
        (sigma >= 0.0)
        & (alpha >= GMIN_ALPHA)
        & (gd <= ref + delta_depth)
    )
    w = jnp.where(keep, alpha, 0.0)
    live = keep & (raw_alpha < 0.999)
    return w, e, raw_alpha, live, dx, dy, cnA, cnB, cnC


_HI = jax.lax.Precision.HIGHEST  # bf16x6 passes ≈ f32-exact on the MXU


def _ce8(g, C):
    """[L, 8] color rows padded for the MXU: C colors | 1 | zeros."""
    L = g.shape[0]
    return jnp.concatenate(
        [g[:, 5:5 + C], jnp.ones((L, 1), g.dtype),
         jnp.zeros((L, 8 - C - 1), g.dtype)], axis=1)


def _fwd_kernel(g_ref, pix_ref, out_ref, *, C, CT, delta_depth):
    for c in range(CT):
        g = g_ref[c]                       # [L, 16]
        px = pix_ref[c, 0:1]               # [1, P]
        py = pix_ref[c, 1:2]
        ref = pix_ref[c, 2:3]
        w, *_ = _pair_core(g, px, py, ref, C, delta_depth)
        # out[k, p] = sum_l ce8[l, k] w[l, p] — one [8, L] x [L, P] MXU
        # matmul replaces C+1 VPU row reductions (the per-channel sums
        # were the majority of the forward's VPU ops)
        out8 = jax.lax.dot_general(
            _ce8(g, C), w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)   # [8, P]
        out_ref[c] = out8[:C + 1]


def _bwd_kernel(g_ref, pix_ref, vo_ref, contrib_ref, *, C, CT, delta_depth):
    """Pixel reductions as MXU moment matmuls: every per-pair gradient
    component is a polynomial in the pixel coordinates, so the sums over
    a tile's pixels factor through six moments of v_sigma against the
    TILE-LOCAL basis [1, px, py, px^2, px*py, py^2] (local coordinates
    keep the f32 basis products exact; HIGHEST precision keeps the
    contraction at f32 accuracy)."""
    for c in range(CT):
        g = g_ref[c]
        px = pix_ref[c, 0:1]
        py = pix_ref[c, 1:2]
        ref = pix_ref[c, 2:3]
        vo = vo_ref[c]                     # [C+1, P]
        w, e, raw_alpha, live, dx, dy, cnA, cnB, cnC = _pair_core(
            g, px, py, ref, C, delta_depth)
        L = g.shape[0]

        # v_w[l,p] = sum_k ce8[l,k] * vo8[k,p] — [L, 8] x [8, P] MXU
        vo8 = jnp.concatenate(
            [vo, jnp.zeros((8 - C - 1, vo.shape[1]), vo.dtype)], axis=0)
        v_w = jax.lax.dot_general(
            _ce8(g, C), vo8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)   # [L, P]
        dalpha = jnp.where(live, v_w, 0.0)
        v_sigma = -dalpha * raw_alpha                            # [L, P]

        # tile-local coordinates (values <= 16: basis products exact f32)
        t0x = px[0:1, 0:1] - 0.5
        t0y = py[0:1, 0:1] - 0.5
        pxl = px - t0x
        pyl = py - t0y
        x = g[:, 0:1] - t0x                # [L, 1]
        y = g[:, 1:2] - t0y
        basis = jnp.concatenate(
            [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl,
             jnp.zeros_like(pxl), jnp.zeros_like(pxl)], axis=0)  # [8, P]
        M = jax.lax.dot_general(
            v_sigma, basis, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)   # [L, 8]
        S0 = M[:, 0:1]
        Sx = M[:, 1:2]
        Sy = M[:, 2:3]
        Sxx = M[:, 3:4]
        Sxy = M[:, 4:5]
        Syy = M[:, 5:6]
        # sum_p v_sigma * dx = x*S0 - Sx (dx = x - px), etc.
        Dx = x * S0 - Sx
        Dy = y * S0 - Sy
        v_x = cnA * Dx + cnB * Dy
        v_y = cnC * Dy + cnB * Dx
        v_ca = 0.5 * (x * x * S0 - 2.0 * x * Sx + Sxx)
        v_cb = x * y * S0 - x * Sy - y * Sx + Sxy
        v_cc = 0.5 * (y * y * S0 - 2.0 * y * Sy + Syy)
        # sum_p dalpha*e = sum_p dalpha*raw_alpha/op = -S0/op
        op = g[:, 6 + C:7 + C]
        v_op = jnp.where(op > 0, -S0 / jnp.where(op > 0, op, 1.0), 0.0)
        # v_ce[l,k] = sum_p w[l,p] vo[k,p] — [L, P] x [P, 8] MXU
        Wm = jax.lax.dot_general(
            w, vo8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)   # [L, 8]
        out = jnp.concatenate(
            [v_x, v_y, v_ca, v_cb, v_cc, Wm[:, :C], v_op], axis=1)
        K = 6 + C
        pad = contrib_ref.shape[-1] - K
        if pad:
            out = jnp.concatenate(
                [out, jnp.zeros((out.shape[0], pad), out.dtype)], axis=1)
        contrib_ref[c] = out


def _pick_ct(A: int, L: int) -> int:
    """Tiles per grid step.  Fat steps amortize per-step grid overhead
    (round-5 trace: the bwd kernel ran at ~6.6 us/step at CT=8, mostly
    prologue), but the per-tile [L, P] pair scratch lives on the Mosaic
    stack and the unrolled step must fit scoped VMEM: CT=32 at L=64 is
    measured-good; CT*L > 2048 OOMed at L=256 (16 MB scoped limit,
    observed on the synthetic small config)."""
    for ct in (32, 16, 8, 4, 2, 1):
        if A % ct == 0 and ct * L <= 2048:
            return ct
    return 1


def _prep(packed, gids, px, py, ref_tiles):
    """Gather per-tile attribute rows and stack the pixel-plane inputs.
    packed: [N+1, >=9+C] from rasterize._pack_attrs (lane-padded, null row
    last); invalid slots carry gid N, so no validity column is needed."""
    g = packed[gids]                                    # [A, L, cols] rows
    pix = jnp.stack(
        [px, py, ref_tiles, jnp.zeros_like(px)], axis=1)  # [A, 4, P]
    return g, pix


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def splat_fwd(packed, gids, px, py, ref_tiles, delta_depth, C,
              interpret=False):
    """[A, C+1, P] channel-major tile sums."""
    g, pix = _prep(packed, gids, px, py, ref_tiles)
    A, L, cols = g.shape
    P = px.shape[1]
    CT = _pick_ct(A, L)
    grid = (A // CT,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, CT=CT,
                          delta_depth=float(delta_depth)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((CT, L, cols), lambda i: (i, 0, 0)),
            pl.BlockSpec((CT, 4, P), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((CT, C + 1, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((A, C + 1, P), jnp.float32),
        interpret=interpret,
    )(g, pix)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def splat_bwd(packed, gids, px, py, ref_tiles, v_out_t, delta_depth,
              C, interpret=False):
    """Per-pair gradient components reduced over pixels: [A, L, 16]
    (columns 0..5+C used: v_x v_y v_ca v_cb v_cc v_ce[0..C-1] v_op).
    v_out_t: [A, C+1, P] channel-major cotangent."""
    g, pix = _prep(packed, gids, px, py, ref_tiles)
    A, L, cols = g.shape
    P = px.shape[1]
    CT = _pick_ct(A, L)             # see splat_fwd
    grid = (A // CT,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, CT=CT,
                          delta_depth=float(delta_depth)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((CT, L, cols), lambda i: (i, 0, 0)),
            pl.BlockSpec((CT, 4, P), lambda i: (i, 0, 0)),
            pl.BlockSpec((CT, C + 1, P), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((CT, L, cols), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((A, L, cols), jnp.float32),
        interpret=interpret,
    )(g, pix, v_out_t)
