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


def _fwd_kernel(g_ref, pix_ref, out_ref, *, C, CT, delta_depth):
    for c in range(CT):
        g = g_ref[c]                       # [L, 16]
        px = pix_ref[c, 0:1]               # [1, P]
        py = pix_ref[c, 1:2]
        ref = pix_ref[c, 2:3]
        w, *_ = _pair_core(g, px, py, ref, C, delta_depth)
        rows = []
        for k in range(C):
            ce_k = g[:, 5 + k:6 + k]       # [L, 1]
            rows.append(jnp.sum(w * ce_k, axis=0, keepdims=True))  # [1, P]
        rows.append(jnp.sum(w, axis=0, keepdims=True))  # the 'one' channel
        out_ref[c] = jnp.concatenate(rows, axis=0)      # [C+1, P]


def _bwd_kernel(g_ref, pix_ref, vo_ref, contrib_ref, *, C, CT, delta_depth):
    for c in range(CT):
        g = g_ref[c]
        px = pix_ref[c, 0:1]
        py = pix_ref[c, 1:2]
        ref = pix_ref[c, 2:3]
        vo = vo_ref[c]                     # [C+1, P]
        w, e, raw_alpha, live, dx, dy, cnA, cnB, cnC = _pair_core(
            g, px, py, ref, C, delta_depth)

        # v_w[l,p] = sum_k ce[l,k] * vo[k,p]; ce's last channel is 1
        v_w = jnp.broadcast_to(vo[C:C + 1], w.shape)
        for k in range(C):
            v_w = v_w + g[:, 5 + k:6 + k] * vo[k:k + 1]
        dalpha = jnp.where(live, v_w, 0.0)
        v_op = jnp.sum(dalpha * e, axis=1, keepdims=True)          # [L, 1]
        v_sigma = -dalpha * raw_alpha
        v_ca = jnp.sum(v_sigma * 0.5 * dx * dx, axis=1, keepdims=True)
        v_cb = jnp.sum(v_sigma * dx * dy, axis=1, keepdims=True)
        v_cc = jnp.sum(v_sigma * 0.5 * dy * dy, axis=1, keepdims=True)
        v_x = jnp.sum(v_sigma * (cnA * dx + cnB * dy), axis=1, keepdims=True)
        v_y = jnp.sum(v_sigma * (cnC * dy + cnB * dx), axis=1, keepdims=True)
        # v_ce_k[l] = sum_p w[l,p] * vo[k,p]
        cols = [v_x, v_y, v_ca, v_cb, v_cc]
        for k in range(C):
            cols.append(jnp.sum(w * vo[k:k + 1], axis=1, keepdims=True))
        cols.append(v_op)
        out = jnp.concatenate(cols, axis=1)            # [L, 6+C]
        K = 6 + C
        pad = contrib_ref.shape[-1] - K
        if pad:
            out = jnp.concatenate(
                [out, jnp.zeros((out.shape[0], pad), out.dtype)], axis=1)
        contrib_ref[c] = out


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
    CT = 8
    assert A % CT == 0, (A, CT)
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
    CT = 8
    assert A % CT == 0, (A, CT)
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
