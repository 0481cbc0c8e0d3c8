"""Classic 3DGS rasterization — front-to-back alpha compositing with
transmittance, for the offline `raw` render method.

Reference semantics (gsplat/rasterizer/rasterize_to_pixels_fwd.cu:108-220 +
depth-keyed binning isect_tiles.cu): per pixel, Gaussians sorted
front-to-back within the tile; out = sum_i c_i * a_i * T_i with
T_i = prod_{j<i} (1 - a_j), alpha floor 1/255, T termination at 1e-4.

TPU design: binning reuses the GES pair expansion but sorts by a composite
(tile_id, depth) key so each tile's fixed-width list is depth-ordered; the
per-tile compositing is an exclusive cumulative product over the list axis
(associative scan) followed by the same MXU contraction as the GES path.
Early termination becomes masking (T < 1e-4 contributes zero) — wasted
lanes instead of divergent exits, the standard SPMD trade.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .rasterize import TileBins


def bin_gaussians_depth(
    means2d: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    tile_size: int,
    tile_w: int,
    tile_h: int,
    visible_cap: int,
    tiles_per_gaussian_cap: int,
    tile_cap: int,
) -> TileBins:
    """isect_tiles + isectOffsetEncode equivalent: pairs sorted by
    (tile, depth) so per-tile lists come out front-to-back."""
    means2d = jax.lax.stop_gradient(means2d)
    depths = jax.lax.stop_gradient(depths)
    T = tile_w * tile_h
    S = max(int(math.isqrt(tiles_per_gaussian_cap)), 1)

    vis_idx, = jnp.nonzero(radii > 0, size=visible_cap, fill_value=-1)
    vmask = vis_idx >= 0
    vsafe = jnp.where(vmask, vis_idx, 0)
    m2d = means2d[vsafe]
    r = radii[vsafe].astype(jnp.float32)
    d = depths[vsafe]

    tmin_x = jnp.clip(jnp.floor((m2d[:, 0] - r) / tile_size), 0, tile_w - 1).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.floor((m2d[:, 0] + r) / tile_size), 0, tile_w - 1).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((m2d[:, 1] - r) / tile_size), 0, tile_h - 1).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.floor((m2d[:, 1] + r) / tile_size), 0, tile_h - 1).astype(jnp.int32)
    span_x = jnp.minimum(tmax_x - tmin_x + 1, S)
    span_y = jnp.minimum(tmax_y - tmin_y + 1, S)
    overflow = vmask & (((tmax_x - tmin_x + 1) > S) | ((tmax_y - tmin_y + 1) > S))

    slot = jnp.arange(S * S, dtype=jnp.int32)
    dx, dy = slot % S, slot // S
    tx = tmin_x[:, None] + dx[None, :]
    ty = tmin_y[:, None] + dy[None, :]
    pair_ok = vmask[:, None] & (dx[None, :] < span_x[:, None]) & (dy[None, :] < span_y[:, None])
    tile_id = jnp.where(pair_ok, ty * tile_w + tx, T)

    # lexicographic (tile, depth) order via two stable sorts (jax sorts are
    # stable): sort by depth first, then stably by tile id — avoids int64
    # composite keys, which need x64 mode
    dbits = jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32)
    flat_tile = tile_id.reshape(-1)
    flat_d = jnp.broadcast_to(dbits[:, None], tile_id.shape).reshape(-1)
    gid = jnp.broadcast_to(vsafe[:, None], tile_id.shape).reshape(-1)
    # payload-carrying stable sorts (no argsort + permutation gathers):
    # by depth first, then stably by tile id
    d1, t1, g1 = jax.lax.sort(
        (flat_d, flat_tile, gid), num_keys=1, is_stable=True)
    keys_s, _, gids_s = jax.lax.sort(
        (t1, d1, g1), num_keys=1, is_stable=True)

    # per-tile [start, count] via run-length boundaries (searchsorted
    # lowers to a serial while loop on TPU; see rasterize._bin_pairs)
    P_len = keys_s.shape[0]
    firstk = jnp.concatenate(
        [jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]])
    kstarts, = jnp.nonzero(firstk, size=T + 1, fill_value=P_len)
    kstarts = kstarts.astype(jnp.int32)
    ksval = jnp.where(
        kstarts < P_len, keys_s[jnp.minimum(kstarts, P_len - 1)], T)
    kends = jnp.concatenate([kstarts[1:], jnp.full((1,), P_len, jnp.int32)])
    counts = jnp.zeros(T, jnp.int32).at[ksval].set(
        kends - kstarts, mode="drop")
    tile_start = jnp.zeros(T, jnp.int32).at[ksval].set(kstarts, mode="drop")
    l = jnp.arange(tile_cap, dtype=jnp.int32)
    flat_idx = tile_start[:, None] + l[None, :]
    valid = l[None, :] < counts[:, None]
    gids_t = gids_s[jnp.clip(flat_idx, 0, keys_s.shape[0] - 1)]
    return TileBins(
        gids_t, valid,
        jnp.sum(pair_ok.astype(jnp.int32)),
        jnp.sum(jnp.maximum(counts - tile_cap, 0)),
        jnp.sum(overflow.astype(jnp.int32)),
    )


def classic_rasterize(
    means2d: jax.Array,
    conics: jax.Array,
    colors: jax.Array,   # [N, C] (rgb + depth channel)
    opacities: jax.Array,
    bins: TileBins,      # depth-ordered!
    width: int,
    height: int,
    tile_size: int = 16,
    chunk: int = 64,
    backgrounds: jax.Array | None = None,
):
    """Front-to-back compositing.  Returns (render [H,W,C], alpha [H,W])."""
    tile_w = -(-width // tile_size)
    tile_h = -(-height // tile_size)
    T = tile_w * tile_h
    L = bins.gids.shape[1]
    C = colors.shape[1]
    P = tile_size * tile_size
    n_chunks = -(-T // chunk)
    T_pad = n_chunks * chunk

    def pad_tiles(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((T_pad - T, *x.shape[1:]), fill, x.dtype)], 0
        ) if T_pad > T else x

    gids = pad_tiles(bins.gids)
    valid = pad_tiles(bins.valid, fill=False)
    tids = jnp.arange(T_pad, dtype=jnp.int32)
    tx = (tids % tile_w).astype(jnp.float32) * tile_size
    ty = (tids // tile_w).astype(jnp.float32) * tile_size
    pp = jnp.arange(P, dtype=jnp.float32)
    px = tx[:, None] + (pp % tile_size)[None, :] + 0.5
    py = ty[:, None] + (pp // tile_size)[None, :] + 0.5

    colors_ext = jnp.concatenate([colors, jnp.ones((colors.shape[0], 1), colors.dtype)], 1)

    def body(carry, xs):
        gid, vld, px_t, py_t = xs
        xy = means2d[gid]
        cn = conics[gid]
        op = opacities[gid]
        ce = colors_ext[gid]                              # [chunk, L, C+1]
        dx = xy[..., None, 0] - px_t[:, None, :]          # [chunk, L, P]
        dy = xy[..., None, 1] - py_t[:, None, :]
        sigma = 0.5 * (cn[..., None, 0] * dx * dx + cn[..., None, 2] * dy * dy) \
            + cn[..., None, 1] * dx * dy
        alpha = jnp.minimum(0.999, op[..., None] * jnp.exp(-sigma))
        keep = vld[..., None] & (sigma >= 0.0) & (alpha >= 1.0 / 255.0)
        a = jnp.where(keep, alpha, 0.0)                   # [chunk, L, P]
        # exclusive transmittance along the (depth-ordered) list axis
        log1m = jnp.log1p(-jnp.minimum(a, 0.999))
        T_excl = jnp.exp(jnp.cumsum(log1m, axis=1) - log1m)
        # early-termination parity: contributions after T < 1e-4 vanish
        w = jnp.where(T_excl >= 1e-4, a * T_excl, 0.0)
        out = jnp.einsum("clp,clk->cpk", w, ce, preferred_element_type=jnp.float32)
        return carry, out

    xs = tuple(
        x.reshape(n_chunks, chunk, *x.shape[1:]) for x in (gids, valid, px, py)
    )
    _, outs = jax.lax.scan(body, None, xs)
    out = outs.reshape(T_pad, P, C + 1)[:T]
    img = (
        out.reshape(tile_h, tile_w, tile_size, tile_size, C + 1)
        .transpose(0, 2, 1, 3, 4)
        .reshape(tile_h * tile_size, tile_w * tile_size, C + 1)
    )[:height, :width]
    render, alpha = img[..., :C], img[..., C]
    if backgrounds is not None:
        render = render + (1.0 - alpha[..., None]) * backgrounds
    return render, alpha
