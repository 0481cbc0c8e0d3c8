"""Tile-based TSDF raycaster — the TPU-native redesign of the sphere
tracer (replaces per-step hash-gather marching with rasterization-style
data movement).

Why: on TPU, random per-element gathers run at ~70M elements/s while
contiguous row gathers and VPU/MXU math are orders of magnitude cheaper
(measured on this chip).  The classic march (castRay,
ITMVisualisationEngine_Shared.h:123-230) costs ~9 image-scale gathers per
step x 64 steps; this design performs ZERO per-element gathers on the
pixel path:

  1. *Surface blocks* (incrementally summarized during fusion: any
     integrated voxel with sdf below threshold) are projected and binned
     into per-16x16-tile, depth-sorted, fixed-width candidate lists — one
     XLA sort, exactly like the Gaussian rasterizer.
  2. Each tile's block payloads (4^3 sdf mip, full 8^3 sdf, weights,
     colors) are fetched with contiguous ROW gathers.
  3. Per pixel: ray-AABB intersection against the tile's blocks (pure
     arithmetic), a fixed number of coarse samples against the 4^3 mip
     evaluated as ONE-HOT x data contractions on the MXU, bisection +
     secant refinement against the full-resolution block, and a final
     trilinear read expressed as a weight-vector contraction.

Output semantics match the reference raycaster: world vertex map, camera
depth, trilinear voxel color, trilinear-weight confidence (+1 on hit),
and screen-space normals (the reference's default ICP normals are also
computed from neighboring raycast points).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.precision import mm
from . import hash as vhash
from .volume import BLOCK, TsdfVolume

TILE = 16
P = TILE * TILE


def _tile_bins(
    vol: TsdfVolume,
    w2c: jax.Array,
    fx, fy, cx, cy,
    width: int, height: int,
    vis_cap: int,
    lb: int,
    span_cap: int,
):
    """Depth-sorted per-tile surface-block lists.
    Returns (gids [T, LB] pool ids, valid [T, LB], n_overflow)."""
    p = vol.params
    tw = -(-width // TILE)
    th = -(-height // TILE)
    T = tw * th
    B = p.block_capacity

    allocated = jnp.arange(B) < vol.n_blocks
    surf = allocated & (vol.block_max_w > 0) & (vol.block_min_sdf < 0.99)
    bx, by, bz = vhash.unpack(vol.block_coords)
    corner = jnp.stack([bx, by, bz], -1).astype(jnp.float32) * (p.voxel_size * BLOCK)
    center = corner + 0.5 * p.voxel_size * BLOCK
    cc = mm(center, w2c[:3, :3].T) + w2c[:3, 3]
    zc = cc[:, 2]
    radius = 0.87 * p.voxel_size * BLOCK  # half diagonal
    in_front = zc > p.frustum_min - radius
    surf = surf & in_front & (zc < p.frustum_max + radius)

    vis_idx, = jnp.nonzero(surf, size=vis_cap, fill_value=-1)
    vmask = vis_idx >= 0
    vsafe = jnp.where(vmask, vis_idx, 0)

    # tile bbox from projected corners (conservative)
    offs = jnp.array(
        [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        jnp.float32,
    ) * (p.voxel_size * BLOCK)
    pts = corner[vsafe][:, None, :] + offs[None]
    pc = mm(pts, w2c[:3, :3].T) + w2c[:3, 3]
    z = pc[..., 2]
    behind = z <= 1e-6
    u = fx * pc[..., 0] / jnp.where(behind, 1.0, z) + cx
    v = fy * pc[..., 1] / jnp.where(behind, 1.0, z) + cy
    u = jnp.where(behind, jnp.where(pc[..., 0] >= 0, 1e6, -1e6), u)
    v = jnp.where(behind, jnp.where(pc[..., 1] >= 0, 1e6, -1e6), v)
    u0 = jnp.floor(jnp.min(u, 1) / TILE)
    u1 = jnp.floor(jnp.max(u, 1) / TILE)
    v0 = jnp.floor(jnp.min(v, 1) / TILE)
    v1 = jnp.floor(jnp.max(v, 1) / TILE)
    on_screen = (u1 >= 0) & (u0 <= tw - 1) & (v1 >= 0) & (v0 <= th - 1)
    vmask = vmask & on_screen & jnp.any(z > p.frustum_min, axis=1)
    u0 = jnp.clip(u0, 0, tw - 1).astype(jnp.int32)
    u1 = jnp.clip(u1, 0, tw - 1).astype(jnp.int32)
    v0 = jnp.clip(v0, 0, th - 1).astype(jnp.int32)
    v1 = jnp.clip(v1, 0, th - 1).astype(jnp.int32)
    span_x = jnp.minimum(u1 - u0 + 1, span_cap)
    span_y = jnp.minimum(v1 - v0 + 1, span_cap)
    span_overflow = vmask & (((u1 - u0 + 1) > span_cap) | ((v1 - v0 + 1) > span_cap))

    slot = jnp.arange(span_cap * span_cap, dtype=jnp.int32)
    dx = slot % span_cap
    dy = slot // span_cap
    tx = u0[:, None] + dx[None]
    ty = v0[:, None] + dy[None]
    ok = vmask[:, None] & (dx[None] < span_x[:, None]) & (dy[None] < span_y[:, None])
    tile_id = jnp.where(ok, ty * tw + tx, T)
    gid = jnp.broadcast_to(vsafe[:, None], tile_id.shape)
    zkey = jax.lax.bitcast_convert_type(
        jnp.maximum(zc[vsafe], 0.0), jnp.int32
    )
    zs = jnp.broadcast_to(zkey[:, None], tile_id.shape).reshape(-1)

    flat_tile = tile_id.reshape(-1)
    flat_gid = gid.reshape(-1)
    o1 = jnp.argsort(zs)
    o2 = jnp.argsort(flat_tile[o1], stable=True)
    order = o1[o2]
    keys_s = flat_tile[order]
    gids_s = flat_gid[order]
    offsets = jnp.searchsorted(keys_s, jnp.arange(T + 1, dtype=jnp.int32))
    counts = offsets[1:] - offsets[:-1]
    l = jnp.arange(lb, dtype=jnp.int32)
    flat_idx = offsets[:-1, None] + l[None]
    valid = l[None] < counts[:, None]
    gids_t = gids_s[jnp.clip(flat_idx, 0, keys_s.shape[0] - 1)]
    n_overflow = jnp.sum(jnp.maximum(counts - lb, 0)) + jnp.sum(span_overflow)
    return gids_t, valid, n_overflow


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def raycast(
    vol: TsdfVolume,
    c2w: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    lb: int = 16,           # blocks per tile
    s_coarse: int = 4,      # coarse samples per (ray, block)
    n_bisect: int = 6,
    chunk: int = 32,        # tiles per scan step
):
    """Returns the same map dict as raycast.raycast."""
    p = vol.params
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    R, t = c2w[:3, :3], c2w[:3, 3]
    w2c_R = R.T
    w2c_t = -mm(w2c_R, t)
    w2c = jnp.concatenate(
        [jnp.concatenate([w2c_R, w2c_t[:, None]], 1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]])], 0,
    )
    tw = -(-width // TILE)
    th = -(-height // TILE)
    T = tw * th

    gids, valid, n_overflow = _tile_bins(
        vol, w2c, fx, fy, cx, cy, width, height,
        vis_cap=p.visible_capacity, lb=lb, span_cap=6,
    )

    # row-gathered tile payloads
    sdf_rows = vol.sdf[gids]                       # [T, LB, 512]
    mip_rows = vol.mip[gids]                       # [T, LB, 64]
    w_rows = vol.w_depth[gids].astype(jnp.float32) # [T, LB, 512]
    c_rows = vol.color[gids]                       # [T, LB, 512, 3] u8
    bx, by, bz = vhash.unpack(vol.block_coords[gids])
    block_org = jnp.stack([bx, by, bz], -1).astype(jnp.float32) * (
        p.voxel_size * BLOCK
    )                                              # [T, LB, 3] world min corner

    # per-tile pixel grids (t parameterizes camera DEPTH: dir_cam z = 1)
    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tids % tw).astype(jnp.float32) * TILE
    ty0 = (tids // tw).astype(jnp.float32) * TILE
    pp = jnp.arange(P, dtype=jnp.float32)
    px = tx0[:, None] + (pp % TILE)[None] + 0.5    # [T, P]
    py = ty0[:, None] + (pp // TILE)[None] + 0.5
    dirx = (px - cx) / fx
    diry = (py - cy) / fy
    # world direction for depth-parameterized rays
    dir_w = (
        dirx[..., None] * R[:, 0] + diry[..., None] * R[:, 1] + R[:, 2]
    )                                              # [T, P, 3]
    origin = t

    n_chunks = -(-T // chunk)
    T_pad = n_chunks * chunk

    def pad(x, fill=0):
        if T_pad == T:
            return x
        return jnp.concatenate(
            [x, jnp.full((T_pad - T, *x.shape[1:]), fill, x.dtype)], 0
        )

    xs = tuple(
        pad(x).reshape(n_chunks, chunk, *x.shape[1:])
        for x in (gids, valid, sdf_rows, mip_rows, w_rows, c_rows, block_org, dir_w)
    )

    inv_vox = 1.0 / p.voxel_size

    def hat(l, n):
        """Separable linear-interpolation weights: w[i] = max(0, 1-|l-i|).
        Trilinear sampling factorizes into three of these contractions —
        no 512-wide one-hot needed."""
        iota = jax.lax.broadcasted_iota(jnp.float32, (*l.shape, n), l.ndim)
        return jnp.maximum(0.0, 1.0 - jnp.abs(l[..., None] - iota))

    def body(carry, xs_c):
        gid, vld, sdf_r, mip_r, w_r, c_r, borg, dw = xs_c
        cdim = gid.shape[0]
        # ray-AABB (slab method, depth-parameterized)
        o = origin[None, None, None, :]
        d = dw[:, :, None, :]                      # [c, P, 1, 3]
        bmin = borg[:, None, :, :]                 # [c, 1, LB, 3]
        bmax = bmin + p.voxel_size * BLOCK
        dsafe = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        ta = (bmin - o) / dsafe
        tb = (bmax - o) / dsafe
        t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)  # [c, P, LB]
        t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
        t0 = jnp.maximum(t0, p.frustum_min)
        t1 = jnp.minimum(t1, p.frustum_max)
        hit_box = (t1 > t0) & vld[:, None, :]

        # coarse samples against the 4^3 mip (separable nearest weights)
        s = (jnp.arange(s_coarse, dtype=jnp.float32) + 0.5) / s_coarse
        ts = t0[..., None] + (t1 - t0)[..., None] * s  # [c, P, LB, S]
        pos = o[..., None, :] + d[..., None, :] * ts[..., None]
        local = (pos - bmin[..., None, :]) * (inv_vox * 0.5)  # mip units
        lq = jnp.clip(local - 0.5, 0.0, 3.0)
        mip_cube = mip_r.reshape(cdim, lb, 4, 4, 4)            # [c,LB,z,y,x]
        wxc = hat(lq[..., 0], 4)
        wyc = hat(lq[..., 1], 4)
        wzc = hat(lq[..., 2], 4)
        v1 = jnp.einsum("clzyx,cplsx->cplszy", mip_cube, wxc)
        v2 = jnp.einsum("cplszy,cplsy->cplsz", v1, wyc)
        sval = jnp.einsum("cplsz,cplsz->cpls", v2, wzc)

        NEAR = 0.9
        neg = (sval < 0.0) & hit_box[..., None]
        near = (sval < NEAR) & hit_box[..., None]
        candidate = jnp.any(near.reshape(cdim, P, lb * s_coarse), -1)

        # per-block min sampled value -> top-K candidate blocks, priority
        # to blocks with an outright negative sample nearest the camera
        minval = jnp.min(jnp.where(hit_box[..., None], sval, jnp.inf), -1)  # [c,P,LB]
        has_neg = jnp.any(neg, -1)                                           # [c,P,LB]
        # rank key: negative blocks first (by list order = depth), then dips
        order_key = jnp.where(
            has_neg,
            jax.lax.broadcasted_iota(jnp.float32, has_neg.shape, 2) - 1e3,
            jnp.where(minval < NEAR, minval, jnp.inf),
        )

        def select_block(l_slot):
            ohl = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, lb), 2)
                == l_slot[..., None]
            ).astype(jnp.bfloat16)
            sdf_sel = jnp.einsum("cpl,clk->cpk", ohl, sdf_r.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            borg_sel = jnp.sum(
                jnp.where(
                    (jax.lax.broadcasted_iota(jnp.int32, (1, 1, lb, 1), 2)
                     == l_slot[..., None, None]), borg[:, None], 0.0),
                axis=2,
            )
            return ohl, sdf_sel, borg_sel

        def sample_tri_cube(tq, sdf_cube, borg_sel):
            posq = o[..., 0, :] + dw * tq[..., None]
            localq = jnp.clip((posq - borg_sel) * inv_vox, 0.0, BLOCK - 1.0)
            wx = hat(localq[..., 0], 8)
            wy = hat(localq[..., 1], 8)
            wz = hat(localq[..., 2], 8)
            u1 = jnp.einsum("cpzyx,cpx->cpzy", sdf_cube, wx)
            u2 = jnp.einsum("cpzy,cpy->cpz", u1, wy)
            return jnp.einsum("cpz,cpz->cp", u2, wz)

        S_FINE = 8

        def fine_scan(l_slot):
            ohl, sdf_sel, borg_sel = select_block(l_slot)
            sdf_cube = sdf_sel.reshape(cdim, P, 8, 8, 8)
            t0_sel = jnp.take_along_axis(t0, l_slot[..., None], -1)[..., 0]
            t1_sel = jnp.take_along_axis(t1, l_slot[..., None], -1)[..., 0]
            seg_ok = t1_sel > t0_sel
            prev_t = t0_sel
            prev_v = jnp.full(t0_sel.shape, 1.0)
            lo, hi = t0_sel, t1_sel
            ff = jnp.zeros(t0_sel.shape, bool)
            for sf in range(S_FINE + 1):
                tq = t0_sel + (t1_sel - t0_sel) * (sf / S_FINE)
                vq = sample_tri_cube(tq, sdf_cube, borg_sel)
                crossing = (~ff) & (prev_v >= 0) & (vq < 0) & seg_ok
                lo = jnp.where(crossing, prev_t, lo)
                hi = jnp.where(crossing, tq, hi)
                ff = ff | crossing
                prev_t, prev_v = tq, vq
            return ff, lo, hi, sdf_cube, borg_sel

        # scan the K best candidate blocks; keep the nearest found crossing
        K = 4
        found = jnp.zeros((cdim, P), bool)
        t_lo = jnp.zeros((cdim, P))
        t_hi = jnp.zeros((cdim, P))
        sdf_cube = jnp.zeros((cdim, P, 8, 8, 8))
        borg_sel = jnp.zeros((cdim, P, 3))
        key = order_key
        for _ in range(K):
            l_slot = jnp.argmin(key, axis=-1).astype(jnp.int32)
            key = key + (
                jax.lax.broadcasted_iota(jnp.int32, key.shape, 2)
                == l_slot[..., None]
            ) * jnp.inf
            ff, lo, hi, cube, bo = fine_scan(l_slot)
            better = ff & (~found | (lo < t_lo))
            t_lo = jnp.where(better, lo, t_lo)
            t_hi = jnp.where(better, hi, t_hi)
            sdf_cube = jnp.where(better[..., None, None, None], cube, sdf_cube)
            borg_sel = jnp.where(better[..., None], bo, borg_sel)
            found = found | ff
        found = found & candidate

        def sample_tri(tq):
            return sample_tri_cube(tq, sdf_cube, borg_sel)

        def bisect_body(_, state):
            lo, hi = state
            mid = 0.5 * (lo + hi)
            neg_m = sample_tri(mid) < 0
            return jnp.where(neg_m, lo, mid), jnp.where(neg_m, mid, hi)

        t_lo, t_hi = jax.lax.fori_loop(0, n_bisect, bisect_body, (t_lo, t_hi))

        v_lo = sample_tri(t_lo)
        v_hi = sample_tri(t_hi)
        denom = v_lo - v_hi
        alpha = jnp.clip(v_lo / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom), 0.0, 1.0)
        t_star = t_lo + alpha * (t_hi - t_lo)

        # final trilinear weights at t_star (separable hats) for
        # confidence + color; payload rows selected by matching borg_sel
        # back to a one-hot over LB (exact float equality is safe: the
        # values are copies)
        # mask to valid list slots: a block spanning several tiles can
        # reappear in this tile's spill region (entries beyond the tile's
        # count belong to neighboring tiles in the sorted pair stream) and
        # an unmasked equality would double-count its payload
        ohl_f = (
            jnp.all(borg[:, None] == borg_sel[:, :, None, :], axis=-1)
            & vld[:, None, :]
        ).astype(jnp.bfloat16)                                  # [c,P,LB]
        posq = o[..., 0, :] + dw * t_star[..., None]
        localq = jnp.clip((posq - borg_sel) * inv_vox, 0.0, BLOCK - 1.0)
        wx = hat(localq[..., 0], 8)
        wy = hat(localq[..., 1], 8)
        wz = hat(localq[..., 2], 8)

        w_cube = jnp.einsum("cpl,clk->cpk", ohl_f, w_r.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32
                            ).reshape(cdim, P, 8, 8, 8)
        conf = jnp.einsum(
            "cpz,cpz->cp",
            jnp.einsum("cpzy,cpy->cpz",
                       jnp.einsum("cpzyx,cpx->cpzy", w_cube, wx), wy), wz,
        )
        c_sel = jnp.einsum("cpl,clkd->cpkd", ohl_f, c_r.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32
                           ).reshape(cdim, P, 8, 8, 8, 3)
        cc1 = jnp.einsum("cpzyxd,cpx->cpzyd", c_sel, wx)
        cc2 = jnp.einsum("cpzyd,cpy->cpzd", cc1, wy)
        color = jnp.einsum("cpzd,cpz->cpd", cc2, wz) / 255.0

        depth = jnp.where(found, t_star, 0.0)
        vertex = jnp.where(found[..., None], o[..., 0, :] + dw * t_star[..., None], 0.0)
        confidence = jnp.where(found, conf + 1.0, 0.0)
        color = jnp.where(found[..., None], color, 0.0)
        return carry, (depth, vertex, color, confidence)

    _, (depth, vertex, color, conf) = jax.lax.scan(body, None, xs)

    def unpack_img(x, ch=None):
        shape = (T_pad, P) + ((ch,) if ch else ())
        x = x.reshape(shape)[:T]
        lastdims = (ch,) if ch else ()
        img = (
            x.reshape(th, tw, TILE, TILE, *lastdims)
            .transpose(0, 2, 1, 3, *(4,) * (1 if ch else 0))
            .reshape(th * TILE, tw * TILE, *lastdims)
        )
        return img[:height, :width]

    depth_img = unpack_img(depth)
    vertex_img = unpack_img(vertex, 3)
    color_img = unpack_img(color, 3)
    conf_img = unpack_img(conf)

    from ..utils.se3 import compute_normal_map

    normal_img = compute_normal_map(vertex_img)
    # Sobel gradients across miss pixels produce garbage unit normals at
    # every hit pixel adjacent to a miss (~8 neighbors per miss), which
    # poisons point-to-plane ICP; invalidate normals whose 3x3
    # neighborhood contains a miss (the reference's ICP-map normal
    # computation likewise requires all 4 neighbors valid)
    hit_mask = (depth_img > 0).astype(jnp.float32)
    nbhd_ok = jax.lax.reduce_window(
        hit_mask, 1.0, jax.lax.min, (3, 3), (1, 1), "SAME"
    ) > 0.5
    normal_img = jnp.where(nbhd_ok[..., None], normal_img, 0.0)
    return {
        "vertex_map": vertex_img,
        "color_map": color_img,
        "confidence_map": conf_img[..., None],
        "depth_map": depth_img[..., None],
        "normal_map": normal_img,
        "n_tile_overflow": n_overflow,
    }
