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
     integrated voxel with sdf below threshold) are projected
     (center + bounding radius) and binned into per-16x16-tile fixed-width
     candidate lists — one XLA sort by tile id, exactly like the Gaussian
     rasterizer.  Depth ordering is NOT baked into the lists; candidate
     blocks are ranked per pixel by ray-entry depth instead, which removes
     the second (depth) sort pass.
  2. Each tile's block payloads (4^3 sdf mip, full 8^3 sdf, weights,
     colors) are fetched with contiguous ROW gathers and cast to bf16
     (sdf is normalized to [-1, 1]; bf16's 8-bit mantissa localizes the
     surface to ~0.4% of mu ~ 0.1 mm, far below sensor noise).
  3. Per pixel: ray-AABB intersection against the tile's blocks (pure
     arithmetic), a fixed number of coarse samples against the 4^3 mip as
     separable hat-weight contractions, then for the best K candidate
     blocks a BATCHED two-stage refinement — one 8^3-cube selection matmul
     per candidate and two batched multi-sample trilinear evaluations that
     bracket the zero crossing + a secant step.  (The previous design ran
     ~44 sequential single-sample cube evaluations per pixel, each
     re-reading the selected cube from HBM — the batched form reads it
     ~4x total.)
  4. The final confidence/color trilinear read contracts the per-pixel
     512-weight vector against the tile's payload rows and the winner's
     one-hot — never materializing a per-pixel color cube.

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
    pool_prefix: int | None = None,
):
    """Per-tile surface-block lists (tile order only — per-pixel depth
    ranking happens in the march).  Returns (gids [T, LB], valid [T, LB],
    n_overflow).  `pool_prefix` bounds the surface scan to the allocated
    prefix bucket (see integrate.visible_blocks) — the pool allocator is
    a cursor, so rows >= n_blocks are never surface blocks."""
    p = vol.params
    tw = -(-width // TILE)
    th = -(-height // TILE)
    T = tw * th
    B = pool_prefix if pool_prefix is not None else p.block_capacity

    allocated = jnp.arange(B) < vol.n_blocks
    surf = (allocated & (vol.summary[:B, 65] > 0)
            & (vol.summary[:B, 64] < 0.99))
    bx, by, bz = vhash.unpack(vol.block_coords[:B])
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

    # tile bbox from the 8 projected corners (conservative; correctly
    # culls blocks near/behind the camera plane, where a center+radius
    # bound degenerates to the whole screen and would spam every tile's
    # depth-ordered list with near-camera junk)
    offs = jnp.array(
        [[ox, oy, oz] for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)],
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

    flat_gid = gid.reshape(-1)
    if T < 4096:
        # ONE multi-operand sort on a combined key: tile id (12 bits) |
        # quantized block depth (20 bits), carrying the gid payload
        # THROUGH the sort (argsort + permutation gathers ran on the
        # scalar core at ~2 ms each per camera in the round-4 trace).
        # Depth order within each tile makes the lb clipping keep the
        # NEAREST blocks — overflow then only drops far (occluded)
        # candidates, mirroring the reference's per-tile depth-sorted
        # intersection lists (isect_tiles.cu).
        zq = jnp.clip(
            zc[vsafe] / p.frustum_max * ((1 << 20) - 1), 0, (1 << 20) - 1
        ).astype(jnp.uint32)
        combined = (
            tile_id.astype(jnp.uint32) << 20
        ) | jnp.broadcast_to(zq[:, None], tile_id.shape)
        comb_s, gids_s = jax.lax.sort(
            (combined.reshape(-1), flat_gid), num_keys=1, is_stable=True)
        keys_s = (comb_s >> 20).astype(jnp.int32)
    else:
        # wide-image fallback: tile ids no longer fit 12 bits -> two-pass
        # stable sort (depth, then tile), payload carried through both
        zkey = jax.lax.bitcast_convert_type(
            jnp.maximum(zc[vsafe], 0.0), jnp.int32
        )
        zs = jnp.broadcast_to(zkey[:, None], tile_id.shape).reshape(-1)
        flat_tile = tile_id.reshape(-1)
        _, t1s, g1s = jax.lax.sort(
            (zs, flat_tile, flat_gid), num_keys=1, is_stable=True)
        keys_s, gids_s = jax.lax.sort(
            (t1s, g1s), num_keys=1, is_stable=True)
    # per-tile [start, count] via sort-compacted run-length boundaries +
    # two O(T) scatters — jnp.searchsorted lowers to a serial while loop
    # and jnp.nonzero to a full-stream scalar-core scatter on TPU (see
    # rasterize._run_starts); the list build is a batched dynamic_slice
    # (contiguous runs) instead of an element gather
    from ..gs.rasterize import _row_slices, _run_starts

    P_len = keys_s.shape[0]
    kstarts, ksval = _run_starts(keys_s, T + 1, T + 1)
    kends = jnp.concatenate([kstarts[1:], jnp.full((1,), P_len, jnp.int32)])
    counts = jnp.zeros(T, jnp.int32).at[ksval].set(
        kends - kstarts, mode="drop")
    tile_start = jnp.zeros(T, jnp.int32).at[ksval].set(
        kstarts, mode="drop")
    l = jnp.arange(lb, dtype=jnp.int32)
    valid = l[None] < counts[:, None]
    gids_t = _row_slices(gids_s, tile_start, lb)
    n_overflow = jnp.sum(jnp.maximum(counts - lb, 0)) + jnp.sum(span_overflow)
    return gids_t, valid, n_overflow


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def raycast(
    vol: TsdfVolume,
    c2w: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    lb: int = 16,           # blocks per tile
    s_coarse: int = 4,      # coarse samples per (ray, block)
    s_refine: int = 8,      # samples per batched refinement stage (2 stages)
    chunk: int = 32,        # tiles per scan step
    k_blocks: int = 2,      # candidate blocks refined per pixel
    pool_prefix: int | None = None,
):
    """Returns the same map dict as the legacy hash-march raycaster."""
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
        pool_prefix=pool_prefix,
    )

    # row-gathered tile payloads (cast to bf16 once, outside the scan);
    # sdf + weight unpack from the packed state rows (volume.pack_state)
    from .volume import state_sdf_f32, state_w_depth

    st_rows = vol.state[gids]                          # [T, LB, 512] u32
    sdf_rows = state_sdf_f32(st_rows).astype(jnp.bfloat16)  # [T, LB, 512]
    mip_rows = vol.summary[gids, :64].astype(jnp.bfloat16)  # [T, LB, 64]
    w_rows = state_w_depth(st_rows).astype(jnp.bfloat16)  # [T, LB, 512]
    cp = vol.color[gids]                               # [T, LB, 512] u32 packed
    c_rows = jnp.stack(
        [(cp & 0xFF), (cp >> 8) & 0xFF, (cp >> 16) & 0xFF], axis=-1
    ).astype(jnp.int32).astype(jnp.bfloat16)           # [T, LB, 512, 3]
    bx, by, bz = vhash.unpack(vol.block_coords[gids])
    block_org = jnp.stack([bx, by, bz], -1).astype(jnp.float32) * (
        p.voxel_size * BLOCK
    )                                                  # [T, LB, 3] world min corner

    # per-tile pixel grids (t parameterizes camera DEPTH: dir_cam z = 1)
    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tids % tw).astype(jnp.float32) * TILE
    ty0 = (tids // tw).astype(jnp.float32) * TILE
    pp = jnp.arange(P, dtype=jnp.float32)
    px = tx0[:, None] + (pp % TILE)[None] + 0.5        # [T, P]
    py = ty0[:, None] + (pp // TILE)[None] + 0.5
    dirx = (px - cx) / fx
    diry = (py - cy) / fy
    dir_w = (
        dirx[..., None] * R[:, 0] + diry[..., None] * R[:, 1] + R[:, 2]
    )                                                  # [T, P, 3]
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
    NEAR = 0.9

    def hat(l, n):
        """Separable linear-interpolation weights (bf16): w[i] =
        max(0, 1-|l-i|).  Trilinear sampling factorizes into three of
        these contractions."""
        iota = jax.lax.broadcasted_iota(jnp.float32, (*l.shape, n), l.ndim)
        return jnp.maximum(0.0, 1.0 - jnp.abs(l[..., None] - iota)).astype(jnp.bfloat16)

    def body(carry, xs_c):
        gid, vld, sdf_r, mip_r, w_r, c_r, borg, dw = xs_c
        cdim = gid.shape[0]
        # ray-AABB (slab method, depth-parameterized)
        o = origin[None, None, None, :]
        d = dw[:, :, None, :]                          # [c, P, 1, 3]
        bmin = borg[:, None, :, :]                     # [c, 1, LB, 3]
        bmax = bmin + p.voxel_size * BLOCK
        dsafe = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        ta = (bmin - o) / dsafe
        tb = (bmax - o) / dsafe
        t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)     # [c, P, LB]
        t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
        t0 = jnp.maximum(t0, p.frustum_min)
        t1 = jnp.minimum(t1, p.frustum_max)
        hit_box = (t1 > t0) & vld[:, None, :]

        # coarse samples against the 4^3 mip (separable hat weights, bf16)
        s = (jnp.arange(s_coarse, dtype=jnp.float32) + 0.5) / s_coarse
        ts = t0[..., None] + (t1 - t0)[..., None] * s  # [c, P, LB, S]
        pos = o[..., None, :] + d[..., None, :] * ts[..., None]
        local = (pos - bmin[..., None, :]) * (inv_vox * 0.5)  # mip units
        lq = jnp.clip(local - 0.5, 0.0, 3.0)
        mip_cube = mip_r.reshape(cdim, lb, 4, 4, 4)            # [c,LB,z,y,x]
        wxc = hat(lq[..., 0], 4)
        wyc = hat(lq[..., 1], 4)
        wzc = hat(lq[..., 2], 4)
        v1 = jnp.einsum("clzyx,cplsx->cplszy", mip_cube, wxc,
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        v2 = jnp.einsum("cplszy,cplsy->cplsz", v1, wyc,
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        sval = jnp.einsum("cplsz,cplsz->cpls", v2, wzc,
                          preferred_element_type=jnp.float32)

        neg = (sval < 0.0) & hit_box[..., None]
        near = (sval < NEAR) & hit_box[..., None]
        candidate = jnp.any(near.reshape(cdim, P, lb * s_coarse), -1)
        has_neg = jnp.any(neg, -1)                              # [c,P,LB]
        minval = jnp.min(jnp.where(hit_box[..., None], sval, jnp.inf), -1)

        # rank: blocks with a negative sample first, nearest ray entry
        # first (replaces the depth-sorted list order of the old design);
        # then "near" dips by their minimum value
        order_key = jnp.where(
            has_neg, t0 - 1e4,
            jnp.where(minval < NEAR, minval, jnp.inf),
        )

        def tri_eval_batch(sdf_cube, borg_sel, t_q):
            """Trilinear sdf at a batch of depths t_q [c,P,S] against each
            pixel's selected 8^3 cube.  One batched separable contraction."""
            posq = o[..., 0, :][:, :, None, :] + dw[:, :, None, :] * t_q[..., None]
            localq = jnp.clip((posq - borg_sel[:, :, None, :]) * inv_vox,
                              0.0, BLOCK - 1.0)
            wx = hat(localq[..., 0], 8)                 # [c,P,S,8]
            wy = hat(localq[..., 1], 8)
            wz = hat(localq[..., 2], 8)
            u1 = jnp.einsum("cpzyx,cpsx->cpszy", sdf_cube, wx,
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            u2 = jnp.einsum("cpszy,cpsy->cpsz", u1, wy,
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return jnp.einsum("cpsz,cpsz->cps", u2, wz,
                              preferred_element_type=jnp.float32)

        lin1 = jnp.arange(s_refine, dtype=jnp.float32) / (s_refine - 1)

        def refine_block(l_slot):
            """Select one candidate block per pixel, bracket its crossing
            from the coarse samples, then run two batched refinement
            stages + a secant step."""
            ohl = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, lb), 2)
                == l_slot[..., None]
            ).astype(jnp.bfloat16)                      # [c,P,LB]
            sdf_sel = jnp.einsum("cpl,clk->cpk", ohl, sdf_r,
                                 preferred_element_type=jnp.float32)
            sdf_cube = sdf_sel.astype(jnp.bfloat16).reshape(cdim, P, 8, 8, 8)
            t0_sel = jnp.take_along_axis(t0, l_slot[..., None], -1)[..., 0]
            t1_sel = jnp.take_along_axis(t1, l_slot[..., None], -1)[..., 0]
            # exact f32 one-hot contraction (block origins must be exact —
            # they anchor the local trilinear coordinates)
            borg_sel = jnp.einsum("cpl,cld->cpd", ohl.astype(jnp.float32), borg)
            sval_sel = jnp.take_along_axis(
                sval, l_slot[..., None, None], 2
            )[:, :, 0, :]                               # [c,P,S] coarse values

            # initial bracket: around the first negative coarse sample,
            # widened by 1.25 sample spacings (the mip is a smoothed proxy
            # of the fine sdf); whole segment if no negative sample
            negs = sval_sel < 0
            any_neg = jnp.any(negs, -1)
            s_star = jnp.argmax(negs, -1).astype(jnp.float32)  # first neg
            dt = (t1_sel - t0_sel) / s_coarse
            ts_neg = t0_sel + (s_star + 0.5) * dt
            lo0 = jnp.where(any_neg, jnp.maximum(ts_neg - 1.25 * dt, t0_sel), t0_sel)
            hi0 = jnp.where(any_neg, ts_neg + 0.25 * dt, t1_sel)

            def bracket_stage(lo, hi, entry_virtual=False):
                t_q = lo[..., None] + (hi - lo)[..., None] * lin1  # [c,P,S1]
                v_q = tri_eval_batch(sdf_cube, borg_sel, t_q)
                if entry_virtual:
                    # a block entered with sdf already < 0 hides a crossing
                    # in the inter-block seam (trilinear clamps at block
                    # faces); register it at the entry plane — the legacy
                    # marcher's prev_v=1 initialisation did the same
                    t_q = jnp.concatenate([lo[..., None], t_q], -1)
                    v_q = jnp.concatenate(
                        [jnp.full(lo[..., None].shape, 1e-3), v_q], -1
                    )
                crossing = (v_q[..., :-1] >= 0) & (v_q[..., 1:] < 0)   # [c,P,S1-1]
                found = jnp.any(crossing, -1)
                j = jnp.argmax(crossing, -1)
                tj = jnp.take_along_axis(t_q, j[..., None], -1)[..., 0]
                tj1 = jnp.take_along_axis(t_q, j[..., None] + 1, -1)[..., 0]
                vj = jnp.take_along_axis(v_q, j[..., None], -1)[..., 0]
                vj1 = jnp.take_along_axis(v_q, j[..., None] + 1, -1)[..., 0]
                return found, tj, tj1, vj, vj1

            f1, lo1, hi1, _, _ = bracket_stage(lo0, hi0)
            # fall back to the whole segment when the mip bracket missed
            lo1b = jnp.where(f1, lo1, t0_sel)
            hi1b = jnp.where(f1, hi1, t1_sel)
            f2, lo2, hi2, vlo, vhi = bracket_stage(lo1b, hi1b, entry_virtual=True)
            denom = vlo - vhi
            alpha = jnp.clip(
                vlo / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom), 0.0, 1.0
            )
            t_star = lo2 + alpha * (hi2 - lo2)
            return f2, t_star, ohl, borg_sel

        found = jnp.zeros((cdim, P), bool)
        t_star = jnp.zeros((cdim, P))
        ohl_win = jnp.zeros((cdim, P, lb), jnp.bfloat16)
        borg_win = jnp.zeros((cdim, P, 3))
        key = order_key
        for _ in range(k_blocks):
            l_slot = jnp.argmin(key, axis=-1).astype(jnp.int32)
            key = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, key.shape, 2)
                == l_slot[..., None],
                jnp.inf, key,
            )
            fk, tk, ohl_k, borg_k = refine_block(l_slot)
            better = fk & (~found | (tk < t_star))
            t_star = jnp.where(better, tk, t_star)
            ohl_win = jnp.where(better[..., None], ohl_k, ohl_win)
            borg_win = jnp.where(better[..., None], borg_k, borg_win)
            found = found | fk
        found = found & candidate

        # final trilinear weights at t_star -> fused contraction against
        # the tile payload rows via the winner's one-hot (never
        # materializes per-pixel weight/color cubes)
        posq = o[..., 0, :] + dw * t_star[..., None]
        localq = jnp.clip((posq - borg_win) * inv_vox, 0.0, BLOCK - 1.0)
        wx = hat(localq[..., 0], 8)
        wy = hat(localq[..., 1], 8)
        wz = hat(localq[..., 2], 8)
        wzy = jnp.einsum("cpz,cpy->cpzy", wz, wy,
                         preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        wvec = jnp.einsum("cpzy,cpx->cpzyx", wzy, wx,
                          preferred_element_type=jnp.float32).astype(
            jnp.bfloat16).reshape(cdim, P, 512)

        # mask one-hot to valid slots (spill entries beyond a tile's count
        # belong to neighboring tiles in the sorted pair stream)
        ohl_f = ohl_win * vld[:, None, :].astype(jnp.bfloat16)
        w_pl = jnp.einsum("cpk,clk->cpl", wvec, w_r,
                          preferred_element_type=jnp.float32)
        conf = jnp.einsum("cpl,cpl->cp", w_pl,
                          ohl_f.astype(jnp.float32))
        c_pld = jnp.einsum("cpk,clkd->cpld", wvec, c_r,
                           preferred_element_type=jnp.float32)
        color = jnp.einsum("cpld,cpl->cpd", c_pld,
                           ohl_f.astype(jnp.float32)) / 255.0

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


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def raycast_batch(
    vol: TsdfVolume,
    c2ws: jax.Array,  # [M, 4, 4]
    K: jax.Array,
    width: int,
    height: int,
    lb: int = 16,
    s_coarse: int = 4,
    s_refine: int = 8,
    chunk: int = 32,
    k_blocks: int = 2,
    pool_prefix: int | None = None,
):
    """`raycast` scanned over M poses — stacked [M, ...] map dict in one
    device program (see raycast_pallas.raycast_batch for the rationale)."""

    def body(_, c2w):
        return None, raycast(vol, c2w, K, width, height, lb, s_coarse,
                             s_refine, chunk, k_blocks, pool_prefix)

    _, maps = jax.lax.scan(body, None, c2ws)
    return maps
