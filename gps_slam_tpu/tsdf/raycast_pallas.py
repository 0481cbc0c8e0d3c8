"""Pallas TPU kernel for the tile-based TSDF raycast march.

The XLA formulation (`raycast_tiles.raycast`) expresses the per-tile march
as chunked einsums; its intermediates ([chunk, P, LB, S]-shaped hat weights
and partial contractions) round-trip through HBM between fused regions,
which caps it at ~270 ms/camera at 1200x680 on a v5e chip.  This kernel
runs the ENTIRE march for a tile inside VMEM — candidate binning and the
payload row-gathers stay outside (one XLA sort + contiguous gathers, see
raycast_tiles._tile_bins), and a single pallas_call then performs:

  1. ray-AABB slab tests against the tile's LB candidate blocks,
  2. a coarse pass of `s_coarse` trilinear samples per (ray, block)
     against the 4^3 sdf mip (separable hat contractions, all [*, P]
     arrays with the 256-pixel tile in the lane dimension),
  3. per-pixel candidate ranking (blocks with a negative sample first,
     by ray-entry depth — the InfiniTAM march visits blocks in exactly
     this order, ITMVisualisationEngine_Shared.h:123-230),
  4. for the best `k_blocks` candidates: one MXU one-hot selection matmul
     ([LB, 512] x [LB, P] -> the per-pixel 8^3 cube, transposed so P
     stays in lanes) and two sequential bracket stages of `s_refine`
     trilinear samples + a secant step,
  5. the final confidence/color trilinear read as MXU one-hot selection
     of the weight/color rows and a [512, P] elementwise contraction.

Per-tile VMEM footprint is ~1 MB; the grid pipelines `tiles_per_step`
tiles per program with double-buffered input DMA.

Reference semantics: castRay + processPixelICP
(InfiniTAM/ITMLib/Engines/Visualisation/Shared/
ITMVisualisationEngine_Shared.h:123-230, 244-270).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.precision import mm
from . import hash as vhash
from .raycast_tiles import TILE, P, _tile_bins
from .volume import BLOCK, TsdfVolume

NEAR = 0.9


def _kernel(borg_ref, dirs_ref, sdf_ref, mip_ref, col_ref, out_ref,
            *, C, LB, s_coarse, s_refine, k_blocks,
            inv_vox, ext, frustum_min, frustum_max, need_color=True):
    """One grid step: C tiles.  All per-tile arrays keep the 256-pixel
    tile in the LANE dimension ([*, P]); cube payloads are selected into
    [512, P] so the separable trilinear stages are sublane reshapes."""
    iota_lb = jax.lax.broadcasted_iota(jnp.int32, (LB, P), 0).astype(jnp.float32)

    for c in range(C):
        d = dirs_ref[c]                       # [3, P] f32
        borg = borg_ref[c]                    # [LB, 4] f32 (camera-relative
                                              #  corner xyz | block max_w)
        sdf_r = sdf_ref[c]                    # [LB, 512] bf16
        mip_r = mip_ref[c]                    # [LB, 64] bf16
        dx = d[0:1]                           # [1, P]
        dy = d[1:2]
        dz = d[2:3]

        # ---- quad downsample: the coarse/ranking pass runs at 2x2-pixel
        # quads (64 per tile) — candidate blocks are >=10 px across, so
        # block ranking is constant within a quad; this quarters the
        # dominant [LB, *, 64] mip-sampling cost.  Qoh maps quad->pixel.
        ppx = jax.lax.broadcasted_iota(jnp.int32, (64, P), 1) % TILE
        ppy = jax.lax.broadcasted_iota(jnp.int32, (64, P), 1) // TILE
        qp = (ppy // 2) * (TILE // 2) + ppx // 2               # [64, P]
        Qoh = (jax.lax.broadcasted_iota(jnp.int32, (64, P), 0) == qp
               ).astype(jnp.float32)                           # [64, P]
        Qoh_b = Qoh.astype(jnp.bfloat16)

        def to_quad(row):          # [1, P] -> [1, 64] (quad mean)
            return jax.lax.dot_general(
                row, Qoh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * 0.25

        def to_full(rowq):         # [1, 64] -> [1, P] (broadcast)
            return jax.lax.dot_general(
                rowq, Qoh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dqx = to_quad(dx)
        dqy = to_quad(dy)
        dqz = to_quad(dz)

        # ---- ray-AABB slab test at quad resolution ----
        t0 = jnp.full((LB, 64), frustum_min, jnp.float32)
        t1 = jnp.full((LB, 64), frustum_max, jnp.float32)
        for a, da in ((0, dqx), (1, dqy), (2, dqz)):
            ds = jnp.where(jnp.abs(da) < 1e-9, 1e-9, da)
            bmin = borg[:, a:a + 1]           # [LB, 1]
            ta = bmin / ds                    # [LB, 64]
            tb = (bmin + ext) / ds
            t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
            t1 = jnp.minimum(t1, jnp.maximum(ta, tb))
        hit_box = t1 > t0                     # [LB, 64]

        # ---- coarse pass: s_coarse trilinear mip samples per block ----
        # FACTORED accumulation: v = sum_z wz_z * (sum_y wy_y * (sum_x
        # wx_x * m_xyz)) with the mip value m_xyz a [LB, 1] lane slice and
        # every hat row a [LB, 64] array — ~140 VPU ops per (block, step)
        # instead of the dense [LB, 64 cells, 64 quads] hat product
        # (~7M ops/tile/step, ~45 ms/camera of pure VPU in round 4's
        # budget; this was the raycast's dominant cost)
        mip_f = mip_r.astype(jnp.float32)                      # [LB, 64]

        def coarse_body(s, carry):
            minval, has_neg, cand, s_first = carry
            cs = (s.astype(jnp.float32) + 0.5) / s_coarse
            ts = t0 + (t1 - t0) * cs          # [LB, 64]
            lq = []
            for da, a in ((dqx, 0), (dqy, 1), (dqz, 2)):
                la = (da * ts - borg[:, a:a + 1]) * (inv_vox * 0.5)
                lq.append(jnp.clip(la - 0.5, 0.0, 3.0))        # [LB, 64]
            wx = [jnp.maximum(0.0, 1.0 - jnp.abs(lq[0] - i)) for i in range(4)]
            wy = [jnp.maximum(0.0, 1.0 - jnp.abs(lq[1] - i)) for i in range(4)]
            wz = [jnp.maximum(0.0, 1.0 - jnp.abs(lq[2] - i)) for i in range(4)]
            v = jnp.zeros_like(ts)
            for z in range(4):
                acc_z = jnp.zeros_like(ts)
                for y in range(4):
                    acc_y = jnp.zeros_like(ts)
                    for x in range(4):
                        cell = x + 4 * y + 16 * z
                        acc_y = acc_y + mip_f[:, cell:cell + 1] * wx[x]
                    acc_z = acc_z + acc_y * wy[y]
                v = v + acc_z * wz[z]                                   # [LB,64]
            neg = ((v < 0.0) & hit_box).astype(jnp.float32)
            near = ((v < NEAR) & hit_box).astype(jnp.float32)
            # record the FIRST negative sample index per (block, quad) —
            # it brackets the crossing for the refinement stage
            s_first = jnp.where((neg > 0) & (has_neg < 1),
                                s.astype(jnp.float32), s_first)
            # f32 {0,1} masks: Mosaic can't carry i1 vectors through scf.for
            return (jnp.minimum(minval, jnp.where(hit_box, v, jnp.inf)),
                    jnp.maximum(has_neg, neg),
                    jnp.maximum(cand, jnp.max(near, 0, keepdims=True)),
                    s_first)

        minval, has_neg, candidate_q, s_first = jax.lax.fori_loop(
            0, s_coarse, coarse_body,
            (jnp.full((LB, 64), jnp.inf), jnp.zeros((LB, 64), jnp.float32),
             jnp.zeros((1, 64), jnp.float32), jnp.zeros((LB, 64), jnp.float32)),
        )
        candidate = to_full(candidate_q)

        # ---- rank candidates: negative blocks by entry depth, then dips ----
        order_key = jnp.where(
            has_neg > 0, t0 - 1e4,
            jnp.where(minval < NEAR, minval, jnp.inf),
        )                                     # [LB, 64]

        def tri(cube, bx, by, bz_, tq):
            """Trilinear sdf of each pixel's selected cube [8,8,8,P] at
            camera depth tq [1, P]."""
            lx = jnp.clip((dx * tq - bx) * inv_vox, 0.0, BLOCK - 1.0)
            ly = jnp.clip((dy * tq - by) * inv_vox, 0.0, BLOCK - 1.0)
            lz = jnp.clip((dz * tq - bz_) * inv_vox, 0.0, BLOCK - 1.0)
            i8 = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0).astype(jnp.float32)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - i8))   # [8, P]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ly - i8))
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - i8))
            u1 = jnp.sum(cube * wx[None, None], axis=2)     # [8, 8, P]
            u2 = jnp.sum(u1 * wy[None], axis=1)             # [8, P]
            return jnp.sum(u2 * wz, axis=0, keepdims=True)  # [1, P]

        def refine(ohl, ohl_q):
            """Bracket + secant against the selected block's 8^3 cube.
            `ohl` is a {0,1} float mask [LB, P] (bool vectors can't be
            select_n'd / truncated by Mosaic).  The block was ranked at
            quad resolution; its segment [t0s, t1s] is recomputed here
            per PIXEL (one [1, P] slab, ~20 VPU ops)."""
            ohb = ohl.astype(jnp.bfloat16)
            cube = jax.lax.dot_general(
                sdf_r, ohb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(8, 8, 8, P)             # [z, y, x, P]
            bx = jnp.sum(ohl * borg[:, 0:1], 0, keepdims=True)
            by = jnp.sum(ohl * borg[:, 1:2], 0, keepdims=True)
            bz_ = jnp.sum(ohl * borg[:, 2:3], 0, keepdims=True)
            t0s = jnp.full((1, P), frustum_min, jnp.float32)
            t1s = jnp.full((1, P), frustum_max, jnp.float32)
            for bmin, da in ((bx, dx), (by, dy), (bz_, dz)):
                ds = jnp.where(jnp.abs(da) < 1e-9, 1e-9, da)
                ta = bmin / ds
                tb = (bmin + ext) / ds
                t0s = jnp.maximum(t0s, jnp.minimum(ta, tb))
                t1s = jnp.minimum(t1s, jnp.maximum(ta, tb))
            t1s = jnp.maximum(t1s, t0s)
            # mip bracket: the first negative coarse sample of this block
            # (quad res), widened by 1.25 sample spacings — skips a whole
            # 8-sample bracketing stage when the mip saw the crossing
            sfq = jnp.sum(ohl_q * s_first, 0, keepdims=True)      # [1, 64]
            anq = jnp.sum(ohl_q * has_neg, 0, keepdims=True)      # [1, 64]
            sf = to_full(sfq)
            an = to_full(anq)
            dt = (t1s - t0s) / s_coarse
            ts_neg = t0s + (sf + 0.5) * dt
            # SINGLE bracket stage + secant (the two-stage bracket of
            # rounds 2-3 spent 17 tri evals/pixel; the TSDF is LINEAR in
            # depth inside the +-mu truncation band by construction, so
            # once adjacent samples bracket the crossing the secant step
            # is already sub-voxel-exact — measured vs the XLA two-stage
            # oracle: hit-mask xor ~0.3%, depth delta well under a voxel).
            # The mip bracket is widened to 2 coarse spacings to absorb
            # mip-vs-fine smoothing error; no-mip-crossing pixels sample
            # the whole block segment (s_refine samples over <= ~2 block
            # diagonals keeps adjacent samples within the linear band).
            lo0 = jnp.where(an > 0,
                            jnp.maximum(ts_neg - 1.5 * dt, t0s), t0s)
            hi0 = jnp.where(an > 0,
                            jnp.minimum(ts_neg + 0.5 * dt, t1s), t1s)

            def stage(lo, hi, virtual_entry):
                """s_refine samples over [lo, hi]; record the first
                sign crossing.  virtual_entry registers a crossing at the
                entry plane when the block is entered already negative
                (the seam case — trilinear clamps at block faces).

                The samples are UNROLLED (not a fori_loop): each tri eval
                is independent, and exposing that lets Mosaic overlap the
                short dependency chains instead of serializing 8 loop
                iterations (~2x on this stage)."""
                ts = [lo + (hi - lo) * (q / (s_refine - 1))
                      for q in range(s_refine)]
                vs = [tri(cube, bx, by, bz_, tq) for tq in ts]
                if virtual_entry:
                    ts = [lo] + ts
                    vs = [jnp.full((1, P), 1e-3)] + vs
                found = jnp.zeros((1, P), jnp.bool_)
                z = jnp.zeros((1, P))
                tlo, thi, vlo, vhi = z, z, z, z
                for i in range(len(vs) - 1):
                    crossing = (~found) & (vs[i] >= 0) & (vs[i] < 1e9) & (vs[i + 1] < 0)
                    tlo = jnp.where(crossing, ts[i], tlo)
                    thi = jnp.where(crossing, ts[i + 1], thi)
                    vlo = jnp.where(crossing, vs[i], vlo)
                    vhi = jnp.where(crossing, vs[i + 1], vhi)
                    found = found | crossing
                return found, tlo, thi, vlo, vhi

            f2, lo2, hi2, vlo, vhi = stage(lo0, hi0, virtual_entry=True)
            denom = vlo - vhi
            alpha = jnp.clip(
                vlo / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom), 0.0, 1.0)
            return f2, lo2 + alpha * (hi2 - lo2)

        iota_lb_q = jax.lax.broadcasted_iota(
            jnp.int32, (LB, 64), 0).astype(jnp.float32)
        found = jnp.zeros((1, P), jnp.bool_)
        t_star = jnp.zeros((1, P))
        ohl_win = jnp.zeros((LB, P), jnp.float32)
        key = order_key
        for _ in range(k_blocks):
            kmin = jnp.min(key, 0, keepdims=True)              # [1, 64]
            slot_q = jnp.min(
                jnp.where((key <= kmin) & (kmin < jnp.inf), iota_lb_q, LB),
                0, keepdims=True)                              # [1, 64]
            key = jnp.where(
                iota_lb_q == slot_q, jnp.inf, key)
            slot = to_full(slot_q)                             # [1, P]
            ohl = (jnp.abs(iota_lb - slot) < 0.5).astype(jnp.float32)
            ohl_q = (jnp.abs(iota_lb_q - slot_q) < 0.5).astype(jnp.float32)
            fk, tk = refine(ohl, ohl_q)
            fk = fk & (slot < LB - 0.5)
            better = fk & (~found | (tk < t_star))
            bf = better.astype(jnp.float32)
            t_star = jnp.where(better, tk, t_star)
            ohl_win = bf * ohl + (1.0 - bf) * ohl_win
            found = found | fk
        found = found & (candidate > 0)

        # ---- final trilinear confidence/color via one-hot selection ----
        # separable contractions against the selected [8,8,8,P] cubes
        # (building the [512, P] weight vector explicitly costs ~0.65M VPU
        # ops/tile; three hat rows + per-cube u1/u2/u3 sums cost ~0.3M per
        # read and share the hat rows across the 4 reads)
        bxw = jnp.sum(ohl_win * borg[:, 0:1], 0, keepdims=True)
        byw = jnp.sum(ohl_win * borg[:, 1:2], 0, keepdims=True)
        bzw = jnp.sum(ohl_win * borg[:, 2:3], 0, keepdims=True)
        lx = jnp.clip((dx * t_star - bxw) * inv_vox, 0.0, BLOCK - 1.0)
        ly = jnp.clip((dy * t_star - byw) * inv_vox, 0.0, BLOCK - 1.0)
        lz = jnp.clip((dz * t_star - bzw) * inv_vox, 0.0, BLOCK - 1.0)
        i8 = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - i8))          # [8, P]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ly - i8))
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - i8))

        def tri3(rows):
            """[512, P] voxel rows (id = x + 8y + 64z) -> trilinear [1, P]."""
            cube = rows.reshape(8, 8, 8, P)                    # [z, y, x, P]
            u1 = jnp.sum(cube * wx[None, None], axis=2)        # [8, 8, P]
            u2 = jnp.sum(u1 * wy[None], axis=1)                # [8, P]
            return jnp.sum(u2 * wz, axis=0, keepdims=True)     # [1, P]

        # confidence = the winning block's max integration weight
        # (summary lane 65, riding in borg col 3) — the per-voxel
        # trilinear weight read cost a [T, LB, 512] payload gather + one
        # tri3 chain per tile (~1.4 ms/camera); consumers only threshold /
        # average it (keyframe policy), so block-level confidence carries
        # the same signal.  The XLA oracle (raycast_tiles) keeps the
        # reference's per-voxel trilinear semantics.
        conf = jnp.sum(ohl_win * borg[:, 3:4], 0, keepdims=True)  # [1, P]
        fm = found.astype(jnp.float32)
        out_ref[c, 0] = (t_star * fm)[0]
        out_ref[c, 1] = ((conf + 1.0) * fm)[0]
        if need_color:
            ohw = ohl_win.astype(jnp.bfloat16)
            c_sel = jax.lax.dot_general(
                col_ref[c], ohw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [1536, P]
            for ch in range(3):
                col_ch = tri3(c_sel[ch * 512:(ch + 1) * 512]) * (1.0 / 255.0)
                out_ref[c, 2 + ch] = (col_ch * fm)[0]
        else:
            # tracking-prepare mode: ICP consumes vertex/normal only —
            # skip the [T, LB, 1536] color payload (~158 MB/camera at
            # bench scale) and the 3 tri3 chains
            for ch in range(3):
                out_ref[c, 2 + ch] = jnp.zeros((P,), jnp.float32)
        out_ref[c, 5] = fm[0]
        out_ref[c, 6] = jnp.zeros((P,), jnp.float32)
        out_ref[c, 7] = jnp.zeros((P,), jnp.float32)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
def raycast(
    vol: TsdfVolume,
    c2w: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    lb: int = 24,
    s_coarse: int = 4,
    s_refine: int = 8,
    k_blocks: int = 2,
    tiles_per_step: int = 4,
    interpret: bool = False,
    pool_prefix: int | None = None,
    need_color: bool = True,
    need_normals: bool = True,
):
    """Drop-in replacement for raycast_tiles.raycast (same output dict)."""
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

    # payload row gathers (contiguous rows; bf16 once here — the unpack
    # + dequant of the packed state fuses into the gather consumer)
    from .volume import state_sdf_f32

    sdf_rows = state_sdf_f32(vol.state[gids]).astype(jnp.bfloat16)  # [T, LB, 512]
    summ_rows = vol.summary[gids]                              # [T, LB, 128]
    mip_rows = summ_rows[..., :64].astype(jnp.bfloat16)        # [T, LB, 64]
    maxw_rows = summ_rows[..., 65]                             # [T, LB]
    if need_color:
        cp = vol.color[gids]                                   # [T, LB, 512] u32
        col_rows = jnp.concatenate(
            [((cp >> (8 * ch)) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16)
             for ch in range(3)], axis=-1,
        )                                                      # channel-major [T, LB, 1536]
    else:
        col_rows = jnp.zeros((T, 1, 128), jnp.bfloat16)        # spec stub
    bx, by, bz = vhash.unpack(vol.block_coords[gids])
    borg = jnp.stack([bx, by, bz], -1).astype(jnp.float32) * (
        p.voxel_size * BLOCK) - t[None, None, :]               # camera-relative
    # park invalid slots far away -> slab test can never hit them
    borg = jnp.where(valid[..., None], borg, 1e9)
    # col 3 carries the block's max integration weight (confidence source)
    borg = jnp.concatenate(
        [borg, jnp.where(valid, maxw_rows, 0.0)[..., None]], -1)

    # per-tile ray directions, [T, 3, P] (depth-parameterized: dir_cam z=1)
    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tids % tw).astype(jnp.float32) * TILE
    ty0 = (tids // tw).astype(jnp.float32) * TILE
    pp = jnp.arange(P, dtype=jnp.float32)
    px = tx0[:, None] + (pp % TILE)[None] + 0.5                # [T, P]
    py = ty0[:, None] + (pp // TILE)[None] + 0.5
    dirx = (px - cx) / fx
    diry = (py - cy) / fy
    dir_w = (
        dirx[..., None] * R[:, 0] + diry[..., None] * R[:, 1] + R[:, 2]
    )                                                          # [T, P, 3]
    dirs = dir_w.transpose(0, 2, 1)                            # [T, 3, P]

    C = tiles_per_step
    n_steps = -(-T // C)
    T_pad = n_steps * C

    def pad(x, fill=0):
        if T_pad == T:
            return x
        return jnp.concatenate(
            [x, jnp.full((T_pad - T, *x.shape[1:]), fill, x.dtype)], 0)

    borg_p = pad(borg, 1e9)
    dirs_p = pad(dirs, 1.0)
    sdf_p = pad(sdf_rows, 1)
    mip_p = pad(mip_rows, 1)
    col_p = pad(col_rows)

    kern = functools.partial(
        _kernel, C=C, LB=lb, s_coarse=s_coarse, s_refine=s_refine,
        k_blocks=k_blocks, inv_vox=1.0 / p.voxel_size,
        ext=p.voxel_size * BLOCK,
        frustum_min=p.frustum_min, frustum_max=p.frustum_max,
        need_color=need_color,
    )
    spec = lambda shape: pl.BlockSpec(
        (C, *shape), lambda i: (i, *([0] * len(shape))),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            spec((lb, 4)), spec((3, P)), spec((lb, 512)),
            spec((lb, 64)),
            spec((lb, 3 * 512)) if need_color else spec((1, 128)),
        ],
        out_specs=spec((8, P)),
        out_shape=jax.ShapeDtypeStruct((T_pad, 8, P), jnp.float32),
        interpret=interpret,
    )(borg_p, dirs_p, sdf_p, mip_p, col_p)

    t_star = out[:T, 0]                                        # [T, P]
    conf = out[:T, 1]
    color = out[:T, 2:5]                                       # [T, 3, P]
    found = out[:T, 5]

    depth = t_star * found
    vertex = (t[None, None, :] + dir_w * t_star[..., None]) * found[..., None]

    def unpack_img(x, ch=None):
        lastdims = (ch,) if ch else ()
        img = (
            x.reshape(th, tw, TILE, TILE, *lastdims)
            .transpose(0, 2, 1, 3, *(4,) * (1 if ch else 0))
            .reshape(th * TILE, tw * TILE, *lastdims)
        )
        return img[:height, :width]

    depth_img = unpack_img(depth)
    vertex_img = unpack_img(vertex.reshape(T, P, 3), 3)
    color_img = unpack_img(color.transpose(0, 2, 1).reshape(T, P, 3), 3)
    conf_img = unpack_img(conf * found)

    if need_normals:
        from ..utils.se3 import compute_normal_map

        normal_img = compute_normal_map(vertex_img)
        hit_mask = (depth_img > 0).astype(jnp.float32)
        nbhd_ok = jax.lax.reduce_window(
            hit_mask, 1.0, jax.lax.min, (3, 3), (1, 1), "SAME"
        ) > 0.5
        normal_img = jnp.where(nbhd_ok[..., None], normal_img, 0.0)
    else:
        # normal maps feed only the ICP tracker's per-frame prepare and
        # the spawn path (which recomputes its own) — the opt-window and
        # eval BATCH raycasts skip the sobel + reduce_window post-pass
        # (~0.6 ms/frame at bench scale, round-5 trace)
        normal_img = jnp.zeros_like(vertex_img)
    return {
        "vertex_map": vertex_img,
        "color_map": color_img,
        "confidence_map": conf_img[..., None],
        "depth_map": depth_img[..., None],
        "normal_map": normal_img,
        "n_tile_overflow": n_overflow,
    }


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def raycast_batch(
    vol: TsdfVolume,
    c2ws: jax.Array,  # [M, 4, 4]
    K: jax.Array,
    width: int,
    height: int,
    lb: int = 24,
    s_coarse: int = 4,
    s_refine: int = 8,
    k_blocks: int = 2,
    tiles_per_step: int = 4,
    interpret: bool = False,
    pool_prefix: int | None = None,
    need_normals: bool = False,
):
    """`raycast` scanned over M poses — stacked [M, ...] map dict in ONE
    device program.  An optimization window's raycasts (local window +
    sampled keyframes, slam_pipeline.cpp:417-448/528-561) otherwise cost
    one dispatch each; over a high-latency host link the per-dispatch
    submission adds up, and inside one program XLA overlaps each camera's
    tile binning with the previous camera's march."""

    def body(_, c2w):
        return None, raycast(vol, c2w, K, width, height, lb, s_coarse,
                             s_refine, k_blocks, tiles_per_step, interpret,
                             pool_prefix, need_normals=need_normals)

    _, maps = jax.lax.scan(body, None, c2ws)
    return maps
