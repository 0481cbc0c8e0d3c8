"""Pallas TPU kernel for the per-voxel integration update.

The XLA formulation (`integrate._window_sample` + the masked running
averages in `fuse_frame`) stages its one-hot sampling matmuls through
HBM ([chunk, 64, 512] partials; ~17 ms/frame at bench scale).  This
kernel runs the whole window-sample + TSDF/color update for a block in
VMEM: per visible block it samples all 512 voxels from a 64x64
depth/color window (contiguous 2x2 tile neighborhood) with two one-hot
MXU matmuls, and applies computeUpdatedVoxelDepthInfo / ColorInfo
(ITMSceneReconstructionEngine_Shared.h:8-140) elementwise.

Window sourcing has two modes:

  * resident (default when the tiled image fits VMEM): the WHOLE tiled
    depth/color planes (~3.4 MB each at 1200x680, stored [R, 8, 128] so
    the lane dim is 128-aligned) ride into VMEM once per program, and
    each block dynamic-slices its 2x2 tile neighborhood in-kernel.  The
    pre-gather alternative materialized [V, 4, 32, 32] windows through
    HBM — at V=8192 that is ~270 MB/frame written + re-read, 40x
    duplicated (only ~800 distinct tiles exist), and its scatter-gather
    fusions cost ~2.3 ms/frame in the round-4 trace.
  * pre-gather (fallback for images whose tile planes exceed the VMEM
    budget): the original [V, 4, PT, PT] row-gather outside the kernel.

Everything is [*, 512]-shaped with the block's voxels in the lane
dimension.  Padding rows of the visible list skip compute via pl.when;
their stale outputs are dropped by the caller's scatter (index =
block_capacity, mode="drop")."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hash as vhash
from .volume import BLOCK, BLOCK_VOL

PT = 32            # image tile edge
WIN = 2 * PT       # gathered window edge
# resident-mode VMEM budget for the two tile planes (f32 + u32)
_RESIDENT_BYTES = 10 * 2 ** 20


def _voxel_update(c, meta_ref, pose_ref, sample_fn, sdf_ref, w_ref,
                  col_ref, wc_ref, out_ref, *, voxel_size, mu, max_w,
                  width, height):
    """The per-block voxel update.  `sample_fn(iu, iv) -> (d_meas, cms)`
    selects the nearest depth tap ([1, 512]) and the three color taps
    (list of [1, 512], 0..1) at window-local integer coordinates,
    returning 0 outside the window — shared by both window-sourcing
    kernels."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_VOL), 1)
    vlx = (lin % BLOCK).astype(jnp.float32)
    vly = ((lin // BLOCK) % BLOCK).astype(jnp.float32)
    vlz = (lin // (BLOCK * BLOCK)).astype(jnp.float32)

    R00, R01, R02 = pose_ref[0, 0], pose_ref[0, 1], pose_ref[0, 2]
    R10, R11, R12 = pose_ref[0, 3], pose_ref[0, 4], pose_ref[0, 5]
    R20, R21, R22 = pose_ref[0, 6], pose_ref[0, 7], pose_ref[0, 8]
    t0, t1, t2 = pose_ref[0, 9], pose_ref[0, 10], pose_ref[0, 11]
    fx, fy, cx, cy = (pose_ref[0, 12], pose_ref[0, 13],
                      pose_ref[0, 14], pose_ref[0, 15])

    bxw, byw, bzw = meta_ref[c, 0], meta_ref[c, 1], meta_ref[c, 2]
    ax, ay = meta_ref[c, 3], meta_ref[c, 4]
    px = (bxw + vlx) * voxel_size
    py = (byw + vly) * voxel_size
    pz = (bzw + vlz) * voxel_size
    zc = R20 * px + R21 * py + R22 * pz + t2        # [1, 512]
    xc = R00 * px + R01 * py + R02 * pz + t0
    yc = R10 * px + R11 * py + R12 * pz + t1
    zs = jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
    u = fx * xc / zs + cx
    v = fy * yc / zs + cy
    in_img = ((zc > 0) & (u >= 1) & (u <= width - 2)
              & (v >= 1) & (v <= height - 2))
    iu = jnp.round(u).astype(jnp.int32) - (ax * PT).astype(jnp.int32)
    iv = jnp.round(v).astype(jnp.int32) - (ay * PT).astype(jnp.int32)
    in_win = (iu >= 0) & (iu < WIN) & (iv >= 0) & (iv < WIN)
    d_meas, cms = sample_fn(iu, iv)

    old_f = sdf_ref[c][None, :]                     # [1, 512]
    old_w = w_ref[c][None, :]
    eta = d_meas - zc
    update = (in_img & in_win & (d_meas > 0)
              & (eta >= -mu))
    new_obs = jnp.minimum(1.0, eta / mu)
    den = old_w + 1.0
    new_f = jnp.where(update, (old_w * old_f + new_obs) / den, old_f)
    new_w = jnp.where(update, jnp.minimum(den, float(max_w)), old_w)

    color_update = update & (eta <= mu) & (jnp.abs(eta / mu) < 0.25)
    cold = col_ref[c]                               # [512] u32 packed
    out_ref[c, 0] = new_f[0]
    out_ref[c, 1] = new_w[0]
    old_wc = wc_ref[c][None, :]                     # [1, 512]
    wc_den = old_wc + 1.0
    for ch in range(3):
        oc = ((cold >> (8 * ch)) & 0xFF).astype(jnp.int32).astype(
            jnp.float32)[None, :] / 255.0
        nc = jnp.where(
            color_update, (oc * old_wc + cms[ch]) / wc_den, oc)
        out_ref[c, 2 + ch] = nc[0]
    out_ref[c, 5] = jnp.where(
        color_update, jnp.minimum(wc_den, float(max_w)), old_wc)[0]


def _kernel_pregather(meta_ref, pose_ref, dwin_ref, cwin_ref, sdf_ref,
                      w_ref, col_ref, wc_ref, out_ref, *, C, voxel_size,
                      mu, max_w, width, height):
    i64 = jax.lax.broadcasted_iota(jnp.int32, (WIN, BLOCK_VOL), 0)
    for c in range(C):
        valid = meta_ref[c, 5] > 0

        @pl.when(valid)
        def _():
            d4 = dwin_ref[c]                                # [4, PT, PT] f32
            dwin = jnp.concatenate([
                jnp.concatenate([d4[0], d4[1]], 1),
                jnp.concatenate([d4[2], d4[3]], 1)], 0)     # [64, 64]
            c4 = cwin_ref[c]                                # [4, PT, PT] u32
            cwin = jnp.concatenate([
                jnp.concatenate([c4[0], c4[1]], 1),
                jnp.concatenate([c4[2], c4[3]], 1)], 0)     # [64, 64] packed

            def sample(iu, iv):
                in_win = ((iu >= 0) & (iu < WIN) & (iv >= 0) & (iv < WIN))
                uh = ((i64 == jnp.clip(iu, 0, WIN - 1)) & in_win
                      ).astype(jnp.float32)
                vh = (i64 == jnp.clip(iv, 0, WIN - 1)).astype(jnp.float32)
                # HIGHEST: the one-hot select must not round metres
                # through bf16 MXU passes (1 cm depth = 0.5 sdf at mu=2cm)
                A = jax.lax.dot_general(
                    dwin, uh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # [64, 512]
                d_meas = jnp.sum(vh * A, 0, keepdims=True)   # [1, 512]
                uh_b = uh.astype(jnp.bfloat16)
                cms = []
                for ch in range(3):
                    cf = ((cwin >> (8 * ch)) & 0xFF).astype(
                        jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
                    Ac = jax.lax.dot_general(
                        cf, uh_b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    cms.append(
                        jnp.sum(vh * Ac, 0, keepdims=True) * (1.0 / 255.0))
                return d_meas, cms

            _voxel_update(c, meta_ref, pose_ref, sample, sdf_ref,
                          w_ref, col_ref, wc_ref, out_ref,
                          voxel_size=voxel_size, mu=mu, max_w=max_w,
                          width=width, height=height)


def _kernel_resident(meta_ref, pose_ref, dall_ref, call_ref, sdf_ref,
                     w_ref, col_ref, wc_ref, out_ref, *, C, tw, voxel_size,
                     mu, max_w, width, height):
    """Window sourcing from the VMEM-resident tile planes [R, 8, 128]
    (each row one PT x PT tile in row-major order: element (r, q) of a
    tile sits at [r // 4, (r % 4) * PT + q]).  Per block, two dynamic
    2-row slices fetch the [top-left, top-right] and [bottom-left,
    bottom-right] tile pairs (contiguous row ids r0, r0+1 and r0+tw,
    r0+tw+1).  The one-hot select runs per tile in the [8, 128] domain —
    4 matmuls [8,128]x[128,512], the same MXU work as the pre-gather
    kernel's one [64,64]x[64,512] (Mosaic cannot shape-cast [8,128] tiles
    to [32,32], so the select never assembles a [64,64] window)."""
    i128 = jax.lax.broadcasted_iota(jnp.int32, (128, BLOCK_VOL), 0)
    i8 = jax.lax.broadcasted_iota(jnp.int32, (8, BLOCK_VOL), 0)
    for c in range(C):
        valid = meta_ref[c, 5] > 0

        @pl.when(valid)
        def _():
            ax = meta_ref[c, 3].astype(jnp.int32)
            ay = meta_ref[c, 4].astype(jnp.int32)
            r0 = ay * tw + ax
            dt = dall_ref[pl.ds(r0, 2)]          # [2, 8, 128] f32
            db = dall_ref[pl.ds(r0 + tw, 2)]
            ct = call_ref[pl.ds(r0, 2)]          # [2, 8, 128] u32
            cb = call_ref[pl.ds(r0 + tw, 2)]
            tiles = ((dt[0], ct[0], 0, 0), (dt[1], ct[1], PT, 0),
                     (db[0], cb[0], 0, PT), (db[1], cb[1], PT, PT))

            def sample(iu, iv):
                d_meas = jnp.zeros((1, BLOCK_VOL), jnp.float32)
                cacc = [jnp.zeros((1, BLOCK_VOL), jnp.float32)
                        for _ in range(3)]
                for dtile, ctile, dx, dy in tiles:
                    ju = iu - dx
                    jv = iv - dy
                    inm = ((ju >= 0) & (ju < PT) & (jv >= 0) & (jv < PT))
                    juc = jnp.clip(ju, 0, PT - 1)
                    jvc = jnp.clip(jv, 0, PT - 1)
                    lane = (jvc & 3) * PT + juc          # [1, 512] in [0,128)
                    sub = jvc >> 2                       # [1, 512] in [0,8)
                    uh = ((i128 == lane) & inm).astype(jnp.float32)
                    vh = (i8 == sub).astype(jnp.float32)
                    A = jax.lax.dot_general(
                        dtile, uh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [8, 512]
                    d_meas = d_meas + jnp.sum(vh * A, 0, keepdims=True)
                    uh_b = uh.astype(jnp.bfloat16)
                    for ch in range(3):
                        cf = ((ctile >> (8 * ch)) & 0xFF).astype(
                            jnp.int32).astype(jnp.float32).astype(
                            jnp.bfloat16)
                        Ac = jax.lax.dot_general(
                            cf, uh_b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        cacc[ch] = cacc[ch] + jnp.sum(
                            vh * Ac, 0, keepdims=True) * (1.0 / 255.0)
                return d_meas, cacc

            _voxel_update(c, meta_ref, pose_ref, sample, sdf_ref, w_ref,
                          col_ref, wc_ref, out_ref, voxel_size=voxel_size,
                          mu=mu, max_w=max_w, width=width, height=height)


def _mip_pool_matrix():
    """Constant [512, 64] mean-pool matrix: mip[j] = mean of the 2x2x2
    voxel group (j = mx + 4*my + 16*mz, voxel lin = x + 8y + 64z).  Lets
    the kernel compute the raycaster's sdf mip as ONE tiny MXU matmul
    instead of a lane-dim shuffle (Mosaic has no cheap cross-lane pool)."""
    import numpy as np

    lin = np.arange(BLOCK_VOL)
    j = ((lin % 8) >> 1) + 4 * (((lin // 8) % 8) >> 1) + 16 * ((lin // 64) >> 1)
    m = np.zeros((BLOCK_VOL, 64), np.float32)
    m[lin, j] = 0.125
    return m


def _kernel_resident_packed(meta_ref, pose_ref, planes_ref, pool_ref,
                            old_ref, oldc_ref, out_ref, outc_ref, outs_ref,
                            *, C, tw, voxel_size, mu, max_w, width, height):
    """v2 resident kernel — packed I/O + one stacked MXU dot per tile.

    vs `_kernel_resident`: (a) voxel state crosses HBM as TWO u32 planes
    (sdf_u16 | w<<16 | wc<<24, and packed rgb888) instead of four f32
    planes — 4x less kernel I/O and no XLA-side convert staging; (b) the
    per-tile window select is ONE bf16 [40,128]x[128,512] MXU dot over
    stacked channel planes (depth split hi/lo bf16: d = hi + lo keeps
    ~16 mantissa bits, ~0.02 mm at 5 m — the old kernel burned a
    6-pass f32-HIGHEST dot per tile on this) instead of 4 thin [8,128]
    dots; (c) the raycaster's per-block summaries (sdf mip / min sdf /
    max weight) are computed in-kernel (mip = one [1,512]x[512,64]
    matmul against `pool_ref`), so the caller's scatter consumes kernel
    outputs directly with no [V,8,512] f32 staging pass.

    planes_ref: bf16 [R, 5, 8, 128] resident tile planes, channel order
    (d_hi, d_lo, r, g, b; colors raw 0..255 — exact in bf16).
    outs_ref: f32 [C, 128] — lanes 0..63 mip, 64 min_sdf, 65 max_w."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_VOL), 1)
    vlx = (lin % BLOCK).astype(jnp.float32)
    vly = ((lin // BLOCK) % BLOCK).astype(jnp.float32)
    vlz = (lin // (BLOCK * BLOCK)).astype(jnp.float32)
    i128 = jax.lax.broadcasted_iota(jnp.int32, (128, BLOCK_VOL), 0)
    i8 = jax.lax.broadcasted_iota(jnp.int32, (8, BLOCK_VOL), 0)
    i128r = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    R00, R01, R02 = pose_ref[0, 0], pose_ref[0, 1], pose_ref[0, 2]
    R10, R11, R12 = pose_ref[0, 3], pose_ref[0, 4], pose_ref[0, 5]
    R20, R21, R22 = pose_ref[0, 6], pose_ref[0, 7], pose_ref[0, 8]
    t0, t1, t2 = pose_ref[0, 9], pose_ref[0, 10], pose_ref[0, 11]
    fx, fy, cx, cy = (pose_ref[0, 12], pose_ref[0, 13],
                      pose_ref[0, 14], pose_ref[0, 15])

    for c in range(C):
        valid = meta_ref[c, 5] > 0

        @pl.when(valid)
        def _():
            bxw, byw, bzw = meta_ref[c, 0], meta_ref[c, 1], meta_ref[c, 2]
            ax = meta_ref[c, 3].astype(jnp.int32)
            ay = meta_ref[c, 4].astype(jnp.int32)
            px = (bxw + vlx) * voxel_size
            py = (byw + vly) * voxel_size
            pz = (bzw + vlz) * voxel_size
            zc = R20 * px + R21 * py + R22 * pz + t2        # [1, 512]
            xc = R00 * px + R01 * py + R02 * pz + t0
            yc = R10 * px + R11 * py + R12 * pz + t1
            zs = jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
            u = fx * xc / zs + cx
            v = fy * yc / zs + cy
            in_img = ((zc > 0) & (u >= 1) & (u <= width - 2)
                      & (v >= 1) & (v <= height - 2))
            iu = jnp.round(u).astype(jnp.int32) - ax * PT
            iv = jnp.round(v).astype(jnp.int32) - ay * PT
            in_win = (iu >= 0) & (iu < WIN) & (iv >= 0) & (iv < WIN)

            r0 = ay * tw + ax
            top = planes_ref[pl.ds(r0, 2)]          # [2, 5, 8, 128]
            bot = planes_ref[pl.ds(r0 + tw, 2)]
            d_meas = jnp.zeros((1, BLOCK_VOL), jnp.float32)
            cacc = [jnp.zeros((1, BLOCK_VOL), jnp.float32) for _ in range(3)]
            for pair, k, dx, dy in ((top, 0, 0, 0), (top, 1, PT, 0),
                                    (bot, 0, 0, PT), (bot, 1, PT, PT)):
                ju = iu - dx
                jv = iv - dy
                inm = ((ju >= 0) & (ju < PT) & (jv >= 0) & (jv < PT))
                juc = jnp.clip(ju, 0, PT - 1)
                jvc = jnp.clip(jv, 0, PT - 1)
                lane = (jvc & 3) * PT + juc          # [1, 512] in [0,128)
                sub = jvc >> 2                       # [1, 512] in [0,8)
                uh = ((i128 == lane) & inm).astype(jnp.bfloat16)
                vh = (i8 == sub).astype(jnp.float32)
                A = pair[k].reshape(5 * 8, 128)      # [40, 128] bf16
                sel = jax.lax.dot_general(
                    A, uh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [40, 512]
                d_meas = d_meas + jnp.sum(
                    vh * (sel[0:8] + sel[8:16]), 0, keepdims=True)
                for ch in range(3):
                    cacc[ch] = cacc[ch] + jnp.sum(
                        vh * sel[16 + 8 * ch:24 + 8 * ch], 0, keepdims=True)

            # --- computeUpdatedVoxelDepthInfo / ColorInfo ---
            po = old_ref[c][None, :]                 # [1, 512] u32
            su = (po & 0xFFFF).astype(jnp.int32)
            old_f = jnp.where(su >= 32768, su - 65536, su).astype(
                jnp.float32) * (1.0 / 32767.0)
            old_w = ((po >> 16) & 0xFF).astype(jnp.int32).astype(jnp.float32)
            old_wc = ((po >> 24) & 0xFF).astype(jnp.int32).astype(jnp.float32)
            eta = d_meas - zc
            update = (in_img & in_win & (d_meas > 0) & (eta >= -mu))
            new_obs = jnp.minimum(1.0, eta / mu)
            den = old_w + 1.0
            new_f = jnp.where(update, (old_w * old_f + new_obs) / den, old_f)
            new_w = jnp.where(update, jnp.minimum(den, float(max_w)), old_w)

            color_update = update & (eta <= mu) & (jnp.abs(eta / mu) < 0.25)
            co = oldc_ref[c][None, :]
            wc_den = old_wc + 1.0
            new_cp = jnp.zeros((1, BLOCK_VOL), jnp.uint32)
            for ch in range(3):
                oc = ((co >> (8 * ch)) & 0xFF).astype(jnp.int32).astype(
                    jnp.float32)
                nc = jnp.where(color_update,
                               (oc * old_wc + cacc[ch]) / wc_den, oc)
                q = jnp.clip(nc + 0.5, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint32)
                new_cp = new_cp | (q << (8 * ch))
            new_wc = jnp.where(color_update,
                               jnp.minimum(wc_den, float(max_w)), old_wc)

            sdf_q = jnp.round(
                jnp.clip(new_f, -1.0, 1.0) * 32767.0).astype(jnp.int32)
            out_ref[c] = ((sdf_q & 0xFFFF).astype(jnp.uint32)
                          | (new_w.astype(jnp.int32).astype(jnp.uint32) << 16)
                          | (new_wc.astype(jnp.int32).astype(jnp.uint32) << 24))[0]
            outc_ref[c] = new_cp[0]

            mip = jax.lax.dot_general(
                new_f.astype(jnp.bfloat16), pool_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1, 64]
            minv = jnp.min(jnp.where(new_w > 0, new_f, 1.0))
            maxv = jnp.max(new_w)
            row = jnp.concatenate(
                [mip, jnp.zeros((1, 64), jnp.float32)], 1)
            row = jnp.where(i128r == 64, minv, row)
            row = jnp.where(i128r == 65, maxv, row)
            outs_ref[c] = row[0]


def _block_window_meta(keys, vis_valid, w2c, fx, fy, cx, cy, tw, th,
                       voxel_size):
    """Per-block meta row [V, 8]: world min corner (voxel units), window
    anchor tile, valid flag (shared by both pallas callers)."""
    V = keys.shape[0]
    bx, by, bz = vhash.unpack(keys)
    bxf = bx.astype(jnp.float32) * BLOCK
    byf = by.astype(jnp.float32) * BLOCK
    bzf = bz.astype(jnp.float32) * BLOCK
    R, t = w2c[:3, :3], w2c[:3, 3]
    umin = jnp.full((V,), jnp.inf)
    vmin = jnp.full((V,), jnp.inf)
    ext = voxel_size * BLOCK
    for ox in (0.0, ext):
        for oy in (0.0, ext):
            for oz in (0.0, ext):
                px = bxf * voxel_size + ox
                py = byf * voxel_size + oy
                pz = bzf * voxel_size + oz
                zc = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
                zs = jnp.maximum(zc, 1e-6)
                uu = fx * (R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]) / zs + cx
                vv = fy * (R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]) / zs + cy
                umin = jnp.minimum(umin, uu)
                vmin = jnp.minimum(vmin, vv)
    ax = jnp.clip(jnp.floor(umin / PT), 0, tw - 2).astype(jnp.float32)
    ay = jnp.clip(jnp.floor(vmin / PT), 0, th - 2).astype(jnp.float32)
    return jnp.stack(
        [bxf, byf, bzf, ax, ay, vis_valid.astype(jnp.float32),
         jnp.zeros((V,)), jnp.zeros((V,))], axis=1)


def integrate_blocks_packed(
    depth: jax.Array,        # [H, W] f32
    rgb_packed: jax.Array,   # [H, W] u32
    keys: jax.Array,         # [V] packed block coords
    vis_valid: jax.Array,    # [V] bool
    old_packed: jax.Array,   # [V, 512] u32: sdf_u16 | w<<16 | wc<<24
    old_color: jax.Array,    # [V, 512] u32 packed rgb888
    w2c: jax.Array,
    fx, fy, cx, cy,
    width: int, height: int,
    voxel_size: float, mu: float, max_w: int,
    blocks_per_step: int = 16,
    interpret: bool = False,
):
    """Packed-I/O integration (see `_kernel_resident_packed`).  Returns
    (new_packed u32 [V,512], new_color u32 [V,512], summary f32 [V,128]:
    lanes 0..63 sdf mip, 64 min integrated sdf, 65 max weight).  Rows with
    vis_valid=False return stale values — callers drop them at scatter.

    Falls back to the f32 pre-gather kernel (plus an XLA repack/summary
    pass) when the resident tile planes exceed the VMEM budget."""
    V = keys.shape[0]
    tw = -(-width // PT)
    th = -(-height // PT)
    if (th * tw) * PT * PT * 10 > _RESIDENT_BYTES:
        su = (old_packed & 0xFFFF).astype(jnp.int32)
        old_sdf = jnp.where(su >= 32768, su - 65536, su).astype(
            jnp.float32) * (1.0 / 32767.0)
        old_w = ((old_packed >> 16) & 0xFF).astype(jnp.float32)
        old_wc = ((old_packed >> 24) & 0xFF).astype(jnp.float32)
        new_f, new_w, new_c, new_wc = integrate_blocks(
            depth, rgb_packed, keys, vis_valid, old_sdf, old_w, old_color,
            old_wc, w2c, fx, fy, cx, cy, width, height, voxel_size, mu,
            max_w, interpret=interpret)
        sdf_q = jnp.round(jnp.clip(new_f, -1.0, 1.0) * 32767.0).astype(
            jnp.int32)
        new_packed = ((sdf_q & 0xFFFF).astype(jnp.uint32)
                      | (new_w.astype(jnp.uint32) << 16)
                      | (new_wc.astype(jnp.uint32) << 24))
        q = jnp.clip(new_c * 255.0 + 0.5, 0, 255).astype(jnp.uint32)
        new_cp = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
        f_cube = new_f.reshape(-1, 4, 2, 4, 2, 4, 2)
        mip = f_cube.mean(axis=(2, 4, 6)).reshape(-1, 64)
        minv = jnp.min(jnp.where(new_w > 0, new_f, 1.0), axis=1)
        maxv = jnp.max(new_w, axis=1)
        summary = jnp.concatenate(
            [mip, minv[:, None], maxv[:, None],
             jnp.zeros((V, 62), jnp.float32)], axis=1)
        return new_packed, new_cp, summary

    dpad = jnp.pad(depth, ((0, th * PT - height), (0, tw * PT - width)))
    cpad = jnp.pad(rgb_packed,
                   ((0, th * PT - height), (0, tw * PT - width)))
    d_hi = dpad.astype(jnp.bfloat16)
    planes = jnp.stack([
        d_hi,
        (dpad - d_hi.astype(jnp.float32)).astype(jnp.bfloat16),
        (cpad & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
        ((cpad >> 8) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
        ((cpad >> 16) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16),
    ])                                                   # [5, Hp, Wp]
    R_t = th * tw
    planes = planes.reshape(5, th, PT, tw, PT).transpose(
        1, 3, 0, 2, 4).reshape(R_t, 5, 8, 128)

    meta = _block_window_meta(keys, vis_valid, w2c, fx, fy, cx, cy,
                              tw, th, voxel_size)
    R, t = w2c[:3, :3], w2c[:3, 3]
    pose = jnp.concatenate([
        R.reshape(-1), t, jnp.asarray([fx, fy, cx, cy]).reshape(-1)
    ]).reshape(1, 16).astype(jnp.float32)
    pool = jnp.asarray(_mip_pool_matrix(), jnp.bfloat16)

    C = blocks_per_step
    n_steps = -(-V // C)
    V_pad = n_steps * C

    def padv(x, fill=0):
        if V_pad == V:
            return x
        return jnp.concatenate(
            [x, jnp.full((V_pad - V, *x.shape[1:]), fill, x.dtype)], 0)

    spec = lambda shape: pl.BlockSpec(
        (C, *shape), lambda i: (i, *([0] * len(shape))),
        memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel_resident_packed, C=C, tw=tw, voxel_size=voxel_size, mu=mu,
        max_w=max_w, width=width, height=height)
    out, outc, outs = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((C, 8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R_t, 5, 8, 128), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_VOL, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            spec((BLOCK_VOL,)), spec((BLOCK_VOL,)),
        ],
        out_specs=[spec((BLOCK_VOL,)), spec((BLOCK_VOL,)), spec((128,))],
        out_shape=[
            jax.ShapeDtypeStruct((V_pad, BLOCK_VOL), jnp.uint32),
            jax.ShapeDtypeStruct((V_pad, BLOCK_VOL), jnp.uint32),
            jax.ShapeDtypeStruct((V_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(padv(meta), pose, planes, pool, padv(old_packed), padv(old_color))
    return out[:V], outc[:V], outs[:V]


def integrate_blocks(
    depth: jax.Array,        # [H, W] f32
    rgb_packed: jax.Array,   # [H, W] u32
    keys: jax.Array,         # [V] packed block coords
    vis_valid: jax.Array,    # [V] bool
    old_sdf: jax.Array,      # [V, 512] f32
    old_w: jax.Array,        # [V, 512] f32
    old_color_packed: jax.Array,  # [V, 512] u32
    old_wc: jax.Array,       # [V, 512] f32
    w2c: jax.Array,          # [4, 4]
    fx, fy, cx, cy,
    width: int, height: int,
    voxel_size: float, mu: float, max_w: int,
    blocks_per_step: int = 8,
    interpret: bool = False,
):
    """Returns (new_f [V,512], new_w [V,512], new_c [V,512,3] float 0..1,
    new_wc [V,512]).  Rows with vis_valid=False return stale values —
    callers must drop them at scatter time."""
    V = keys.shape[0]
    tw = -(-width // PT)
    th = -(-height // PT)
    dpad = jnp.pad(depth, ((0, th * PT - height), (0, tw * PT - width)))
    cpad = jnp.pad(rgb_packed, ((0, th * PT - height), (0, tw * PT - width)))
    d_tiles = dpad.reshape(th, PT, tw, PT).transpose(0, 2, 1, 3).reshape(
        th * tw, PT, PT)
    c_tiles = cpad.reshape(th, PT, tw, PT).transpose(0, 2, 1, 3).reshape(
        th * tw, PT, PT)
    resident = (th * tw) * PT * PT * 8 <= _RESIDENT_BYTES

    # per-block meta: world min corner (voxel units), window anchor, valid
    bx, by, bz = vhash.unpack(keys)
    bxf = bx.astype(jnp.float32) * BLOCK
    byf = by.astype(jnp.float32) * BLOCK
    bzf = bz.astype(jnp.float32) * BLOCK
    R, t = w2c[:3, :3], w2c[:3, 3]
    # project the 8 corners to get the window anchor (scalar [V] planes)
    umin = jnp.full((V,), jnp.inf)
    vmin = jnp.full((V,), jnp.inf)
    ext = voxel_size * BLOCK
    for ox in (0.0, ext):
        for oy in (0.0, ext):
            for oz in (0.0, ext):
                px = bxf * voxel_size + ox
                py = byf * voxel_size + oy
                pz = bzf * voxel_size + oz
                zc = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
                zs = jnp.maximum(zc, 1e-6)
                uu = fx * (R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]) / zs + cx
                vv = fy * (R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]) / zs + cy
                umin = jnp.minimum(umin, uu)
                vmin = jnp.minimum(vmin, vv)
    ax = jnp.clip(jnp.floor(umin / PT), 0, tw - 2).astype(jnp.float32)
    ay = jnp.clip(jnp.floor(vmin / PT), 0, th - 2).astype(jnp.float32)
    meta = jnp.stack(
        [bxf, byf, bzf, ax, ay, vis_valid.astype(jnp.float32),
         jnp.zeros((V,)), jnp.zeros((V,))], axis=1)          # [V, 8]

    pose = jnp.concatenate([
        R.reshape(-1), t, jnp.asarray([fx, fy, cx, cy]).reshape(-1)
    ]).reshape(1, 16).astype(jnp.float32)

    C = blocks_per_step
    n_steps = -(-V // C)
    V_pad = n_steps * C

    def padv(x, fill=0):
        if V_pad == V:
            return x
        return jnp.concatenate(
            [x, jnp.full((V_pad - V, *x.shape[1:]), fill, x.dtype)], 0)

    spec = lambda shape, ms=pltpu.VMEM: pl.BlockSpec(
        (C, *shape), lambda i: (i, *([0] * len(shape))), memory_space=ms)
    pose_spec = pl.BlockSpec((1, 16), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    meta_spec = pl.BlockSpec((C, 8), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    blk_specs = [spec((BLOCK_VOL,))] * 4
    out_spec = spec((8, BLOCK_VOL))
    out_shape = jax.ShapeDtypeStruct((V_pad, 8, BLOCK_VOL), jnp.float32)

    if resident:
        # [R, 8, 128] keeps the lane dim 128-aligned; a [R, 32, 32]
        # resident plane would be lane-padded 4x by the T(8,128) tiling
        # and blow the VMEM budget
        R_t = th * tw
        d_res = d_tiles.reshape(R_t, 8, 128)
        c_res = c_tiles.reshape(R_t, 8, 128)
        res_spec = lambda: pl.BlockSpec(
            (R_t, 8, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        kern = functools.partial(
            _kernel_resident, C=C, tw=tw, voxel_size=voxel_size, mu=mu,
            max_w=max_w, width=width, height=height)
        out = pl.pallas_call(
            kern,
            grid=(n_steps,),
            in_specs=[meta_spec, pose_spec, res_spec(),
                      res_spec(), *blk_specs],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(padv(meta), pose, d_res, c_res, padv(old_sdf),
          padv(old_w), padv(old_color_packed), padv(old_wc))
    else:
        rows0 = (ay * tw + ax).astype(jnp.int32)
        rows = rows0[:, None] + jnp.asarray(
            [0, 1, tw, tw + 1], jnp.int32)[None]
        dwin = d_tiles[rows]                                # [V, 4, PT, PT]
        cwin = c_tiles[rows]
        kern = functools.partial(
            _kernel_pregather, C=C, voxel_size=voxel_size, mu=mu,
            max_w=max_w, width=width, height=height)
        out = pl.pallas_call(
            kern,
            grid=(n_steps,),
            in_specs=[meta_spec, pose_spec, spec((4, PT, PT)),
                      spec((4, PT, PT)), *blk_specs],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(padv(meta), pose, padv(dwin), padv(cwin), padv(old_sdf),
          padv(old_w), padv(old_color_packed), padv(old_wc))

    new_f = out[:V, 0]
    new_w = out[:V, 1]
    new_c = out[:V, 2:5].transpose(0, 2, 1)                 # [V, 512, 3]
    new_wc = out[:V, 5]
    return new_f, new_w, new_c, new_wc
