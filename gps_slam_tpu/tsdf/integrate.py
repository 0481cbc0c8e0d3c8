"""Depth-driven block allocation + TSDF fusion — TPU re-expression of
InfiniTAM's ITMSceneReconstructionEngine_CUDA (AllocateSceneFromDepth +
IntegrateIntoScene, ITMSceneReconstructionEngine_CUDA.tcu:96-246, shared
math in ITMSceneReconstructionEngine_Shared.h:8-323).

Design notes (vs the CUDA reference):
  * Allocation candidates come from the same per-pixel mu-band march
    (Shared.h:207-323) but with a *static* step count; insertion goes
    through the probing scheme in `hash.insert` instead of the serialized
    freelist kernel.
  * The visible-block list is recomputed per frame by projecting all
    allocated blocks' corners into the camera (the reference instead
    unions "touched this frame" with a persisted visible list +
    re-projection; recomputing from the pool is simpler, has the same
    result, and is one dense vectorized pass).
  * Integration gathers whole visible blocks, updates all 512 voxels with
    masked running averages, and scatters them back — indices are unique
    by construction so there are no atomics and the result is
    deterministic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.precision import mm
from . import hash as vhash
from .volume import (BLOCK, BLOCK_VOL, TsdfVolume, pack_state,
                     state_sdf_f32, state_w_color, state_w_depth)


def _pack_rgb(rgb: jax.Array) -> jax.Array:
    """[H, W, 3] float in [0,1] -> packed rgb888 uint32 [H, W]."""
    q = jnp.clip(rgb * 255.0 + 0.5, 0, 255).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)


def _unpack_rgb(p: jax.Array) -> jax.Array:
    return jnp.stack(
        [(p & 0xFF), (p >> 8) & 0xFF, (p >> 16) & 0xFF], axis=-1
    ).astype(jnp.float32) / 255.0


def _project(pt_cam: jax.Array, fx, fy, cx, cy):
    """Camera-space point -> pixel coords (u, v)."""
    z = pt_cam[..., 2]
    u = fx * pt_cam[..., 0] / z + cx
    v = fy * pt_cam[..., 1] / z + cy
    return u, v, z


def alloc_candidates(
    depth: jax.Array,       # [H, W] metres
    c2w: jax.Array,         # 4x4 camera-to-world
    fx, fy, cx, cy,
    voxel_size: float,
    mu: float,
    frustum_min: float,
    frustum_max: float,
    n_steps: int,
    stride: int = 2,
) -> jax.Array:
    """Per-pixel mu-band block candidates, packed keys
    [ceil(H/stride)*ceil(W/stride)*n_steps]
    (buildHashAllocAndVisibleTypePP, Shared.h:207-323).

    `stride` subsamples the pixel grid: a block spans >=25 px at 1 m with
    5 mm voxels, so stride-2 candidates still name every surface block
    (a sub-pixel sliver missed in one frame re-candidates the next) while
    the downstream dedup sort shrinks 4x.  All math is scalar [h, w]
    planes — no [., ., 3]-stacked arrays (3-lane layouts waste the VPU).

    The subsample is a reshape + reduce, NOT a strided slice: XLA lowers
    `depth[::2, ::2]` of a T(8,128)-tiled image as a 204k-element
    scalar-core gather (~3.9 ms/frame, round-3 xplane trace).  Each quad
    contributes TWO band marches — at its max and (valid-)min depth — so
    depth discontinuities allocate both the near and far surface (a
    max-only pool was measured to bias the fused geometry at edges hard
    enough to move tracked ATE 13.6 -> 20.9 cm on the CI orbit); uniform
    quads emit identical streams the dedup sort removes."""
    H, W = depth.shape
    Hs, Ws = (H // stride) * stride, (W // stride) * stride
    quads = depth[:Hs, :Ws].reshape(Hs // stride, stride, Ws // stride, stride)
    z_max = jnp.max(quads, axis=(1, 3))
    z_min = jnp.min(jnp.where(quads > 0, quads, jnp.inf), axis=(1, 3))
    z_min = jnp.where(jnp.isfinite(z_min), z_min, 0.0)
    Hh, Ww = z_max.shape
    one_over_block = 1.0 / (voxel_size * BLOCK)
    i = (jnp.arange(Ww, dtype=jnp.float32) * stride)[None, :]
    j = (jnp.arange(Hh, dtype=jnp.float32) * stride)[:, None]
    R, t = c2w[:3, :3], c2w[:3, 3]
    inv = 1.0 / max(n_steps - 1, 1)

    def band_keys(z):
        valid = (
            (z > 0)
            & ((z - mu) >= frustum_min)
            & ((z + mu) <= frustum_max)
        )
        x = z * (i - cx) / fx
        y = z * (j - cy) / fy
        norm = jnp.sqrt(x * x + y * y + z * z)
        norm = jnp.maximum(norm, 1e-6)
        s0 = 1.0 - mu / norm
        s1 = 1.0 + mu / norm
        # world-space ray through the band, per axis ([h, w] planes)
        wx = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z
        wy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z
        wz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z
        sx0 = (wx * s0 + t[0]) * one_over_block
        sy0 = (wy * s0 + t[1]) * one_over_block
        sz0 = (wz * s0 + t[2]) * one_over_block
        dx = (wx * s1 + t[0]) * one_over_block - sx0
        dy = (wy * s1 + t[1]) * one_over_block - sy0
        dz = (wz * s1 + t[2]) * one_over_block - sz0
        keys = []
        for s in range(n_steps):
            f = s * inv
            bx = jnp.floor(sx0 + f * dx).astype(jnp.int32)
            by = jnp.floor(sy0 + f * dy).astype(jnp.int32)
            bz = jnp.floor(sz0 + f * dz).astype(jnp.int32)
            in_range = vhash.coords_in_range(bx, by, bz)
            k = vhash.pack(bx, by, bz)
            keys.append(jnp.where(valid & in_range, k, vhash.EMPTY))
        return keys

    keys = band_keys(z_max) + band_keys(z_min)
    return jnp.stack(keys, axis=-1).reshape(-1)


def visible_blocks(
    vol: TsdfVolume,
    w2c: jax.Array,
    fx, fy, cx, cy,
    width: int,
    height: int,
    depth: jax.Array | None = None,
    prefix: int | None = None,
    cap: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Indices of allocated blocks visible in the camera, padded with -1 to
    `cap` (default `visible_capacity`), plus the UN-capped visible count
    (the engine sizes the next frames' cap bucket from it — integration
    cost then scales with the actual on-screen block count, not the
    worst-case capacity)
    (ITMSceneReconstructionEngine_CUDA buildVisibleList /
    checkBlockVisibility).  A block is visible when any of its 8 corners
    projects inside the (slightly enlarged) image within the frustum.

    With `depth` given and band_only_integration set, blocks far from the
    measured surface band at their image tile are dropped: integrating
    them only performs free-space carving, a no-op for static scenes.  The
    test uses 32x32-pixel min/max depth pools.

    `prefix` bounds the scan to the allocated-prefix bucket (the pool
    allocator is a cursor, so rows >= n_blocks are never allocated) —
    callers pass a cached-count bucket so per-frame cost tracks scene
    size, not capacity.  A stale-low prefix only delays brand-new blocks'
    first integration by one frame (they re-enter via next frame's
    candidates)."""
    p = vol.params
    B = prefix if prefix is not None else p.block_capacity
    allocated = jnp.arange(B, dtype=jnp.int32) < vol.n_blocks
    bxi, byi, bzi = vhash.unpack(vol.block_coords[:B])
    ext = p.voxel_size * BLOCK
    cxw = bxi.astype(jnp.float32) * ext   # [B] world min corner per axis
    cyw = byi.astype(jnp.float32) * ext
    czw = bzi.astype(jnp.float32) * ext
    R, t = w2c[:3, :3], w2c[:3, 3]
    margin_u, margin_v = 0.125 * width, 0.125 * height
    # unrolled 8-corner projection on scalar [B] planes (a stacked
    # [B, 8, 3] matmul makes XLA pad 3-lane layouts)
    any_ok = jnp.zeros((B,), bool)
    su = sv = sz = jnp.zeros((B,), jnp.float32)
    for ox in (0.0, ext):
        for oy in (0.0, ext):
            for oz in (0.0, ext):
                px, py, pz = cxw + ox, cyw + oy, czw + oz
                zc_ = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
                xc_ = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
                yc_ = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
                u = fx * xc_ / zc_ + cx
                v = fy * yc_ / zc_ + cy
                any_ok = any_ok | (
                    (zc_ > p.frustum_min) & (zc_ < p.frustum_max)
                    & (u > -margin_u) & (u < width + margin_u)
                    & (v > -margin_v) & (v < height + margin_v)
                )
                su, sv, sz = su + u, sv + v, sz + zc_
    vis = allocated & any_ok

    if depth is not None and p.band_only_integration:
        PT = 32
        th, tw = -(-height // PT), -(-width // PT)
        dpad = jnp.pad(depth, ((0, th * PT - height), (0, tw * PT - width)))
        tiles = dpad.reshape(th, PT, tw, PT)
        dvalid = tiles > 0
        # finite sentinels (not +-inf): the one-hot lane select below
        # multiplies by 0, and inf * 0 = nan would poison the band test
        tmin = jnp.min(jnp.where(dvalid, tiles, 1e9), axis=(1, 3))
        tmax = jnp.max(jnp.where(dvalid, tiles, -1e9), axis=(1, 3))
        zc = sz / 8.0
        uc = jnp.clip(su / 8.0 / PT, 0, tw - 1).astype(jnp.int32)
        vc = jnp.clip(sv / 8.0 / PT, 0, th - 1).astype(jnp.int32)
        margin = p.mu + 1.74 * p.voxel_size * BLOCK
        # tmin[vc, uc] as a 2-D element gather runs on the scalar core
        # (~1.2 ms/frame at B=128k, round-5 trace); a contiguous ROW
        # gather + one-hot lane select is DMA + VPU work instead
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)
        sel = (lane == uc[:, None]).astype(jnp.float32)          # [B, tw]
        tmin_b = jnp.sum(tmin[vc] * sel, axis=1)
        tmax_b = jnp.sum(tmax[vc] * sel, axis=1)
        in_band = (zc > tmin_b - margin) & (zc < tmax_b + margin)
        vis = vis & in_band

    cap = cap if cap is not None else p.visible_capacity
    n_vis = jnp.sum(vis.astype(jnp.int32))
    if not p.visible_sort_overflow:
        (idx,) = jnp.nonzero(vis, size=cap, fill_value=-1)
        return idx.astype(jnp.int32), n_vis
    # nearest-first overflow: when the visible set exceeds
    # visible_capacity, FAR blocks drop (their pixel footprint is
    # coarsest) instead of arbitrary allocation-order drops — an
    # undersized cap then degrades resolution gracefully rather than
    # punching integration holes (a 4096 cap at bench scale cost 13 dB
    # of PSNR with allocation-order drops).  Two-stage: a cheap nonzero
    # to 2x the cap, then a depth sort of only that subset (a full-pool
    # argsort costs ~7 ms/frame at 2^17).
    pre = min(2 * cap, B)
    (idx0,) = jnp.nonzero(vis, size=pre, fill_value=-1)
    ok0 = idx0 >= 0
    key = jnp.where(ok0, (sz / 8.0)[jnp.where(ok0, idx0, 0)], jnp.inf)
    order = jnp.argsort(key)[:cap]
    idx = idx0[order].astype(jnp.int32)
    ok = jnp.take(key, order) < jnp.inf
    return jnp.where(ok, idx, -1), n_vis


PT = 32  # image tile edge for windowed sampling


def _window_sample(
    depth: jax.Array,        # [H, W]
    rgb_packed: jax.Array,   # [H, W] u32
    u: jax.Array, v: jax.Array,   # [V, 512] projected pixel coords
    width: int, height: int,
    chunk: int = 512,
):
    """Per-voxel image values without element gathers.

    Blocks are small on screen, so each visible block's 512 voxels project
    into a 64x64-pixel window.  The image is cut into 32x32 tiles; each
    block row-gathers its 2x2 tile neighborhood (contiguous 4 KB rows) and
    samples within the window via separable one-hot contractions on the
    MXU (f32-precision for depth: bf16 would quantize metres to ~1 cm).
    Voxels projecting outside their block's window (blocks closer than
    ~0.4 m appear larger than 64 px) are masked out for the frame.

    Returns (depth_vals [V,512], rgb_vals [V,512,3], in_window [V,512]).
    """
    tw = -(-width // PT)
    th = -(-height // PT)
    dpad = jnp.pad(depth, ((0, th * PT - height), (0, tw * PT - width)))
    cpad = jnp.pad(rgb_packed, ((0, th * PT - height), (0, tw * PT - width)))
    d_tiles = dpad.reshape(th, PT, tw, PT).transpose(0, 2, 1, 3).reshape(th * tw, PT, PT)
    c_tiles = cpad.reshape(th, PT, tw, PT).transpose(0, 2, 1, 3).reshape(th * tw, PT, PT)

    V = u.shape[0]
    # window anchor from the block's projected bbox
    umin = jnp.min(u, axis=1)
    vmin = jnp.min(v, axis=1)
    ax = jnp.clip(jnp.floor(umin / PT).astype(jnp.int32), 0, tw - 2)
    ay = jnp.clip(jnp.floor(vmin / PT).astype(jnp.int32), 0, th - 2)

    n_chunks = -(-V // chunk)
    Vp = n_chunks * chunk

    def padv(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((Vp - V, *x.shape[1:]), fill, x.dtype)], 0
        ) if Vp > V else x

    iota64 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * PT), 2)

    def body(carry, xs):
        ui, vi_, axi, ayi = xs
        # gather the 2x2 tile neighborhood (row gathers)
        t00 = ayi * tw + axi
        rows = jnp.stack([t00, t00 + 1, t00 + tw, t00 + tw + 1], 1)   # [c,4]
        dw = d_tiles[rows]                                  # [c,4,PT,PT]
        cw = c_tiles[rows]
        def to_win(x):
            q = x.reshape(-1, 2, 2, PT, PT)                 # [c,ty,tx,y,x]
            return q.transpose(0, 1, 3, 2, 4).reshape(-1, 2 * PT, 2 * PT)
        dwin = to_win(dw)                                   # [c,64,64]
        cwin = to_win(cw)
        lu = ui - (axi * PT)[:, None].astype(jnp.float32)
        lv = vi_ - (ayi * PT)[:, None].astype(jnp.float32)
        iu = jnp.round(lu).astype(jnp.int32)
        iv = jnp.round(lv).astype(jnp.int32)
        in_win = (iu >= 0) & (iu < 2 * PT) & (iv >= 0) & (iv < 2 * PT)
        uh = (iota64 == jnp.clip(iu, 0, 2 * PT - 1)[..., None]).astype(jnp.float32)
        vh = (iota64 == jnp.clip(iv, 0, 2 * PT - 1)[..., None]).astype(jnp.float32)
        # depth: f32 contractions (precision HIGHEST keeps metres exact)
        q = jnp.einsum("cyx,ckx->cyk", dwin, uh,
                       precision=jax.lax.Precision.HIGHEST)
        dval = jnp.einsum("cyk,cky->ck", q, vh,
                          precision=jax.lax.Precision.HIGHEST)
        # color: unpack to f32 channels then the same contractions
        cf = _unpack_rgb(cwin)                               # [c,64,64,3]
        qc = jnp.einsum("cyxd,ckx->cykd", cf, uh,
                        precision=jax.lax.Precision.DEFAULT)
        cval = jnp.einsum("cykd,cky->ckd", qc, vh,
                          precision=jax.lax.Precision.DEFAULT)
        return carry, (dval, cval, in_win)

    xs = (
        padv(u).reshape(n_chunks, chunk, -1),
        padv(v).reshape(n_chunks, chunk, -1),
        padv(ax).reshape(n_chunks, chunk),
        padv(ay).reshape(n_chunks, chunk),
    )
    _, (dvals, cvals, in_win) = jax.lax.scan(body, None, xs)
    return (
        dvals.reshape(Vp, -1)[:V],
        cvals.reshape(Vp, -1, 3)[:V],
        in_win.reshape(Vp, -1)[:V],
    )


def _block_voxel_positions(block_keys: jax.Array, voxel_size: float) -> jax.Array:
    """Packed block keys [V] -> world positions of all 512 voxels
    [V, 512, 3] (voxel center convention: world = (gpos) * voxel_size,
    matching IntegrateIntoScene's globalPos + locId mapping)."""
    bx, by, bz = vhash.unpack(block_keys)
    base = jnp.stack([bx, by, bz], axis=-1).astype(jnp.float32) * BLOCK  # [V,3]
    lin = jnp.arange(BLOCK_VOL, dtype=jnp.int32)
    lx = lin % BLOCK
    ly = (lin // BLOCK) % BLOCK
    lz = lin // (BLOCK * BLOCK)
    local = jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32)  # [512,3]
    return (base[:, None, :] + local[None, :, :]) * voxel_size


def _fuse_frame_impl(
    vol: TsdfVolume,
    depth: jax.Array,   # [H, W] metres
    rgb: jax.Array,     # [H, W, 3] float in [0,1]
    c2w: jax.Array,     # 4x4
    K: jax.Array,       # 3x3
    bilinear_color: bool = False,
    use_pallas: bool = False,
    shard_sid: jax.Array | None = None,  # this device's space-shard id
    shard_n: int = 1,                    # number of space shards
    frame_idx: jax.Array | None = None,  # LRU stamp for the swap engine
    pool_prefix: int | None = None,      # allocated-prefix bucket (visible scan)
    vis_cap: int | None = None,          # visible-list bucket (default capacity)
) -> TsdfVolume:
    """One frame of allocation + integration (DenseMapper::ProcessFrame,
    ITMDenseMapper.tpp:33-60).  Donates the volume for in-place update."""
    p = vol.params
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    height, width = depth.shape

    # 1. allocate blocks along each pixel's mu band: dedup the per-pixel
    #    candidate stream first (50x redundant), then probe-insert
    cand = alloc_candidates(
        depth, c2w, fx, fy, cx, cy, p.voxel_size, p.mu,
        p.frustum_min, p.frustum_max, p.alloc_steps,
        stride=p.alloc_stride,
    )
    if shard_n > 1:
        # spatial sharding (parallel/spatial.py): this device owns only
        # the blocks whose key-hash lands on its shard — candidate streams
        # are identical across devices, ownership masking needs no
        # communication.  Ownership comes from hash bits ABOVE the table
        # index (>> 21, clear of the default 2^21 table's index bits): low
        # bits would make every key owned by shard s hash to a home slot
        # ≡ s (mod S), leaving only H/S reachable home slots per shard
        # table and saturating the bounded probing ~S× earlier than the
        # single-volume table.
        owner = (vhash.hash_packed(cand, 1 << 30) >> 21) % shard_n
        cand = jnp.where(
            (owner == shard_sid) & (cand != vhash.EMPTY), cand, vhash.EMPTY)
    cand = vhash.dedup_candidates(cand, p.alloc_candidate_cap)
    tk, tp, nb, bc, cand_ptrs = vhash.insert(
        vol.table_keys, vol.table_ptrs, vol.n_blocks, vol.block_coords,
        cand, p.max_probes, p.block_capacity,
        # incremental per-frame inserts: a claim round is only lost to a
        # same-bucket same-slot pileup of DIFFERENT new keys — already
        # rare at 1/16 load, and a dropped candidate re-candidates next
        # frame.  Each extra round costs an [M, mp] row gather + an O(M)
        # scalar-core scatter (~0.7 ms/frame at M=32k, round-5 trace)
        claim_rounds=2,
        return_ptrs=True,
    )
    vol = vol.replace(table_keys=tk, table_ptrs=tp, n_blocks=nb, block_coords=bc)

    w2c_R = c2w[:3, :3].T
    w2c_t = -mm(w2c_R, c2w[:3, 3])
    w2c = jnp.concatenate(
        [jnp.concatenate([w2c_R, w2c_t[:, None]], axis=1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0
    )
    # 2. integration set.  Band mode (the default): this frame's deduped
    #    mu-band candidates ARE the blocks whose voxels can update — their
    #    pool ptrs come straight out of `insert` (dedup's sort parks EMPTY
    #    keys at the end, so the valid prefix is contiguous and the list
    #    is a static slice: no 8-corner projection over the allocated
    #    prefix, no [B]-wide band test, no nonzero compaction).  The only
    #    semantic difference vs the projected visible list is a thin shell
    #    of free-space carving beyond +mu that band_only_integration
    #    already skipped at tile granularity (quality-gated by the bench's
    #    psnr/ssim line).  Full-carving mode keeps the projected list.
    if p.band_only_integration:
        V = min(vis_cap if vis_cap is not None else p.visible_capacity,
                p.alloc_candidate_cap)
        vis = cand_ptrs[:V]
        n_vis = jnp.sum((cand != vhash.EMPTY).astype(jnp.int32))
        vis_valid = vis >= 0
        vis_safe = jnp.where(vis_valid, vis, 0)
        # key 0 for padded rows keeps the projection math finite (their
        # voxel updates are masked by vis_valid; EMPTY would unpack to the
        # coord-space corner and can overflow the f32 projection)
        keys = jnp.where(vis_valid, cand[:V], jnp.uint32(0))
    else:
        vis, n_vis = visible_blocks(vol, w2c, fx, fy, cx, cy, width, height,
                                    depth=depth, prefix=pool_prefix,
                                    cap=vis_cap)
        vis_valid = vis >= 0
        vis_safe = jnp.where(vis_valid, vis, 0)
        keys = vol.block_coords[vis_safe]

    # 3. integrate: gather the set's blocks, masked running-average update,
    #    scatter back (computeUpdatedVoxelDepthInfo / ColorInfo,
    #    Shared.h:8-140)
    rgb_packed = _pack_rgb(rgb)

    # the window kernels anchor a 2x2 tile neighborhood at clip(.., dim-2):
    # frames narrower/shorter than two tiles would gather wrong tiles
    if width < 2 * PT or height < 2 * PT:
        use_pallas = False
        bilinear_color = True  # _window_sample has the same 2-tile minimum

    if use_pallas:
        from . import integrate_pallas as ipk

        # the volume's native voxel state IS the kernel's packed format
        # (volume.pack_state) — one u32 row gather, no pack
        old_packed = vol.state[vis_safe]
        new_packed, new_cp, summary = ipk.integrate_blocks_packed(
            depth, rgb_packed, keys, vis_valid, old_packed,
            vol.color[vis_safe], w2c, fx, fy, cx, cy, width, height,
            p.voxel_size, p.mu, p.max_w,
        )
        return _finish_fuse_packed(vol, vis, vis_valid, new_packed, new_cp,
                                   summary, frame_idx, n_vis)

    pos_w = _block_voxel_positions(keys, p.voxel_size)       # [V, 512, 3]
    pc = mm(pos_w, w2c_R.T) + w2c_t                          # camera space
    u, v, z = _project(pc, fx, fy, cx, cy)
    in_img = (
        (z > 0)
        & (u >= 1) & (u <= width - 2)
        & (v >= 1) & (v <= height - 2)
    )
    if bilinear_color:
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, width - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, height - 1)
        d_meas = depth[vi, ui]
        in_win = jnp.ones_like(in_img)
    else:
        d_meas, c_win, in_win = _window_sample(
            depth, rgb_packed, u, v, width, height
        )
    has_depth = d_meas > 0
    eta = d_meas - z
    update = in_img & in_win & has_depth & (eta >= -p.mu) & vis_valid[:, None]

    st_rows = vol.state[vis_safe]                            # [V, 512] u32
    old_f = state_sdf_f32(st_rows)
    old_w = state_w_depth(st_rows).astype(jnp.float32)
    new_f_obs = jnp.minimum(1.0, eta / p.mu)
    num = old_w * old_f + new_f_obs
    den = old_w + 1.0
    new_f = jnp.where(update, num / den, old_f)
    new_w = jnp.where(update, jnp.minimum(den, float(p.max_w)), old_w)

    # color: sampled only near the surface (|eta/mu| < 0.25,
    # Shared.h:176-178).  The image is packed rgb888 so each tap is one u32
    # element-gather.  Default is a single nearest tap: element gathers
    # cost ~4 ms per million on this hardware and the running average over
    # ~100 observations washes out the half-pixel difference vs the
    # reference's bilinear tap (available via bilinear_color=True).
    color_update = update & (eta <= p.mu) & (jnp.abs(eta / p.mu) < 0.25)
    if bilinear_color:
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, width - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, height - 2)
        du = jnp.clip(u - u0, 0.0, 1.0)
        dv = jnp.clip(v - v0, 0.0, 1.0)
        c00 = _unpack_rgb(rgb_packed[v0, u0])
        c01 = _unpack_rgb(rgb_packed[v0, u0 + 1])
        c10 = _unpack_rgb(rgb_packed[v0 + 1, u0])
        c11 = _unpack_rgb(rgb_packed[v0 + 1, u0 + 1])
        c_meas = (
            c00 * ((1 - du) * (1 - dv))[..., None]
            + c01 * (du * (1 - dv))[..., None]
            + c10 * ((1 - du) * dv)[..., None]
            + c11 * (du * dv)[..., None]
        )  # [V, 512, 3] in [0,1]
    else:
        c_meas = c_win
    old_c = _unpack_rgb(vol.color[vis_safe])
    old_wc = state_w_color(st_rows).astype(jnp.float32)
    new_c = jnp.where(
        color_update[..., None],
        (old_c * old_wc[..., None] + c_meas) / (old_wc[..., None] + 1.0),
        old_c,
    )
    new_wc = jnp.where(
        color_update, jnp.minimum(old_wc + 1.0, float(p.max_w)), old_wc
    )

    return _finish_fuse(vol, vis, vis_valid, new_f, new_w, new_c, new_wc,
                        frame_idx, n_vis)


@partial(jax.jit, donate_argnums=(0,), static_argnums=(5, 6, 8, 10, 11))
def fuse_frame(
    vol: TsdfVolume,
    depth: jax.Array,
    rgb: jax.Array,
    c2w: jax.Array,
    K: jax.Array,
    bilinear_color: bool = False,
    use_pallas: bool = False,
    shard_sid: jax.Array | None = None,
    shard_n: int = 1,
    frame_idx: jax.Array | None = None,
    pool_prefix: int | None = None,
    vis_cap: int | None = None,
) -> TsdfVolume:
    """Jitted single-frame wrapper of `_fuse_frame_impl` (see its doc)."""
    return _fuse_frame_impl(vol, depth, rgb, c2w, K, bilinear_color,
                            use_pallas, shard_sid, shard_n, frame_idx,
                            pool_prefix, vis_cap)


@partial(jax.jit, donate_argnums=(0,), static_argnums=(5, 6, 7, 8))
def fuse_frames_scan(
    vol: TsdfVolume,
    depths: jax.Array,  # [F, H, W] metres
    rgbs: jax.Array,    # [F, H, W, 3] float in [0,1]
    c2ws: jax.Array,    # [F, 4, 4]
    K: jax.Array,
    bilinear_color: bool = False,
    use_pallas: bool = False,
    pool_prefix: int | None = None,
    vis_cap: int | None = None,
) -> TsdfVolume:
    """Fuse a CHUNK of frames in one device program (`lax.scan` over the
    per-frame body).  Valid only when every pose is known up front
    (gt-pose train / recon modes) — under tracking, frame i+1's pose
    depends on frame i's raycast, so the engine falls back to per-frame
    dispatch.  The reference's per-frame loop (slam_pipeline.cpp:52-173)
    costs nothing over PCIe; over a high-latency host link each dispatch
    + control fetch is ~ms-scale, and this amortizes it F-fold.  The
    visible-scan `pool_prefix` bucket is held static across the chunk:
    blocks allocated past the bucket within the chunk are still inserted
    and integrate from their next visible pass.  Staleness is up to ~2
    chunks of allocation (cursor refreshes once per chunk), so callers
    must scale the prefix margin by the chunk length
    (tsdf/engine._pool_prefix(stale_frames=...))."""

    def body(v, xs):
        d, c, p = xs
        return _fuse_frame_impl(v, d, c, p, K, bilinear_color, use_pallas,
                                None, 1, None, pool_prefix, vis_cap), None

    vol, _ = jax.lax.scan(body, vol, (depths, rgbs, c2ws))
    return vol


def _finish_fuse_packed(vol, vis, vis_valid, new_packed, new_cp, summary,
                        frame_idx=None, n_vis=None):
    """Scatter-back for the packed integrate kernel: unpacks fuse into
    the scatters, and the per-block raycaster summaries come from the
    kernel's summary rows instead of a full [V, 512] f32 recompute."""
    p = vol.params
    if n_vis is not None:
        vol = vol.replace(n_visible=n_vis)
    scatter_idx = jnp.where(vis_valid, vis, p.block_capacity)
    vol = vol.replace(
        state=vol.state.at[scatter_idx].set(new_packed, mode="drop"),
        color=vol.color.at[scatter_idx].set(new_cp, mode="drop"),
        summary=vol.summary.at[scatter_idx].set(summary, mode="drop"),
    )
    if frame_idx is not None:
        vol = vol.replace(
            last_seen=vol.last_seen.at[scatter_idx].set(
                jnp.broadcast_to(frame_idx, scatter_idx.shape).astype(
                    jnp.int32),
                mode="drop",
            )
        )
    return vol


def _finish_fuse(vol, vis, vis_valid, new_f, new_w, new_c, new_wc,
                 frame_idx=None, n_vis=None):
    """Per-block raycaster summaries + deterministic scatter-back."""
    p = vol.params
    if n_vis is not None:
        vol = vol.replace(n_visible=n_vis)
    # 2x2x2 mean-pooled sdf mip (lin64 = mx + 4*my + 16*mz), min
    # integrated sdf, max weight — one [V, 128] summary row per block
    f_cube = new_f.reshape(-1, 8, 8, 8)          # [V][z][y][x]
    mip = f_cube.reshape(-1, 4, 2, 4, 2, 4, 2).mean(axis=(2, 4, 6)).reshape(-1, 64)
    integrated = new_w > 0
    min_sdf = jnp.min(jnp.where(integrated, new_f, 1.0), axis=1)
    max_w = jnp.max(new_w, axis=1)
    V = new_f.shape[0]
    summary = jnp.concatenate(
        [mip, min_sdf[:, None], max_w[:, None],
         jnp.zeros((V, 62), jnp.float32)], axis=1)

    # scatter back (unique indices -> deterministic); the state pack
    # fuses into the scatter operand
    scatter_idx = jnp.where(vis_valid, vis, p.block_capacity)
    vol = vol.replace(
        state=vol.state.at[scatter_idx].set(
            pack_state(new_f, new_w, new_wc), mode="drop"),
        color=vol.color.at[scatter_idx].set(_pack_rgb(new_c), mode="drop"),
        summary=vol.summary.at[scatter_idx].set(summary, mode="drop"),
    )
    if frame_idx is not None:
        vol = vol.replace(
            last_seen=vol.last_seen.at[scatter_idx].set(
                jnp.broadcast_to(frame_idx, scatter_idx.shape).astype(jnp.int32),
                mode="drop",
            )
        )
    return vol
