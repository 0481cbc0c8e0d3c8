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
from .volume import BLOCK, BLOCK_VOL, TsdfVolume


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
) -> jax.Array:
    """Per-pixel mu-band block candidates, packed keys [H*W*n_steps]
    (buildHashAllocAndVisibleTypePP, Shared.h:207-323)."""
    Hh, Ww = depth.shape
    one_over_block = 1.0 / (voxel_size * BLOCK)
    i = jnp.arange(Ww, dtype=jnp.float32)[None, :]
    j = jnp.arange(Hh, dtype=jnp.float32)[:, None]
    z = depth
    valid = (
        (z > 0)
        & ((z - mu) >= frustum_min)
        & ((z + mu) <= frustum_max)
    )
    x = z * (i - cx) / fx
    y = z * (j - cy) / fy
    pt_cam = jnp.stack([x, y, z], axis=-1)  # [H, W, 3]
    norm = jnp.linalg.norm(pt_cam, axis=-1, keepdims=True)
    norm = jnp.maximum(norm, 1e-6)
    start_cam = pt_cam * (1.0 - mu / norm)
    end_cam = pt_cam * (1.0 + mu / norm)
    R, t = c2w[:3, :3], c2w[:3, 3]
    start_w = (mm(start_cam, R.T) + t) * one_over_block
    end_w = (mm(end_cam, R.T) + t) * one_over_block
    step = (end_w - start_w) / max(n_steps - 1, 1)
    keys = []
    for s in range(n_steps):
        p = start_w + s * step
        b = jnp.floor(p).astype(jnp.int32)
        in_range = vhash.coords_in_range(b[..., 0], b[..., 1], b[..., 2])
        k = vhash.pack(b[..., 0], b[..., 1], b[..., 2])
        keys.append(jnp.where(valid & in_range, k, vhash.EMPTY))
    return jnp.stack(keys, axis=-1).reshape(-1)


def visible_blocks(
    vol: TsdfVolume,
    w2c: jax.Array,
    fx, fy, cx, cy,
    width: int,
    height: int,
) -> jax.Array:
    """Indices of allocated blocks visible in the camera, padded with -1 to
    `visible_capacity` (ITMSceneReconstructionEngine_CUDA buildVisibleList /
    checkBlockVisibility).  A block is visible when any of its 8 corners
    projects inside the (slightly enlarged) image within the frustum."""
    p = vol.params
    B = p.block_capacity
    allocated = jnp.arange(B, dtype=jnp.int32) < vol.n_blocks
    bx, by, bz = vhash.unpack(vol.block_coords)
    corner = jnp.stack([bx, by, bz], axis=-1).astype(jnp.float32) * (
        p.voxel_size * BLOCK
    )  # [B, 3] world min corner (metres)
    offs = jnp.array(
        [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        dtype=jnp.float32,
    ) * (p.voxel_size * BLOCK)
    pts = corner[:, None, :] + offs[None, :, :]  # [B, 8, 3]
    pc = mm(pts, w2c[:3, :3].T) + w2c[:3, 3]
    u, v, z = _project(pc, fx, fy, cx, cy)
    margin_u, margin_v = 0.125 * width, 0.125 * height
    ok = (
        (z > p.frustum_min)
        & (z < p.frustum_max)
        & (u > -margin_u) & (u < width + margin_u)
        & (v > -margin_v) & (v < height + margin_v)
    )
    vis = allocated & jnp.any(ok, axis=1)
    (idx,) = jnp.nonzero(vis, size=p.visible_capacity, fill_value=-1)
    return idx.astype(jnp.int32)


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


@partial(jax.jit, donate_argnums=(0,))
def fuse_frame(
    vol: TsdfVolume,
    depth: jax.Array,   # [H, W] metres
    rgb: jax.Array,     # [H, W, 3] float in [0,1]
    c2w: jax.Array,     # 4x4
    K: jax.Array,       # 3x3
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
    )
    cand = vhash.dedup_candidates(cand, p.alloc_candidate_cap)
    tk, tp, nb, bc = vhash.insert(
        vol.table_keys, vol.table_ptrs, vol.n_blocks, vol.block_coords,
        cand, p.max_probes, p.block_capacity,
    )
    vol = vol.replace(table_keys=tk, table_ptrs=tp, n_blocks=nb, block_coords=bc)

    # 2. visible list
    w2c_R = c2w[:3, :3].T
    w2c_t = -mm(w2c_R, c2w[:3, 3])
    w2c = jnp.concatenate(
        [jnp.concatenate([w2c_R, w2c_t[:, None]], axis=1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0
    )
    vis = visible_blocks(vol, w2c, fx, fy, cx, cy, width, height)
    vis_valid = vis >= 0
    vis_safe = jnp.where(vis_valid, vis, 0)

    # 3. integrate: gather visible blocks, masked running-average update,
    #    scatter back (computeUpdatedVoxelDepthInfo / ColorInfo,
    #    Shared.h:8-140)
    keys = vol.block_coords[vis_safe]
    pos_w = _block_voxel_positions(keys, p.voxel_size)       # [V, 512, 3]
    pc = mm(pos_w, w2c_R.T) + w2c_t                          # camera space
    u, v, z = _project(pc, fx, fy, cx, cy)
    in_img = (
        (z > 0)
        & (u >= 1) & (u <= width - 2)
        & (v >= 1) & (v <= height - 2)
    )
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, width - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, height - 1)
    d_meas = depth[vi, ui]
    has_depth = d_meas > 0
    eta = d_meas - z
    update = in_img & has_depth & (eta >= -p.mu) & vis_valid[:, None]

    old_f = vol.sdf[vis_safe]                                # [V, 512]
    old_w = vol.w_depth[vis_safe].astype(jnp.float32)
    new_f_obs = jnp.minimum(1.0, eta / p.mu)
    num = old_w * old_f + new_f_obs
    den = old_w + 1.0
    new_f = jnp.where(update, num / den, old_f)
    new_w = jnp.where(update, jnp.minimum(den, float(p.max_w)), old_w)

    # color: bilinear sample, only near the surface (|eta/mu| < 0.25,
    # Shared.h:176-178).  The image is packed rgb888 -> one u32 gather per
    # tap instead of three f32 gathers (3x less random-access traffic).
    color_update = update & (eta <= p.mu) & (jnp.abs(eta / p.mu) < 0.25)
    rgb_packed = _pack_rgb(rgb)
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
    old_c = vol.color[vis_safe].astype(jnp.float32) / 255.0
    old_wc = vol.w_color[vis_safe].astype(jnp.float32)
    new_c = jnp.where(
        color_update[..., None],
        (old_c * old_wc[..., None] + c_meas) / (old_wc[..., None] + 1.0),
        old_c,
    )
    new_wc = jnp.where(
        color_update, jnp.minimum(old_wc + 1.0, float(p.max_w)), old_wc
    )

    # per-block summaries for the tile raycaster: 2x2x2 mean-pooled sdf
    # mip (lin64 = mx + 4*my + 16*mz), min integrated sdf, max weight
    f_cube = new_f.reshape(-1, 8, 8, 8)          # [V][z][y][x]
    mip = f_cube.reshape(-1, 4, 2, 4, 2, 4, 2).mean(axis=(2, 4, 6)).reshape(-1, 64)
    integrated = new_w > 0
    min_sdf = jnp.min(jnp.where(integrated, new_f, 1.0), axis=1)
    max_w = jnp.max(new_w, axis=1).astype(jnp.int32)

    # scatter back (unique indices -> deterministic)
    scatter_idx = jnp.where(vis_valid, vis, p.block_capacity)
    vol = vol.replace(
        sdf=vol.sdf.at[scatter_idx].set(new_f, mode="drop"),
        w_depth=vol.w_depth.at[scatter_idx].set(new_w.astype(jnp.int16), mode="drop"),
        color=vol.color.at[scatter_idx].set(
            jnp.clip(new_c * 255.0 + 0.5, 0, 255).astype(jnp.uint8), mode="drop"
        ),
        w_color=vol.w_color.at[scatter_idx].set(new_wc.astype(jnp.int16), mode="drop"),
        mip=vol.mip.at[scatter_idx].set(mip, mode="drop"),
        block_min_sdf=vol.block_min_sdf.at[scatter_idx].set(min_sdf, mode="drop"),
        block_max_w=vol.block_max_w.at[scatter_idx].set(max_w, mode="drop"),
    )
    return vol
