"""TSDF sphere-tracing raycaster — TPU re-expression of InfiniTAM's
visualisation engine (castRay, ITMVisualisationEngine_Shared.h:123-230;
color decode :556-564; ICP maps :400-480; driver
ITMBasicEngine::runRaycast, ITMBasicEngine.tpp:501).

Differences vs the CUDA kernel, and why:
  * The data-dependent `while` march becomes a fixed-budget
    `lax.fori_loop` with per-ray done flags (static shapes, SPMD lanes).
  * The reference switches to trilinear reads when |sdf| is small *during*
    the march; in lockstep SPMD that would make every step pay 8 hash
    lookups.  We march on cheap uninterpolated reads and instead run a
    few extra trilinear Newton refinement steps after the zero crossing
    (the reference itself finishes with two such steps, :199-207) —
    same fixed point, cheaper march.
  * Per-tile expected-depth ranges (CreateExpectedDepths) bound the march
    length: visible blocks are projected and scatter-min/maxed into a
    16x16-pixel tile grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.precision import mm
from . import hash as vhash
from .volume import (
    BLOCK,
    TsdfVolume,
    read_color_trilinear,
    read_sdf_nearest,
    read_sdf_trilinear,
    read_sdf_with_confidence,
)

RANGE_TILE = 16  # renderingBlockSize (ITMVisualisationEngine_Shared.h:20)


def expected_depth_range(
    vol: TsdfVolume,
    vis_idx: jax.Array,  # [V] visible block indices (-1 padded)
    w2c: jax.Array,
    fx, fy, cx, cy,
    width: int,
    height: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-16x16-tile (zmin, zmax) from projected visible blocks
    (CreateExpectedDepths + ProjectAndSplitBlocks).  Tiles nothing projects
    into get (frustum_min, frustum_min) => their rays exit immediately."""
    p = vol.params
    tw = -(-width // RANGE_TILE)
    th = -(-height // RANGE_TILE)
    valid = vis_idx >= 0
    safe = jnp.where(valid, vis_idx, 0)
    bx, by, bz = vhash.unpack(vol.block_coords[safe])
    corner = jnp.stack([bx, by, bz], -1).astype(jnp.float32) * (p.voxel_size * BLOCK)
    offs = jnp.array(
        [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        dtype=jnp.float32,
    ) * (p.voxel_size * BLOCK)
    pts = corner[:, None, :] + offs[None, :, :]
    pc = mm(pts, w2c[:3, :3].T) + w2c[:3, 3]  # [V, 8, 3]
    z = pc[..., 2]
    zc = jnp.clip(z, p.frustum_min, p.frustum_max)
    u = fx * pc[..., 0] / jnp.maximum(z, 1e-6) + cx
    v = fy * pc[..., 1] / jnp.maximum(z, 1e-6) + cy
    behind = z <= 1e-6
    # project the block's 2D bbox onto the tile grid
    u = jnp.where(behind, jnp.where(pc[..., 0] >= 0, 1e6, -1e6), u)
    v = jnp.where(behind, jnp.where(pc[..., 1] >= 0, 1e6, -1e6), v)
    any_front = jnp.any(~behind, axis=1) & valid
    u0 = jnp.clip(jnp.floor(jnp.min(u, axis=1) / RANGE_TILE), 0, tw - 1).astype(jnp.int32)
    u1 = jnp.clip(jnp.floor(jnp.max(u, axis=1) / RANGE_TILE), 0, tw - 1).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(jnp.min(v, axis=1) / RANGE_TILE), 0, th - 1).astype(jnp.int32)
    v1 = jnp.clip(jnp.floor(jnp.max(v, axis=1) / RANGE_TILE), 0, th - 1).astype(jnp.int32)
    bzmin = jnp.where(any_front, jnp.min(zc, axis=1), jnp.inf)
    bzmax = jnp.where(any_front, jnp.max(zc, axis=1), -jnp.inf)

    zmin = jnp.full((th, tw), jnp.inf, dtype=jnp.float32)
    zmax = jnp.full((th, tw), -jnp.inf, dtype=jnp.float32)
    # bound the per-block tile fan-out: blocks are small on screen; an
    # 8x8-tile cap covers blocks up to ~128 px (beyond that the range just
    # stays conservative for the missed tiles)
    CAP = 8
    for dy in range(CAP):
        for dx in range(CAP):
            ty = v0 + dy
            tx = u0 + dx
            on = any_front & (ty <= v1) & (tx <= u1)
            flat = jnp.where(on, ty * tw + tx, th * tw)
            zmin = zmin.reshape(-1).at[flat].min(bzmin, mode="drop").reshape(th, tw)
            zmax = zmax.reshape(-1).at[flat].max(bzmax, mode="drop").reshape(th, tw)
    zmin = jnp.where(jnp.isfinite(zmin), zmin, vol.params.frustum_min)
    zmax = jnp.where(jnp.isfinite(zmax), zmax, vol.params.frustum_min)
    # small safety margin of one truncation band
    zmin = jnp.maximum(zmin - p.mu, p.frustum_min)
    zmax = jnp.minimum(zmax + p.mu, p.frustum_max)
    return zmin, zmax


@partial(jax.jit, static_argnums=(4, 5))
def raycast(
    vol: TsdfVolume,
    c2w: jax.Array,  # 4x4 camera-to-world
    K: jax.Array,    # 3x3
    vis_idx: jax.Array | None,  # optional [V] visible blocks for depth ranges
    width: int,
    height: int,
):
    """Render the volume from a camera.  Returns a dict:
      vertex_map   [H, W, 3] world-space hit points (metres; 0 when miss)
      color_map    [H, W, 3] trilinear voxel color in [0,1]
      confidence   [H, W, 1] interpolated integration weight + 1 (0 = miss)
      depth_map    [H, W, 1] camera-space z of hits (0 = miss)
      normal_map   [H, W, 3] SDF-gradient normals (for ICP)
    """
    p = vol.params
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    R, t = c2w[:3, :3], c2w[:3, 3]
    w2c_R = R.T
    w2c_t = -mm(R.T, t)
    w2c = jnp.concatenate(
        [jnp.concatenate([w2c_R, w2c_t[:, None]], 1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]])], 0
    )

    one_over_voxel = 1.0 / p.voxel_size
    step_scale = p.mu * one_over_voxel

    i = jnp.arange(width, dtype=jnp.float32)[None, :]
    j = jnp.arange(height, dtype=jnp.float32)[:, None]
    dx = jnp.broadcast_to((i - cx) / fx, (height, width))
    dy = jnp.broadcast_to((j - cy) / fy, (height, width))
    dir_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)  # [H, W, 3]
    dir_w = mm(dir_cam, R.T)  # world direction (unnormalized; z_cam = 1 scaling)

    if vis_idx is not None:
        zmin, zmax = expected_depth_range(
            vol, vis_idx, w2c, fx, fy, cx, cy, width, height
        )
        zmin_px = jnp.repeat(jnp.repeat(zmin, RANGE_TILE, 0), RANGE_TILE, 1)[
            :height, :width
        ]
        zmax_px = jnp.repeat(jnp.repeat(zmax, RANGE_TILE, 0), RANGE_TILE, 1)[
            :height, :width
        ]
    else:
        zmin_px = jnp.full((height, width), p.frustum_min)
        zmax_px = jnp.full((height, width), p.frustum_max)

    # start / end points in voxel units (castRay :136-152)
    origin_v = t * one_over_voxel
    pt_start = origin_v + dir_w * zmin_px[..., None] * one_over_voxel
    pt_end = origin_v + dir_w * zmax_px[..., None] * one_over_voxel
    ray_vec = pt_end - pt_start
    total_max = jnp.linalg.norm(ray_vec, axis=-1)
    ray_dir = ray_vec / jnp.maximum(total_max, 1e-9)[..., None]

    def march_body(_, state):
        pt, total, sdf_val, done = state
        sdf, found = read_sdf_nearest(vol, pt)
        # step rule (castRay :170-190): full block hop outside allocated
        # space, else sdf-proportional with a 1-voxel floor
        step = jnp.where(
            found, jnp.maximum(sdf * step_scale, 1.0), float(BLOCK)
        )
        crossed = found & (sdf <= 0.0)
        new_done = done | crossed | (total >= total_max)
        adv = jnp.where(new_done, 0.0, step)
        pt = pt + ray_dir * adv[..., None]
        total = total + adv
        sdf_val = jnp.where(done, sdf_val, sdf)
        return pt, total, sdf_val, new_done

    init = (
        pt_start,
        jnp.zeros((height, width)),
        jnp.ones((height, width)),
        total_max <= 0.0,
    )
    pt, total, sdf_val, done = jax.lax.fori_loop(
        0, p.raycast_steps, march_body, init
    )
    hit = done & (sdf_val <= 0.0)

    # trilinear Newton refinement (castRay :199-207, extended)
    def refine_body(_, pt):
        sdf, _found = read_sdf_trilinear(vol, pt)
        return pt + ray_dir * (sdf * step_scale)[..., None]

    # first refinement uses the uninterpolated value (reference :201)
    pt = pt + ray_dir * (sdf_val * step_scale)[..., None]
    pt = jax.lax.fori_loop(0, p.refine_steps - 1, refine_body, pt)
    sdf_final, conf = read_sdf_with_confidence(vol, pt)
    pt = pt + ray_dir * (sdf_final * step_scale)[..., None]

    vertex = jnp.where(hit[..., None], pt * p.voxel_size, 0.0)
    confidence = jnp.where(hit, conf + 1.0, 0.0)[..., None]
    color = jnp.where(hit[..., None], read_color_trilinear(vol, pt), 0.0)

    # camera-space depth of the hit (slam_pipeline.cpp:396-403)
    pc = mm(vertex, w2c_R.T) + w2c_t
    depth = jnp.where(hit, pc[..., 2], 0.0)[..., None]

    # SDF-gradient normals in world space (computeNormalAndAngle,
    # ITMVisualisationEngine_Shared.h:232-310 uses voxel-grid central
    # differences of the trilinear field)
    eps = 1.0  # one voxel
    def grad_axis(axis):
        off = jnp.zeros(3).at[axis].set(eps)
        s_pos, _ = read_sdf_trilinear(vol, pt + off)
        s_neg, _ = read_sdf_trilinear(vol, pt - off)
        return s_pos - s_neg

    g = jnp.stack([grad_axis(0), grad_axis(1), grad_axis(2)], axis=-1)
    g_norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    normal = jnp.where(hit[..., None], g / jnp.maximum(g_norm, 1e-9), 0.0)

    return {
        "vertex_map": vertex,
        "color_map": color,
        "confidence_map": confidence,
        "depth_map": depth,
        "normal_map": normal,
    }
