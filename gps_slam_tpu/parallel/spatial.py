"""Spatial sharding of the voxel-block pool over a device mesh — the
second multi-chip axis named in SURVEY §2.4 (the reference has nothing
comparable: InfiniTAM is single-GPU; this is where the TPU design goes
past it).

Decomposition: block OWNERSHIP by key hash.  Every device runs the same
per-frame allocation candidate pass (identical inputs, no communication),
masks the stream to the keys whose hash lands on its shard, and
allocates/integrates only those blocks in its private hash table + pool.
The map is the disjoint union of the shards:

  * fusion needs ZERO collectives — candidate masking is deterministic
    and identical everywhere, so shards never disagree about ownership;
  * raycast runs per shard and merges by nearest-hit (depth z-min): the
    true first crossing along a ray lives in exactly one shard, so the
    merged maps equal the single-volume raycast (up to per-tile list
    capacity, which the sharded version effectively multiplies by S);
  * memory scales: each device sizes its pool/table at capacity/S.

The merge is the only cross-device step; under `shard_map` it is one
all_gather of the [H, W] maps (rides ICI), here expressed as stacked
[S, ...] outputs + the z-min combine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tsdf import integrate, raycast_tiles
from ..tsdf.volume import TsdfParams, TsdfVolume, create


def create_sharded(params: TsdfParams, n_shards: int) -> TsdfVolume:
    """A stacked volume: every leaf gets a leading [S] shard axis.
    Per-shard capacities should already be divided by S in `params`."""
    base = create(params)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_shards, *x.shape)).copy()
        if hasattr(x, "shape") else x,
        base,
    )


def shard_volume(svol: TsdfVolume, mesh: Mesh) -> TsdfVolume:
    """Place the stacked volume's leaves shard-axis-over-mesh."""
    sh = NamedSharding(mesh, P("space"))
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, svol)


@partial(jax.jit, static_argnums=(5, 6), donate_argnums=(0,))
def fuse_frame_sharded(
    svol: TsdfVolume,      # stacked [S, ...] leaves
    depth: jax.Array,
    rgb: jax.Array,
    c2w: jax.Array,
    K: jax.Array,
    n_shards: int,
    use_pallas: bool = False,
) -> TsdfVolume:
    """One fused frame across all shards (vmap over the shard axis; under
    a Mesh + sharded leaves XLA partitions this with no collectives —
    the ownership mask makes shards independent)."""

    def one(vol_shard, sid):
        return integrate.fuse_frame(
            vol_shard, depth, rgb, c2w, K, False, use_pallas,
            shard_sid=sid, shard_n=n_shards,
        )

    sids = jnp.arange(n_shards, dtype=jnp.int32)
    return jax.vmap(one, in_axes=(0, 0))(svol, sids)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def raycast_sharded(
    svol: TsdfVolume,
    c2w: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    lb: int = 16,
    s_coarse: int = 4,
    s_refine: int = 8,
    chunk: int = 32,
):
    """Per-shard tile raycast + nearest-hit merge.  Returns the same map
    dict as raycast_tiles.raycast."""

    def one(vol_shard):
        return raycast_tiles.raycast(
            vol_shard, c2w, K, width, height, lb, s_coarse, s_refine, chunk)

    maps = jax.vmap(one)(svol)                 # each leaf [S, H, W, ...]
    depth_s = maps["depth_map"][..., 0]        # [S, H, W]
    dz = jnp.where(depth_s > 0, depth_s, jnp.inf)
    winner = jnp.argmin(dz, axis=0)            # [H, W]
    any_hit = jnp.any(depth_s > 0, axis=0)

    def pick(x):                               # [S, H, W, C?] -> [H, W, C?]
        idx = winner[None, ..., None] if x.ndim == 4 else winner[None]
        return jnp.take_along_axis(x, idx, axis=0)[0]

    out = {
        "depth_map": jnp.where(any_hit[..., None],
                               pick(maps["depth_map"]), 0.0),
        "vertex_map": jnp.where(any_hit[..., None],
                                pick(maps["vertex_map"]), 0.0),
        "color_map": jnp.where(any_hit[..., None],
                               pick(maps["color_map"]), 0.0),
        "confidence_map": jnp.where(any_hit[..., None],
                                    pick(maps["confidence_map"]), 0.0),
        "n_tile_overflow": jnp.sum(maps["n_tile_overflow"]),
    }
    # normals recomputed from the merged vertex map (shard-local normals
    # are invalid along shard silhouettes)
    from ..utils.se3 import compute_normal_map

    normal = compute_normal_map(out["vertex_map"])
    hit_mask = (out["depth_map"][..., 0] > 0).astype(jnp.float32)
    nbhd_ok = jax.lax.reduce_window(
        hit_mask, 1.0, jax.lax.min, (3, 3), (1, 1), "SAME") > 0.5
    out["normal_map"] = jnp.where(nbhd_ok[..., None], normal, 0.0)
    return out


def total_blocks(svol: TsdfVolume) -> jax.Array:
    return jnp.sum(svol.n_blocks)
