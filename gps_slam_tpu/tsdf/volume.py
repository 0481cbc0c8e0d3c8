"""TSDF volume state — the TPU equivalent of InfiniTAM's
ITMScene<ITMVoxel_s_rgb, ITMVoxelBlockHash>.

Fixed-capacity struct-of-arrays pools (ITMLocalVBA + hash,
Objects/Scene/ITMLocalVBA.h:14-35, ITMVoxelBlockHash.h:15-31):
voxel blocks are 8^3, allocated once, never freed.  Voxel fields mirror
ITMVoxel_s_rgb (Objects/Scene/ITMVoxelTypes.h:41-69) at the same widths:
sdf int16 (value = sdf * 32767, SDF_SCALE below — quantization is 0.6 um
at mu = 2 cm), integration weight uint8 (maxW = 100), rgb uint8[3] and
color weight uint8.  The narrow pool halves fusion/raycast HBM traffic
end-to-end; all arithmetic converts to f32 at gather time.

Voxel linear index inside a block is x + 8*y + 64*z, matching InfiniTAM's
locId so dumps are comparable.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from . import hash as vhash

BLOCK = 8
BLOCK_VOL = BLOCK ** 3
# int16 sdf quantization (ITMVoxelTypes.h:41-69 valueToFloat/floatToValue)
SDF_SCALE = 32767.0
INV_SDF_SCALE = 1.0 / SDF_SCALE


def sdf_to_f32(q: jax.Array) -> jax.Array:
    """Quantized int16 sdf -> float in [-1, 1]."""
    return q.astype(jnp.float32) * INV_SDF_SCALE


def sdf_to_i16(f: jax.Array) -> jax.Array:
    """Float sdf in [-1, 1] -> quantized int16 (round-to-nearest)."""
    return jnp.round(jnp.clip(f, -1.0, 1.0) * SDF_SCALE).astype(jnp.int16)


# ---------------------------------------------------------------------------
# packed voxel state: ONE u32 per voxel = sdf-i16 (bits 0-15, two's
# complement) | w_depth u8 (16-23) | w_color u8 (24-31).  This is the
# same packing the pallas integrate kernel always used internally; storing
# it natively makes fusion gather+scatter ONE plane instead of three
# (scatter cost on this hardware is per-op row overhead, not bytes) and
# deletes the pack/unpack that bracketed every fuse.  Consumers unpack at
# gather time with shift-ands that fuse into the gather consumer.
# ---------------------------------------------------------------------------

STATE_INIT = 0x7FFF  # sdf = +1 (SDF_SCALE), w_depth = 0, w_color = 0


def state_sdf_i32(state: jax.Array) -> jax.Array:
    """Packed state -> sign-extended integer sdf (i32, value in i16 range)."""
    su = (state & 0xFFFF).astype(jnp.int32)
    return jnp.where(su >= 32768, su - 65536, su)


def state_sdf_f32(state: jax.Array) -> jax.Array:
    return state_sdf_i32(state).astype(jnp.float32) * INV_SDF_SCALE


def state_w_depth(state: jax.Array) -> jax.Array:
    return ((state >> 16) & 0xFF).astype(jnp.int32)


def state_w_color(state: jax.Array) -> jax.Array:
    return (state >> 24).astype(jnp.int32)


def pack_state(sdf_f32: jax.Array, w_depth, w_color) -> jax.Array:
    """(f32 sdf in [-1,1], integer-valued weights) -> packed u32."""
    q = jnp.round(jnp.clip(sdf_f32, -1.0, 1.0) * SDF_SCALE).astype(jnp.int32)
    su = jnp.where(q < 0, q + 65536, q).astype(jnp.uint32)
    return (su
            | (w_depth.astype(jnp.uint32) << 16)
            | (w_color.astype(jnp.uint32) << 24))


def unpack_color_np(packed) -> "np.ndarray":
    """Host-side u32 rgb888 -> u8 [..., 3] (meshers / exports)."""
    import numpy as np

    p = np.asarray(packed)
    return np.stack(
        [(p & 0xFF), (p >> 8) & 0xFF, (p >> 16) & 0xFF], axis=-1
    ).astype(np.uint8)


@struct.dataclass
class TsdfParams:
    """Static scene parameters (ITMSceneParams: ITMLibSettings ctor +
    slam/InfiniTAM_tools.cpp:48-63)."""

    voxel_size: float = struct.field(pytree_node=False, default=0.005)
    mu: float = struct.field(pytree_node=False, default=0.02)
    max_w: int = struct.field(pytree_node=False, default=100)
    frustum_min: float = struct.field(pytree_node=False, default=0.2)
    frustum_max: float = struct.field(pytree_node=False, default=10.0)
    hash_size: int = struct.field(pytree_node=False, default=2 ** 21)
    block_capacity: int = struct.field(pytree_node=False, default=2 ** 18)
    max_probes: int = struct.field(pytree_node=False, default=8)
    visible_capacity: int = struct.field(pytree_node=False, default=2 ** 15)
    alloc_steps: int = struct.field(pytree_node=False, default=4)
    alloc_stride: int = struct.field(pytree_node=False, default=2)
    raycast_tiles_per_step: int = struct.field(pytree_node=False, default=8)
    alloc_candidate_cap: int = struct.field(pytree_node=False, default=2 ** 15)
    raycast_lb: int = struct.field(pytree_node=False, default=24)      # blocks/tile
    raycast_samples: int = struct.field(pytree_node=False, default=4)  # coarse samples/block
    raycast_bisect: int = struct.field(pytree_node=False, default=6)
    raycast_chunk: int = struct.field(pytree_node=False, default=32)   # tiles/scan step
    # integrate only blocks near the measured depth band (True) or every
    # visible block incl. free-space carving (False = reference semantics)
    band_only_integration: bool = struct.field(pytree_node=False, default=True)
    # visible-list overflow policy: True = nearest-first (drop FAR blocks
    # when the set exceeds visible_capacity; costs a 2x-cap depth sort
    # ~5 ms/frame at bench scale), False = allocation order (free; safe
    # only when the cap is known to cover the scene's visible set)
    visible_sort_overflow: bool = struct.field(pytree_node=False, default=True)
    raycast_steps: int = struct.field(pytree_node=False, default=96)
    refine_steps: int = struct.field(pytree_node=False, default=3)


@struct.dataclass
class TsdfVolume:
    params: TsdfParams
    # hash table stored as LANE-WIDE rows of consecutive max_probes-slot
    # buckets ([H/128, 128] at the default size): TPU pads the minor dim
    # of HBM buffers to the 128-lane tile, so a [H/mp, mp] bucket-major
    # table occupied 16x its logical bytes and every probe gather dragged
    # the padding (hash.lookup's doc has the numbers).  The flattened
    # (row-major) slot order is IDENTICAL to bucket-major, so 1-D
    # consumers (native mesher, save files) are unaffected.
    table_keys: jax.Array    # uint32 [H/W, W] packed block coords (EMPTY = free)
    table_ptrs: jax.Array    # int32 [H/W, W] block-pool index or -1
    block_coords: jax.Array  # uint32 [B] reverse map: pool idx -> packed coords
    # ONE u32 plane per voxel: sdf-i16 | w_depth u8 << 16 | w_color u8
    # << 24 (see pack_state above).  ITMVoxel_s_rgb's separate fields
    # (ITMVoxelTypes.h:41-69) were three planes here through round 4;
    # packing them made fusion's gather+scatter one plane instead of three
    state: jax.Array         # u32 [B, 512] packed voxel state
    # rgb888 packed into one u32 plane (r | g<<8 | b<<16): a [B, 512, 3]
    # u8 layout costs two full-pool transpose copies per fused frame
    # (XLA flips {1,0,2}<->{1,2,0} around the scatter, ~2 ms/frame) and a
    # channel-major copy in every raycast payload; one u32 plane makes
    # gather/scatter layout-native and unpacks with 3 shift-ands at use
    color: jax.Array         # u32 [B, 512] packed rgb888
    n_blocks: jax.Array      # i32 scalar
    # visible-block count of the LAST fused frame (pre-cap) — the engine
    # fetches it asynchronously to size the next frames' visible-list
    # bucket (integrate.visible_blocks cap)
    n_visible: jax.Array     # i32 scalar
    # incremental per-block summaries for the tile raycaster, ONE f32
    # [B, 128] row per block: lanes 0..63 = 2x2x2 mean-pooled sdf mip,
    # lane 64 = min sdf over integrated voxels (1 = none), lane 65 = max
    # integration weight.  One row = one scatter at fusion time (the
    # separate mip/min/max arrays cost three row scatters per frame, and
    # scatter cost here is per-op index overhead, not bytes)
    summary: jax.Array       # f32 [B, 128]
    # LRU stamp for the host-swapping engine (frame index of the last
    # fusion that saw the block visible; -1 = never)
    last_seen: jax.Array     # i32 [B]


def init_summary(B: int) -> jax.Array:
    """Fresh per-block summary rows: mip = 1 (free space), min_sdf = 1,
    max_w = 0."""
    row = jnp.concatenate(
        [jnp.ones((65,), jnp.float32), jnp.zeros((63,), jnp.float32)])
    return jnp.broadcast_to(row, (B, 128)).copy()


def table_width(params: TsdfParams) -> int:
    """Stored row width of the hash table: 128 lanes when the table is
    big enough, never below one bucket (tiny test tables)."""
    return max(params.max_probes, min(128, params.hash_size))


def create(params: TsdfParams) -> TsdfVolume:
    H, B = params.hash_size, params.block_capacity
    assert H & (H - 1) == 0, "hash_size must be a power of two"
    W = table_width(params)
    return TsdfVolume(
        params=params,
        table_keys=jnp.full((H // W, W), vhash.EMPTY, dtype=jnp.uint32),
        table_ptrs=jnp.full((H // W, W), -1, dtype=jnp.int32),
        block_coords=jnp.full((B,), vhash.EMPTY, dtype=jnp.uint32),
        state=jnp.full((B, BLOCK_VOL), STATE_INIT, dtype=jnp.uint32),
        color=jnp.zeros((B, BLOCK_VOL), dtype=jnp.uint32),
        n_blocks=jnp.zeros((), dtype=jnp.int32),
        n_visible=jnp.zeros((), dtype=jnp.int32),
        summary=init_summary(B),
        last_seen=jnp.full((B,), -1, dtype=jnp.int32),
    )


# ---------------------------------------------------------------------------
# voxel reads (ITMRepresentationAccess.h:151-427 equivalents)
# ---------------------------------------------------------------------------

def _split_voxel(pt_voxel_int: jax.Array):
    """Integer voxel coords [..., 3] -> (packed block key, local linear id)."""
    block = pt_voxel_int >> 3  # floor division by 8, correct for negatives
    local = pt_voxel_int - (block << 3)
    lin = local[..., 0] + BLOCK * local[..., 1] + BLOCK * BLOCK * local[..., 2]
    key = vhash.pack(block[..., 0], block[..., 1], block[..., 2])
    return key, lin


def read_sdf_nearest(vol: TsdfVolume, pt_voxel: jax.Array):
    """Uninterpolated SDF at float voxel coords [..., 3]
    (readFromSDF_float_uninterpolated).  Returns (sdf, found)."""
    pt = jnp.floor(pt_voxel + 0.5).astype(jnp.int32)
    key, lin = _split_voxel(pt)
    ptr = vhash.lookup(vol.table_keys, vol.table_ptrs, key, vol.params.max_probes)
    found = ptr >= 0
    safe = jnp.where(found, ptr, 0)
    sdf = state_sdf_f32(vol.state[safe, lin])
    return jnp.where(found, sdf, 1.0), found


def _gather_corner(vol: TsdfVolume, base: jax.Array, offset):
    pt = base + jnp.array(offset, dtype=jnp.int32)
    key, lin = _split_voxel(pt)
    ptr = vhash.lookup(vol.table_keys, vol.table_ptrs, key, vol.params.max_probes)
    found = ptr >= 0
    safe = jnp.where(found, ptr, 0)
    return safe, lin, found


_CORNERS = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
            (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]


def read_sdf_trilinear(vol: TsdfVolume, pt_voxel: jax.Array):
    """Trilinear SDF (readFromSDF_float_interpolated).  Returns
    (sdf, any_found).  Missing corners contribute sdf=1 (free space),
    matching the reference's uninitialized-voxel value."""
    base = jnp.floor(pt_voxel).astype(jnp.int32)
    f = pt_voxel - base
    wx, wy, wz = f[..., 0], f[..., 1], f[..., 2]
    weights = [
        (1 - wx) * (1 - wy) * (1 - wz), wx * (1 - wy) * (1 - wz),
        (1 - wx) * wy * (1 - wz), wx * wy * (1 - wz),
        (1 - wx) * (1 - wy) * wz, wx * (1 - wy) * wz,
        (1 - wx) * wy * wz, wx * wy * wz,
    ]
    acc = 0.0
    any_found = jnp.zeros(pt_voxel.shape[:-1], dtype=bool)
    for off, w in zip(_CORNERS, weights):
        safe, lin, found = _gather_corner(vol, base, off)
        v = jnp.where(found, state_sdf_f32(vol.state[safe, lin]), 1.0)
        acc = acc + w * v
        any_found = any_found | found
    return acc, any_found


def read_color_trilinear(vol: TsdfVolume, pt_voxel: jax.Array) -> jax.Array:
    """Trilinear color in [0,1] (readFromSDF_color4u_interpolated)."""
    base = jnp.floor(pt_voxel).astype(jnp.int32)
    f = pt_voxel - base
    wx, wy, wz = f[..., 0], f[..., 1], f[..., 2]
    weights = [
        (1 - wx) * (1 - wy) * (1 - wz), wx * (1 - wy) * (1 - wz),
        (1 - wx) * wy * (1 - wz), wx * wy * (1 - wz),
        (1 - wx) * (1 - wy) * wz, wx * (1 - wy) * wz,
        (1 - wx) * wy * wz, wx * wy * wz,
    ]
    acc = jnp.zeros((*pt_voxel.shape[:-1], 3), dtype=jnp.float32)
    for off, w in zip(_CORNERS, weights):
        safe, lin, found = _gather_corner(vol, base, off)
        p = vol.color[safe, lin]
        c = jnp.stack(
            [(p & 0xFF), (p >> 8) & 0xFF, (p >> 16) & 0xFF], axis=-1
        ).astype(jnp.float32)
        c = jnp.where(found[..., None], c, 0.0)
        acc = acc + w[..., None] * c
    return acc / 255.0


def read_sdf_with_confidence(vol: TsdfVolume, pt_voxel: jax.Array):
    """Trilinear SDF + trilinear integration weight as confidence
    (readWithConfidenceFromSDF_float_interpolated)."""
    base = jnp.floor(pt_voxel).astype(jnp.int32)
    f = pt_voxel - base
    wx, wy, wz = f[..., 0], f[..., 1], f[..., 2]
    weights = [
        (1 - wx) * (1 - wy) * (1 - wz), wx * (1 - wy) * (1 - wz),
        (1 - wx) * wy * (1 - wz), wx * wy * (1 - wz),
        (1 - wx) * (1 - wy) * wz, wx * (1 - wy) * wz,
        (1 - wx) * wy * wz, wx * wy * wz,
    ]
    sdf_acc = 0.0
    conf_acc = 0.0
    for off, w in zip(_CORNERS, weights):
        safe, lin, found = _gather_corner(vol, base, off)
        st_ = vol.state[safe, lin]
        sdf_acc = sdf_acc + w * jnp.where(
            found, state_sdf_f32(st_), 1.0
        )
        conf_acc = conf_acc + w * jnp.where(
            found, state_w_depth(st_).astype(jnp.float32), 0.0
        )
    return sdf_acc, conf_acc
