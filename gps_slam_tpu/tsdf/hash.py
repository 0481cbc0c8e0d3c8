"""Open-addressing voxel-block hash — the TPU-shaped replacement for
InfiniTAM's bucket+excess-list hash (ITMVoxelBlockHash.h:15-31,
ITMRepresentationAccess.h:8-113).

Differences from the reference, and why:
  * The reference uses 2^20 ordered buckets + a 2^17 excess linked list,
    with allocation serialized through a single-threaded kernel
    (ITMSceneReconstructionEngine_CUDA.tcu:406).  Linked lists and
    serialized allocation are hostile to XLA; we use one flat
    power-of-two table probed as ALIGNED max_probes-slot buckets — the
    TPU cousin of the reference's bucket array, without the excess list:
    the whole probe window is one contiguous row gather.  Lookup is a
    single row gather + vector compare (SPMD-friendly, no data-dependent
    trip counts); insertion is a bounded sequence of claim
    rounds whose races are *benign by construction* (all writers racing on
    a slot either carry the same key and agree, or the loser retries at
    the next probe / next frame — exactly the benign-miss semantics
    InfiniTAM accepts in its visible-list marking).
  * Block coordinates are packed into one uint32 (10 bits + sign offset
    per axis => +-512 blocks per axis).  With the default 5 mm voxels /
    4 cm blocks that spans +-20 m, matching the reference's indoor scope.

The same hash function is kept (3-prime xor,
ITMRepresentationAccess.h:8-11) so occupancy statistics carry over.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# packed-coordinate layout
COORD_BITS = 10
COORD_OFFSET = 1 << (COORD_BITS - 1)  # 512
COORD_MASK = (1 << COORD_BITS) - 1
EMPTY = jnp.uint32(0xFFFFFFFF)

_P1 = 73856093
_P2 = 19349669
_P3 = 83492791


def pack(bx: jax.Array, by: jax.Array, bz: jax.Array) -> jax.Array:
    """Pack signed block coords into uint32 (coords outside +-511 alias;
    callers clamp / mask upstream)."""
    x = (bx + COORD_OFFSET).astype(jnp.uint32) & COORD_MASK
    y = (by + COORD_OFFSET).astype(jnp.uint32) & COORD_MASK
    z = (bz + COORD_OFFSET).astype(jnp.uint32) & COORD_MASK
    return x | (y << COORD_BITS) | (z << (2 * COORD_BITS))


def unpack(packed: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    x = (packed & COORD_MASK).astype(jnp.int32) - COORD_OFFSET
    y = ((packed >> COORD_BITS) & COORD_MASK).astype(jnp.int32) - COORD_OFFSET
    z = ((packed >> (2 * COORD_BITS)) & COORD_MASK).astype(jnp.int32) - COORD_OFFSET
    return x, y, z


def coords_in_range(bx: jax.Array, by: jax.Array, bz: jax.Array) -> jax.Array:
    lim = COORD_OFFSET - 1
    return (
        (jnp.abs(bx) <= lim) & (jnp.abs(by) <= lim) & (jnp.abs(bz) <= lim)
    )


def hash_packed(packed: jax.Array, table_size: int) -> jax.Array:
    """3-prime xor hash on the unpacked coords (reference
    ITMRepresentationAccess.h:8-11 hashIndex), masked to the table."""
    x, y, z = unpack(packed)
    h = (x * _P1) ^ (y * _P2) ^ (z * _P3)
    return (h & (table_size - 1)).astype(jnp.int32)


def lookup(
    table_keys: jax.Array,  # uint32 [H/W, W] row-major (W a multiple of mp)
    table_ptrs: jax.Array,  # int32 [H/W, W]
    packed: jax.Array,      # uint32 [...]: query keys
    max_probes: int,
) -> jax.Array:
    """Vectorized probe: returns the block-pool index for each query, or -1.

    Probing is over the ALIGNED `max_probes`-slot bucket containing the
    hash (slots `(h & ~(mp-1)) .. +mp-1`).  The table is STORED as
    LANE-WIDE rows of W/mp consecutive buckets (W = 128 at the default
    2^21 size): TPU pads the minor dim of HBM buffers to the 128-lane
    tile, so an [H/8, 8] bucket-major table occupied 16x its logical
    bytes and every row gather/scatter dragged the padding (~2.3 ms/frame
    of gather + relayout copies in the round-5 xplane trace).  A probe
    now gathers the 128-lane row CONTAINING the bucket and masks to the
    bucket's mp-slot group — dense DMA rows, VPU-side select, no layout
    change (a 1-D [H] table was worse still: T(1024) -> T(8,128)
    relayout per call).  Bucket capacity stays mp keys; with the default
    2^17 blocks in a 2^21 table (load 1/16, Poisson per-bucket mean 0.5)
    a 9-deep bucket has ~1e-9 probability — the same benign-miss class
    the reference's bucket+excess scheme accepts.
    """
    R, W = table_keys.shape
    assert W % max_probes == 0, (table_keys.shape, max_probes)
    mp = max_probes
    gpr = W // mp                                   # buckets per stored row
    bucket = hash_packed(packed, R * W) // mp
    row = bucket // gpr
    keys_r = table_keys[row]   # [..., W] row gather
    ptrs_r = table_ptrs[row]
    lane_g = jnp.arange(W, dtype=jnp.int32) // mp
    gmask = lane_g == (bucket % gpr)[..., None]
    match = (keys_r == packed[..., None]) & gmask
    return jnp.max(jnp.where(match, ptrs_r, -1), axis=-1)


def dedup_candidates(packed: jax.Array, cap: int) -> jax.Array:
    """Collapse a large candidate stream to its unique keys, padded with
    EMPTY to `cap`.  One XLA sort + compaction — candidate streams are
    ~50x redundant (every pixel of a surface patch names the same blocks),
    and probing 1.5M raw candidates costs ~200 ms where probing the ~30k
    unique ones is sub-ms.  Overflow beyond `cap` is dropped for the frame
    (benign: re-candidates next frame)."""
    s = jnp.sort(packed)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    ) & (s != EMPTY)
    # compact by a second sort (EMPTY = 0xFFFFFFFF sorts to the end):
    # a nonzero() compaction here lowers to a scalar-core cumsum+scatter
    # that costs ~3x the sort itself
    s2 = jnp.sort(jnp.where(first, s, EMPTY))
    return s2[:cap]


def insert(
    table_keys: jax.Array,   # uint32 [H/mp, mp] bucket-major
    table_ptrs: jax.Array,   # int32 [H/mp, mp]
    n_blocks: jax.Array,     # int32 scalar: current block-pool cursor
    block_coords: jax.Array, # uint32 [B] pool-index -> packed key (reverse map)
    packed: jax.Array,       # uint32 [M] UNIQUE candidate keys (EMPTY = skip)
    max_probes: int,
    block_capacity: int,
    claim_rounds: int | None = None,
    return_ptrs: bool = False,
):
    """Insert candidate keys; allocate pool slots for the newly inserted.

    Returns (table_keys, table_ptrs, n_blocks, block_coords), plus — with
    `return_ptrs` — the per-candidate pool index [M] (-1 for EMPTY slots
    and for candidates dropped this frame).  The fusion path consumes the
    ptrs as this frame's integration set directly: the deduped mu-band
    candidates ARE the blocks whose voxels can update this frame, so no
    separate visible-list pass (8-corner projection + band test + nonzero
    over the allocated prefix) is needed (the reference likewise derives
    its visible list from the alloc pass's per-block visible marks,
    ITMSceneReconstructionEngine_CUDA.tcu:96-160).

    `packed` must carry each real key AT MOST ONCE (dedup_candidates
    guarantees this for the fusion path; the swap engine's key sets are
    unique by construction).  Uniqueness makes slot ownership unique —
    a slot holds one key and at most one candidate carries it — so no
    winner-per-slot pass is needed (the previous one materialized an
    [H]-sized scratch + scatter + gather every frame, ~1 ms at H=2^21).

    Race discipline: each round scatters unresolved candidates onto their
    bucket's first EMPTY slot; the next round's bucket re-read decides the
    winner (XLA scatter picks one deterministically), and losers retry on
    the next empty slot.  Candidates unresolved after the claim rounds (or
    in a full bucket) are dropped for this frame — the same benign-miss
    the reference accepts (ITMSceneReconstructionEngine_Shared.h:207-323
    drops on hash-collision within a frame too).
    """
    R, W = table_keys.shape
    assert W % max_probes == 0, (table_keys.shape, max_probes)
    mp = max_probes
    gpr = W // mp                                        # buckets per row
    valid = packed != EMPTY
    bucket = hash_packed(packed, R * W) // mp            # [M] bucket index
    row = bucket // gpr                                  # [M] stored row
    lane_g = jnp.arange(W, dtype=jnp.int32) // mp
    gmask = lane_g[None, :] == (bucket % gpr)[:, None]   # [M, W] bucket lanes
    resolved = ~valid
    my_col = jnp.full(packed.shape, W, jnp.int32)        # column in row
    # bucketized claim rounds: each round is one [M, mp] bucket row gather
    # (contiguous — see lookup) + one element scatter; the NEXT round's
    # gather doubles as the race check (a claim winner sees its own key as
    # a hit, a loser sees the winner's key and retries on the next empty
    # slot).  A round is lost only to a DIFFERENT new key claiming the
    # same empty slot of the same bucket; pileups deeper than the round
    # count are dropped for the frame (benign-miss, re-candidates next
    # frame).  Default = mp rounds (resolves a full bucket — bulk inserts
    # like scene load / swap rebuild need it); the incremental per-frame
    # path passes claim_rounds=2 (a round is only lost to a same-bucket
    # same-slot pileup of DIFFERENT new keys — already rare at 1/16 load).
    rounds = min(mp, mp if claim_rounds is None else claim_rounds)
    ptrs_row = None
    for r in range(rounds + 1):
        keys = table_keys[row]                           # [M, W] row gather
        hitl = (keys == packed[:, None]) & gmask
        hit = (~resolved) & jnp.any(hitl, axis=-1)
        hit_col = jnp.argmax(hitl, axis=-1).astype(jnp.int32)
        my_col = jnp.where(hit, hit_col, my_col)
        resolved = resolved | hit
        if r == rounds:
            # the ptr bucket rides the same rows as the final key gather
            ptrs_row = table_ptrs[row]                   # [M, W]
            break
        # claim the first empty slot of the bucket
        emptyl = (keys == EMPTY) & gmask
        e_col = jnp.argmax(emptyl, axis=-1).astype(jnp.int32)
        want = (~resolved) & jnp.any(emptyl, axis=-1)
        table_keys = table_keys.at[
            jnp.where(want, row, R), e_col
        ].set(packed, mode="drop")

    # allocate pool pointers for newly-claimed slots.  All bookkeeping
    # runs on the [M]-sized candidate arrays, never the [H]-sized table.
    col_safe = jnp.minimum(my_col, W - 1)
    my_ptr = jnp.take_along_axis(ptrs_row, col_safe[:, None], 1)[:, 0]
    is_new = resolved & valid & (my_ptr < 0)
    order = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_ptr = n_blocks + order
    fits = is_new & (new_ptr < block_capacity)
    table_ptrs = table_ptrs.at[
        jnp.where(fits, row, R), col_safe
    ].set(new_ptr, mode="drop")
    # overflow: un-insert keys that could not get a block this frame
    table_keys = table_keys.at[
        jnp.where(is_new & ~fits, row, R), col_safe
    ].set(EMPTY, mode="drop")
    n_alloc = jnp.sum(fits.astype(jnp.int32))
    # reverse map: pool index -> packed coords
    block_coords = block_coords.at[jnp.where(fits, new_ptr, block_capacity)].set(
        packed, mode="drop"
    )
    if return_ptrs:
        ptrs = jnp.where(fits, new_ptr, my_ptr)
        ptrs = jnp.where(resolved & valid & (ptrs >= 0), ptrs, -1)
        return table_keys, table_ptrs, n_blocks + n_alloc, block_coords, ptrs
    return table_keys, table_ptrs, n_blocks + n_alloc, block_coords
