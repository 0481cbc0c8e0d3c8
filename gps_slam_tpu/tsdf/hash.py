"""Open-addressing voxel-block hash — the TPU-shaped replacement for
InfiniTAM's bucket+excess-list hash (ITMVoxelBlockHash.h:15-31,
ITMRepresentationAccess.h:8-113).

Differences from the reference, and why:
  * The reference uses 2^20 ordered buckets + a 2^17 excess linked list,
    with allocation serialized through a single-threaded kernel
    (ITMSceneReconstructionEngine_CUDA.tcu:406).  Linked lists and
    serialized allocation are hostile to XLA; we use one flat
    power-of-two table with bounded linear probing instead.  Lookup is a
    fixed unrolled sequence of gathers (SPMD-friendly, no data-dependent
    trip counts); insertion is a bounded sequence of scatter+re-gather
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
    table_keys: jax.Array,  # uint32 [H]
    table_ptrs: jax.Array,  # int32 [H]
    packed: jax.Array,      # uint32 [...]: query keys
    max_probes: int,
) -> jax.Array:
    """Vectorized probe: returns the block-pool index for each query, or -1.

    A fixed, unrolled sequence of `max_probes` gathers — every lane pays the
    worst case, so keep the load factor low (the defaults put ~2^17 blocks in
    a 2^21 table => first-probe hit rate > 90%).
    """
    H = table_keys.shape[0]
    h0 = hash_packed(packed, H)
    ptr = jnp.full(packed.shape, -1, dtype=jnp.int32)
    # no early-out on EMPTY slots: the probe loop is unrolled and every
    # gather executes regardless, and skipping the check makes lookups
    # tolerant of probe-chain holes left by pool-overflow un-insertions
    for r in range(max_probes):
        slot = (h0 + r) & (H - 1)
        match = table_keys[slot] == packed
        ptr = jnp.where(match, table_ptrs[slot], ptr)
    return ptr


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
    table_keys: jax.Array,   # uint32 [H]
    table_ptrs: jax.Array,   # int32 [H]
    n_blocks: jax.Array,     # int32 scalar: current block-pool cursor
    block_coords: jax.Array, # uint32 [B] pool-index -> packed key (reverse map)
    packed: jax.Array,       # uint32 [M] candidate keys (may contain EMPTY = skip)
    max_probes: int,
    block_capacity: int,
):
    """Insert candidate keys; allocate pool slots for the newly inserted.

    Returns (table_keys, table_ptrs, n_blocks, block_coords).

    Race discipline: each round scatters unresolved candidates into the
    current probe slot *only where it is EMPTY*, then re-reads.  When two
    different keys race for one slot, the scatter picks one winner
    deterministically (XLA scatter semantics); the loser simply probes on.
    Duplicate candidates with the same key collapse automatically.
    Candidates still unresolved after `max_probes` rounds are dropped for
    this frame — the same benign-miss the reference accepts
    (ITMSceneReconstructionEngine_Shared.h:207-323 drops on hash-collision
    within a frame too).
    """
    H = table_keys.shape[0]
    M = packed.shape[0]
    valid = packed != EMPTY
    h0 = hash_packed(packed, H)
    resolved = ~valid
    my_slot = jnp.full((M,), H, jnp.int32)   # resolved candidates' slot
    for r in range(max_probes):
        slot = (h0 + r) & (H - 1)
        keys = table_keys[slot]
        hit = (~resolved) & (keys == packed)
        my_slot = jnp.where(hit, slot, my_slot)
        resolved = resolved | hit
        # try to claim empty slots for unresolved candidates
        want = (~resolved) & (keys == EMPTY)
        # scatter: losers of intra-round races are detected by re-reading
        table_keys = table_keys.at[jnp.where(want, slot, H)].set(
            packed, mode="drop"
        )
        keys2 = table_keys[slot]
        won = (~resolved) & (keys2 == packed)
        my_slot = jnp.where(won, slot, my_slot)
        resolved = resolved | won

    # allocate pool pointers for newly-claimed slots.  All bookkeeping
    # runs on the [M]-sized candidate arrays, never the [H]-sized table
    # (a full-table cumsum + scatter costs ~10 ms/frame at H = 2^21).
    # Duplicate candidates resolve to the same slot; a one-winner-per-slot
    # scatter keeps exactly one allocator per slot.
    slot_safe = jnp.where(resolved & valid, my_slot, 0)
    maybe_new = resolved & valid & (table_ptrs[slot_safe] < 0)
    cand_ids = jnp.arange(M, dtype=jnp.int32)
    winner = jnp.full((H,), M, jnp.int32).at[
        jnp.where(maybe_new, my_slot, H)
    ].set(cand_ids, mode="drop")
    is_new = maybe_new & (winner[slot_safe] == cand_ids)
    order = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_ptr = n_blocks + order
    fits = is_new & (new_ptr < block_capacity)
    table_ptrs = table_ptrs.at[jnp.where(fits, my_slot, H)].set(
        new_ptr, mode="drop"
    )
    # overflow: un-insert keys that could not get a block this frame
    table_keys = table_keys.at[jnp.where(is_new & ~fits, my_slot, H)].set(
        EMPTY, mode="drop"
    )
    n_alloc = jnp.sum(fits.astype(jnp.int32))
    # reverse map: pool index -> packed coords
    block_coords = block_coords.at[jnp.where(fits, new_ptr, block_capacity)].set(
        packed, mode="drop"
    )
    return table_keys, table_ptrs, n_blocks + n_alloc, block_coords
