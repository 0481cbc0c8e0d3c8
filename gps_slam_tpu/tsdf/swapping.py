"""Host-swapping engine — the TPU-native analog of InfiniTAM's
device<->host voxel-block streaming (Engines/Swapping/
ITMSwappingEngine_CUDA.tcu + ITMGlobalCache, ~883 LoC; mode
SWAPPINGMODE_DISABLED by default, Utils/ITMLibSettings.cpp:33 — ours is
config-gated off by default too, TPU.enable_swapping).

The reference streams individual blocks each frame through fixed transfer
buffers.  Per-block streaming is the wrong shape for this rig (the
host<->device tunnel costs ~30 ms per round trip, PERF.md), so the rebuild
swaps in EPISODES:

  * every `swap_check_interval` frames the engine reads the block-pool
    cursor; when it exceeds `high_water * block_capacity` the coldest
    blocks (smallest `last_seen` LRU stamp, maintained by fuse_frame) are
    fetched to a host dict and the pool is REBUILT from the survivors —
    fresh hash table via the standard insert path, survivor rows gathered
    into the pool prefix.  One large contiguous transfer instead of many
    small ones.
  * when fusion re-allocates a block whose key is in the host store, the
    stored voxels are MERGED back (running-average combination of the two
    observations, the same semantics as the reference's swap-in fusion,
    ITMSwappingEngine_Shared.h) and the store entry dropped.

Everything here is a cold path: it runs only when the scene outgrows the
pool, exactly like the reference's out-of-core mode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import hash as vhash
from .volume import TsdfVolume

_POOL_FIELDS = ("state", "color", "summary", "last_seen")


def _np_unpack_state(st):
    """Host-side volume.pack_state inverse: u32 -> (sdf f32, w f32, wc f32)."""
    si = (st & 0xFFFF).astype(np.int32)
    si = np.where(si >= 32768, si - 65536, si)
    from .volume import SDF_SCALE

    return (si.astype(np.float32) / SDF_SCALE,
            ((st >> 16) & 0xFF).astype(np.float32),
            (st >> 24).astype(np.float32))


def _np_pack_state(f, w, wc):
    from .volume import SDF_SCALE

    q = np.round(np.clip(f, -1.0, 1.0) * SDF_SCALE).astype(np.int32)
    su = np.where(q < 0, q + 65536, q).astype(np.uint32)
    return su | (w.astype(np.uint32) << 16) | (wc.astype(np.uint32) << 24)


class HostSwapEngine:
    def __init__(self, high_water: float = 0.85, low_water: float = 0.70):
        self.high_water = high_water
        self.low_water = low_water
        self.store: dict[int, dict[str, np.ndarray]] = {}
        self.n_spilled_total = 0
        self.n_reloaded_total = 0
        self._n_known = 0  # pool cursor after the last spill/reload scan

    # -- spill ---------------------------------------------------------------

    def maybe_spill(self, vol: TsdfVolume) -> TsdfVolume:
        """Spill cold blocks + rebuild when past the high-water mark."""
        B = vol.params.block_capacity
        n = int(vol.n_blocks)
        if n < int(self.high_water * B):
            self._n_known = n
            return vol
        keep_n = int(self.low_water * B)
        ls = np.asarray(vol.last_seen[:n])
        coords = np.asarray(vol.block_coords[:n])
        order = np.argsort(ls, kind="stable")
        spill_ids = np.sort(order[: n - keep_n])
        keep_ids = np.sort(order[n - keep_n:])

        # one contiguous fetch per field for the spilled rows
        spill_rows = {
            f: np.asarray(getattr(vol, f)[jnp.asarray(spill_ids)])
            for f in _POOL_FIELDS
        }
        for k, key in enumerate(coords[spill_ids]):
            self.store[int(key)] = {f: spill_rows[f][k] for f in _POOL_FIELDS}
        self.n_spilled_total += len(spill_ids)

        # rebuild: fresh table, survivors re-inserted in pool order (all
        # unique, all new -> ptrs are exactly 0..keep_n-1 in that order)
        p = vol.params
        keep_keys = jnp.asarray(coords[keep_ids])
        from .volume import table_width

        H, W = p.hash_size, table_width(p)
        tk = jnp.full((H // W, W), vhash.EMPTY, dtype=jnp.uint32)
        tp = jnp.full((H // W, W), -1, dtype=jnp.int32)
        bc = jnp.full((B,), vhash.EMPTY, dtype=jnp.uint32)
        tk, tp, nb, bc = vhash.insert(
            tk, tp, jnp.zeros((), jnp.int32), bc, keep_keys,
            p.max_probes, B,
        )
        keep_dev = jnp.asarray(keep_ids)

        def tail_like(x, fill):
            t = jnp.full((B - keep_n, *x.shape[1:]), fill, x.dtype)
            return jnp.concatenate([x[keep_dev], t], 0)

        def tail_like_summary(x):
            from .volume import init_summary
            return jnp.concatenate(
                [x[keep_dev], init_summary(B - keep_n)], 0)

        from .volume import STATE_INIT

        vol = vol.replace(
            table_keys=tk, table_ptrs=tp, n_blocks=nb, block_coords=bc,
            state=tail_like(vol.state, STATE_INIT),
            color=tail_like(vol.color, 0),
            summary=tail_like_summary(vol.summary),
            last_seen=tail_like(vol.last_seen, -1),
        )
        self._n_known = keep_n
        return vol

    # -- per-view swap-in ------------------------------------------------------

    def reload_visible(self, vol: TsdfVolume, c2w, K, width: int,
                       height: int) -> TsdfVolume:
        """Swap stored blocks that project into the given camera back onto
        the device — the analog of the reference's per-view swap-in
        (ITMSwappingEngine_CUDA.tcu IntegrateGlobalIntoLocal streams the
        render state's visible blocks each frame).  Ours runs on demand in
        the raycast service, so arbitrary-view renders (eval poses, saved
        trajectories) see spilled geometry instead of holes.  Cold path:
        host-side frustum cull over the store's keys."""
        if not self.store:
            return vol
        vol = self.maybe_reload(vol)  # drain pending fusion merges first
        if not self.store:
            return vol
        p = vol.params
        B = p.block_capacity
        keys = np.fromiter(self.store.keys(), np.int64, len(self.store))
        mask, off = vhash.COORD_MASK, vhash.COORD_OFFSET
        bx = (keys & mask) - off
        by = ((keys >> vhash.COORD_BITS) & mask) - off
        bz = ((keys >> (2 * vhash.COORD_BITS)) & mask) - off
        ext = p.voxel_size * 8.0
        centers = (np.stack([bx, by, bz], -1).astype(np.float32) + 0.5) * ext
        w2c = np.linalg.inv(np.asarray(c2w, np.float64)).astype(np.float32)
        pc = centers @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        Kn = np.asarray(K, np.float32)
        fx, fy, cx, cy = Kn[0, 0], Kn[1, 1], Kn[0, 2], Kn[1, 2]
        r_blk = ext * 0.87  # block half-diagonal
        zs = np.maximum(z, 1e-6)
        u = fx * pc[:, 0] / zs + cx
        v = fy * pc[:, 1] / zs + cy
        pad_u = fx * r_blk / zs
        pad_v = fy * r_blk / zs
        vis = (
            (z > -r_blk)
            & (u >= -pad_u) & (u <= width - 1 + pad_u)
            & (v >= -pad_v) & (v <= height - 1 + pad_v)
        )
        if not vis.any():
            return vol
        n = int(vol.n_blocks)
        avail = B - n
        if avail <= 0:
            return vol
        sel = keys[vis]
        if len(sel) > avail:
            # nearest-first under capacity pressure
            sel = sel[np.argsort(zs[vis])][:avail]
        tk, tp, nb, bc = vhash.insert(
            vol.table_keys, vol.table_ptrs, vol.n_blocks, vol.block_coords,
            jnp.asarray(sel.astype(np.uint32)), p.max_probes, B,
        )
        vol = vol.replace(table_keys=tk, table_ptrs=tp, n_blocks=nb,
                          block_coords=bc)
        # probe-bound inserts can drop keys: scatter only where resident
        ptrs = np.asarray(vhash.lookup(
            tk, tp, jnp.asarray(sel.astype(np.uint32)), p.max_probes))
        ok = ptrs >= n  # strictly the rows THIS insert created
        if not ok.any():
            self._n_known = int(nb)
            return vol
        rows_dev = jnp.asarray(ptrs[ok])
        stored = [self.store.pop(int(k)) for k in sel[ok]]
        st = {f: np.stack([s[f] for s in stored]) for f in _POOL_FIELDS}
        # reloaded rows count as freshly seen (avoid next-spill thrash)
        st["last_seen"] = np.full(len(stored),
                                  max(int(np.max(st["last_seen"])), 0),
                                  np.int32)
        vol = vol.replace(**{
            f: getattr(vol, f).at[rows_dev].set(
                jnp.asarray(st[f]).astype(getattr(vol, f).dtype))
            for f in _POOL_FIELDS
        })
        self.n_reloaded_total += len(stored)
        self._n_known = int(nb)
        return vol

    # -- reload ---------------------------------------------------------------

    def maybe_reload(self, vol: TsdfVolume) -> TsdfVolume:
        """Merge stored voxel data back into blocks fusion re-allocated
        since the last scan.  No-op while the store is empty."""
        if not self.store:
            self._n_known = int(vol.n_blocks)
            return vol
        n = int(vol.n_blocks)
        if n <= self._n_known:
            return vol
        new_ids = np.arange(self._n_known, n)
        new_keys = np.asarray(vol.block_coords[jnp.asarray(new_ids)])
        hit = [(i, int(k)) for i, k in zip(new_ids, new_keys)
               if int(k) in self.store]
        self._n_known = n
        if not hit:
            return vol
        rows = np.asarray([i for i, _ in hit])
        rows_dev = jnp.asarray(rows)
        stored = [self.store.pop(k) for _, k in hit]
        st = {f: np.stack([s[f] for s in stored]) for f in _POOL_FIELDS}

        # running-average merge with whatever fusion already wrote
        # (ITMSwappingEngine_Shared.h combineVoxelInformation semantics)
        from .volume import unpack_color_np

        max_w = float(vol.params.max_w)
        f1, w1, wc1 = _np_unpack_state(np.asarray(vol.state[rows_dev]))
        c1 = unpack_color_np(vol.color[rows_dev]).astype(np.float32)
        f2, w2, wc2 = _np_unpack_state(st["state"])
        c2 = unpack_color_np(st["color"]).astype(np.float32)
        wsum = w1 + w2
        f = np.where(wsum > 0, (w1 * f1 + w2 * f2) / np.maximum(wsum, 1), 1.0)
        w = np.minimum(wsum, max_w)
        wcsum = wc1 + wc2
        c = np.where(
            wcsum[..., None] > 0,
            (wc1[..., None] * c1 + wc2[..., None] * c2)
            / np.maximum(wcsum[..., None], 1),
            0.0,
        )
        wc = np.minimum(wcsum, max_w)
        cq = np.clip(c + 0.5, 0, 255).astype(np.uint32)
        c_packed = cq[..., 0] | (cq[..., 1] << 8) | (cq[..., 2] << 16)

        mip = f.reshape(-1, 4, 2, 4, 2, 4, 2).mean(axis=(2, 4, 6)).reshape(-1, 64)
        integrated = w > 0
        min_sdf = np.min(np.where(integrated, f, 1.0), axis=1)
        maxw_blk = np.max(w, axis=1).astype(np.float32)
        summary = np.concatenate(
            [mip, min_sdf[:, None], maxw_blk[:, None],
             np.zeros((len(mip), 62), np.float32)], axis=1).astype(np.float32)

        vol = vol.replace(
            state=vol.state.at[rows_dev].set(
                jnp.asarray(_np_pack_state(f, w, wc))),
            color=vol.color.at[rows_dev].set(jnp.asarray(c_packed)),
            summary=vol.summary.at[rows_dev].set(jnp.asarray(summary)),
        )
        self.n_reloaded_total += len(hit)
        return vol
