"""Classic 3DGS densification (clone / split / prune / opacity reset) on
the fixed-capacity pool — the offline `raw` training path.

Reference logic (RawGaussianModel::stepPostBackward / updateDensifyGrad /
densifiyGs, src/raw_gs_model.cpp:419-633):
  * accumulate per-Gaussian screen-space positional gradient norms
    (scaled by image size / 2) and visibility counts;
  * every densify_interval iters (outside the post-opacity-reset pause):
    high-gradient + small  -> clone (duplicate);
    high-gradient + large  -> split into 2 samples drawn from the Gaussian
    itself, scales / 1.6, original pruned;
    prune opacity < thres, and (after the first opacity reset) scales >
    0.1 * scene_scale;
  * every reset_opacity_interval iters: clamp opacities to
    logit(2 * prune_opacity_thres).

Fixed-pool expression: clone/split are scatter-adds into free slots, prune
is a mask clear, and the reference's optimizer-state surgery
(addToOptimizer/removeFromOptimizer, :707-823) is row-zeroing of the optax
state for every touched slot.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.se3 import quat_to_rotmat
from . import params as pmod
from .params import GaussianPool

PAUSE_REFINE_AFTER_RESET = 100  # opensplat-style settle time (raw_gs_model.cpp)
N_SPLIT_SAMPLES = 2
SPLIT_SIZE_FAC = 1.6


@partial(jax.jit, donate_argnums=(0,), static_argnums=(6,))
def densify_step(
    pool: GaussianPool,
    grad_2d: jax.Array,        # [C] accumulated screen-grad norms
    visible_count: jax.Array,  # [C]
    rng_key: jax.Array,
    scene_scale: jax.Array,
    thresholds: jax.Array,     # [grad_thres, large_thres, split_unused, prune_opac]
    max_new: int,
    allow_scale_prune: jax.Array = None,  # bool: curr_iter > reset interval
):
    """One densification round.  Returns (pool, touched_rows_mask, stats).
    `touched_rows_mask` marks rows whose optimizer state must be zeroed."""
    grad_thres, large_thres, _, prune_opac = (
        thresholds[0], thresholds[1], thresholds[2], thresholds[3]
    )
    grads = grad_2d / jnp.maximum(visible_count, 1.0)
    is_high = (grads > grad_thres) & pool.alive
    max_scales = jnp.exp(pool.scales).max(-1)
    is_large = max_scales > large_thres * scene_scale
    is_dupli = is_high & ~is_large
    is_split = is_high & is_large

    C = pool.capacity
    half = max_new // 2

    # ---- clones: straight copies of up to `half` duplication candidates
    dup_idx, = jnp.nonzero(is_dupli, size=half, fill_value=C)
    dup_ok = dup_idx < C
    n_dup = jnp.sum(dup_ok.astype(jnp.int32))
    safe_dup = jnp.where(dup_ok, dup_idx, 0)
    dup_attrs = {
        "means": pool.means[safe_dup],
        "scales": pool.scales[safe_dup],
        "quats": pool.quats[safe_dup],
        "features_dc": pool.features_dc[safe_dup],
        "features_rest": pool.features_rest[safe_dup],
        "opacities": pool.opacities[safe_dup],
    }

    # ---- splits: 2 samples around each candidate, scales / 1.6
    n_split_cand = half // N_SPLIT_SAMPLES
    split_idx, = jnp.nonzero(is_split, size=n_split_cand, fill_value=C)
    split_ok = split_idx < C
    n_split = jnp.sum(split_ok.astype(jnp.int32))
    safe_split = jnp.where(split_ok, split_idx, 0)
    rep = jnp.tile(safe_split, (N_SPLIT_SAMPLES,))
    rep_ok = jnp.tile(split_ok, (N_SPLIT_SAMPLES,))
    noise = jax.random.normal(rng_key, (n_split_cand * N_SPLIT_SAMPLES, 3))
    sc = jnp.exp(pool.scales[rep])
    R = quat_to_rotmat(pool.quats[rep])
    offs = jnp.einsum("nij,nj->ni", R, sc * noise)
    split_attrs = {
        "means": pool.means[rep] + offs,
        "scales": jnp.log(jnp.maximum(sc / SPLIT_SIZE_FAC, 1e-12)),
        "quats": pool.quats[rep],
        "features_dc": pool.features_dc[rep],
        "features_rest": pool.features_rest[rep],
        "opacities": pool.opacities[rep],
    }

    # stack candidates, valid-first ordering (clones then splits)
    def cat(a, b):
        return jnp.concatenate([a, b], axis=0)

    attrs = {k: cat(dup_attrs[k], split_attrs[k]) for k in dup_attrs}
    # compact valid rows to the front so pmod.add's `count` prefix works
    valid_rows = cat(dup_ok, rep_ok)
    order = jnp.argsort(~valid_rows, stable=True)
    attrs = {k: v[order] for k, v in attrs.items()}
    n_new = n_dup + n_split * N_SPLIT_SAMPLES

    alive_before = pool.alive
    pool = pmod.add(pool, attrs, n_new)
    new_rows = pool.alive & ~alive_before

    # ---- prune: low opacity, split originals, (post-reset) huge scales
    opac = jax.nn.sigmoid(pool.opacities[:, 0])
    is_prune = (opac < prune_opac) & pool.alive & ~new_rows
    is_prune = is_prune | (is_split & ~new_rows)
    if allow_scale_prune is None:
        allow_scale_prune = jnp.asarray(False)
    scale_prune = (jnp.exp(pool.scales).max(-1) > 0.1 * scene_scale) & pool.alive & ~new_rows
    is_prune = is_prune | (allow_scale_prune & scale_prune)
    n_pruned = jnp.sum(is_prune.astype(jnp.int32))
    pool = pmod.remove(pool, is_prune)

    touched = new_rows | is_prune
    stats = {"n_dup": n_dup, "n_split": n_split, "n_pruned": n_pruned}
    return pool, touched, stats


@partial(jax.jit, donate_argnums=(0,))
def reset_opacities(pool: GaussianPool, target: jax.Array) -> GaussianPool:
    """Opacity reset: clamp logits to logit(target)
    (stepPostBackward, raw_gs_model.cpp:497-505)."""
    logit = jnp.log(target / (1.0 - target))
    return pool.replace(opacities=jnp.minimum(pool.opacities, logit))
