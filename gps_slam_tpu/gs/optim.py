"""Per-attribute Adam with the reference's LR schedule.

The reference keeps 7 independent torch Adam instances, one per attribute
(initOptimizers, src/raw_gs_model.cpp:654-705) and decays only the means LR
exponentially: lr *= gamma per step with gamma = 0.01^(1/max_iter)
(include/optim_scheduler.hpp:7-22, gamma at raw_gs_model.cpp:673-674).

Here that is one optax.multi_transform over the parameter pytree.  Because
the pools are fixed-capacity, the reference's optimizer-state surgery on
add/remove (addToOptimizer/removeFromOptimizer/replaceToOptimizer,
raw_gs_model.cpp:707-823) collapses into zeroing state rows by mask —
optax state is just arrays.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def make_optimizer(cfg, max_iterations: int) -> optax.GradientTransformation:
    """cfg: ModelConfig.  LR layout per raw_gs_model.cpp:659-705."""
    gamma = 0.01 ** (1.0 / max(max_iterations, 1))

    def means_schedule(step):
        return cfg.means_lr * (gamma ** step)

    label_map = {
        "means": "means",
        "scales": "scales",
        "quats": "quats",
        "features_dc": "features_dc",
        "features_rest": "features_rest",
        "opacities": "opacities",
        "exposure": "exposure",
    }
    adam = lambda lr: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    tx = optax.multi_transform(
        {
            "means": adam(means_schedule),
            "scales": adam(cfg.scales_lr),
            "quats": adam(cfg.quats_lr),
            "features_dc": adam(cfg.featuresDc_lr),
            "features_rest": adam(cfg.featuresRest_lr),
            "opacities": adam(cfg.opacities_lr),
            "exposure": adam(cfg.exposure_lr if cfg.use_exposure else 0.0),
        },
        label_map,
    )
    return tx


def zero_state_rows(opt_state: Any, row_mask: jax.Array) -> Any:
    """Clear Adam moments for pool rows in `row_mask` — the fixed-pool
    equivalent of removeFromOptimizer/addToOptimizer state surgery."""

    def zero(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 and leaf.shape[0] == row_mask.shape[0]:
            shape = (-1,) + (1,) * (leaf.ndim - 1)
            return jnp.where(row_mask.reshape(shape), jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree_util.tree_map(zero, opt_state)
