"""Fixed-capacity Gaussian parameter pool.

TPU replacement for the reference's dynamically resized parameter tensors
(RawGaussianParams, src/raw_gs_param.cpp / include/raw_gs_param.h:1-85):
the 7 learnable arrays live in a preallocated pool of `capacity` slots with
an `alive` mask.  add = scatter into free slots; remove = clear mask.  No
tensor ever changes shape, so nothing recompiles as Gaussians come and go.

Parameterization matches the reference exactly: scales stored in log space,
opacities in logit space, quats (w,x,y,z) unnormalized, SH features split
dc/rest, optional per-camera 3x4 exposure affine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.se3 import quat_between
from . import knn, sh


@struct.dataclass
class GaussianPool:
    capacity: int = struct.field(pytree_node=False)
    sh_degree: int = struct.field(pytree_node=False)
    means: jax.Array          # [C, 3]
    scales: jax.Array         # [C, 3] log
    quats: jax.Array          # [C, 4] (w,x,y,z)
    features_dc: jax.Array    # [C, 3]
    features_rest: jax.Array  # [C, K-1, 3]
    opacities: jax.Array      # [C, 1] logit
    exposure: jax.Array       # [E, 3, 4]
    alive: jax.Array          # [C] bool
    n_alive: jax.Array        # int32 scalar (== alive.sum(), kept for cheap logging)

    @property
    def params(self) -> dict:
        """The differentiable leaves, as an optax-style pytree."""
        return {
            "means": self.means,
            "scales": self.scales,
            "quats": self.quats,
            "features_dc": self.features_dc,
            "features_rest": self.features_rest,
            "opacities": self.opacities,
            "exposure": self.exposure,
        }

    def with_params(self, p: dict) -> "GaussianPool":
        return self.replace(
            means=p["means"], scales=p["scales"], quats=p["quats"],
            features_dc=p["features_dc"], features_rest=p["features_rest"],
            opacities=p["opacities"], exposure=p["exposure"],
        )

    # convenience accessors mirroring getReal* (include/raw_gs_model.h)
    @property
    def real_scales(self) -> jax.Array:
        return jnp.exp(self.scales)

    @property
    def real_opacities(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacities)


def create(capacity: int, sh_degree: int, exposure_num: int = 0) -> GaussianPool:
    k = sh.num_sh_bases(sh_degree)
    e = max(exposure_num, 1)
    eye = jnp.tile(jnp.eye(3, 4, dtype=jnp.float32)[None], (e, 1, 1))
    return GaussianPool(
        capacity=capacity,
        sh_degree=sh_degree,
        means=jnp.zeros((capacity, 3), jnp.float32),
        scales=jnp.full((capacity, 3), -10.0, jnp.float32),
        quats=jnp.concatenate(
            [jnp.ones((capacity, 1)), jnp.zeros((capacity, 3))], 1
        ),
        features_dc=jnp.zeros((capacity, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        opacities=jnp.full((capacity, 1), -10.0, jnp.float32),
        exposure=eye,
        alive=jnp.zeros((capacity,), bool),
        n_alive=jnp.zeros((), jnp.int32),
    )


def init_attributes(
    xyz: jax.Array,          # [M, 3]
    rgb: jax.Array,          # [M, 3]
    normals: jax.Array | None,  # [M, 3] or None
    sh_degree: int,
    default_opacity: float,
    max_init_scale: float,
    min_init_scale: float,
) -> dict:
    """New-Gaussian attribute computation (RawGaussianParams::init,
    src/raw_gs_param.cpp:11-77): scale = sqrt(mean 3-NN dist^2) clamped;
    with normals the z-axis is flattened x0.1 and the quat aligns +z to the
    normal; SH dc from rgb; opacity = logit(default)."""
    m = xyz.shape[0]
    # rows parked far away (spawn's 1e6 sentinels) are excluded from the
    # Morton bounding box so quantization keeps its resolution
    near = jnp.max(jnp.abs(xyz), axis=-1) < 1e5
    d2 = knn.mean_dist_sq_3nn_morton(xyz, valid=near)
    s = jnp.sqrt(jnp.maximum(d2, 1e-12))
    if min_init_scale > 0:
        s = jnp.clip(s, min_init_scale, max_init_scale)
    else:
        s = jnp.minimum(s, max_init_scale)
    scales = jnp.tile(s[:, None], (1, 3))
    if normals is not None:
        scales = scales.at[:, 2].multiply(0.1)
        z_axis = jnp.zeros_like(xyz).at[:, 2].set(1.0)
        quats = quat_between(z_axis, normals)
        # degenerate normals (zeros) -> identity quat
        ok = jnp.linalg.norm(normals, axis=-1) > 0.5
        quats = jnp.where(ok[:, None], quats, jnp.array([1.0, 0, 0, 0]))
    else:
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (m, 1))
    k = sh.num_sh_bases(sh_degree)
    logit = jnp.log(default_opacity / (1.0 - default_opacity))
    return {
        "means": xyz,
        "scales": jnp.log(jnp.maximum(scales, 1e-12)),
        "quats": quats,
        "features_dc": sh.rgb_to_sh(rgb),
        "features_rest": jnp.zeros((m, k - 1, 3), jnp.float32),
        "opacities": jnp.full((m, 1), logit, jnp.float32),
    }


def add(pool: GaussianPool, attrs: dict, count: jax.Array) -> GaussianPool:
    """Scatter `count` new Gaussians (first `count` rows of each [M, ...]
    attr array) into free pool slots.  Overflow beyond capacity is dropped
    (callers read n_alive to detect saturation).  Replaces the reference's
    torch::cat growth (raw_gs_param.cpp add)."""
    m = attrs["means"].shape[0]
    free_idx, = jnp.nonzero(~pool.alive, size=m, fill_value=pool.capacity)
    take = jnp.arange(m) < count
    dst = jnp.where(take, free_idx, pool.capacity)

    def put(arr, new):
        return arr.at[dst].set(new, mode="drop")

    placed = jnp.sum((take & (free_idx < pool.capacity)).astype(jnp.int32))
    return pool.replace(
        means=put(pool.means, attrs["means"]),
        scales=put(pool.scales, attrs["scales"]),
        quats=put(pool.quats, attrs["quats"]),
        features_dc=put(pool.features_dc, attrs["features_dc"]),
        features_rest=put(pool.features_rest, attrs["features_rest"]),
        opacities=put(pool.opacities, attrs["opacities"]),
        alive=pool.alive.at[dst].set(True, mode="drop"),
        n_alive=pool.n_alive + placed,
    )


def remove(pool: GaussianPool, remove_mask: jax.Array) -> GaussianPool:
    """Prune by mask (prunePoints, raw_gs_model.cpp:606-633) — just clears
    `alive`; dead slots stop rendering and become reusable."""
    kill = remove_mask & pool.alive
    return pool.replace(
        alive=pool.alive & ~kill,
        n_alive=pool.n_alive - jnp.sum(kill.astype(jnp.int32)),
    )


@jax.jit
def compact(pool: GaussianPool) -> GaussianPool:
    """Stable-permute live rows to the pool prefix.

    The SLAM pipeline keeps the pool compact (compact after every prune;
    `add` fills free slots which are then exactly the tail), so the window
    optimizer and renderers can run on a `n_alive`-sized prefix instead of
    the full capacity — per-iteration cost scales with the live count.
    NOTE: callers owning per-row side state (offline densify's Adam
    moments / gradient accumulators) must not interleave it across a
    compaction — the SLAM path re-inits optimizer state every window
    (slam_pipeline.cpp:202), so ordering there is free."""
    order = jnp.argsort(~pool.alive, stable=True)
    return pool.replace(
        means=pool.means[order],
        scales=pool.scales[order],
        quats=pool.quats[order],
        features_dc=pool.features_dc[order],
        features_rest=pool.features_rest[order],
        opacities=pool.opacities[order],
        alive=pool.alive[order],
    )
