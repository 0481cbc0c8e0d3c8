"""Mean squared distance to the 3 nearest neighbours — equivalent of the
reference's `distCUDA2` (gsplat/rasterizer/simple_knn.cu, used for initial
Gaussian scales at src/raw_gs_param.cpp:28) and of the nanoflann CPU path
(src/kdtree_tensor.cpp:8-38).

Two implementations:
  * `mean_dist_sq_3nn` — brute-force chunked distance matrices via the MXU.
    Exact; O(N^2); used as the oracle in tests.
  * `mean_dist_sq_3nn_morton` — Morton-sort the points and search a
    +-`window` neighborhood in Morton order (the same locality trick
    simple_knn.cu uses with its Morton boxes, minus the exact box-distance
    pruning).  O(N window); the approximation only seeds initial Gaussian
    scales, where a near-neighbor estimate is statistically equivalent.
    This is what the spawn path uses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2,))
def _knn_chunked(points: jax.Array, ref: jax.Array, chunk: int) -> jax.Array:
    n = points.shape[0]
    ref_sq = jnp.sum(ref * ref, axis=1)

    def body(i, out):
        rows = jax.lax.dynamic_slice_in_dim(points, i * chunk, chunk)
        # HIGHEST: the |a|^2+|b|^2-2ab cancellation amplifies matmul
        # rounding into O(1) relative error on near-neighbor distances —
        # on TPU the default bf16 MXU passes made close-range d2 garbage
        d2 = (
            jnp.sum(rows * rows, axis=1)[:, None]
            + ref_sq[None, :]
            - 2.0 * jnp.matmul(rows, ref.T, precision=jax.lax.Precision.HIGHEST)
        )
        # 4 smallest (self is among them at ~0 distance)
        neg4, _ = jax.lax.top_k(-d2, 4)
        mean3 = jnp.maximum(-neg4[:, 1:], 0.0).mean(axis=1)
        return jax.lax.dynamic_update_slice_in_dim(out, mean3, i * chunk, 0)

    out = jnp.zeros((n,), dtype=points.dtype)
    return jax.lax.fori_loop(0, n // chunk, body, out)


def mean_dist_sq_3nn(
    points: jax.Array, max_reference: int = 65536, chunk: int = 1024
) -> jax.Array:
    """[N, 3] -> [N] mean squared distance to each point's 3 NN."""
    n = points.shape[0]
    ref = points
    if n > max_reference:
        stride = -(-n // max_reference)
        ref = points[::stride]
    pad = (-n) % chunk
    pts = jnp.concatenate([points, jnp.full((pad, 3), 1e6, points.dtype)]) if pad else points
    out = _knn_chunked(pts, ref, chunk)
    return out[:n]


def _interleave10(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


@partial(jax.jit, static_argnums=(1,))
def mean_dist_sq_3nn_morton(points: jax.Array, window: int = 64,
                            valid: jax.Array | None = None) -> jax.Array:
    """Approximate [N] mean squared 3-NN distance via a Morton-order
    sliding window (simple_knn.cu's coordinate ordering).  Pass `valid`
    when some rows are far-away sentinels (spawn parks unselected rows at
    1e6): the Morton bounding box is computed over valid rows only so the
    quantization keeps its resolution, and sentinels sort to the end."""
    n = points.shape[0]
    if valid is None:
        lo = jnp.min(points, axis=0)
        hi = jnp.max(points, axis=0)
    else:
        v = valid[:, None]
        lo = jnp.min(jnp.where(v, points, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(v, points, -jnp.inf), axis=0)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    span = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((points - lo) / span * 1023.0), 0.0, 1023.0).astype(jnp.uint32)
    code = (
        _interleave10(q[:, 0])
        | (_interleave10(q[:, 1]) << 1)
        | (_interleave10(q[:, 2]) << 2)
    )
    if valid is not None:
        code = jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(code)
    ps = points[order]                                  # [N, 3] morton-sorted

    # distances to +-window morton neighbors via static shifted slices
    # (no per-element gathers), padded with +inf at the ends
    big = jnp.full((window, 3), jnp.inf, points.dtype)
    ext = jnp.concatenate([big, ps, big], axis=0)       # [N + 2W, 3]
    cols = []
    for o in range(-window, window + 1):
        if o == 0:
            continue
        nbr = jax.lax.slice_in_dim(ext, window + o, window + o + n, axis=0)
        cols.append(jnp.sum((nbr - ps) ** 2, axis=-1))
    d2 = jnp.stack(cols, axis=-1)                       # [N, 2W]
    neg3, _ = jax.lax.top_k(-d2, 3)
    mean3 = jnp.mean(
        jnp.where(jnp.isfinite(neg3), jnp.maximum(-neg3, 0.0), 0.0), axis=1
    )
    # undo the permutation
    out = jnp.zeros((n,), points.dtype).at[order].set(mean3)
    return out
