"""Mean squared distance to the 3 nearest neighbours — equivalent of the
reference's `distCUDA2` (gsplat/rasterizer/simple_knn.cu, used for initial
Gaussian scales at src/raw_gs_param.cpp:28) and of the nanoflann CPU path
(src/kdtree_tensor.cpp:8-38).

TPU design: brute-force chunked distance matrices via the MXU
(d^2 = |a|^2 + |b|^2 - 2 a.b) with a top-4 partial sort per row.  Exact up
to `max_reference` points; beyond that the reference set is uniformly
subsampled — the result only seeds initial scales, where an estimate from
64k reference points is statistically indistinguishable.
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
        d2 = (
            jnp.sum(rows * rows, axis=1)[:, None]
            + ref_sq[None, :]
            - 2.0 * rows @ ref.T
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
