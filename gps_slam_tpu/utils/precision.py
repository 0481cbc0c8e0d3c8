"""Full-f32 matmul helper for geometry math.

TPU matmuls default to bf16 inputs; for pose transforms, covariance
conjugation, and voxel projection that 0.1% relative error is the same
order as a voxel, so every geometry matmul goes through `mm` (HIGHEST
precision = 3-pass f32).  The rasterizer's big weight-color contraction
deliberately stays on the fast path — bf16 products with f32 accumulation
are plenty for rendering.
"""

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.matmul(a, b, precision=HIGHEST)
