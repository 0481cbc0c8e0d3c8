"""GPS-SLAM-TPU: a TPU-native (JAX/XLA/Pallas) RGB-D Gaussian-plus-SDF SLAM framework.

Re-implementation of the capabilities of the GPS-SLAM reference system
(arXiv:2509.11574): a real-time RGB-D reconstruction pipeline coupling a
colorized TSDF voxel-hash scene (classical fusion + raycasting + ICP
tracking + marching-cubes meshing) with a sparse set of 3D Gaussians that
model only what the SDF renders badly, optimized online with an
order-independent ("GES") differentiable rasterizer.

Everything here is designed TPU-first:
  * fixed-capacity pools + masks instead of dynamically-sized tensors,
  * functional pytree state threaded through jitted megasteps,
  * the GES renderer expressed as dense masked per-tile matmuls (MXU),
  * raycasting as bounded `lax.fori_loop` sphere tracing over a
    linear-probed voxel-block hash,
  * multi-chip scaling via `jax.sharding.Mesh` + collectives (no NCCL).
"""

__version__ = "0.1.0"
