"""Native C++ mesher vs the numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from gps_slam_tpu.data import synthetic
from gps_slam_tpu.tsdf import integrate, volume as vm
from gps_slam_tpu.tsdf.meshing import extract_mesh
from gps_slam_tpu.tsdf.native import native_available


@pytest.mark.skipif(not native_available(), reason="g++/native lib unavailable")
def test_native_mesher_matches_numpy():
    cams = synthetic.make_cameras(n_frames=4, width=96, height=72)
    p = vm.TsdfParams(voxel_size=0.02, mu=0.08, hash_size=1 << 15,
                      block_capacity=1 << 12, visible_capacity=1 << 11,
                      raycast_steps=48)
    vol = vm.create(p)
    for c in cams:
        vol = integrate.fuse_frame(
            vol, jnp.asarray(c.depth[..., 0]), jnp.asarray(c.image),
            jnp.asarray(c.c2w), jnp.asarray(c.K),
        )
    v_np, c_np = extract_mesh(vol, use_native=False)
    v_na, c_na = extract_mesh(vol, use_native=True)
    assert v_na.shape[0] == v_np.shape[0], (v_na.shape, v_np.shape)
    # triangle sets must match (order may differ across OpenMP threads):
    # compare sorted flattened triangles
    tri_np = np.sort(v_np.reshape(-1, 9), axis=0)
    tri_na = np.sort(v_na.reshape(-1, 9), axis=0)
    np.testing.assert_allclose(tri_na, tri_np, atol=1e-5)
    cc_np = np.sort(c_np.reshape(-1, 9), axis=0)
    cc_na = np.sort(c_na.reshape(-1, 9), axis=0)
    np.testing.assert_allclose(cc_na, cc_np, atol=2e-2)
