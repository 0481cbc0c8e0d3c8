"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths compile + execute without TPU hardware."""

import os

# force-override: the environment presets JAX_PLATFORMS=axon (real TPU) and
# the axon plugin ignores the JAX_PLATFORMS filter, so additionally pin the
# default device to CPU after import.  Tests run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def synthetic_cams():
    from gps_slam_tpu.data import synthetic

    return synthetic.make_cameras(n_frames=12, width=160, height=120)
