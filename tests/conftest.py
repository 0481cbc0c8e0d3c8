"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths compile + execute without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def synthetic_cams():
    from gps_slam_tpu.data import synthetic

    return synthetic.make_cameras(n_frames=12, width=160, height=120)
