"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding paths are validated on
virtual CPU devices (``xla_force_host_platform_device_count``), per the
multi-host test strategy in SURVEY.md §4.  TPU-specific checks live in
``scripts/`` and run ad hoc on real hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and overrides
# JAX_PLATFORMS; pin the config explicitly so the suite always runs on the
# virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ehyb_spmv_gpu_tpu.core.coo import deterministic_x  # noqa: E402
from ehyb_spmv_gpu_tpu.io import generate  # noqa: E402


@pytest.fixture(scope="session")
def poisson_small():
    return generate.poisson2d(40)  # dim 1600


@pytest.fixture(scope="session")
def poisson_mid():
    return generate.poisson2d(64)  # dim 4096


@pytest.fixture(scope="session")
def fem_small():
    return generate.fem3d(8)  # dim 1536, 27-point, 3 dofs


@pytest.fixture(scope="session")
def powerlaw_small():
    return generate.random_general(3000, 16, seed=5, power_law=0.8)


@pytest.fixture(scope="session")
def scrambled():
    return generate.permuted(generate.poisson2d(48), seed=11)


def x_for(m):
    return deterministic_x(m.dimension)
