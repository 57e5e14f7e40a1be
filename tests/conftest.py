"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(parallel/) execute without TPU hardware, per SURVEY.md §4's strategy of
testing distributed logic via --xla_force_host_platform_device_count.
Must set env before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms='axon,cpu' at interpreter start; pin it back to CPU before
# any backend initialization so tests run on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from xlab_fftbarotropic_tpu.config import ModelConfig  # noqa: E402


@pytest.fixture
def small_cfg():
    """Small square grid for fast differential tests."""
    return ModelConfig(nx=64, ny=64, lx=600_000.0, ly=600_000.0,
                       dt=3.0, nu=6.5, record_step=10, total_steps=20)


@pytest.fixture
def cfg128():
    return ModelConfig(nx=128, ny=128)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
