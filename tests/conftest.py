"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised without TPU hardware.

NOTE: in this environment the 'axon' TPU plugin ignores the JAX_PLATFORMS
env var and XLA_FLAGS=--xla_force_host_platform_device_count is a no-op;
the working mechanism is the jax.config API, called before first backend use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
