"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware.

Note: this environment's sitecustomize imports jax at interpreter startup
(axon TPU plugin), so JAX_PLATFORMS env vars set here are too late —
``jax.config.update`` still works because backends initialize lazily.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
