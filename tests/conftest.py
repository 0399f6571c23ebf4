"""Test harness configuration.

Forces the CPU backend with 8 virtual devices so sharding tests run
anywhere (the JAX-idiomatic fake-cluster mechanism, SURVEY §4). The axon
sitecustomize may have already imported jax with the TPU platform
registered; the backend itself is initialized lazily, so switching the
platform here still works as long as no array ops ran yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
