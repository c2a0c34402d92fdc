"""Test configuration: run on CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware (SURVEY.md §4).

Note: the environment preloads a TPU PJRT plugin via sitecustomize (jax is imported
before pytest loads this conftest), so setting JAX_PLATFORMS here is too late for the
import — we must update jax.config directly, before any backend initialisation.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
