"""Test harness: force the CPU platform with 8 virtual devices so multi-chip
sharding (Mesh/psum/shard_map) is exercised without TPU hardware
(see SURVEY.md §4 rebuild implications).

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var, so the platform
must be forced through jax.config BEFORE the backend initializes. Set
CONTRASTYOU_TEST_PLATFORM=tpu to run the suite on the real chip instead
(sharding tests will then skip if fewer than 8 devices)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("CONTRASTYOU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
