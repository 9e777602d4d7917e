"""Test config: force CPU with 8 virtual devices so multi-chip sharding paths
can be exercised without TPU hardware.

Note: this container's sitecustomize imports jax at interpreter startup to
register the axon TPU plugin, so setting JAX_PLATFORMS here is too late for
jax's import-time config read — we also call jax.config.update, which works
as long as no backend has been initialised yet. For fast local iteration run
`env -u PALLAS_AXON_POOL_IPS python -m pytest ...` which skips the TPU relay
registration (~2 min) entirely.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; got " + jax.default_backend())
