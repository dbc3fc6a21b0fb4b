"""Test config: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpret mode on CPU (handled inside the render
module via a platform check).
"""
import os

# The environment pins JAX_PLATFORMS=axon (tunneled TPU) and a
# sitecustomize imports jax at interpreter start, so plain env overrides are
# too late; jax.config still works because the backend is resolved lazily.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
