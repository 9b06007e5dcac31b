"""Test harness: run everything on CPU with 8 virtual devices.

The reference has no tests at all (SURVEY.md §4); this suite is the test
pyramid it lacked. An 8-device host-platform mesh stands in for a v5e-8 so
the sharded paths (embedding all-gather in the loss, batch-sharded train
steps) are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS from the
# environment; the config update below wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20200220)


@pytest.fixture(scope="session")
def mesh8():
    from eeg_image_decode_tpu.core.mesh import create_mesh

    return create_mesh(data_parallel=8)
