"""Test configuration: force an 8-device CPU platform before JAX is used.

Distributed behavior (DP sharding, collectives) is validated on a virtual
8-device CPU mesh, mirroring how the driver dry-runs the multi-chip path.
The environment may pre-register an accelerator plugin at interpreter start
(sitecustomize) and force `jax_platforms`; we override it back to CPU via
jax.config before any backend is initialized by the tests.
"""

import os

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
