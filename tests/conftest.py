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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# On a loaded host the virtual-device threads can be starved past XLA:CPU's
# 40 s collective-rendezvous termination default, which hard-aborts the
# process mid-test (rendezvous.cc check failure). Tests only care about
# correctness — give the rendezvous generous headroom.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
