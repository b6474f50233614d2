"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* so multi-chip sharding logic is
exercised without TPU hardware, and with jax x64 enabled so f64 parity
against the numpy oracle is exact.  These env vars must be set before jax
is imported anywhere.
"""

import os

# Force CPU (the environment presets JAX_PLATFORMS=axon for the real TPU;
# tests must run on the virtual 8-device CPU mesh instead).  The axon
# sitecustomize registers its PJRT plugin whenever PALLAS_AXON_POOL_IPS is
# set and that registration overrides JAX_PLATFORMS — clear it too.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon sitecustomize imports jax at interpreter start, so the env vars
# above can be too late; the config update below still wins as long as no
# backend has been initialised yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
