"""Test env: force CPU with an 8-device virtual mesh BEFORE jax import.

Mesh-sharded tests validate multi-chip sharding logic without TPU hardware
(see SURVEY.md §4 item 7).
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("RA_TPU_QUIET", "1")

# the axon TPU plugin overrides JAX_PLATFORMS env; the config API wins.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
