"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no tests at all (SURVEY.md §4). Our strategy, per SURVEY §4's
implication list: unit oracles for every vectorized metric, golden CSV schemas,
model parity vs randomly-initialized torch references, e2e fixture runs, and
multi-chip sharding tests on a fake 8-device CPU backend
(``xla_force_host_platform_device_count`` — the standard JAX trick).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Parity tests compare against torch fp32; the backend's default matmul/conv
# precision is reduced (bf16-class), so force full precision under test.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
