"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no tests at all (SURVEY.md §4). Our strategy, per SURVEY §4's
implication list: unit oracles for every vectorized metric, golden CSV schemas,
model parity vs randomly-initialized torch references, e2e fixture runs, and
multi-chip sharding tests on a fake 8-device CPU backend
(``xla_force_host_platform_device_count`` — the standard JAX trick).
"""
import os

import jax

# A sitecustomize on PYTHONPATH force-sets JAX_PLATFORMS=axon (the TPU
# tunnel), so env vars are clobbered — use jax.config instead. Tests run on
# an 8-device virtual CPU mesh: deterministic, covers multi-chip sharding.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Parity tests compare against torch fp32; TPU-default matmul/conv precision
# is reduced (bf16-class) — force full precision under test.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
