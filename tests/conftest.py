"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; `shard_map` collectives are
validated on XLA's host platform with 8 virtual devices (SURVEY.md §4d).
x64 is enabled so fp64 oracle paths (BASELINE config 1) are exact.

Note: the session's sitecustomize imports jax and registers a TPU PJRT
plugin before conftest runs, so plain env vars are too late — we use
jax.config.update, which takes effect as long as no backend is initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
