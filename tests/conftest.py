"""Test harness config: CPU backend with 8 virtual devices.

Must run before any ``jax`` import (SURVEY.md §6.2 "Distributed without a
real pod"): the whole suite runs on XLA-CPU for determinism/speed, and the
slab-decomposition tests get an 8-device mesh via
``--xla_force_host_platform_device_count`` — ``ppermute``/``psum`` semantics
are identical to ICI, only performance differs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start, overriding the env var — override it back before any
# backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running parity/scale tests (deselect with -m 'not slow')"
    )
