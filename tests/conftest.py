"""Test harness: run everything on a virtual 8-device CPU mesh in float64.

Multi-host logic is validated on CPU via XLA's forced host platform device
count (SURVEY.md §4 consequence); parity tests need float64 like the
reference (float64 end-to-end, GPR/data_handler.py:63-64).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin force-registers itself as the default platform at
# interpreter boot (sitecustomize); override *after* import so tests run on
# the virtual 8-device CPU mesh, not through the remote-compile TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
