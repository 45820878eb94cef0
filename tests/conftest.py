"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere in the test process.
"""

import os
import sys

# Force CPU: the session env may pin JAX_PLATFORMS to a TPU backend (and a
# sitecustomize may re-pin it), but the test suite runs on a virtual
# 8-device CPU mesh (SURVEY.md §4 item 5).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
