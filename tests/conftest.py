"""Test configuration: run everything on an 8-device virtual CPU mesh.

Mirrors the multi-host simulation strategy from SURVEY.md §4 — the
reference has no CI suite at all; we test kernels against numpy/torch
oracles and sharding against a virtual device mesh
(xla_force_host_platform_device_count=8).
"""

import os

# Force the CPU backend for unit tests regardless of the ambient platform
# (the dev machine exposes a tunneled TPU via JAX_PLATFORMS=axon; tests
# must be hermetic and run on the 8-device virtual CPU mesh).  The axon
# plugin ignores the env var, so also set it via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1)
