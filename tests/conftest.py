"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
`xla_force_host_platform_device_count=8` (the TPU-idiomatic fake-cluster
equivalent — see SURVEY.md §4).  The environment pins JAX to the tunneled
single-TPU 'axon' platform via sitecustomize, so the env var alone is not
enough — `jax.config.update` must override it before any computation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
