"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard way for TPU code without a pod:
``xla_force_host_platform_device_count`` (see SURVEY.md §4e). Must be set
before jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
