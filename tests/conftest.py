"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard way for TPU code without a pod:
a forced 8-device host (CPU) platform (see SURVEY.md §4e). The execution
environment pre-imports jax with the real-TPU backend selected
(``sitecustomize``), so env vars are too late — use ``jax.config`` instead.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True)
def _clean_kernel_escape_hatches():
    """The engine's compile-failure ladder sets process-wide escape hatches
    (HIPSC_NO_PALLAS_FTCS / HIPSC_NO_PALLAS); never let one test's fallback
    silently disable Pallas kernels for the rest of the suite."""
    yield
    import os

    os.environ.pop("HIPSC_NO_PALLAS_FTCS", None)
    os.environ.pop("HIPSC_NO_PALLAS", None)
