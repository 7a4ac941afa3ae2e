"""Hardware-mode tests: run on the REAL TPU backend (no platform override).

``tests/`` forces a virtual 8-device CPU mesh, so every Pallas test there
runs the kernels in interpreter mode; this directory is the compiled-Mosaic
regression gate. Run with ``python -m pytest tests_tpu/ -q`` in an
environment with a TPU attached (the bench environment); the tests skip
cleanly anywhere else.
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
