"""YAML config system, byte-compatible with the reference templates.

Replaces ``template_params`` / ``check_output_dir`` (reference
``backend.py:234-280``): the same ``paths.yaml`` + ``templates/*.yaml`` files
run unchanged. ``check_output_dir`` keeps the reference's self-healing
interactive loop but adds a non-interactive mode (create-if-missing) for
headless TPU jobs.
"""

from __future__ import annotations

import os
from typing import Optional

import yaml


def template_params(path: str) -> dict:
    """Parameters dict from a YAML template file (``backend.py:234-238``)."""
    with open(path, "r") as file:
        return yaml.safe_load(file)


def check_output_dir(
    paths_file: str = "paths.yaml",
    interactive: Optional[bool] = None,
) -> str:
    """Read the output root from ``paths.yaml`` and make sure it exists
    (``backend.py:241-280``). In non-interactive mode (the default when stdin
    is not a TTY) a missing directory is created instead of prompting."""
    with open(paths_file, "r") as file:
        keys = yaml.safe_load(file)
    output_dir = keys["output_dir"]

    if interactive is None:
        import sys

        interactive = sys.stdin.isatty()

    while not os.path.isdir(output_dir):
        if not interactive:
            os.makedirs(output_dir, exist_ok=True)
            break
        print(f'\nSimulation output directory: "{output_dir}" does not exist!')
        user = input('Do you want to make this directory? If "n", you can specify'
                     " the correct path (y/n): ")
        print()
        if user == "y":
            os.makedirs(output_dir)
            break
        elif user == "n":
            output_dir = input("Correct path (absolute) to output directory: ")
            keys["output_dir"] = output_dir
            with open(paths_file, "w") as file:
                yaml.dump(keys, file)
        else:
            print('Either type "y" or "n"')

    separator = os.path.sep
    if output_dir[-1] != separator:
        output_dir += separator
    return output_dir


def check_direct(path: str) -> None:
    """Make sure a directory exists (``backend.py:163-167``)."""
    if not os.path.isdir(path):
        os.makedirs(path, exist_ok=True)


def ensure_compilation_cache(path: str | None = None) -> None:
    """Point JAX at a persistent compilation cache unless the caller already
    set one. The fused step + Pallas kernels take minutes to compile at large
    capacities through a tunneled TPU backend; the cache makes every rerun
    (and every capacity-growth recompile seen before) near-instant."""
    import os

    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:  # pragma: no cover - very old jax
        return
    if current:
        return
    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "hipsc_abm_tpu_jax"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
