"""Checkpoint / resume with a stable, bit-exact format.

Replaces the reference's every-step pickle of the whole Simulation object
(``temp``, ``simulation.py:290-298``; restore at ``simulation.py:525-536``).
Two improvements the SURVEY calls out (§5.4):

- the checkpoint is the state PyTree (all slot arrays + the ``jax.random``
  key + counters) serialized to ``npz`` — format-stable, not coupled to the
  Python object layout;
- the RNG key is part of the state, so resume is bit-exact (the reference's
  global ``random``/``np.random`` streams are not captured by its pickle).
"""

from __future__ import annotations

import io
import json
import os
from typing import Tuple

import jax
import numpy as np

from hipsc_abm_tpu.engine import CellState
from hipsc_abm_tpu.ops.jkr import BondState

_FORMAT_VERSION = 2  # v2: + arrays/ids, next_id (stable agent identity)


def save_state(path: str, state: CellState, meta: dict | None = None) -> None:
    """Serialize a CellState (device -> host -> npz) atomically."""
    payload = {}
    host = jax.device_get(state)
    for name, arr in host.arrays.items():
        payload[f"arrays/{name}"] = np.asarray(arr)
    payload["alive"] = np.asarray(host.alive)
    payload["bonds/partners"] = np.asarray(host.bonds.partners)
    payload["bonds/mask"] = np.asarray(host.bonds.mask)
    for name, grid in host.gradients.items():
        payload[f"gradients/{name}"] = np.asarray(grid)
    payload["key"] = np.asarray(host.key)
    payload["step"] = np.asarray(host.step)
    payload["next_id"] = np.asarray(host.next_id)
    payload["meta"] = np.frombuffer(
        json.dumps({"format_version": _FORMAT_VERSION, **(meta or {})}).encode(),
        dtype=np.uint8,
    )

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
    os.replace(tmp, path)


def load_state(path: str) -> Tuple[CellState, dict]:
    """Restore a CellState and its metadata from an npz checkpoint."""
    with np.load(path) as data:
        arrays = {}
        gradients = {}
        for key in data.files:
            if key.startswith("arrays/"):
                arrays[key.split("/", 1)[1]] = data[key]
            elif key.startswith("gradients/"):
                gradients[key.split("/", 1)[1]] = data[key]
        meta = json.loads(bytes(data["meta"]).decode()) if "meta" in data.files else {}
        state = CellState(
            arrays={k: jax.numpy.asarray(v) for k, v in arrays.items()},
            alive=jax.numpy.asarray(data["alive"]),
            bonds=BondState(
                partners=jax.numpy.asarray(data["bonds/partners"]),
                mask=jax.numpy.asarray(data["bonds/mask"]),
            ),
            gradients={k: jax.numpy.asarray(v) for k, v in gradients.items()},
            key=jax.numpy.asarray(data["key"]),
            step=jax.numpy.asarray(data["step"]),
            next_id=jax.numpy.asarray(data["next_id"]),
        )
    return state, meta
