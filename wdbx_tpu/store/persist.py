"""Orbax/TensorStore checkpoint backend for index slabs.

The default npz path (wdbx_tpu/index/flat.py) gathers the slab to host —
fine at laptop scale, wrong at 10M x 768 across a pod (the full-host
gather is exactly what SURVEY.md §5.4 says to replace with
"device-resident arrays checkpointed via orbax/tensorstore-style sharded
arrays + a JSON sidecar"). This backend writes each device's shard
directly from device memory and restores with the target sharding, so
checkpoint I/O scales with per-host data, not corpus size.

Select with ``WDBX_PERSIST_BACKEND=orbax`` (store config) or
``index.persist_backend = "orbax"``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_arrays(path: str, arrays: dict[str, jax.Array]) -> None:
    """Write device arrays (possibly sharded) without a host gather."""
    path = os.path.abspath(path) + ".orbax"
    ckptr = _checkpointer()
    ckptr.save(path, arrays, force=True)
    ckptr.wait_until_finished()


def load_arrays(
    path: str, abstract: dict[str, jax.ShapeDtypeStruct]
) -> dict[str, jax.Array] | None:
    """Restore arrays with the shardings given in ``abstract``; returns
    None if no checkpoint exists at ``path``."""
    path = os.path.abspath(path) + ".orbax"
    if not os.path.isdir(path):
        return None
    ckptr = _checkpointer()
    return ckptr.restore(path, abstract)


def exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path) + ".orbax")
