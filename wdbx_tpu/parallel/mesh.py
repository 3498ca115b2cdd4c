"""Mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh2(
    replicas: int,
    shards: int | None = None,
    axes: tuple[str, str] = ("replica", "shard"),
) -> Mesh:
    """2-D mesh for replicated serving: the corpus shards over
    ``axes[1]`` and replicates over ``axes[0]``; query batches shard
    over ``axes[0]`` for data-parallel throughput."""
    devices = jax.devices()
    if shards is None:
        if len(devices) % replicas:
            raise ValueError(
                f"{len(devices)} devices not divisible by {replicas} replicas"
            )
        shards = len(devices) // replicas
    need = replicas * shards
    if need > len(devices):
        raise ValueError(f"requested {need} devices, {len(devices)} visible")
    return jax.make_mesh((replicas, shards), axes, devices=devices[:need])


def make_mesh(
    n_devices: int | None = None, axis: str = "shard"
) -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices.

    On a real slice the axis rides ICI; under
    ``--xla_force_host_platform_device_count=N`` it fakes N devices on
    CPU, which is how the test suite and the driver's multi-chip dry run
    exercise the collective paths.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} visible"
            )
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis,), devices=devices)
