"""Shard control plane.

What survives from the reference's ShardManager (reference
wdbx/core/distributed.py:21): the *control* responsibilities — knowing
the topology, shard→device placement, replication factor, liveness — as
small host-side JSON state. What does NOT survive: the data plane.
Cross-shard queries are XLA collectives inside compiled programs
(wdbx_tpu/parallel/sharded_flat.py), not pickle-over-TCP RPC (the
reference's framed-socket scheme at wdbx/core/distributed.py:265-273 is
both dead code — its client paths NameError on ``struct`` — and unsafe).

Multi-host scaling hooks into JAX's multi-controller runtime
(``jax.distributed.initialize`` over DCN) rather than a bespoke
coordinator process.
"""

from __future__ import annotations

import json
import logging
import os
import socket
import time
from typing import Any

import jax

from wdbx_tpu.parallel.mesh import make_mesh

logger = logging.getLogger("wdbx_tpu.parallel")


class ShardEngine:
    """Owns the device mesh and shard placement metadata."""

    def __init__(self, config: Any, mesh=None):
        self.config = config
        self.axis = str(config.get("MESH_AXIS", "shard"))
        self.replication_factor = int(
            config.get("DISTRIBUTED_REPLICATION_FACTOR", 1)
        )
        self.node_id = f"{socket.gethostname()}_{int(time.time())}"
        self.mesh = mesh
        self._initialized = False

    async def initialize(self) -> None:
        if self._initialized:
            return
        # Multi-host: if a coordinator is configured in the environment,
        # join the JAX multi-controller runtime (DCN control plane).
        coord = os.environ.get("WDBX_COORDINATOR_ADDRESS")
        if coord and jax.process_count() == 1:
            try:
                jax.distributed.initialize(
                    coordinator_address=coord,
                    num_processes=int(os.environ.get("WDBX_NUM_PROCESSES", "1")),
                    process_id=int(os.environ.get("WDBX_PROCESS_ID", "0")),
                )
            except Exception as e:
                logger.warning("jax.distributed.initialize failed: %s", e)
        if self.mesh is None:
            self.mesh = make_mesh(axis=self.axis)
        self._persist_allocation()
        self._initialized = True

    async def shutdown(self) -> None:
        self._initialized = False

    # -- placement metadata ------------------------------------------------
    def allocation(self) -> dict[str, Any]:
        """Shard→device map. Devices replace the reference's 'nodes';
        replication means the same logical shard present on r devices
        (recomputed from checkpoint on failure, not socket failover)."""
        mesh = self.mesh or make_mesh(axis=self.axis)
        devices = list(mesh.devices.flat)
        alloc = {
            "axis": self.axis,
            "node_id": self.node_id,
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "replication_factor": self.replication_factor,
            "shards": {
                str(i): {
                    "primary": str(d),
                    "replicas": [
                        str(devices[(i + r) % len(devices)])
                        for r in range(1, self.replication_factor)
                    ],
                }
                for i, d in enumerate(devices)
            },
        }
        return alloc

    def _persist_allocation(self) -> None:
        data_dir = self.config.get("DATA_DIR", "./wdbx_data")
        try:
            os.makedirs(data_dir, exist_ok=True)
            with open(os.path.join(data_dir, "shard_allocation.json"), "w") as f:
                json.dump(self.allocation(), f, indent=2)
        except OSError as e:
            logger.warning("failed to persist shard allocation: %s", e)

    def is_local_shard(self, shard: int) -> bool:
        """All mesh shards are addressable from this controller; with
        multi-host meshes a shard is 'local' if its device belongs to
        this process."""
        mesh = self.mesh or make_mesh(axis=self.axis)
        devices = list(mesh.devices.flat)
        device = devices[shard % len(devices)]
        return device.process_index == jax.process_index()

    def health_check(self) -> dict[str, Any]:
        """Per-device liveness: run a trivial computation on each mesh
        device. Replaces the reference's static status flags (reference
        wdbx/core/distributed.py:555-557 — no heartbeats at all)."""
        import jax.numpy as jnp

        mesh = self.mesh or make_mesh(axis=self.axis)
        statuses = {}
        for device in mesh.devices.flat:
            try:
                out = jax.device_put(jnp.ones((8, 8)), device) @ jnp.ones(
                    (8, 8)
                )
                ok = bool(out[0, 0] == 8.0)
            except Exception as e:
                ok = False
                statuses[str(device)] = f"error: {e}"
                continue
            statuses[str(device)] = "ok" if ok else "bad-result"
        healthy = all(v == "ok" for v in statuses.values())
        return {"healthy": healthy, "devices": statuses}

    def plan_recovery(
        self, health: dict[str, Any] | None = None
    ) -> dict[int, str]:
        """Consume the replication metadata on failure: for every shard
        whose primary device is unhealthy, pick the first healthy
        replica (falling back to any healthy device). Returns
        ``{shard: target_device}`` — the caller re-hosts each shard from
        its checkpoint there (checkpoint-based recovery, the TPU answer
        to the reference's socket failover at
        wdbx/core/distributed.py:698-834)."""
        health = health or self.health_check()
        statuses = health["devices"]
        healthy = {d for d, s in statuses.items() if s == "ok"}
        plan: dict[int, str] = {}
        for shard_s, placement in self.allocation()["shards"].items():
            if placement["primary"] in healthy:
                continue
            target = next(
                (r for r in placement["replicas"] if r in healthy), None
            )
            if target is None:
                target = next(iter(sorted(healthy)), None)
            if target is not None:
                plan[int(shard_s)] = target
        return plan

    def degraded_mesh(self, health: dict[str, Any] | None = None):
        """Mesh of only the healthy devices — the live re-meshing target
        when a device is permanently gone (vs. plan_recovery's same-mesh
        checkpoint re-hosting for transient failures). Returns the
        current mesh unchanged when everything is healthy."""
        import numpy as np
        from jax.sharding import Mesh

        health = health or self.health_check()
        mesh = self.mesh or make_mesh(axis=self.axis)
        devices = list(mesh.devices.flat)
        healthy = [
            d for d in devices if health["devices"].get(str(d)) == "ok"
        ]
        if not healthy:
            raise RuntimeError("no healthy devices to remesh onto")
        if len(healthy) == len(devices):
            return mesh
        # replica axes collapse: survival beats data-parallel fan-out
        return Mesh(np.array(healthy), (self.axis,))

    def adopt_mesh(self, mesh) -> None:
        """Install a new mesh (post-remesh) and persist the allocation."""
        self.mesh = mesh
        self._persist_allocation()

    def get_stats(self) -> dict[str, Any]:
        mesh = self.mesh
        return {
            "node_id": self.node_id,
            "axis": self.axis,
            "devices": [str(d) for d in (mesh.devices.flat if mesh else [])],
            "replication_factor": self.replication_factor,
            "process_count": jax.process_count(),
            "initialized": self._initialized,
        }
