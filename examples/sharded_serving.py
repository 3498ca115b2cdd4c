"""Multi-device serving demo: corpus sharding + replica groups + dynamic
query batching.

Run on a fake 8-device mesh (no TPU slice needed):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_serving.py

The same program runs unchanged on a real v5e-8: the corpus shards over
4 devices, replicates over 2 replica groups, queries shard over the
replica axis, and concurrent REST-style requests coalesce into device
batches.
"""

import asyncio
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Choose the platform BEFORE any backend initialization: probing
# jax.default_backend() would lock in the default platform.
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from wdbx_tpu import WDBX
from wdbx_tpu.api.batching import QueryBatcher


async def main() -> None:
    n_dev = len(jax.devices())
    replicas = 2 if n_dev >= 4 and n_dev % 2 == 0 else 1
    db = WDBX(
        vector_dimension=256,
        num_shards=1,  # device mesh does the sharding below this level
        data_dir=tempfile.mkdtemp(prefix="wdbx_sharded_"),
        enable_plugins=False,
        config={
            "INDEX_TYPE": "sharded_flat",
            "INDEX_DTYPE": "bfloat16",
            "MESH_REPLICAS": replicas,
            "VECTOR_STORE_KEEP_RAW": False,
            "VECTOR_STORE_AUTOSAVE_INTERVAL": 0,
        },
    )
    await db.initialize()
    index = db.store.indices[0]
    print(
        f"mesh: {index.n_devices} shard devices x {index.replicas} replicas "
        f"({n_dev} total)"
    )

    rng = np.random.default_rng(0)
    vectors = {
        f"doc-{i}": rng.standard_normal(256).astype(np.float32)
        for i in range(5_000)
    }
    await db.batch_store_async(vectors, {k: {"n": i} for i, k in enumerate(vectors)})
    print(f"stored {db.count_vectors()} vectors across the mesh")

    # Concurrent "requests" coalescing into device batches:
    batcher = QueryBatcher(db.store, max_batch=32, max_wait_ms=2.0)

    async def request(i: int):
        hits = await batcher.search(vectors[f"doc-{i}"], limit=3)
        assert hits[0][0] == f"doc-{i}", hits[0]
        return hits[0]

    results = await asyncio.gather(*(request(i) for i in range(64)))
    stats = batcher.get_stats()
    print(
        f"{stats['requests']} concurrent requests served in "
        f"{stats['batches']} device batches "
        f"(avg batch {stats.get('avg_batch_size', 1)})"
    )
    print(f"top hit example: {results[0][0]} score={results[0][1]:.4f}")
    await db.shutdown()


if __name__ == "__main__":
    asyncio.run(main())
