"""Full-stack serving QPS: QueryBatcher -> VectorStore -> clustered index.

The engine-level flagships measure ``search_pipelined`` directly; this
measures what an API user gets: concurrent single-query requests
coalesced by the QueryBatcher (the REST server's path,
wdbx_tpu/api/server.py -> api/batching.py) into store ``search_batch``
calls, with the store's id/metadata resolution on every hit. The
reference's equivalent path is one hnswlib call per request per shard
(reference wdbx/api/server.py:141-152).

Protocol: N client coroutines each submit single queries back-to-back
for DURATION seconds; flushes overlap on threads (device waits release
the GIL). Reports client-side QPS, achieved batch size, and request
latency percentiles.

Env: STORE_N (default 262144), STORE_DIM (384), CLIENTS (256),
     DURATION (10 s), MAX_BATCH (128).
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_wdbx")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main() -> None:
    n = int(os.environ.get("STORE_N", 262_144))
    dim = int(os.environ.get("STORE_DIM", 384))
    clients = int(os.environ.get("CLIENTS", 256))
    duration = float(os.environ.get("DURATION", 10.0))
    max_batch = int(os.environ.get("MAX_BATCH", 128))
    chunk = 65_536

    import jax
    import jax.numpy as jnp

    from wdbx_tpu.api.batching import QueryBatcher
    from wdbx_tpu.core.config import WDBXConfig
    from wdbx_tpu.store.vector_store import VectorStore

    cfg = WDBXConfig()
    cfg.set("VECTOR_DIMENSION", dim)
    cfg.set("NUM_SHARDS", 1)
    cfg.set("INDEX_TYPE", "ivf_clustered")
    cfg.set("INDEX_DTYPE", "int8")
    cfg.set("IVF_NLIST", max(64, n // 1024))
    cfg.set("IVF_NPROBE", 8)
    cfg.set("IVF_TRAIN_THRESHOLD", 4096)
    cfg.set("VECTOR_STORE_KEEP_RAW", False)  # no host copies at this n
    cfg.set("VECTOR_STORE_AUTOSAVE_INTERVAL", 1 << 62)

    store = VectorStore(cfg, data_dir="/tmp/wdbx_store_bench")

    # data on device (host first-touch is ~15 MB/s here), Gaussian
    # mixture like the engine flagships
    n_comp = 1024
    centers = jax.random.normal(
        jax.random.PRNGKey(7), (n_comp, dim), jnp.float32
    )
    centers = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
    noise = 0.67 / np.sqrt(dim)

    from functools import partial

    @partial(jax.jit, static_argnames=("m",))
    def _gen(cents, seed, m):
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        ids = jax.random.randint(k1, (m,), 0, n_comp)
        rows = cents[ids] + noise * jax.random.normal(
            k2, (m, dim), jnp.float32
        )
        return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

    t0 = time.perf_counter()
    for i in range(0, n, chunk):
        m = min(chunk, n - i)
        rows = np.asarray(_gen(centers, 1000 + i // chunk, m), np.float32)
        store.batch_store(
            {f"v{i + j}": rows[j] for j in range(m)}
        )
    store.indices[0].build()
    print(json.dumps({
        "stage": "ingest", "n": store.count(),
        "ingest_s": round(time.perf_counter() - t0, 1),
    }), flush=True)

    queries = np.asarray(_gen(centers, 9999, 4096), np.float32)
    # pre-compile every batch width the serving loop can hit (the same
    # thing `cli serve --warm` does) — an unwarmed width mid-run would
    # bill a fresh compile to some unlucky request's p99
    t1 = time.perf_counter()
    widths = store.warm(max_batch=max_batch)
    print(json.dumps({
        "stage": "warm", "widths": widths,
        "s": round(time.perf_counter() - t1, 1),
    }), flush=True)

    async def run() -> None:
        batcher = QueryBatcher(
            store, max_batch=max_batch, max_wait_ms=2.0
        )
        stop = time.perf_counter() + duration
        lat: list[float] = []
        done = 0

        async def client(cid: int) -> None:
            nonlocal done
            r = cid
            while time.perf_counter() < stop:
                q = queries[r % len(queries)]
                r += clients
                t1 = time.perf_counter()
                hits = await batcher.search(q, limit=10)
                lat.append(time.perf_counter() - t1)
                # SearchHit = (id, score, metadata)
                assert hits and hits[0][0].startswith("v")
                done += 1

        t1 = time.perf_counter()
        await asyncio.gather(*(client(c) for c in range(clients)))
        wall = time.perf_counter() - t1
        arr = np.asarray(sorted(lat))
        print(json.dumps({
            "stage": "serving", "clients": clients,
            "qps": round(done / wall),
            "requests": done,
            "avg_batch": batcher.get_stats().get("avg_batch_size"),
            "p50_ms": round(float(arr[len(arr) // 2]) * 1000, 1),
            "p99_ms": round(float(arr[int(len(arr) * 0.99)]) * 1000, 1),
        }), flush=True)

    asyncio.run(run())


if __name__ == "__main__":
    main()
