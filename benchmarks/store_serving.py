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
     DURATION (10 s), MAX_BATCH (128), STORE_NLIST (default 4096),
     STORE_NPROBE (default 1 — the tuned flagship op point).
     STORE_DATA_DIR — load a previously saved store (e.g. the
     store_scale 10M corpus) instead of generating + building one;
     STORE_NPROBE still applies (set on the loaded index).
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
    chunk = 262_144

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
    cfg.set("IVF_NLIST", int(os.environ.get(
        "STORE_NLIST", min(4096, max(64, n // 1024))
    )))
    cfg.set("IVF_NPROBE", int(os.environ.get("STORE_NPROBE", 1)))
    cfg.set("IVF_TRAIN_THRESHOLD", 4096)
    cfg.set("VECTOR_STORE_KEEP_RAW", False)  # no host copies at this n
    cfg.set("VECTOR_STORE_AUTOSAVE_INTERVAL", 1 << 62)

    data_dir = os.environ.get("STORE_DATA_DIR")
    if data_dir:
        # serve a persisted corpus (store_scale's 10M build): the cfg
        # must match its geometry; nprobe is an op point, not a layout
        # property, so the env override wins over the checkpointed one
        cfg.set("INDEX_CAPACITY", n)
        cfg.set("RAW_STORE", os.environ.get("RAW_STORE", "memmap"))
        cfg.set("RAW_STORE_DTYPE", os.environ.get("RAW_STORE_DTYPE", "int8"))
        cfg.set("IVF_TRAIN_THRESHOLD", 1 << 62)
        t0 = time.perf_counter()
        store = VectorStore(cfg, data_dir=data_dir)
        for index in store.indices:
            index.nprobe = int(os.environ.get("STORE_NPROBE", 1))
        print(json.dumps({
            "stage": "load", "n": store.count(),
            "load_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
    else:
        store = VectorStore(cfg, data_dir="/tmp/wdbx_store_bench")

    # corpus generation on the CPU BACKEND (numpy first-touch is
    # ~15 MB/s here; and device-side generation would D2H ~30 GB of
    # rows through the sandbox tunnel at 10M x 768) — same Gaussian
    # mixture as the engine flagships, threefry is platform-invariant
    n_comp = 1024
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        centers = jax.random.normal(
            jax.random.PRNGKey(7), (n_comp, dim), jnp.float32
        )
        centers = centers / jnp.linalg.norm(
            centers, axis=-1, keepdims=True
        )
    noise = 0.67 / np.sqrt(dim)

    from functools import partial

    @partial(jax.jit, static_argnames=("m",), device=cpu)
    def _gen(cents, seed, m):
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        ids = jax.random.randint(k1, (m,), 0, n_comp)
        rows = cents[ids] + noise * jax.random.normal(
            k2, (m, dim), jnp.float32
        )
        return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

    if not data_dir:
        t0 = time.perf_counter()
        for i in range(0, n, chunk):
            m = min(chunk, n - i)
            rows = np.asarray(
                _gen(centers, 1000 + i // chunk, m), np.float32
            )
            store.bulk_load([f"v{i + j}" for j in range(m)], rows)
        store.indices[0].build()
        print(json.dumps({
            "stage": "ingest", "n": store.count(),
            "ingest_s": round(time.perf_counter() - t0, 1),
        }), flush=True)

    # window-contention probe: round-trip a trivial dispatch — the
    # serving numbers below are only comparable across windows when
    # this floor is healthy (~30 ms on the tunneled chip)
    tiny = jnp.zeros((8, 8), jnp.float32)
    jax.block_until_ready(tiny + 1)
    t1 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(tiny + 1)
    print(json.dumps({
        "stage": "floor_probe",
        "rtt_ms": round((time.perf_counter() - t1) / 10 * 1000, 1),
    }), flush=True)

    if os.environ.get("STORE_TUNE"):
        # VERDICT r4 ask #6 done-bar: the flagship re-tune must
        # reproduce the nprobe=1 op point on a held-out random sample
        t1 = time.perf_counter()
        rep = store.tune(target_recall=0.95, sample=64)
        print(json.dumps({
            "stage": "tune", "s": round(time.perf_counter() - t1, 1),
            "nprobe": rep["shards"][0].get("nprobe"),
            "achieved_recall": round(rep["achieved"], 4),
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
