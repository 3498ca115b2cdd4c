"""Flagship memory config: 10M x 768 int8 IVF on ONE chip (clustered slab).

The dense-table IVF needs slab + bucket tables ~= 2.3x corpus HBM, which
put 10M x 768 int8 (~17.7 GB) out of reach of a single 16 GB v5e.
ClusteredIVFIndex stores the bucket layout IN the slab (corpus + ~9
bytes/row), so the same corpus fits one chip with room to spare.

Measures: streaming two-pass build time, HBM envelope, recall@10 vs the
exact oracle at several nprobe, single-query device latency (pipelined
(NB,1,d) stack to amortize the sandbox's ~30 ms tunnel RTT), and
batch-serving QPS (pipelined (NB,B,d) stacks).

Data: Gaussian-mixture embeddings (4096 components — the geometry of
real corpora; uniform-random is the known-adversarial case for any
partitioned index, see benchmarks/ivf_crossover.py).

Usage: python benchmarks/clustered_10m.py [N] [dim] [nlist]
Env: BENCH_SCALE shrinks N for smoke runs.
     BENCH_PHASES: comma list of build,recall,latency,serving (default
       all) — serving-only runs keep the fresh-Mosaic-compile count at
       one program per kernel generation.
     BENCH_KERNELS: comma list of kernel generations to A/B in ONE
       process/window, e.g. "v1,v2" (default: the index's auto pick).
       A generation whose compile dies (this sandbox's remote compile
       service caps long Mosaic compiles) is reported and skipped.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_wdbx")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    scale = float(os.environ.get("BENCH_SCALE", 1.0))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(10_000_000 * scale)
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    chunk = 524_288
    k = 10

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wdbx_tpu.index.clustered import ClusteredIVFIndex

    n_comp = min(nlist, 4096)
    centers = jax.random.normal(
        jax.random.PRNGKey(7), (n_comp, dim), jnp.float32
    )
    centers = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
    # within-cluster cosine ~0.83 (|noise| ~ 0.67 relative): realistic
    # embedding-corpus tightness, same as benchmarks/ivf_crossover.py
    noise = 0.67 / np.sqrt(dim)

    from functools import partial

    @partial(jax.jit, static_argnames=("m",))
    def _gen(cents, seed, m):
        # NOTE: cents is an argument, not a closure capture — a captured
        # device array becomes an HLO literal, costing ~2 minutes of
        # constant folding per compile and defeating the compile cache.
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        ids = jax.random.randint(k1, (m,), 0, n_comp)
        rows = cents[ids] + noise * jax.random.normal(
            k2, (m, dim), jnp.float32
        )
        return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

    def gen_chunk(seed, m):
        return _gen(centers, seed, m)

    def chunks():
        for i in range(0, n, chunk):
            yield gen_chunk(1000 + i // chunk, min(chunk, n - i))

    import logging

    logging.basicConfig(level=logging.INFO)
    idx = ClusteredIVFIndex(
        dim, dtype="int8", nlist=nlist, nprobe=4,
        train_threshold=1 << 62,  # no auto-retrain during the bench
    )
    qprec_env = os.environ.get("BENCH_QPREC", "").strip().lower()
    if qprec_env:
        # validate up front: a typo would otherwise survive the
        # multi-minute build and die at the first serving dispatch
        assert qprec_env in ("bf16", "int8"), qprec_env
        idx.kernel_qprec = qprec_env
    idx.block_bytes_target = int(
        os.environ.get("BENCH_BLOCK_TARGET", 786_432)
    )
    t0 = time.perf_counter()
    idx.build_from(chunks, train_chunks=1)
    build_s = time.perf_counter() - t0
    stats = idx.get_stats()
    # full HBM envelope: slab + scales(f32) + valid + row_bucket(i32)
    hbm_gb = (stats["hbm_bytes"] + idx.capacity * (4 + 1 + 4)) / 1e9
    print(json.dumps({
        "stage": "build", "n": n, "dim": dim, "nlist": nlist,
        "build_s": round(build_s, 1), "hbm_gb": round(hbm_gb, 2),
        "ingest_rows_per_s": round(n / build_s),
    }), flush=True)

    phases = set(
        os.environ.get("BENCH_PHASES", "build,recall,latency,serving")
        .split(",")
    )
    kernels = [
        kv for kv in os.environ.get("BENCH_KERNELS", "").split(",") if kv
    ] or [None]

    # ---- recall vs exact oracle ----
    idx.batch_flat_fallback = False
    if "recall" in phases:
        q = np.asarray(gen_chunk(9999, 32), np.float32)
        # true top-k oracle (the default 'approx' oracle caps measured
        # recall at its own ~0.95-0.98 agreement with the exact answer)
        idx.topk_method = "exact"
        _, oracle = idx._oracle_search(q, k)
        idx.topk_method = "approx"
        for nprobe in (1, 2, 4, 8):
            idx.nprobe = nprobe
            _, got = idx.search(q, k)
            rec = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / k
                for a, b in zip(got, oracle)
            ]))
            print(json.dumps({
                "stage": "recall", "nprobe": nprobe,
                "recall_at_10": round(rec, 4),
            }), flush=True)

    def bench(fn, reps=3):
        fn()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    idx.nprobe = 4
    for kv in kernels:
        if kv is not None:
            idx.kernel_version = kv
        tag = {} if kv is None else {"kernel": kv}

        # ---- single-query device latency (64 queries / dispatch) ----
        if "latency" in phases:
            q1 = np.asarray(
                gen_chunk(888, 64), np.float32
            ).reshape(64, 1, dim)
            try:
                dt = bench(lambda: idx.search_pipelined(q1, k))
                print(json.dumps({
                    "stage": "latency", "nprobe": 4,
                    "single_query_device_ms": round(dt / 64 * 1000, 3),
                    **tag,
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "stage": "latency",
                    "error": f"{type(e).__name__}: {str(e)[:160]}", **tag,
                }), flush=True)

        # ---- batch serving throughput ----
        if "serving" in phases:
            configs = [
                tuple(int(x) for x in cfg.split(":"))
                for cfg in os.environ.get(
                    "BENCH_SERVING_CONFIGS", "16:128,16:64"
                ).split(",")
            ]
            flights = int(os.environ.get("BENCH_FLIGHTS", 3))
            # BENCH_DEVICE_QS=1 keeps the query stack device-resident:
            # isolates the per-dispatch H2D upload of the numpy stack
            # (3-6 MB through the tunnel) from device compute.
            # "ab" measures both modes in one window.
            dq_env = os.environ.get("BENCH_DEVICE_QS", "0")
            dq_modes = [False, True] if dq_env == "ab" else [dq_env == "1"]
            for nb, b in configs:
              for device_qs in dq_modes:
                qs = np.asarray(
                    gen_chunk(777, nb * b), np.float32
                ).reshape(nb, b, dim)
                if device_qs:
                    qs = jax.device_put(jnp.asarray(qs))
                    jax.block_until_ready(qs)
                try:
                    # steady-state serving keeps dispatches IN FLIGHT
                    # (same double-buffered pattern as bench.py): the
                    # ~30 ms tunnel RTT and the query-stack H2D overlap
                    # device compute instead of serializing with it
                    idx.resolve_pipelined(
                        idx.search_pipelined(qs, k, materialize=False)
                    )  # warm/compile
                    reps = 3
                    t0 = time.perf_counter()
                    hs = [
                        idx.search_pipelined(qs, k, materialize=False)
                        for _ in range(max(reps, flights))
                    ]
                    for h in hs:
                        idx.resolve_pipelined(h)
                    dt = (time.perf_counter() - t0) / len(hs)
                    rec = {
                        "stage": "serving", "nprobe": 4, "nb": nb,
                        "batch": b, "qps": round(nb * b / dt),
                        "ms_per_batch": round(dt / nb * 1000, 2),
                        "in_flight": len(hs),
                        "device_qs": device_qs, **tag,
                    }
                    if os.environ.get("BENCH_SERIAL", "1") == "1":
                        # serial (one-dispatch-at-a-time) comparison
                        dt_s = bench(
                            lambda: idx.search_pipelined(qs, k)
                        )
                        rec["qps_serial"] = round(nb * b / dt_s)
                    print(json.dumps(rec), flush=True)
                except Exception as e:
                    print(json.dumps({
                        "stage": "serving", "nb": nb, "batch": b,
                        "error": f"{type(e).__name__}: {str(e)[:160]}",
                        **tag,
                    }), flush=True)


if __name__ == "__main__":
    main()
