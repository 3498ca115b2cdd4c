"""Search latency DURING a clustered rebuild: background vs blocking.

The reference's ``optimize`` is stop-the-world (hnswlib rebuild under
the store lock — reference wdbx/core/indexing.py:1124-1149); round-2's
blocking ``build`` here held the writer lock 18-200+ s at 10M rows, so
p99 during a rebuild WAS the rebuild time. ``build_background`` keeps
serving from the old layout; this benchmark measures the steady-state
p50/p99 for B-query searches, then runs a rebuild in a thread while
hammering searches from the main thread, and reports both latency
distributions plus the rebuild duration.

Chip note: the rebuild's device work (assignment matmuls, permute
copies) time-shares the ONE chip with the searches, so some slowdown
is physical — the claim under test is "p99 within ~2x steady-state",
not zero interference.

Usage: python benchmarks/rebuild_p99.py [N] [dim] [nlist]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_wdbx")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main() -> None:
    scale = float(os.environ.get("BENCH_SCALE", 1.0))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(2_000_000 * scale)
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    b, k = 16, 10

    import jax
    import jax.numpy as jnp

    from wdbx_tpu.index.clustered import ClusteredIVFIndex

    n_comp = min(nlist, 4096)
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

    chunk = 524_288

    def chunks():
        for i in range(0, n, chunk):
            yield _gen(centers, 1000 + i // chunk, min(chunk, n - i))

    idx = ClusteredIVFIndex(
        dim, dtype="int8", nlist=nlist, nprobe=4,
        train_threshold=1 << 62,
    )
    t0 = time.perf_counter()
    slots = idx.build_from(chunks, train_chunks=1)
    print(json.dumps({
        "stage": "build", "n": n, "dim": dim,
        "build_s": round(time.perf_counter() - t0, 1),
    }), flush=True)

    q = np.asarray(_gen(centers, 9999, b), np.float32)
    idx.batch_flat_fallback = False

    def one_search():
        t = time.perf_counter()
        s, _ = idx.search(q, k)
        float(np.asarray(s[0, 0]))  # force D2H (block_until_ready lies)
        return time.perf_counter() - t

    def run_searches(seconds: float, lat: list[float], stop=None):
        end = time.perf_counter() + seconds
        while time.perf_counter() < end and (stop is None or
                                             not stop.is_set()):
            lat.append(one_search())

    # warm + steady state
    for _ in range(5):
        one_search()
    steady: list[float] = []
    run_searches(15.0, steady)

    def pct(xs, p):
        return float(np.percentile(np.asarray(xs) * 1000, p))

    print(json.dumps({
        "stage": "steady", "searches": len(steady),
        "p50_ms": round(pct(steady, 50), 2),
        "p99_ms": round(pct(steady, 99), 2),
    }), flush=True)

    # churn so the rebuild has real work, then rebuild in background
    idx.remove_slots(slots[: n // 10])
    during: list[float] = []
    done = threading.Event()
    t_re = [0.0]

    def rebuild():
        t = time.perf_counter()
        idx.build_background()
        t_re[0] = time.perf_counter() - t
        done.set()

    th = threading.Thread(target=rebuild)
    th.start()
    while not done.is_set():
        during.append(one_search())
    th.join()
    print(json.dumps({
        "stage": "during_background_rebuild", "searches": len(during),
        "rebuild_s": round(t_re[0], 1),
        "p50_ms": round(pct(during, 50), 2),
        "p99_ms": round(pct(during, 99), 2),
        "p99_vs_steady": round(pct(during, 99) / pct(steady, 99), 2),
    }), flush=True)

    # contrast: blocking rebuild — p99 during it is the rebuild itself
    idx.remove_slots(slots[n // 10: n // 5])
    blocking: list[float] = []
    done2 = threading.Event()
    t_bl = [0.0]

    def rebuild_blocking():
        t = time.perf_counter()
        idx.build()
        t_bl[0] = time.perf_counter() - t
        done2.set()

    th2 = threading.Thread(target=rebuild_blocking)
    th2.start()
    while not done2.is_set():
        blocking.append(one_search())
    th2.join()
    print(json.dumps({
        "stage": "during_blocking_rebuild", "searches": len(blocking),
        "rebuild_s": round(t_bl[0], 1),
        "p50_ms": round(pct(blocking, 50), 2),
        "p99_ms": round(pct(blocking, 99), 2),
        "p99_vs_steady": round(pct(blocking, 99) / pct(steady, 99), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
