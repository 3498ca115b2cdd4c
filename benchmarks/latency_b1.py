"""Single-query (B=1) latency: clustered narrow-block vs wide-block.

VERDICT r2 weak #2: at 1M x 384 the clustered engine's B=1 device
latency (0.43-0.50 ms) lost to the dense-table IVF (0.20 ms) because
c-wide covering blocks over-fetch ~2x for one query's few probed
buckets. Round 3 added narrow-block (c/4) extents selected when
pad_b <= small_batch_threshold. This benchmark measures, in ONE
window: wide vs narrow B=1 latency on the SAME built index (toggling
``small_batch_threshold``), recall parity between the two, and the
dense-table IVF reference point.

Latency protocol: pipelined (NB, 1, d) stacks amortize the ~30 ms
tunnel RTT; a D2H fetch closes each timing (block_until_ready lies on
this backend).

Usage: python benchmarks/latency_b1.py [N] [dim] [nlist]
"""

from __future__ import annotations

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    k, nb = 10, 64

    import jax
    import jax.numpy as jnp

    from wdbx_tpu.index.clustered import ClusteredIVFIndex
    from wdbx_tpu.index.ivf import IVFIndex

    n_comp = 4096
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

    chunk = 262_144

    def chunks():
        for i in range(0, n, chunk):
            yield _gen(centers, 1000 + i // chunk, min(chunk, n - i))

    idx = ClusteredIVFIndex(
        dim, dtype="int8", nlist=nlist, nprobe=4,
        train_threshold=1 << 62,
    )
    t0 = time.perf_counter()
    idx.build_from(chunks, train_chunks=1)
    print(json.dumps({
        "stage": "build", "n": n, "dim": dim,
        "build_s": round(time.perf_counter() - t0, 1),
        "c": idx._c,
        "c_small": idx._small["c"] if idx._small else None,
    }), flush=True)
    idx.batch_flat_fallback = False

    qstack = np.asarray(_gen(centers, 9999, nb), np.float32)[:, None, :]

    def one_lat(reps=3):
        # (NB, 1, d) pipelined stack -> device ms per query
        t0 = time.perf_counter()
        for _ in range(reps):
            s, _ = idx.search_pipelined(qstack, k)
        return (time.perf_counter() - t0) / (reps * nb) * 1000

    # Three B=1 programs, one window, same built index: wide covering
    # blocks, narrow (c/4) covering blocks, and the r3 exact-bucket-
    # range scan (dynamic slices, no Pallas — the dense-IVF program
    # shape on the clustered slab).
    results = {}
    for name in ("wide", "narrow", "ranges"):
        idx.latency_path = name
        try:
            # warm with the EXACT timed program: warming via search()
            # compiles the per-batch program but not the (NB,1,d)
            # pipelined one, so rep 1 paid the fresh compile / cache
            # deserialization (seconds) and every recorded absolute was
            # compile-time, not latency (r3 bug — ratios survived,
            # absolutes did not)
            idx.search_pipelined(qstack, k)
            lat = one_lat()
            results[name] = lat
            print(json.dumps({
                "stage": "b1_latency", "path": name,
                "device_ms_per_query": round(lat, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "stage": "b1_latency", "path": name,
                "error": f"{type(e).__name__}: {str(e)[:160]}",
            }), flush=True)
    idx.latency_path = "auto"

    # recall parity between geometries
    q64 = np.asarray(_gen(centers, 31337, 64), np.float32)
    idx.small_batch_threshold = 0
    idx.topk_method = "exact"
    _, oracle = idx._oracle_search(q64, k)
    idx.topk_method = "approx"
    got = {}
    for name in ("wide", "narrow", "ranges"):
        # force each program at B=64 for a recall read (narrow needs the
        # small-batch gate widened; ranges forces regardless)
        idx.small_batch_threshold = 0 if name == "wide" else 64
        idx.latency_path = name
        _, g = idx.search(q64, k)
        got[name] = g
        idx.small_batch_threshold = 4
        idx.latency_path = "auto"
        rec = float(np.mean([
            len(set(int(x) for x in a if x >= 0) & set(b.tolist())) / k
            for a, b in zip(g, np.asarray(oracle))
        ]))
        print(json.dumps({
            "stage": "recall", "path": name,
            "recall_at_10": round(rec, 4),
        }), flush=True)

    # dense-table IVF reference point (same corpus, same window)
    ivf = IVFIndex(dim, dtype="int8", nlist=nlist, nprobe=4,
                   train_threshold=1 << 62)
    rows = np.concatenate(
        [np.asarray(c_, np.float32) for c_ in chunks()]
    ) if n <= 2_000_000 else None
    if rows is not None:
        ivf.add_batch(rows)
        ivf.build()
        ivf.batch_flat_fallback = False
        ivf.search_pipelined(qstack, k)
        t0 = time.perf_counter()
        for _ in range(3):
            ivf.search_pipelined(qstack, k)
        lat = (time.perf_counter() - t0) / (3 * nb) * 1000
        print(json.dumps({
            "stage": "b1_latency", "path": "dense_ivf",
            "device_ms_per_query": round(lat, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
