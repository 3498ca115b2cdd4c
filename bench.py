"""Headline benchmark: QPS at recall@10, 1M x 384, batch-64 queries.

Runs the flagship device engine (bf16 flat slab, exact top-k — recall
1.0 by construction) against the reference's equivalent CPU path (numpy
brute-force scoring, which is what wdbx's VectorStore does when hnswlib/
faiss are absent; those libs are not in this image). Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_N (rows, default 1_000_000), BENCH_DIM (default 384),
BENCH_BATCH (default 64), BENCH_ITERS (default 10).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    n = int(os.environ.get("BENCH_N", 1_000_000))
    dim = int(os.environ.get("BENCH_DIM", 384))
    batch = int(os.environ.get("BENCH_BATCH", 64))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    k = 10

    rng = np.random.default_rng(0)
    db = rng.standard_normal((n, dim)).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    queries = rng.standard_normal((batch, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    # -- reference CPU path: numpy brute-force cosine + top-k ------------
    def cpu_search(q):
        scores = q @ db.T
        idx = np.argpartition(-scores, k, axis=-1)[:, :k]
        part = np.take_along_axis(scores, idx, axis=-1)
        order = np.argsort(-part, axis=-1)
        return np.take_along_axis(idx, order, axis=-1)

    t0 = time.perf_counter()
    exact_idx = cpu_search(queries)
    cpu_reps = max(1, int(os.environ.get("BENCH_CPU_ITERS", 3)))
    t0 = time.perf_counter()
    for _ in range(cpu_reps):
        cpu_search(queries)
    cpu_qps = batch * cpu_reps / (time.perf_counter() - t0)

    # -- TPU path: bf16 flat slab, fused matmul + top_k ------------------
    import jax
    import jax.numpy as jnp

    from wdbx_tpu.index.flat import FlatIndex

    t0 = time.perf_counter()
    index = FlatIndex(dim=dim, dtype="bfloat16", capacity=n)
    index.add_batch(db)
    jax.block_until_ready(index._slab)
    build_s = time.perf_counter() - t0

    q_dev = jnp.asarray(queries)

    def tpu_search():
        from wdbx_tpu.ops.exact_search import exact_search

        return exact_search(
            index._slab, q_dev, k=k, valid=index._valid, precision="default"
        )

    scores, idx = tpu_search()  # compile + warm
    jax.block_until_ready(scores)
    t0 = time.perf_counter()
    for _ in range(iters):
        scores, idx = tpu_search()
    jax.block_until_ready(scores)
    tpu_qps = batch * iters / (time.perf_counter() - t0)

    got = np.asarray(idx)
    recall = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(got, exact_idx)
        ]
    )

    result = {
        "metric": f"QPS at recall@10 ({n}x{dim}, batch={batch})",
        "value": round(tpu_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "recall_at_10": round(float(recall), 4),
        "cpu_baseline_qps": round(cpu_qps, 1),
        "index_build_s": round(build_s, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
