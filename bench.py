"""Headline benchmark: QPS at recall@10, 1M x 384, batch-64 queries.

Measures the flagship device engine (bf16 flat slab + TPU-optimized
top-k) against the reference's equivalent CPU path (numpy brute-force
cosine top-k — what wdbx's VectorStore computes via hnswlib/numpy;
hnswlib/faiss are not installed in this image). Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", ...}.

Methodology notes (this sandbox):
  * Host memory first-touch runs at ~15 MB/s here, so the database is
    generated ON DEVICE (jax.random) and the recall oracle is computed
    on device at float32/HIGHEST precision.
  * Every dispatch through the remote-TPU tunnel costs ~30 ms
    regardless of work, so QPS is measured over a jitted lax.scan that
    processes NB distinct query batches per dispatch (the moral
    equivalent of server-side request pipelining), with results
    materialized to host to force completion. Single-batch round-trip
    latency is reported separately.
  * The CPU baseline is measured at a smaller N and scaled linearly
    (brute force is O(N); small N is cache-friendlier, so this favors
    the baseline if anything).

Env knobs: BENCH_N (default 1_048_576), BENCH_DIM (384), BENCH_BATCH
(64), BENCH_NB (64 kernel batches/dispatch), BENCH_COALESCE (2 client
batches per kernel batch), BENCH_REPS (3), BENCH_CPU_N.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: repeat bench runs (and the driver's
# round-end run) skip the 20-40s first-compile cost.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_wdbx")


def main() -> None:
    n = int(os.environ.get("BENCH_N", 1_048_576))
    dim = int(os.environ.get("BENCH_DIM", 384))
    batch = int(os.environ.get("BENCH_BATCH", 64))
    # serving pipeline: `coalesce` client batches ride one kernel batch
    # (the QueryBatcher's job) and `nb` kernel batches ride one dispatch
    # (amortizes the ~30 ms tunnel round trip of this sandbox)
    coalesce = int(os.environ.get("BENCH_COALESCE", 2))
    nb = int(os.environ.get("BENCH_NB", 64))
    # 6 dispatches in flight: the r3 depth sweep (benchmarks/
    # flat_attrib.py) measured 1->2->3->4->6 in flight as 74.5k ->
    # 91.6k -> 99.8k -> 104.0k -> 107.0k QPS against a same-window
    # calibrated 119.8k HBM roofline — depth 6 is where the curve
    # flattens (the residual ~12% is per-dispatch host turnaround).
    reps = int(os.environ.get("BENCH_REPS", 6))
    cpu_n = min(n, int(os.environ.get("BENCH_CPU_N", 65_536)))
    k = 10

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache (env var alone may not enable it)
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # -- data: generated on device ---------------------------------------
    key = jax.random.PRNGKey(0)
    db32 = jax.random.normal(key, (n, dim), jnp.float32)
    db32 = db32 / jnp.linalg.norm(db32, axis=-1, keepdims=True)
    slab_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    kb = batch * coalesce  # kernel batch width
    qkey = jax.random.PRNGKey(1)
    qstack = jax.random.normal(qkey, (nb, kb, dim), jnp.float32)
    qstack = qstack / jnp.linalg.norm(qstack, axis=-1, keepdims=True)
    if slab_dtype != "int8":  # int8 kernels take bf16/f32 queries
        qstack = qstack.astype(jnp.bfloat16)

    def mm(dbx, q, precision):
        return jax.lax.dot_general(
            q, dbx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    # -- recall oracle: exact f32 top-k on device -------------------------
    # 1 kernel batch (128 queries) is plenty for a recall estimate;
    # f32/HIGHEST is ~6 MXU passes so keeping this slice small keeps
    # bench wall-time bounded.
    n_oracle = 1

    @jax.jit
    def oracle(dbx, qs):
        def step(c, q):
            s = mm(dbx, q.astype(jnp.float32), "highest")
            return c, jax.lax.top_k(s, k)[1]
        return jax.lax.scan(step, 0, qs)[1]

    t0 = time.perf_counter()
    exact_idx = np.asarray(oracle(db32, qstack[:n_oracle]))
    oracle_s = time.perf_counter() - t0

    # -- flagship path: the real index engine (bf16 slab + fused Pallas
    # kernel, grouped fold, scan-pipelined) -------------------------------
    from wdbx_tpu.index.flat import FlatIndex

    index = FlatIndex(dim=dim, dtype=slab_dtype, capacity=n)
    t0 = time.perf_counter()
    index.add_batch(db32)  # device-resident ingest: one batched scatter
    jax.block_until_ready(index._slab)
    np.asarray(index._valid[:1])  # host-force (tunnel can lie)
    ingest_s = time.perf_counter() - t0

    got = index.search_pipelined(qstack, k=k)  # warm + compile
    got_idx = got[1]
    # Steady-state serving keeps dispatches IN FLIGHT (double buffering):
    # enqueue all reps, then materialize — the host turnaround between
    # dispatches overlaps device compute instead of serializing with it.
    t0 = time.perf_counter()
    handles = [
        index.search_pipelined(qstack, k=k, materialize=False)
        for _ in range(reps)
    ]
    for h in handles:
        index.resolve_pipelined(h)
    per_dispatch = (time.perf_counter() - t0) / reps
    tpu_qps = nb * kb / per_dispatch

    # single-batch round-trip latency (includes ~30ms tunnel overhead)
    single = index.search(np.asarray(qstack[0], np.float32), k=k)
    t0 = time.perf_counter()
    for i in range(4):
        index.search(np.asarray(qstack[i % nb], np.float32), k=k)
    single_ms = (time.perf_counter() - t0) / 4 * 1000

    recall = float(
        np.mean(
            [
                len(set(a.tolist()) & set(b.tolist())) / k
                for a, b in zip(
                    got_idx[:n_oracle].reshape(-1, k),
                    exact_idx.reshape(-1, k),
                )
            ]
        )
    )
    build_s = ingest_s  # real 1M-row device ingest, measured above

    # -- CPU reference baseline -------------------------------------------
    cpu_db = np.asarray(db32[:cpu_n], np.float32)
    cpu_q = np.asarray(qstack[0], np.float32)

    def cpu_search(q):
        scores = q @ cpu_db.T
        idx = np.argpartition(-scores, k, axis=-1)[:, :k]
        part = np.take_along_axis(scores, idx, axis=-1)
        order = np.argsort(-part, axis=-1)
        return np.take_along_axis(idx, order, axis=-1)

    cpu_search(cpu_q)  # warm
    t0 = time.perf_counter()
    cpu_reps = 3
    for _ in range(cpu_reps):
        cpu_search(cpu_q)
    cpu_qps_small = kb * cpu_reps / (time.perf_counter() - t0)
    cpu_qps = cpu_qps_small * (cpu_n / n)  # linear O(N) scaling

    result = {
        "metric": f"QPS at recall@10 ({n}x{dim} {slab_dtype}, batch={batch})",
        "value": round(tpu_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "recall_at_10": round(recall, 4),
        "single_batch_latency_ms": round(single_ms, 2),
        "cpu_baseline_qps": round(cpu_qps, 2),
        "cpu_baseline_note": f"numpy brute force measured at N={cpu_n}, scaled x{n/cpu_n:.0f}",
        "index_build_s": round(build_s, 2),
        "oracle_s": round(oracle_s, 2),
        "operating_point": f"fused kernel, B={kb} ({coalesce}x{batch} coalesced), NB={nb}/dispatch",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
