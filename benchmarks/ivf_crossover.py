"""IVF vs flat-fused crossover at 1M x 384 bf16 on the real chip.

Measures the two serving engines at several batch sizes after tuning
nprobe to recall@10 >= 0.95 with the binary-search tuner. Prints one
line per (engine, batch). VERDICT r1 #4: "make IVF win at batch — or
prove where it can't" — this is the measured crossover table.

Uniform-random vectors are the known-adversarial case for ANY
partitioned index (no cluster structure: recall needs ~full probe);
"clustered" draws a 1024-component Gaussian mixture — the shape of real
embedding corpora — where probing a few buckets suffices.

Usage: python benchmarks/ivf_crossover.py [N] [nlist] [uniform|clustered]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_wdbx")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, reps=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    dist = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    d, k = 384, 10
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wdbx_tpu.index.flat import FlatIndex
    from wdbx_tpu.index.ivf import IVFIndex

    key = jax.random.PRNGKey(0)
    db = jax.random.normal(key, (n, d), jnp.float32)
    if dist == "clustered":
        # Gaussian mixture: 1024 centers, sigma chosen so clusters are
        # tight but overlapping (realistic embedding geometry).
        centers = jax.random.normal(jax.random.PRNGKey(7), (1024, d),
                                    jnp.float32)
        centers = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
        cid = jax.random.randint(jax.random.PRNGKey(8), (n,), 0, 1024)
        # noise scaled to ~0.45 L2 so within-cluster cosine ~0.83
        # (0.25 * raw normal would be norm ~sqrt(d)/4 — noise-dominated)
        db = centers[cid] + 0.45 * db / jnp.sqrt(jnp.float32(d))
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    queries = np.array(db[:: n // 256][:256])  # near-duplicate queries
    if dist == "uniform":
        queries = np.array(
            jax.random.normal(jax.random.PRNGKey(1), (256, d), jnp.float32)
        )
    queries = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    print(f"data={dist}", flush=True)

    flat = FlatIndex(dim=d, dtype="bfloat16", capacity=n)
    t0 = time.perf_counter()
    flat.add_batch(db)
    jax.block_until_ready(flat._slab)
    print(f"flat ingest: {time.perf_counter()-t0:.1f}s", flush=True)

    ivf = IVFIndex(dim=d, dtype="bfloat16", capacity=n, nlist=nlist,
                   train_threshold=n + 1)
    ivf.add_batch(db)
    t0 = time.perf_counter()
    ivf.build()
    jax.block_until_ready(ivf._bucket_rows)
    print(f"ivf build (nlist={nlist}): {time.perf_counter()-t0:.1f}s",
          flush=True)
    ivf.batch_flat_fallback = False
    t0 = time.perf_counter()
    recall = ivf.tune(queries[:64], k=k, target_recall=0.95)
    print(f"tuned nprobe={ivf.nprobe} recall={recall:.4f} "
          f"(tune {time.perf_counter()-t0:.0f}s)", flush=True)

    for b in (1, 8, 64):
        q = queries[:b]
        t_flat = bench(lambda: flat.search(q, k))
        t_ivf = bench(lambda: ivf.search(q, k))
        print(
            f"B={b:3d}: flat {t_flat*1000:8.2f} ms ({b/t_flat:9.0f} q/s)"
            f"   ivf {t_ivf*1000:8.2f} ms ({b/t_ivf:9.0f} q/s)"
            f"   winner={'ivf' if t_ivf < t_flat else 'flat'}",
            flush=True,
        )
    # pipelined comparison (device time dominates; tunnel RTT amortized)
    qs = np.broadcast_to(queries[:64], (32, 64, d)).copy()
    t = bench(lambda: flat.search_pipelined(qs, k))
    print(f"flat pipelined 32x64: {32*64/t:9.0f} q/s", flush=True)
    t = bench(lambda: ivf.search_pipelined(qs, k))
    print(f"ivf  pipelined 32x64: {32*64/t:9.0f} q/s  (nprobe={ivf.nprobe})",
          flush=True)
    # single-query DEVICE latency: 256 sequential single queries per
    # dispatch — tunnel RTT amortizes, per-query device time shows
    q1 = queries[:256].reshape(256, 1, d)
    t = bench(lambda: flat.search_pipelined(q1, k))
    print(f"flat single-query device time: {t/256*1000:7.3f} ms/query",
          flush=True)
    t = bench(lambda: ivf.search_pipelined(q1, k))
    print(f"ivf  single-query device time: {t/256*1000:7.3f} ms/query  "
          f"(nprobe={ivf.nprobe})", flush=True)


if __name__ == "__main__":
    main()
