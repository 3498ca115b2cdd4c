"""Filtered search at scale: pushdown vs exact fallback.

VERDICT r2 weak #3 asked for a filtered-search benchmark at
0.1% / 1% / 10% selectivity. Round 3 pushed slot masks into the ANN
paths (striped row-validity AND for clustered, bucket-table AND for
dense IVF) with a ~2/s nprobe boost; below 2% selectivity the exact
masked scan still serves (recall-safe). This measures, per selectivity:

* filtered batch-64 QPS (clustered engine, pushdown or exact per the
  router) vs the unfiltered baseline in the SAME window;
* filtered recall@10 against the exact filtered oracle — with the
  DEFAULT boost table, and again after tune_filtered() closes the
  recall loop on a held-out sample (VERDICT r3 ask #4);
* the same table for the mesh-striped ShardedClusteredIndex
  (FILTERED_SHARDED=1; device count reported — the bench chip is a
  1-device mesh, the 8-device leg runs in tests/dryrun).

Usage: python benchmarks/filtered.py [N] [dim] [nlist]
Env:   FILTERED_SHARDED=1 benches ShardedClusteredIndex instead.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    k, b = 10, 64

    import jax
    import jax.numpy as jnp

    from wdbx_tpu.index.clustered import ClusteredIVFIndex

    n_comp = 4096
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        centers_cpu = jax.random.normal(
            jax.random.PRNGKey(7), (n_comp, dim), jnp.float32
        )
        centers_cpu = centers_cpu / jnp.linalg.norm(
            centers_cpu, axis=-1, keepdims=True
        )
    # H2D upload for the device-side build/search legs
    centers = jax.device_put(centers_cpu, jax.devices()[0])
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

    # CPU-backend twin for the oracle's corpus regeneration: threefry
    # is platform-invariant, and materializing device chunks to host
    # would D2H gigabytes through the sandbox tunnel
    _gen_cpu_jit = jax.jit(
        _gen.__wrapped__, static_argnames=("m",), device=cpu
    )

    def gen_host(seed, m):
        return np.asarray(_gen_cpu_jit(centers_cpu, seed, m))

    sharded = bool(int(os.environ.get("FILTERED_SHARDED", "0")))
    if sharded:
        from wdbx_tpu.parallel.sharded_clustered import (
            ShardedClusteredIndex,
        )

        idx = ShardedClusteredIndex(
            dim, dtype="int8", nlist=nlist, nprobe=4,
            train_threshold=1 << 62,
        )
    else:
        idx = ClusteredIVFIndex(
            dim, dtype="int8", nlist=nlist, nprobe=4,
            train_threshold=1 << 62,
        )
    t0 = time.perf_counter()
    slots = np.asarray(idx.build_from(chunks, train_chunks=1))
    print(json.dumps({
        "stage": "build", "n": n, "dim": dim,
        "engine": type(idx).__name__,
        "devices": len(jax.devices()),
        "build_s": round(time.perf_counter() - t0, 1),
    }), flush=True)
    q = gen_host(9999, b).astype(np.float32)
    rng = np.random.default_rng(0)

    def qps_of(mask, reps=3):
        idx.search(q, k, slot_mask=mask)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            s, _ = idx.search(q, k, slot_mask=mask)
        return b * reps / (time.perf_counter() - t0)

    base_qps = qps_of(None)
    print(json.dumps({
        "stage": "unfiltered", "batch64_qps": round(base_qps),
    }), flush=True)

    for sel in (0.10, 0.01, 0.001):
        mask = np.zeros(idx.capacity, bool)
        pick = rng.choice(n, int(n * sel), replace=False)
        mask[slots[pick]] = True
        fq = qps_of(mask)
        # filtered exact oracle on the selected subset (regenerate the
        # selected rows chunk-wise to score exactly)
        sub = np.sort(pick)
        best_s = np.full((b, k), -np.inf)
        best_i = np.full((b, k), -1, np.int64)
        for ci in range(0, n, chunk):
            rows = gen_host(1000 + ci // chunk, min(chunk, n - ci))
            in_chunk = sub[(sub >= ci) & (sub < ci + rows.shape[0])]
            if not len(in_chunk):
                continue
            r = rows[in_chunk - ci]
            s = q @ r.T  # (b, m)
            cand_s = np.concatenate([best_s, s], axis=1)
            cand_i = np.concatenate(
                [best_i, np.tile(slots[in_chunk], (b, 1))], axis=1
            )
            selidx = np.argsort(-cand_s, axis=1)[:, :k]
            best_s = np.take_along_axis(cand_s, selidx, axis=1)
            best_i = np.take_along_axis(cand_i, selidx, axis=1)
        def recall_now():
            _, got = idx.search(q, k, slot_mask=mask)
            return float(np.mean([
                len(set(int(x) for x in a if x >= 0) & set(e.tolist()))
                / k
                for a, e in zip(got, best_i)
            ]))

        rec = recall_now()
        print(json.dumps({
            "stage": "filtered", "selectivity": sel,
            "boosts": "default",
            "batch64_qps": round(fq),
            "vs_unfiltered": round(fq / base_qps, 3),
            "recall_at_10": round(rec, 4),
        }), flush=True)
        if sel >= 0.02:
            # close the loop BOTH ways: calibrate the bin's boost on a
            # HELD-OUT query sample (escalating when recall misses,
            # de-escalating when the default over-probes), then
            # remeasure the original query set
            q_tune = gen_host(4242, 32).astype(np.float32)
            tuned = idx.tune_filtered(
                q_tune, mask, k=k, target_recall=0.95
            )
            fq2 = qps_of(mask)
            print(json.dumps({
                "stage": "filtered", "selectivity": sel,
                "boosts": dict(idx._filter_boosts),
                "tune_sample_recall": round(tuned, 4),
                "batch64_qps": round(fq2),
                "vs_unfiltered": round(fq2 / base_qps, 3),
                "recall_at_10": round(recall_now(), 4),
            }), flush=True)


if __name__ == "__main__":
    main()
