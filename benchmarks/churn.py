"""Delete/insert churn: bucket-matched hole recycling vs quarantine-
until-rebuild (the round-2 known gap "delete-heavy workloads grow
capacity until the next build absorbs the tombstones").

Protocol: build a clustered index, then run churn rounds of
(delete X% random live rows, insert the same count of new rows drawn
from the same cluster mixture). Measured per mode (recycle on/off):
capacity growth (next_slot), residual-region occupancy, quarantine
depth, whether the rebuild trigger fired, search QPS and recall@10
after the churn (residual bloat costs the scan; recycling keeps rows
inside bucket extents).

Usage: python benchmarks/churn.py [N] [dim] [rounds] [churn_pct]
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
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    churn_pct = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    k, batch = 10, 64

    import jax
    import jax.numpy as jnp

    from wdbx_tpu.index.clustered import ClusteredIVFIndex

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

    per_round = int(n * churn_pct / 100)
    rng = np.random.default_rng(0)

    def run_mode(recycle: bool) -> dict:
        idx = ClusteredIVFIndex(
            dim, dtype="int8", nlist=1024, nprobe=4,
            train_threshold=1 << 62, rebuild_fraction=0.2,
        )
        idx.recycle_holes = recycle
        t0 = time.perf_counter()
        idx.build_from(chunks, train_chunks=1)
        build_s = time.perf_counter() - t0
        ns0, fb = idx._next_slot, idx._fresh_base

        live = list(range(n))  # external slots == initial positions
        next_seed = 10**6
        t0 = time.perf_counter()
        rebuilds = 0
        for r in range(rounds):
            sel = rng.choice(len(live), per_round, replace=False)
            sel.sort()
            dead = [live[i] for i in sel]
            for i in reversed(sel):
                live[i] = live[-1]
                live.pop()
            idx.remove_slots(np.asarray(dead, np.int64))
            rows = np.asarray(_gen(centers, next_seed + r, per_round))
            new = idx.add_batch(rows)
            live.extend(int(s) for s in new)
            if idx._needs_build():
                rebuilds += 1
                idx.build()
        churn_s = time.perf_counter() - t0

        stats = dict(
            mode="recycle" if recycle else "quarantine",
            build_s=round(build_s, 1),
            churn_s=round(churn_s, 1),
            churned_rows=per_round * rounds,
            capacity_growth_rows=int(idx._next_slot - ns0),
            residual_rows=len(idx._residual),
            quarantine_depth=idx._quar_len(),
            rebuilds_triggered=rebuilds,
            count=idx.count(),
        )

        # serving after the churn: pipelined batches, device-resident
        q = np.asarray(_gen(centers, 424242, 1024), np.float32)
        qstack = q.reshape(-1, batch, dim)
        idx.search_pipelined(qstack, k)  # warm the exact timed program
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            idx.search_pipelined(qstack, k)
        dt = time.perf_counter() - t0
        stats["qps_after_churn"] = round(reps * len(q) / dt)

        # recall vs the exact oracle on this mutated corpus
        idx.topk_method = "exact"
        _, oracle = idx._oracle_search(q[:64], k)
        idx.topk_method = "approx"
        _, got = idx.search(q[:64], k)
        rec = float(np.mean([
            len(set(int(x) for x in a if x >= 0)
                & set(int(x) for x in b)) / k
            for a, b in zip(got, np.asarray(oracle))
        ]))
        stats["recall_at_10"] = round(rec, 4)
        print(json.dumps(stats), flush=True)
        del idx
        return stats

    print(json.dumps({
        "stage": "config", "n": n, "dim": dim, "rounds": rounds,
        "churn_pct": churn_pct, "per_round": per_round,
    }), flush=True)
    a = run_mode(recycle=True)
    b = run_mode(recycle=False)
    print(json.dumps({
        "stage": "summary",
        "capacity_growth_recycle": a["capacity_growth_rows"],
        "capacity_growth_quarantine": b["capacity_growth_rows"],
        "qps_recycle": a["qps_after_churn"],
        "qps_quarantine": b["qps_after_churn"],
    }), flush=True)


if __name__ == "__main__":
    main()
