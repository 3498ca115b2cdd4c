"""Host-side store at device-side scale (VERDICT r3 ask #3).

Round 3's 10M+ numbers were all index-layer; the store around them
(id registry, metadata, raw rows, filter masks, persistence) had never
been exercised past ~512k. This benchmark drives the FULL VectorStore
at flagship scale and reports, per stage, wall time and host RSS:

  ingest       bulk_load in chunks (ids + metadata columns + raw rows)
  save         store.save() — index npz + registry + columnar metadata
               sidecars + raw memmap flush (no np.stack spike)
  load         fresh process-equivalent store picking the data dir up
  first_filter first-seen 10%-selectivity metadata filter (vectorized
               columnar mask build + masked search) — bar: mask < 1 s
  update       batch_store over existing ids (move-on-update churn)
  search       steady filtered + unfiltered QPS after all of the above

Done-bars (VERDICT): save and load in seconds not minutes at 10M; peak
host RSS < 1.5x the store's host-resident data; first filter < 1 s.

Reference behaviors replaced: one-blob metadata.json + per-id raw dict
(reference wdbx/core/vector_store.py:136-176) and the per-slot Python
mask walk (reference wdbx/core/vector_store.py:414-463).

Usage: python benchmarks/store_scale.py [N] [dim]
  env: STORE_SCALE_DTYPE=int8  RAW_STORE=memmap  RAW_STORE_DTYPE=int8

The serve half (load/filter/update/search) runs in a FRESH process
(STORE_SCALE_STAGE=serve re-exec): production loads start cold, and
measuring RSS in the ingest process would charge the serving story for
the corpus generator's allocator arenas.
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


def _rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def _peak_rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1e6
    return 0.0


def emit(**kw) -> None:
    kw["rss_gb"] = round(_rss_gb(), 2)
    print(json.dumps(kw), flush=True)


def _mkcfg(n: int, dim: int):
    from wdbx_tpu.core.config import WDBXConfig

    cfg = WDBXConfig()
    cfg.set("VECTOR_DIMENSION", dim)
    cfg.set("INDEX_TYPE", "ivf_clustered")
    cfg.set("INDEX_DTYPE", os.environ.get("STORE_SCALE_DTYPE", "int8"))
    cfg.set("IVF_NLIST", 4096)
    cfg.set("IVF_NPROBE", 4)
    # declared capacity (the reference's HNSW_MAX_ELEMENTS semantic):
    # past ~half of HBM an incremental copy-grow cannot hold old+new
    # slabs at once — a 10M bulk load OOMed at ~8M rows without this
    cfg.set("INDEX_CAPACITY", n)
    cfg.set("IVF_TRAIN_THRESHOLD", 1 << 62)  # build_from trains
    cfg.set("VECTOR_STORE_AUTOSAVE_INTERVAL", 0)  # explicit save only
    cfg.set("RAW_STORE", os.environ.get("RAW_STORE", "memmap"))
    cfg.set("RAW_STORE_DTYPE", os.environ.get("RAW_STORE_DTYPE", "int8"))
    return cfg


def _make_gen(dim: int):
    # corpus generation runs on the CPU BACKEND: the ingest contract is
    # host rows -> store (the production direction), and materializing
    # device-generated rows would instead D2H ~30 GB through the
    # sandbox tunnel (threefry is platform-invariant, so seeds stay
    # comparable with the device-side benchmarks)
    import jax
    import jax.numpy as jnp

    n_comp = 4096
    cpu = jax.devices("cpu")[0]
    noise = 0.67 / np.sqrt(dim)
    from functools import partial

    with jax.default_device(cpu):
        centers = jax.random.normal(
            jax.random.PRNGKey(7), (n_comp, dim), jnp.float32
        )
        centers = centers / jnp.linalg.norm(
            centers, axis=-1, keepdims=True
        )

    @partial(jax.jit, static_argnames=("m",), device=cpu)
    def _gen_jit(cents, seed, m):
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        ids = jax.random.randint(k1, (m,), 0, n_comp)
        rows = cents[ids] + noise * jax.random.normal(
            k2, (m, dim), jnp.float32
        )
        return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

    def _gen(seed, m):
        return _gen_jit(centers, seed, m)

    return _gen


def ingest_stage(n: int, dim: int, data_dir: str) -> None:
    import shutil

    shutil.rmtree(data_dir, ignore_errors=True)
    from wdbx_tpu.store.vector_store import VectorStore

    store = VectorStore(_mkcfg(n, dim), data_dir=data_dir)
    _gen = _make_gen(dim)

    # ---- ingest: chunked bulk_load with metadata columns ----
    chunk = 524_288
    cats = np.asarray(["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"])
    t0 = time.perf_counter()
    for i in range(0, n, chunk):
        m = min(chunk, n - i)
        rows = np.asarray(_gen(1000 + i // chunk, m), np.float32)
        ids = [f"v{j}" for j in range(i, i + m)]
        rng = np.random.default_rng(i)
        store.bulk_load(ids, rows, metadata_columns={
            "cat": cats[rng.integers(0, 10, m)],
            "score": rng.random(m).astype(np.float32),
            "ts": np.arange(i, i + m, dtype=np.int64),
        })
        del rows
    ingest_s = time.perf_counter() - t0
    emit(stage="ingest", n=n, dim=dim, s=round(ingest_s, 1),
         rows_per_s=int(n / ingest_s))

    # cluster the slab so serving is the real path (trains on device)
    t0 = time.perf_counter()
    store.optimize()
    emit(stage="optimize", s=round(time.perf_counter() - t0, 1))

    # ---- save ----
    t0 = time.perf_counter()
    store.save()
    save_s = time.perf_counter() - t0
    du = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(data_dir) for f in fs
    )
    emit(stage="save", s=round(save_s, 1), disk_gb=round(du / 1e9, 2),
         ingest_peak_rss_gb=round(_peak_rss_gb(), 2))


def serve_stage(n: int, dim: int, data_dir: str) -> None:
    from wdbx_tpu.store.vector_store import VectorStore

    cfg = _mkcfg(n, dim)

    # ---- load (fresh process: production cold start) ----
    t0 = time.perf_counter()
    store = VectorStore(cfg, data_dir=data_dir)
    load_s = time.perf_counter() - t0
    emit(stage="load", s=round(load_s, 1), count=store.count())

    _gen = _make_gen(dim)
    q = np.asarray(_gen(9999, 16), np.float32)

    # ---- first-seen filter mask: 10% selectivity (cat == "a") ----
    # The VERDICT bar (<1 s) is on the MASK BUILD — the vectorized
    # columnar scan replacing the reference's per-slot Python walk.
    # The first filtered SEARCH additionally pays the one-time XLA
    # compile of the masked kernel; reported separately.
    t0 = time.perf_counter()
    store._filter_mask(0, {"cat": "a"})
    mask_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    hits = store.search_batch(q, limit=10, filter_metadata={"cat": "a"})
    first_filter_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    hits2 = store.search_batch(q, limit=10, filter_metadata={"cat": "a"})
    emit(stage="first_filter", selectivity=0.10,
         mask_s=round(mask_s, 3),
         first_search_s=round(first_filter_s, 2),
         cached_s=round(time.perf_counter() - t0, 3),
         hits=sum(len(h) for h in hits), hits2=sum(len(h) for h in hits2))

    # ---- update churn over existing ids ----
    upd = 10_000
    rng = np.random.default_rng(3)
    pick = rng.integers(0, n, upd)
    rows = np.asarray(_gen(31337, upd), np.float32)
    emit(stage="update_pre")  # rss attribution: rows generated
    t0 = time.perf_counter()
    store.batch_store({f"v{j}": rows[i] for i, j in enumerate(pick)})
    upd_s = time.perf_counter() - t0
    emit(stage="update", n=upd, s=round(upd_s, 2),
         rows_per_s=int(upd / upd_s))
    import gc

    gc.collect()
    emit(stage="update_postgc")

    # ---- steady serving: unfiltered vs filtered ----
    # the "tuned" leg pins the 10%-selectivity boost bin to the rung
    # tune_filtered de-escalated to on this corpus family (boost=1,
    # recall 0.975 at 2M — benchmarks/filtered.py); the default table
    # over-probes 16x here
    def _pin_boost(factor):
        for index in store.indices:
            if hasattr(index, "_filter_boosts"):
                index._filter_boosts = {3: factor} if factor else {}

    legs = (("unfiltered", None, None),
            ("filtered_10pct", {"cat": "a"}, None),
            ("filtered_10pct_tuned", {"cat": "a"}, 1))
    for name, flt, boost in legs:
        _pin_boost(boost)
        for _ in range(3):
            store.search_batch(q, limit=10, filter_metadata=flt)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            store.search_batch(q, limit=10, filter_metadata=flt)
        dt = time.perf_counter() - t0
        emit(stage=f"search_{name}", qps=int(reps * len(q) / dt),
             ms_per_batch=round(dt / reps * 1000, 1))
    _pin_boost(None)

    # host-resident data the RSS bar is measured against: int8 raw rows
    # + scales + ok flags + metadata columns + the id registry (ids are
    # ~8-char strings; the native registry stores them once)
    resident_gb = (
        n * dim            # raw int8 codes
        + n * 4 + n        # scales + ok
        + n * (4 + 8 + 2)  # score f32 + ts i64 + cat codes
        + n * 48           # id registry (string + slot + hash overhead)
    ) / 1e9
    emit(stage="summary", serve_peak_rss_gb=round(_peak_rss_gb(), 2),
         resident_data_gb=round(resident_gb, 2),
         rss_over_resident=round(_peak_rss_gb() / resident_gb, 2),
         load_s=round(load_s, 1), mask_s=round(mask_s, 3),
         first_search_s=round(first_filter_s, 2))


def main() -> None:
    scale = float(os.environ.get("BENCH_SCALE", 1.0))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(10_000_000 * scale)
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    data_dir = os.environ.get("STORE_SCALE_DIR", "/tmp/wdbx_store_scale")
    stage = os.environ.get("STORE_SCALE_STAGE", "all")
    if stage == "ingest":
        ingest_stage(n, dim, data_dir)
    elif stage == "serve":
        serve_stage(n, dim, data_dir)
    else:
        import subprocess

        for sub in ("ingest", "serve"):
            env = dict(os.environ, STORE_SCALE_STAGE=sub)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 str(n), str(dim)], env=env,
            )
            if r.returncode != 0:
                sys.exit(r.returncode)


if __name__ == "__main__":
    main()
