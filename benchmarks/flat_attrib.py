"""Attribute the flat serving path's gap to its HBM roofline.

VERDICT r2 weak #6/#7: bench.py e2e best-window is ~100k QPS at 1M x 384
bf16 while the 0.94 ms/batch-128 HBM stream implies ~136k. This harness
splits the residual into (a) window speed (HBM calibration), (b) kernel
device time, (c) dispatch-depth pipelining, (d) the grouped-fold width,
and (e) the int8 slab option (half the HBM bytes at ~2x the MXU rate),
each printed as one JSON line the moment it is measured. Run on the real
chip; phases that need fresh Mosaic compiles come last so a remote-
compile failure still leaves the cached-program phases recorded.

Usage: python benchmarks/flat_attrib.py [n] [dim]
Env: ATTRIB_SKIP_GROUPS=1 to skip the group-sweep compiles,
     ATTRIB_SKIP_INT8=1 to skip the int8 phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_wdbx")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    k = 10
    kb = 128          # kernel batch (2x64 coalesced, bench.py's point)
    nb = 64           # kernel batches per dispatch
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    emit(stage="env", device=str(jax.devices()[0]), n=n, dim=dim)

    key = jax.random.PRNGKey(0)
    db32 = jax.random.normal(key, (n, dim), jnp.float32)
    db32 = db32 / jnp.linalg.norm(db32, axis=-1, keepdims=True)
    qstack = jax.random.normal(jax.random.PRNGKey(1), (nb, kb, dim),
                               jnp.float32)
    qstack = qstack / jnp.linalg.norm(qstack, axis=-1, keepdims=True)
    qbf = qstack.astype(jnp.bfloat16)

    # -- (a) window calibration: how fast is HBM *today*? ----------------
    # 32 slab-reading matvecs against DISTINCT vectors in ONE dispatch
    # (distinct operands defeat CSE; one dispatch amortizes the ~30 ms
    # tunnel RTT, which otherwise IS the measurement). An empty-dispatch
    # RTT estimate is subtracted.
    slab_bf = db32.astype(jnp.bfloat16)
    creps = 32
    V = jax.random.normal(jax.random.PRNGKey(2), (creps, dim),
                          jnp.bfloat16)

    @jax.jit
    def calib(s, vs):
        def step(acc, v):
            r = jax.lax.dot_general(
                s, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(r), None
        return jax.lax.scan(step, jnp.float32(0), vs)[0]

    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5

    float(calib(slab_bf, V))  # warm/compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        got = float(calib(slab_bf, V))  # D2H forces completion
    dt = max(1e-9, (time.perf_counter() - t0) / reps - rtt)
    gbs = creps * n * dim * 2 / dt / 1e9
    emit(stage="hbm_calibration", ms=round(dt * 1e3, 3),
         rtt_ms=round(rtt * 1e3, 1), effective_gb_s=round(gbs, 1),
         note=f"{creps} distinct slab matvecs/dispatch, RTT-corrected")
    roofline_ms = n * dim * 2 / (gbs * 1e9) * 1e3
    emit(stage="roofline", ms_per_batch=round(roofline_ms, 3),
         qps_ceiling=round(kb / roofline_ms * 1e3, 1))

    # -- build the index once (device-resident ingest) --------------------
    from wdbx_tpu.index.flat import FlatIndex

    index = FlatIndex(dim=dim, dtype="bfloat16", capacity=n)
    index.add_batch(db32)
    np.asarray(index._valid[:1])

    # exact oracle for recall bookkeeping
    @jax.jit
    def oracle(dbx, q):
        s = jax.lax.dot_general(
            q.astype(jnp.float32), dbx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision="highest")
        return jax.lax.top_k(s, k)[1]

    exact_idx = np.asarray(oracle(db32, qstack[0]))

    # -- (b)+(c) dispatch-depth sweep on the cached bf16 program ----------
    index.search_pipelined(qbf, k=k)  # warm
    for depth in (1, 2, 3, 4, 6):
        t0 = time.perf_counter()
        rounds = max(1, 6 // depth)
        for _ in range(rounds):
            hs = [index.search_pipelined(qbf, k=k, materialize=False)
                  for _ in range(depth)]
            for h in hs:
                index.resolve_pipelined(h)
        dt = (time.perf_counter() - t0) / (rounds * depth)
        emit(stage="depth_sweep", dtype="bfloat16", in_flight=depth,
             ms_per_dispatch=round(dt * 1e3, 2),
             qps=round(nb * kb / dt, 1),
             ms_per_batch=round(dt * 1e3 / nb, 3),
             vs_roofline=round((dt * 1e3 / nb) / roofline_ms, 2))

    # recall sanity on the cached program
    got = index.search_pipelined(qbf, k=k)[1][0]
    rec = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                   for a, b in zip(got, exact_idx)])
    emit(stage="recall", dtype="bfloat16", recall_at_10=round(float(rec), 4))

    # -- (d) grouped-fold width sweep (fresh Mosaic compiles) -------------
    if not os.environ.get("ATTRIB_SKIP_GROUPS"):
        from wdbx_tpu.kernels.fused_topk import fused_topk_search_batched
        blk = index._fused_block(kb)
        for group in (64, 128, 256):
            try:
                t0 = time.perf_counter()
                s, i = fused_topk_search_batched(
                    slab_bf, qbf, index._valid, k=k, block_n=blk,
                    group=group, normalize=True)
                np.asarray(i[:1, :1])
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(3):
                    s, i = fused_topk_search_batched(
                        slab_bf, qbf, index._valid, k=k, block_n=blk,
                        group=group, normalize=True)
                    np.asarray(i[:1, :1])
                dt = (time.perf_counter() - t0) / 3
                emit(stage="group_sweep", group=group, block_n=blk,
                     ms_per_batch=round(dt * 1e3 / nb, 3),
                     qps_equiv=round(nb * kb / dt, 1),
                     compile_s=round(compile_s, 1),
                     vs_roofline=round((dt * 1e3 / nb) / roofline_ms, 2))
            except Exception as e:  # remote-compile flake: keep going
                emit(stage="group_sweep", group=group,
                     error=f"{type(e).__name__}: {str(e)[:160]}")

    # -- (e) int8 slab: half the DMA bytes, 2x MXU rate -------------------
    if not os.environ.get("ATTRIB_SKIP_INT8"):
        try:
            idx8 = FlatIndex(dim=dim, dtype="int8", capacity=n)
            idx8.add_batch(db32)
            np.asarray(idx8._valid[:1])
            q32 = qstack  # int8 kernel takes float queries
            idx8.search_pipelined(q32, k=k)  # warm/compile
            got = idx8.search_pipelined(q32, k=k)[1][0]
            rec8 = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                            for a, b in zip(got, exact_idx)])
            for depth in (3,):
                t0 = time.perf_counter()
                rounds = 2
                for _ in range(rounds):
                    hs = [idx8.search_pipelined(q32, k=k,
                                                materialize=False)
                          for _ in range(depth)]
                    for h in hs:
                        idx8.resolve_pipelined(h)
                dt = (time.perf_counter() - t0) / (rounds * depth)
                emit(stage="int8", in_flight=depth,
                     qps=round(nb * kb / dt, 1),
                     ms_per_batch=round(dt * 1e3 / nb, 3),
                     recall_at_10=round(float(rec8), 4),
                     vs_bf16_roofline=round(
                         (dt * 1e3 / nb) / roofline_ms, 2))
        except Exception as e:
            emit(stage="int8", error=f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    try:
        main()
    except Exception:
        import traceback

        emit(stage="fatal", traceback=traceback.format_exc()[-1500:])
        raise
