"""Sweep the fused top-k kernel at 1M x 384 bf16 on the real chip.

Finds the (B, block_n, NB) operating point for bench.py: wider query
blocks amortize the HBM slab stream over more queries (the kernel is
bandwidth-bound), and NB batches per dispatch amortize the ~30 ms
tunnel round trip. Prints one line per config.

Usage: python benchmarks/sweep_fused.py [B,...] [block_n,...] [NB]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_wdbx")
# NOTE: do NOT use PYTHONPATH=<repo> for TPU runs in this sandbox — it
# breaks the axon PJRT plugin registration. Self-locate instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wdbx_tpu.kernels.fused_topk import fused_topk_search_batched


def main() -> None:
    bs = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                           else ["64", "128", "256"])]
    blocks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                               else ["2048"])]
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n, d, k = 1 << 20, 384, 10

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    key = jax.random.PRNGKey(0)
    db = jax.random.normal(key, (n, d), jnp.bfloat16)
    valid = jnp.ones((n,), jnp.bool_)
    hbm_gb = n * d * 2 / 1e9
    print(f"slab: {n}x{d} bf16 = {hbm_gb:.2f} GB; roofline ~{hbm_gb/0.819*1000:.2f} ms/stream")

    for block_n in blocks:
        for b in bs:
            q = jax.random.normal(jax.random.PRNGKey(1), (nb, b, d),
                                  jnp.bfloat16)
            t0 = time.perf_counter()
            out = fused_topk_search_batched(db, q, valid, k=k,
                                            block_n=block_n)
            np.asarray(out[0])
            compile_s = time.perf_counter() - t0
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fused_topk_search_batched(db, q, valid, k=k,
                                                block_n=block_n)
                np.asarray(out[0])
            dt = (time.perf_counter() - t0) / reps
            per_batch_ms = dt / nb * 1000
            qps = nb * b / dt
            print(
                f"B={b:4d} block_n={block_n:5d} NB={nb:3d}: "
                f"{per_batch_ms:7.2f} ms/batch  {qps:10.0f} q/s  "
                f"(dispatch {dt*1000:.1f} ms, compile {compile_s:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
