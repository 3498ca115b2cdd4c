"""Mesh serving-structure experiment (1M x 384 bf16, real chip).

Round-2 finding: scan-of-shard_map serves 5.92 ms/batch-128 on a
1-device mesh where the non-mesh engine does 1.61 ms — 3.7x overhead.
This experiment compares:

  A. non-mesh fused batched kernel (reference point)
  B. ShardedFlatIndex.search_pipelined (now the single-gather stack
     structure; historically scan-of-shard_map with per-step gathers)
  C. one shard_map over the WHOLE stack: per-device batched kernel
     (scan inside), ONE all_gather of the (NB, B, k) stacks, vectorized
     merge

Usage: python benchmarks/mesh_pipeline_exp.py [N] [NB] [B]
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
from jax.sharding import PartitionSpec as P


def bench(fn, reps=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 128
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
    from wdbx_tpu.parallel.sharded_flat import ShardedFlatIndex

    key = jax.random.PRNGKey(0)
    db = jax.random.normal(key, (n, d), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    qs = jax.random.normal(jax.random.PRNGKey(1), (nb, b, d), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    qs_host = np.asarray(qs, np.float32)

    # A: non-mesh engine
    flat = FlatIndex(d, dtype="bfloat16", capacity=n)
    flat.add_batch(db)
    dt = bench(lambda: flat.search_pipelined(qs, k))  # device-resident
    print(f"A non-mesh fused batched: {dt / nb * 1000:.2f} ms/batch "
          f"({nb * b / dt:,.0f} q/s)")

    # B: current sharded pipelined (scan of shard_map)
    sh = ShardedFlatIndex(d, dtype="bfloat16", capacity=n)
    sh.add_batch(db)
    dt = bench(lambda: sh.search_pipelined(qs, k))  # device-resident
    print(f"B ShardedFlatIndex path:  {dt / nb * 1000:.2f} ms/batch "
          f"({nb * b / dt:,.0f} q/s)")

    # C: one shard_map, batched kernel inside, single all_gather
    mesh, axis = sh.mesh, sh.axis
    from wdbx_tpu.kernels.fused_topk import fused_topk_search_batched

    def local_stack(slab_l, valid_l, scales_l, qstack):
        n_dev = jax.lax.axis_size(axis)
        rows = slab_l.shape[1]
        s, i = fused_topk_search_batched(
            slab_l[0], qstack, valid_l[0], k=k,
            block_n=min(8192, rows), normalize=True,
        )  # (NB, B, k)
        gi = i * n_dev + jax.lax.axis_index(axis)
        all_s = jax.lax.all_gather(s, axis, axis=2, tiled=True)
        all_i = jax.lax.all_gather(gi, axis, axis=2, tiled=True)
        top, pos = jax.lax.top_k(all_s, k)
        return top, jnp.take_along_axis(all_i, pos, axis=2)

    mapped = jax.jit(jax.shard_map(
        local_stack,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None), P(axis, None),
                  P(None, None, None)),
        out_specs=(P(None, None, None), P(None, None, None)),
        check_vma=False,
    ))

    def run_c():
        s, i = mapped(sh._slab, sh._valid, sh._scales, qs)
        jax.device_get((s, i))

    dt = bench(run_c)
    print(f"C single-gather stack:    {dt / nb * 1000:.2f} ms/batch "
          f"({nb * b / dt:,.0f} q/s)")


if __name__ == "__main__":
    main()
