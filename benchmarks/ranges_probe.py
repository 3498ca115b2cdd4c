"""Isolate the slow component of the exact-bucket-range B=1 program.

latency_b1 (10M x 768) measured the r3 ranges path at 12.9 ms/query vs
4.9 ms for the narrow-block Pallas scan, even though it reads ~100x
fewer bytes. All-XLA program -> cheap compiles, so this probe times the
program's components in isolation on the same built index:

  A  full ranges path via search_pipelined (the measured number)
  B  inner scan of S dynamic slices, slab read only (sum, no matmul)
  C  B + the bf16 matmul per step
  D  C + valid/scales slices + owner/in-bucket masks + top-k (the full
     inner program, no residual merge, no index-layer overhead)
  E  D with the inner lax.scan unrolled (python loop)
  F  one contiguous dynamic slice of S*L rows (DMA contiguity check)

Usage: python benchmarks/ranges_probe.py [n] [dim] [nlist]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_097_152
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    k, nb, nprobe = 10, 64, 4

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

    idx = ClusteredIVFIndex(
        dim, dtype="int8", nlist=nlist, nprobe=nprobe,
        train_threshold=1 << 62,
    )
    t0 = time.perf_counter()
    idx.build_from(chunks, train_chunks=1)
    idx.batch_flat_fallback = False
    L = idx._range_L
    print(json.dumps({
        "stage": "build", "n": n, "build_s":
        round(time.perf_counter() - t0, 1), "L": L,
    }), flush=True)

    qstack = np.asarray(_gen(centers, 9999, nb), np.float32)[:, None, :]
    slab, valid, scales = idx._slab, idx._valid, idx._scales
    row_lo, row_cnt = idx._row_lo, idx._row_cnt
    centroids = idx._centroids
    cap = slab.shape[0]
    S = nprobe  # B=1

    def timed(name, fn, *args, reps=3):
        try:
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm+force
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
                np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "stage": name, "ms_per_dispatch": round(dt * 1e3, 2),
                "ms_per_query": round(dt / nb * 1e3, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "stage": name,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)

    # A: the full path as served
    idx.latency_path = "ranges"
    timed("A_full_path", lambda qs: idx.search_pipelined(qs, k), qstack)

    def probes_of(q):
        cs = q.astype(jnp.float32) @ centroids.T
        return jax.lax.top_k(cs, S)[1][0]  # (S,)

    @jax.jit
    def b_slices_only(slab, row_lo, qs):
        def outer(carry, q):
            probe = probes_of(q)

            def step(c2, pj):
                lo = jnp.take(row_lo, pj)
                start = jnp.clip(lo, 0, cap - L)
                rows = jax.lax.dynamic_slice(
                    slab, (start, jnp.int32(0)), (L, slab.shape[1])
                )
                return c2 + jnp.sum(rows, dtype=jnp.int32), None

            acc, _ = jax.lax.scan(step, jnp.int32(0), probe)
            return carry + acc, None

        acc, _ = jax.lax.scan(outer, jnp.int32(0), qs)
        return acc

    timed("B_slices_only", b_slices_only, slab, row_lo, qstack)

    @jax.jit
    def c_slice_matmul(slab, row_lo, qs):
        def outer(carry, q):
            probe = probes_of(q)
            qb = q.astype(jnp.bfloat16)

            def step(c2, pj):
                lo = jnp.take(row_lo, pj)
                start = jnp.clip(lo, 0, cap - L)
                rows = jax.lax.dynamic_slice(
                    slab, (start, jnp.int32(0)), (L, slab.shape[1])
                )
                s = jax.lax.dot_general(
                    qb, rows.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return c2 + jnp.sum(s), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), probe)
            return carry + acc, None

        acc, _ = jax.lax.scan(outer, jnp.float32(0), qs)
        return acc

    timed("C_slice_matmul", c_slice_matmul, slab, row_lo, qstack)

    @jax.jit
    def d_full_inner(slab, valid, scales, row_lo, row_cnt, qs):
        def outer(carry, q):
            probe = probes_of(q)
            qb = q.astype(jnp.bfloat16)

            def step(c2, pj):
                lo = jnp.take(row_lo, pj)
                cnt = jnp.take(row_cnt, pj)
                start = jnp.clip(lo, 0, cap - L)
                rows = jax.lax.dynamic_slice(
                    slab, (start, jnp.int32(0)), (L, slab.shape[1])
                )
                v = jax.lax.dynamic_slice(valid, (start,), (L,))
                sc = jax.lax.dynamic_slice(scales, (start,), (L,))
                pos = start + jnp.arange(L, dtype=jnp.int32)
                inb = v & (pos >= lo) & (pos < lo + cnt)
                s = jax.lax.dot_general(
                    qb, rows.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sc[None, :]
                s = jnp.where(inb[None, :], s, -jnp.inf)
                return c2, (s, pos)

            _, (ss, pp) = jax.lax.scan(step, 0, probe)
            flat = ss.reshape(1, -1)
            kv, sel = jax.lax.top_k(flat, k)
            return carry, (kv, jnp.take(pp.reshape(-1), sel[0]))

        _, out = jax.lax.scan(outer, 0, qs)
        return out

    timed("D_full_inner_scan", d_full_inner, slab, valid, scales,
          row_lo, row_cnt, qstack)

    @jax.jit
    def e_unrolled(slab, valid, scales, row_lo, row_cnt, qs):
        def outer(carry, q):
            probe = probes_of(q)
            qb = q.astype(jnp.bfloat16)
            parts_s, parts_p = [], []
            for s_i in range(S):
                pj = probe[s_i]
                lo = jnp.take(row_lo, pj)
                cnt = jnp.take(row_cnt, pj)
                start = jnp.clip(lo, 0, cap - L)
                rows = jax.lax.dynamic_slice(
                    slab, (start, jnp.int32(0)), (L, slab.shape[1])
                )
                v = jax.lax.dynamic_slice(valid, (start,), (L,))
                sc = jax.lax.dynamic_slice(scales, (start,), (L,))
                pos = start + jnp.arange(L, dtype=jnp.int32)
                inb = v & (pos >= lo) & (pos < lo + cnt)
                s = jax.lax.dot_general(
                    qb, rows.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sc[None, :]
                parts_s.append(jnp.where(inb[None, :], s, -jnp.inf))
                parts_p.append(pos)
            flat = jnp.concatenate(parts_s, axis=1)
            pp = jnp.concatenate(parts_p)
            kv, sel = jax.lax.top_k(flat, k)
            return carry, (kv, jnp.take(pp, sel[0]))

        _, out = jax.lax.scan(outer, 0, qs)
        return out

    timed("E_unrolled", e_unrolled, slab, valid, scales, row_lo,
          row_cnt, qstack)

    @jax.jit
    def f_one_big_slice(slab, row_lo, qs):
        def outer(carry, q):
            probe = probes_of(q)
            lo = jnp.take(row_lo, probe[0])
            start = jnp.clip(lo, 0, cap - S * L)
            rows = jax.lax.dynamic_slice(
                slab, (start, jnp.int32(0)), (S * L, slab.shape[1])
            )
            return carry + jnp.sum(rows, dtype=jnp.int32), None

        acc, _ = jax.lax.scan(outer, jnp.int32(0), qs)
        return acc

    timed("F_one_big_slice", f_one_big_slice, slab, row_lo, qstack)


if __name__ == "__main__":
    main()
