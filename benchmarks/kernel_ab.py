"""Clustered block-scan kernel A/B micro-benchmark (real chip).

Isolates the per-grid-step cost of ``kernels/clustered_scan.py`` from
index bookkeeping: a synthetic int8 slab is generated ON DEVICE (host
first-touch is ~15 MB/s in this sandbox), a synthetic deduped block
list mimics the serving shape (live entries first, padding pinned to
one block id), and each variant scans an (NB, B, d) query stack in one
dispatch exactly like ``_clustered_kernelpath_pipelined``.

Timing forces a D2H fetch per measurement (``block_until_ready`` lies
on the axon backend). Run variants within one window — the chip is
time-shared and absolute numbers drift 2x across hours.

Usage: python benchmarks/kernel_ab.py [--rows 8388608] [--dim 768]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_wdbx")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def make_slab(cap: int, d: int, chunk: int = 1 << 18):
    """Chunked on-device fill. Uses random.normal → int8 rounding:
    normal generation is fast on this backend while uint8 random.bits
    measured ~0.35 MB/s (pathological lowering); a full-shape generate
    also peaks at several extra copies of the slab."""
    import functools

    slab = jnp.zeros((cap, d), jnp.int8)

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(s, key, start):
        rows = jax.random.normal(key, (chunk, d), jnp.float32)
        q = jnp.clip(jnp.round(rows * 40.0), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(s, q, (start, 0))

    key = jax.random.PRNGKey(0)
    for i in range(max(1, cap // chunk)):
        key, sub = jax.random.split(key)
        slab = fill(slab, sub, jnp.int32(i * chunk))
    valid = jnp.ones((1, cap), jnp.int8)
    scales = jnp.full((1, cap), 1.0 / 127.0, jnp.float32)
    return slab, valid, scales


def make_blocklist(nblocks: int, live: int, u: int, seed: int = 1,
                   contiguous: bool = False):
    if contiguous:
        # diagnostic: sorted consecutive block ids — isolates whether
        # SCATTERED fetch order (vs a sequential sweep) costs bandwidth
        real = np.arange(live, dtype=np.int32)
    else:
        rng = np.random.default_rng(seed)
        real = rng.permutation(nblocks)[:live].astype(np.int32)
    uniq = np.full(u, nblocks - 1, np.int32)
    uniq[:live] = real
    ok = np.zeros(u, np.int32)
    ok[:live] = 1
    return jnp.asarray(uniq), jnp.asarray(ok)


def bench(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8 * 1024 * 1024)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--c", type=int, default=2048)
    ap.add_argument("--live", type=int, default=448)
    ap.add_argument("--u", type=int, default=1024)
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--contiguous", type=int, default=0,
                    help="1 = sorted consecutive block ids (diagnostic)")
    ap.add_argument("--variants", type=str, default="",
                    help="comma list: v1w4,v1w8,v2w4,v2w8,v2w8b128")
    args = ap.parse_args()

    print("attaching device...", flush=True)
    print("devices:", jax.devices(), flush=True)

    from wdbx_tpu.kernels.clustered_scan import (
        clustered_block_topk,
        clustered_block_topk_v2,
    )

    cap, d, c = args.rows, args.dim, args.c
    nblocks = cap // c
    slab, valid, scales = make_slab(cap, d)
    uniq, ok = make_blocklist(nblocks, args.live, args.u,
                              contiguous=bool(args.contiguous))
    qkey = jax.random.PRNGKey(2)
    qstack = jax.random.normal(qkey, (args.nb, args.b, d), jnp.float32)
    np.asarray(slab[:1])  # force materialization before timing

    def pipelined(kernel, kw, b_eff, qdtype):
        nb_eff = args.nb * args.b // b_eff
        qs = qstack.reshape(nb_eff, b_eff, d).astype(qdtype)

        # Pass the slab and aux arrays as jit ARGUMENTS: closing over
        # them captures multi-GB lowering constants (slab alone is
        # 6.5 GB at 8M x 768), which stalls compilation and defeats the
        # persistent cache.
        @jax.jit
        def run(slab, valid, scales, uniq, ok, qs):
            def step(carry, q):
                v, p = kernel(
                    slab, valid, scales, uniq, ok, q,
                    k=args.k, c=c, **kw,
                )
                return carry, (v, p)

            _, out = jax.lax.scan(step, 0, qs)
            return out

        return run, qs

    dma_gb = args.live * c * d / 1e9
    print(f"slab {cap}x{d} int8, {nblocks} blocks, live={args.live} "
          f"u={args.u}, per-batch DMA {dma_gb:.2f} GB "
          f"(roofline ~{dma_gb / 800 * 1000:.2f} ms @800GB/s)")

    all_variants = {
        "v1w4": ("v1 w4 B64", clustered_block_topk, {"n_ways": 4},
                 args.b, jnp.bfloat16),
        "v1w8": ("v1 w8 B64", clustered_block_topk, {"n_ways": 8},
                 args.b, jnp.bfloat16),
        "v2w4": ("v2 w4 B64", clustered_block_topk_v2, {"n_ways": 4},
                 args.b, jnp.float32),
        "v2w8": ("v2 w8 B64", clustered_block_topk_v2, {"n_ways": 8},
                 args.b, jnp.float32),
        "v2w8b128": ("v2 w8 B128", clustered_block_topk_v2,
                     {"n_ways": 8}, 2 * args.b, jnp.float32),
        # B-sweep diagnostics: per-step DMA is constant, compute scales
        # with B — flat time/step => fetch-bound, linear => compute-bound
        # (the v3 manual-DMA variants this sweep A/B'd were removed in
        # r4 after measuring never-better; numbers live in RESULTS.md)
        "v2w8b32": ("v2 w8 B32", clustered_block_topk_v2, {"n_ways": 8},
                    32, jnp.float32),
    }
    names = (args.variants.split(",") if args.variants
             else list(all_variants))

    def run_e2e(kern_name):
        """FULL index search path (probe + dedup + kernel + residual
        merge) on a synthetic one-block-per-bucket geometry (m=1,
        nlist=nblocks): same slab, so (e2e - kernel-only at the
        matching live/u) attributes the non-kernel device cost.
        At B=64 nprobe=4 the deduped live-block count is ~248 of
        u=256 — compare against `--live 248 --u 256` kernel-only."""
        from wdbx_tpu.index.clustered import (
            _clustered_kernelpath_pipelined,
        )

        nlist = nblocks
        cents = jax.random.normal(
            jax.random.PRNGKey(5), (nlist, d), jnp.float32
        )
        cents = cents / jnp.linalg.norm(cents, axis=-1, keepdims=True)
        blk_lo = jnp.arange(nlist, dtype=jnp.int32)
        blk_hi = blk_lo + 1
        valid_b = jnp.ones((cap,), bool)
        scales_f = jnp.full((cap,), 1.0 / 127.0, jnp.float32)
        nprobe = 4
        u_eff = min(args.u, args.b * nprobe)
        qs = qstack  # (nb, b, d) f32

        def run(slab, valid_b, scales_f, cents, qs):
            return _clustered_kernelpath_pipelined(
                slab, valid_b, scales_f, cents, blk_lo, blk_hi,
                np.zeros((0,), np.int32), np.int32(0), qs,
                k=args.k, nprobe=nprobe, u=u_eff, m=1, c=c,
                precision="default", int8=True, normalize=True,
                kern=kern_name,
            )

        print(f"e2e_{kern_name}: compiling... (nprobe={nprobe} "
              f"u={u_eff} m=1)", flush=True)
        t0 = time.perf_counter()
        best, med = bench(run, slab, valid_b, scales_f, cents, qs,
                          iters=args.iters)
        per_batch_ms = best / args.nb * 1000
        qps = args.nb * args.b / best
        print(f"e2e_{kern_name:8s} best {best*1000:7.2f} ms/dispatch "
              f"({per_batch_ms:6.2f} ms/batch-{args.b}) "
              f"median {med*1000:7.2f}  ~{qps:8.0f} q/s "
              f"[first-call {time.perf_counter()-t0:.1f}s]")

    for name in [n for n in names if n.startswith("e2e_")]:
        try:
            run_e2e(name[4:])
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name:12s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
    names = [n for n in names if not n.startswith("e2e_")]
    for name, kern, kw, b_eff, qdt in (all_variants[n] for n in names):
        try:
            print(f"{name}: compiling...", flush=True)
            run, qs = pipelined(kern, kw, b_eff, qdt)
            t0 = time.perf_counter()
            best, med = bench(run, slab, valid, scales, uniq, ok, qs,
                              iters=args.iters)
            nbatches = args.nb * args.b / args.b  # batch-64 equivalents
            per_batch_ms = best / (args.nb * args.b / args.b) * 1000
            qps = args.nb * args.b / best
            print(f"{name:12s} best {best*1000:7.2f} ms/dispatch "
                  f"({per_batch_ms:6.2f} ms/batch64-eq) "
                  f"median {med*1000:7.2f}  ~{qps:8.0f} q/s "
                  f"[first-call {time.perf_counter()-t0:.1f}s]")
        except Exception as e:  # noqa: BLE001 — report and continue A/B
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
