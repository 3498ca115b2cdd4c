"""Cluster-ordered IVF: the bucket table IS the slab (zero-copy IVF).

``IVFIndex`` (wdbx_tpu/index/ivf.py) materializes probed buckets as a
dense ``(nlist, cap_b, d)`` side table so probes read contiguous HBM —
but the table duplicates the corpus (~1.3x with capacity-capped
placement), which is why 10M x 768 int8 (slab 7.7 GB + tables ~8.9 GB)
could not fit a single 16 GB chip.

This index removes the duplication entirely, ScaNN-style: ``build()``
physically reorders the slab into bucket order, so each bucket occupies
one contiguous row range ``[bucket_start[p], bucket_start[p+1])`` and a
probe is a plain contiguous DMA of slab rows — the exact access pattern
the side table bought, at **zero** extra corpus bytes (bookkeeping adds
~9 bytes/row). There are no bucket capacity caps and no spilled rows:
extents are exact.

Design points:
  * **Stable slots.** External slot ids never change across rebuilds —
    a slot↔position indirection (two host int32 arrays) maps the store's
    handles to physical rows, so the registry/store layer needs no remap
    when a rebuild permutes the slab (unlike ``compact()``).
  * **Block scan.** The slab is viewed as ``(cap/c, c, d)`` blocks; a
    probed bucket expands to its covering block range (buckets may
    straddle blocks — co-resident rows of neighbouring buckets are
    valid extra candidates, so buckets need no block alignment and the
    layout has no padding). The probed multiset dedups to unique blocks
    (the batch-dedup trick from ``_ivf_search``), each DMA'd once per
    batch.
  * **Mutation.** Fresh adds land at/above a block-aligned boundary
    past the clustered region and are brute-scanned via the residual
    buffer; deletes tombstone + quarantine their position until the next
    build; updates MOVE the row to a fresh position. Scanned blocks and
    the residual buffer are therefore always disjoint — both scan paths
    exploit this to skip per-row bucket masking entirely
    (kernels/clustered_scan.py).
  * **Streaming two-pass build.** ``build_from()`` ingests a re-iterable
    chunk source directly into cluster order (pass 1 assigns, pass 2
    scatters), keeping peak HBM at slab + one chunk — this is what fits
    10M x 768 int8 on one v5e. The in-memory ``build()`` permutes the
    live slab on device (peak 2x corpus transient).

Reference parity: same HNSW/FAISS-IVF replacement role as ``IVFIndex``
(reference wdbx/core/indexing.py:470-505, :709-758); auto-train,
``optimize()`` retrain and tune() are inherited.
"""

from __future__ import annotations

import json
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wdbx_tpu.index.flat import FlatIndex, _as_qstack, _next_pow2
from wdbx_tpu.index.ivf import IVFIndex
from wdbx_tpu.ops.kmeans import kmeans
from wdbx_tpu.ops.normalize import l2_normalize


@partial(jax.jit, static_argnames=("block",))
def _assign_blocked(rows, centroids, block=8192):
    """argmax centroid assignment without materializing the full
    (rows, nlist) score matrix (2.1 GB per 131k-row chunk at nlist=4096):
    lax.map over row blocks keeps the live score tile at block x nlist."""
    n = rows.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
    cents16 = centroids.astype(jnp.bfloat16)

    def f(chunk):
        # bf16 pass: 2x the MXU rate of f32; argmax assignment is robust
        # to bf16 rounding (ties move a row to an equally-near centroid)
        s = jax.lax.dot_general(
            chunk.astype(jnp.bfloat16), cents16, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.argmax(s, axis=-1).astype(jnp.int32)
    out = jax.lax.map(f, rows.reshape(nb, block, -1))
    return out.reshape(-1)[:n]


def _block_rows(dim: int, itemsize: int, cap: int,
                target: int = 786_432) -> int:
    """Rows per scan block: targets ``target`` bytes per DMA (default
    0.75 MB), power of two, and divides the capacity (caps are pow2
    below 1M rows and 1M-row multiples above, so any c <= 2^20 divides
    them)."""
    c = _next_pow2(max(256, target // max(1, dim * itemsize)))
    c = min(c, 4096)
    while cap % c != 0 and c > 1:
        c //= 2
    return max(1, c)


@partial(
    jax.jit,
    static_argnames=("k", "nprobe", "u", "m", "c", "precision", "int8",
                     "normalize", "int4"),
)
def _clustered_search(
    slab, valid, scales, centroids, blk_lo, blk_hi,
    residual_pos, residual_count, q,
    k, nprobe, u, m, c, precision, int8=False, normalize=False,
    int4=False,
):
    """Batch-deduplicated block scan over the cluster-ordered slab.

    Probe selection is one small centroid matmul; each probed bucket
    expands to its covering blocks; the block multiset dedups (sort +
    first-occurrence) so every block is DMA'd once per batch and scored
    against the whole query batch. No per-row bucket mask: rows of
    *other* buckets sharing a scanned block are valid extra candidates
    (true similarities — they can only improve recall), and the
    mutation invariant keeps fresh/residual rows out of scanned blocks
    entirely. Same semantics as the Pallas kernel path.
    """
    b, d = q.shape
    if normalize:
        q = l2_normalize(q)
    cs = jax.lax.dot_general(
        q, centroids, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    p_eff = min(nprobe, centroids.shape[0])
    _, probe = jax.lax.top_k(cs, p_eff)  # (B, P) bucket ids

    # Sentinel-collapse inside _dedup_blocks: every out-of-range lane
    # maps to `nblocks`, contributing one masked entry after dedup; when
    # u undercuts the true unique count, popularity-ranked priority
    # drops the least-probed blocks (graceful recall degradation).
    nblocks = slab.shape[0] // c
    u = min(u, b * min(nprobe, centroids.shape[0]) * m)
    # blocks with no live rows (tombstoned out, or filtered out by a
    # pushed-down slot mask ANDed into `valid`) collapse to the sentinel
    # pre-ranking: no DMA, no compute (one cheap (cap,) reduce)
    uniq, uniq_ok = _dedup_blocks(
        probe, blk_lo, blk_hi, nblocks, u, m, valid=valid, c=c
    )

    slab3 = slab.reshape(nblocks, c, slab.shape[1])  # packed width for int4
    v2 = valid.reshape(nblocks, c)
    s2 = scales.reshape(nblocks, c) if (int8 or int4) else None

    # Group g blocks per scan step: the per-iteration fixed cost
    # (~45us measured: loop bookkeeping + DMA issue) dominates a single
    # 0.75 MB block's compute, so bigger steps amortize it; the group
    # top-k also shrinks the final merge width by g. Block top-k
    # exactness is preserved: a global top-k candidate is beaten by at
    # most k-1 rows within its own group, so the group's top-k always
    # surfaces it.
    g = max(1, min(8, 8192 // c, u))
    steps = max(1, u // g)
    # u need not divide g (the draws*m bound is not a power of two):
    # truncate to steps*g entries — the tail holds the lowest-priority
    # dedup slots (duplicates/sentinel under popularity ranking)
    k_blk = min(k, g * c)
    uniq_g = uniq[: steps * g].reshape(steps, g)
    ok_g = uniq_ok[: steps * g].reshape(steps, g)

    def step(carry, x):
        blks, oks = x  # (g,)
        rows = jnp.concatenate(
            [jax.lax.dynamic_index_in_dim(slab3, blks[i], 0, False)
             for i in range(g)], axis=0,
        )  # (g*c, d)  (d = packed width for int4)
        v = jnp.concatenate(
            [jax.lax.dynamic_index_in_dim(v2, blks[i], 0, False)
             for i in range(g)], axis=0,
        )
        if int4:
            from wdbx_tpu.kernels.quant import unpack_int4

            rows = unpack_int4(rows)
        if int8 or int4:
            sc = jnp.concatenate(
                [jax.lax.dynamic_index_in_dim(s2, blks[i], 0, False)
                 for i in range(g)], axis=0,
            )
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * sc[None, :]
        else:
            s = jax.lax.dot_general(
                q.astype(rows.dtype), rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # (B, g*c)
        okrow = jnp.repeat(oks, c)  # per-source-block dedup validity
        s = jnp.where(v[None, :] & okrow[None, :], s, -jnp.inf)
        if s.shape[-1] >= 16 * k_blk:
            v_, i_ = jax.lax.approx_max_k(s, k_blk, recall_target=0.998)
        else:
            v_, i_ = jax.lax.top_k(s, k_blk)
        # decode concat offset -> global position: block blks[j] spans
        # [j*c, (j+1)*c) of the concat axis
        base = jnp.repeat(blks * c, c)  # (g*c,)
        off = jnp.tile(jnp.arange(c, dtype=jnp.int32), g)
        pos_of_col = base + off
        return carry, (v_, jnp.take(pos_of_col, i_))

    _, (vals, pos) = jax.lax.scan(step, 0, (uniq_g, ok_g))  # (steps, B, kb)
    scores = vals.transpose(1, 0, 2).reshape(b, steps * k_blk)
    flat_pos = pos.transpose(1, 0, 2).reshape(b, steps * k_blk)
    # residual (fresh rows) brute-scan + final merge — shared with the
    # kernel path (labels are global slab positions in both)
    from wdbx_tpu.index.ivf import _residual_merge

    return _residual_merge(
        slab, valid, residual_pos, residual_pos.astype(jnp.int32),
        residual_count, scales, scores, flat_pos, q,
        k=k, precision=precision, int8=int8, int4=int4,
    )


def _dedup_blocks(probe, blk_lo, blk_hi, nblocks: int, u: int, m: int,
                  valid=None, c=None):
    """Expand probed buckets to covering blocks and dedup to ``u``
    popularity-ranked unique block ids (trace-time shapes). Shared by
    the lax scan, Pallas kernel, and sharded paths. ``valid`` (the
    (cap,) live mask, with ``c`` rows per block) collapses blocks with
    no live rows into the sentinel BEFORE ranking — their DMAs and
    compute vanish entirely (filter pushdown and fully-tombstoned
    blocks); the per-block any-live reduce lives here so the three
    call paths cannot drift."""
    lo = jnp.take(blk_lo, probe)  # (B, P)
    hi = jnp.take(blk_hi, probe)
    blocks = lo[..., None] + jnp.arange(m, dtype=jnp.int32)  # (B, P, M)
    in_range = blocks < hi[..., None]
    if valid is not None:
        blk_live = valid[: nblocks * c].reshape(nblocks, c).any(axis=1)
        in_range = jnp.logical_and(
            in_range,
            jnp.take(blk_live, jnp.clip(blocks, 0, nblocks - 1)),
        )
    flat = jnp.where(in_range, blocks, nblocks).reshape(-1)
    bp = flat.shape[0]
    u = min(u, bp)
    sorted_ids = jnp.sort(flat)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    is_first = jnp.logical_and(is_first, sorted_ids < nblocks)
    counts = (
        jnp.searchsorted(sorted_ids, sorted_ids, side="right")
        - jnp.searchsorted(sorted_ids, sorted_ids, side="left")
    ).astype(jnp.int32)
    # counts*bp must stay inside int32 (x64 is off); without the clamp a
    # bucket probed by >~2^31/bp of the expanded entries wraps negative
    # and the hottest blocks silently fall out of the top_k.
    counts = jnp.minimum(counts, (2**31 - 1 - bp) // bp)
    prio = jnp.where(
        is_first, counts * bp + (bp - jnp.arange(bp, dtype=jnp.int32)), 0
    )
    _, sel = jax.lax.top_k(prio, u)
    uniq_ok = jnp.take(is_first, sel)
    # Masked entries (dups/sentinel) sort to the tail (prio 0); pin them
    # all to ONE block id so the kernel's consecutive identical block
    # indices skip their DMAs entirely.
    uniq = jnp.where(
        uniq_ok, jnp.minimum(jnp.take(sorted_ids, sel), nblocks - 1),
        nblocks - 1,
    )
    return uniq, uniq_ok


@partial(
    jax.jit,
    static_argnames=("k", "nprobe", "L", "precision", "int8",
                     "normalize", "int4"),
)
def _clustered_search_ranges(
    slab, valid, scales, centroids, row_lo, row_cnt,
    residual_pos, residual_count, q,
    k, nprobe, L, precision, int8=False, normalize=False, int4=False,
):
    """Small-batch latency path: scan the probed buckets' EXACT row
    ranges as contiguous dynamic slices of the cluster-ordered slab —
    the dense-table IVF's program shape (reference HNSW's latency
    regime, reference wdbx/core/indexing.py:470-505) with zero memory
    duplication, because the slab IS bucket-contiguous. No covering-
    block over-fetch, no Pallas kernel (plain XLA: fast compiles),
    sequential DMAs at memory speed (contiguous slices sidestep the
    TPU gather pathology). Each scan step scores ALL B queries against
    one query's probed bucket but masks non-owners, so duplicate
    (query, row) candidates cannot arise when queries share buckets —
    the waste is bounded by B <= small_batch_threshold."""
    from wdbx_tpu.index.ivf import _residual_merge

    if normalize:
        q = l2_normalize(q)
    b = q.shape[0]
    cap = slab.shape[0]
    cs = jax.lax.dot_general(
        q, centroids, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    p_eff = min(nprobe, centroids.shape[0])
    _, probe = jax.lax.top_k(cs, p_eff)  # (B, P) distinct per row
    flat_probe = probe.reshape(-1)       # step s belongs to query s//P
    owner = jax.lax.broadcasted_iota(jnp.int32, (b, p_eff), 0).reshape(-1)
    Ls = min(L, cap)
    quant = int8 or int4

    def step(carry, x):
        pj, ow = x
        lo = jnp.take(row_lo, pj)
        cnt = jnp.take(row_cnt, pj)
        # slice starts round DOWN to a 512-row boundary: arbitrary-offset
        # HBM slices pay a relayout penalty the (aligned) dense-table IVF
        # slices never see; L carries a 512-row margin so the bucket
        # tail still fits and the in-bucket mask drops the lead-in rows
        start = jnp.clip((lo // 512) * 512, 0, cap - Ls)
        rows = jax.lax.dynamic_slice(
            slab, (start, jnp.int32(0)), (Ls, slab.shape[1])
        )
        if int4:
            from wdbx_tpu.kernels.quant import unpack_int4

            rows = unpack_int4(rows)
        v = jax.lax.dynamic_slice(valid, (start,), (Ls,))
        pos = start + jnp.arange(Ls, dtype=jnp.int32)
        in_bucket = v & (pos >= lo) & (pos < lo + cnt)
        if quant:
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * jax.lax.dynamic_slice(scales, (start,), (Ls,))[None, :]
        else:
            s = jax.lax.dot_general(
                q.astype(rows.dtype), rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
        is_owner = jax.lax.broadcasted_iota(
            jnp.int32, (b, 1), 0
        ) == ow  # (b, 1)
        s = jnp.where(is_owner & in_bucket[None, :], s, -jnp.inf)
        return carry, (s, pos)

    _, (ss, pp) = jax.lax.scan(step, 0, (flat_probe, owner))
    # (S, B, Ls) / (S, Ls) -> per-query candidate row
    scores_all = jnp.moveaxis(ss, 0, 1).reshape(b, -1)
    pos_all = jnp.broadcast_to(
        pp.reshape(1, -1), (b, pp.size)
    )
    kv, sel = jax.lax.top_k(scores_all, min(k, scores_all.shape[-1]))
    kp = jnp.take_along_axis(pos_all, sel, axis=-1)
    return _residual_merge(
        slab, valid, residual_pos, residual_pos.astype(jnp.int32),
        residual_count, scales, kv, kp, q,
        k=k, precision=precision, int8=int8, int4=int4,
    )


@partial(
    jax.jit,
    static_argnames=("k", "nprobe", "L", "precision", "int8",
                     "normalize", "int4"),
)
def _clustered_ranges_pipelined(
    slab, valid, scales, centroids, row_lo, row_cnt,
    residual_pos, residual_count, qstack,
    k, nprobe, L, precision, int8=False, normalize=False, int4=False,
):
    def one(carry, q):
        s, i = _clustered_search_ranges(
            slab, valid, scales, centroids, row_lo, row_cnt,
            residual_pos, residual_count, q,
            k=k, nprobe=nprobe, L=L, precision=precision, int8=int8,
            normalize=normalize, int4=int4,
        )
        return carry, (s, i)

    _, (scores, pos) = jax.lax.scan(one, 0, qstack)
    return scores, pos


@partial(
    jax.jit,
    static_argnames=("k", "nprobe", "u", "m", "c", "precision", "int8",
                     "normalize", "interpret", "int4", "kern", "qprec"),
)
def _clustered_search_kernelpath(
    slab, valid, scales, centroids, blk_lo, blk_hi,
    residual_pos, residual_count, q,
    k, nprobe, u, m, c, precision, int8=False, normalize=False,
    interpret=False, int4=False, kern="v1", qprec="bf16",
):
    """One-dispatch kernel query: probe selection, block dedup, the
    Pallas block scan, and the residual merge inline in a single
    compiled program. Candidate positions come back as global slab
    rows, so the residual merge is shared with the lax path.
    ``kern`` selects the kernel generation: "v1" (scalar-prefetch grid),
    "v2" (restructured step body — int8×int8 MXU, padding-step skip);
    int4 slabs require v2 (v1 has no unpack). A v3 (manual
    depth-buffered DMA) existed through r3 and measured never-better
    than v2's grid pipeline (RESULTS.md r3-late A/B) — removed in r4 to
    halve the matrix every new feature must be wired through."""
    from wdbx_tpu.index.ivf import _residual_merge
    from wdbx_tpu.kernels.clustered_scan import (
        clustered_block_topk,
        clustered_block_topk_v2,
    )

    if normalize:
        q = l2_normalize(q)
    cs = jax.lax.dot_general(
        q, centroids, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    p_eff = min(nprobe, centroids.shape[0])
    _, probe = jax.lax.top_k(cs, p_eff)
    nblocks = slab.shape[0] // c
    uniq, uniq_ok = _dedup_blocks(
        probe, blk_lo, blk_hi, nblocks, u, m, valid=valid, c=c
    )
    valid_i8 = valid.astype(jnp.int8).reshape(1, -1)
    quant = int8 or int4
    sc_arg = (
        scales.astype(jnp.float32).reshape(1, -1) if quant else None
    )
    if kern == "v2" or int4:
        kv, kp = clustered_block_topk_v2(
            slab, valid_i8, sc_arg,
            uniq.astype(jnp.int32), uniq_ok.astype(jnp.int32),
            q if quant else q.astype(slab.dtype),
            k=k, c=c, interpret=interpret, int4=int4, qprec=qprec,
        )
    else:
        qk = q.astype(jnp.bfloat16) if int8 else q.astype(slab.dtype)
        kv, kp = clustered_block_topk(
            slab, valid_i8, sc_arg,
            uniq.astype(jnp.int32), uniq_ok.astype(jnp.int32), qk,
            k=k, c=c, interpret=interpret,
        )
    return _residual_merge(
        slab, valid, residual_pos, residual_pos.astype(jnp.int32),
        residual_count, scales, kv, kp, q,
        k=k, precision=precision, int8=int8, int4=int4,
    )


@partial(
    jax.jit,
    static_argnames=("k", "nprobe", "u", "m", "c", "precision", "int8",
                     "normalize", "interpret", "int4", "kern", "qprec"),
)
def _clustered_kernelpath_pipelined(
    slab, valid, scales, centroids, blk_lo, blk_hi,
    residual_pos, residual_count, qstack,
    k, nprobe, u, m, c, precision, int8=False, normalize=False,
    interpret=False, int4=False, kern="v1", qprec="bf16",
):
    def step(carry, q):
        s, i = _clustered_search_kernelpath(
            slab, valid, scales, centroids, blk_lo, blk_hi,
            residual_pos, residual_count, q,
            k=k, nprobe=nprobe, u=u, m=m, c=c, precision=precision,
            int8=int8, normalize=normalize, interpret=interpret,
            int4=int4, kern=kern, qprec=qprec,
        )
        return carry, (s, i)

    _, (scores, pos) = jax.lax.scan(step, 0, qstack)
    return scores, pos


@partial(
    jax.jit,
    static_argnames=("k", "nprobe", "u", "m", "c", "precision", "int8",
                     "normalize", "int4"),
)
def _clustered_search_pipelined(
    slab, valid, scales, centroids, blk_lo, blk_hi,
    residual_pos, residual_count, qstack,
    k, nprobe, u, m, c, precision, int8=False, normalize=False,
    int4=False,
):
    """lax.scan of the block scan over a (NB, B, d) stack — one dispatch
    serves NB batches (same serving shape as the flat/IVF pipelines)."""

    def step(carry, q):
        s, i = _clustered_search(
            slab, valid, scales, centroids, blk_lo, blk_hi,
            residual_pos, residual_count, q,
            k=k, nprobe=nprobe, u=u, m=m, c=c, precision=precision,
            int8=int8, normalize=normalize, int4=int4,
        )
        return carry, (s, i)

    _, (scores, pos) = jax.lax.scan(step, 0, qstack)
    return scores, pos


class ClusteredSlotMixin:
    """Shared slot↔position bookkeeping and mutation rules for the
    cluster-ordered layouts (single-device and mesh-striped).

    Invariant while trained: every live position below the block-aligned
    clustered boundary (``_fresh_base``) either was placed by build() or
    was RECYCLED into a hole inside its own assigned bucket's extent
    (see ``_place_batch``); fresh rows otherwise occupy positions
    at/above the boundary. Freed clustered-region positions are
    quarantined per bucket — reusable only by a row that k-means-assigns
    to that same bucket — and updates MOVE the row, so the block scan
    and the residual scan never overlap and every scanned row belongs to
    the bucket whose extent covers it. The Pallas kernel paths rely on
    this to skip per-row bucket masking.
    """

    #: reuse quarantined clustered-region holes for inserts/updates whose
    #: nearest centroid matches the hole's bucket (config key
    #: IVF_RECYCLE_HOLES). Bounds capacity growth under delete/update
    #: churn without waiting for the next rebuild.
    recycle_holes = True

    # -- bucket-aware quarantine ---------------------------------------------
    # ``self._quar`` maps bucket id -> list of quarantined positions in
    # that bucket's extent (-1 = bucket unknown: untrained or a legacy /
    # foreign-topology restore; never recycled, only counted). It is the
    # single source of truth; the flat view below feeds persistence,
    # stats, and the rebuild trigger.

    @property
    def _pos_quarantine(self) -> list[int]:
        return self._quar_flat()

    def _quar_len(self) -> int:
        # a plain int kept in sync under the write lock: the search
        # paths read it through the deliberately lock-free
        # _needs_build() pre-check, where iterating the dict would race
        # concurrent mutators (RuntimeError: dict changed size)
        return self._quar_n

    def _quar_flat(self) -> list[int]:
        return [p for holes in self._quar.values() for p in holes]

    def _quarantine_positions(self, pos: np.ndarray) -> None:
        pos = np.asarray(pos, np.int64)
        if len(pos) == 0:
            return
        for p, b in zip(pos.tolist(), self._bucket_of_pos(pos).tolist()):
            self._quar.setdefault(int(b), []).append(int(p))
        self._quar_n += len(pos)

    def _place_batch(self, vectors, n: int):
        """Choose physical positions for ``n`` prepped rows. When holes
        exist, each row is assigned to its nearest centroid (the same
        bf16-argmax rule the build uses) and fills a quarantined hole in
        that bucket's extent if one is free — the row is then served by
        the normal block scan, not the residual scan. Returns
        ``(pos, fresh)`` where ``fresh`` marks rows that took residual-
        region positions (the caller appends only those to
        ``self._residual``)."""
        recyclable = (
            n > 0 and self.is_trained and self.recycle_holes
            and any(b >= 0 and holes for b, holes in self._quar.items())
        )
        if not recyclable:
            return self._take_slots(n), np.ones(n, bool)
        rows = (
            vectors.astype(jnp.float32)
            if isinstance(vectors, jax.Array)
            else jnp.asarray(vectors, jnp.float32)
        )
        if self.metric == "cosine":
            rows = l2_normalize(rows)
        buckets = np.asarray(_assign_blocked(rows, self._centroids))
        pos = np.full(n, -1, np.int64)
        for i, b in enumerate(buckets.tolist()):
            holes = self._quar.get(b)
            if holes:
                pos[i] = holes.pop()
                self._quar_n -= 1
                if not holes:
                    del self._quar[b]
        fresh = pos < 0
        n_fresh = int(fresh.sum())
        if n_fresh:
            pos[fresh] = self._take_slots(n_fresh)
        return pos, fresh

    def _take_ext_slots(self, n: int) -> np.ndarray:
        slots = []
        while self._free_slots and len(slots) < n:
            slots.append(self._free_slots.pop())
        fresh = n - len(slots)
        if fresh:
            slots.extend(
                range(self._next_ext_slot, self._next_ext_slot + fresh)
            )
            self._next_ext_slot += fresh
        return np.asarray(slots, np.int64)

    def _map_pos_to_slots(self, scores: np.ndarray, pos: np.ndarray):
        """Translate physical positions to stable external slot ids."""
        out = self._slot_of[np.clip(pos, 0, self._cap - 1)].astype(np.int64)
        out[(pos < 0) | (scores == -np.inf)] = -1
        return scores, out

    def _positions_of(self, slots) -> np.ndarray:
        idx = np.asarray(slots, np.int64)
        return self._pos_of[np.clip(idx, 0, self._cap - 1)].astype(np.int64)

    # -- mutation -----------------------------------------------------------
    def add_batch(self, vectors: np.ndarray) -> np.ndarray:
        with self._mu.write():
            vectors = self._prep(vectors)
            n = len(vectors)
            # recycle bucket-matched quarantined holes first (capacity
            # stays bounded under delete churn); the rest take residual-
            # region positions via the parent bookkeeping
            pos, fresh = self._place_batch(vectors, n)
            self._scatter(pos, vectors, True)
            self._size += n
            slots = self._take_ext_slots(n)
            self._slot_of[pos] = slots.astype(np.int32)
            self._pos_of[slots] = pos.astype(np.int32)
            if self.is_trained:
                self._residual.extend(int(p) for p in pos[fresh])
            if getattr(self, "_cow_writes", False):
                for s in slots:
                    self._bg_journal[int(s)] = "dirty"
            return slots

    def update_slots(self, slots: np.ndarray, vectors: np.ndarray) -> None:
        slots = np.asarray(slots, np.int64)
        vectors = np.asarray(vectors)
        if len(slots) != len(np.unique(slots)):
            # duplicate slot ids in one batch: last row wins. Without the
            # dedup the same physical position is freed/quarantined twice
            # and two later inserts alias one row.
            _, idx_rev = np.unique(slots[::-1], return_index=True)
            keep = np.sort(len(slots) - 1 - idx_rev)
            slots, vectors = slots[keep], vectors[keep]
        with self._mu.write():
            if getattr(self, "_cow_writes", False):
                for s in slots:
                    self._bg_journal[int(s)] = "dirty"
            vectors = self._prep(vectors)
            pos = self._positions_of(slots)
            known = pos >= 0
            slots = np.asarray(slots, np.int64)[known]
            if not known.all():
                vectors = vectors[known]
            if len(slots) == 0:
                return
            pos = pos[known]
            if not self.is_trained:
                self._scatter(pos, vectors, True)
                return
            # move-on-update: tombstone the old position (quarantined
            # if inside the clustered region, recycled otherwise), land
            # the new row in a bucket-matched hole when one exists
            # (often its own old position — an in-place rewrite), else
            # above the clustered boundary
            self._tombstone_positions(pos)
            # clear the moved-from label NOW: a stale label at a dead
            # position persisted through save() and load()'s
            # last-assignment-wins _pos_of rebuild, pointing the slot at
            # its dead row — a later remove then double-freed that
            # position, two inserts recycled it twice, and one slot
            # became a ghost the next rebuild dropped (the r4 racing
            # differential failure: slot lost with _size intact)
            self._slot_of[pos] = -1
            clustered = pos < self._fresh_base
            self._quarantine_positions(pos[clustered])
            self._free.extend(int(p) for p in pos[~clustered])
            gone = set(int(x) for x in pos[~clustered])
            self._residual = [p for p in self._residual if p not in gone]
            new_pos, fresh = self._place_batch(vectors, len(slots))
            self._scatter(new_pos, vectors, True)
            self._slot_of[new_pos] = slots.astype(np.int32)
            self._pos_of[slots] = new_pos.astype(np.int32)
            self._residual.extend(int(p) for p in new_pos[fresh])

    def _tombstone_positions(self, pos: np.ndarray) -> None:
        pad_n = _next_pow2(len(pos))
        ppos = jnp.asarray(
            np.pad(pos, (0, pad_n - len(pos)), constant_values=self._cap)
        )
        self._valid = self._tombstone_arrays(ppos)

    def remove_slots(self, slots: np.ndarray) -> None:
        # dedup: duplicate ids would double-decrement _size and push the
        # same position into the free/quarantine lists twice
        slots = np.unique(np.asarray(slots, np.int64))
        if len(slots) == 0:
            return
        with self._mu.write():
            pos = self._positions_of(slots)
            known = pos >= 0  # unknown slots are a no-op, not row -1
            slots, pos = slots[known], pos[known]
            if len(slots) == 0:
                return
            if getattr(self, "_cow_writes", False):
                for s in slots:
                    self._bg_journal[int(s)] = "removed"
            self._tombstone_positions(pos)
            self._size -= len(slots)
            # external slots recycle immediately; clustered-region
            # positions quarantine until the next build, residual-region
            # positions (never block-scanned) recycle right away
            if self.is_trained:
                clustered = pos < self._fresh_base
                self._quarantine_positions(pos[clustered])
                self._free.extend(int(p) for p in pos[~clustered])
                res = set(int(p) for p in pos)
                self._residual = [p for p in self._residual if p not in res]
            else:
                self._free.extend(int(p) for p in pos)
            self._free_slots.extend(int(s) for s in slots)
            self._slot_of[pos] = -1
            self._pos_of[slots] = -1

    def _adopt_foreign_checkpoint(self, path: str) -> bool:
        """Called by ``load`` when the clustered sidecar is absent: decide
        what the base checkpoint actually was. Flat/IVF checkpoints store
        rows at slot==position, so they are adopted by building identity
        slot maps (the index comes up untrained and serves through the
        exact path until the next ``build``). A same-kind checkpoint with
        a missing sidecar is corrupt, and any other kind is refused —
        previously both cases "loaded" with all slot maps at -1, so
        ``count()`` reported N vectors while every search returned slot -1.
        """
        meta_file = path + ".meta.json"
        src_kind = self.kind
        if os.path.exists(meta_file):
            with open(meta_file) as f:
                src_kind = json.load(f).get("kind", self.kind)
        if src_kind == self.kind:
            raise ValueError(
                f"checkpoint at {path!r} is kind {src_kind!r} but its "
                "clustered sidecar file is missing — refusing partial load"
            )
        if src_kind not in ("flat", "ivf", "sharded_flat", "sharded_ivf"):
            raise ValueError(
                f"cannot load a {src_kind!r} checkpoint "
                f"into a {self.kind!r} index"
            )
        hwm = self._next_slot
        live = np.ones(hwm, bool)
        free_live = [int(p) for p in self._free if p < hwm]
        live[free_live] = False
        pos = np.arange(hwm, dtype=np.int32)[live]
        self._slot_of[pos] = pos
        self._pos_of[pos] = pos
        self._next_ext_slot = hwm
        self._free_slots = list(free_live)
        return True

    # -- shared query helpers -----------------------------------------------
    def _scan_rows(self) -> int:
        """Rows covered by one block grid (per device in mesh layouts)."""
        return self._cap

    def _scan_u(self, pad_b: int, nprobe: int, geom: dict | None = None
                ) -> int:
        """Static dedup scan length. Two bounds:

        * worst case — prefix sum of the largest buckets' block counts
          for pad_b*nprobe probes (never drops a block);
        * expected case — 1.5x the expected distinct-bucket count (the
          birthday bound; uniform probe spread maximizes it) times the
          mean blocks/bucket. At large coalesced batches the worst case
          over-scans ~2.4x; under this bound the (rare) overflow drops
          the least-probed blocks (popularity-ranked priority), which
          tune() measures and compensates for with nprobe.

        ``geom`` overrides the block geometry (the narrow-block latency
        path passes ``self._small``)."""
        if geom is None:
            geom = dict(
                c=self._c, m=self._m, u_prefix=self._u_prefix,
                nonempty=self._nonempty, avg_blocks=self._avg_blocks,
            )
        pref = geom["u_prefix"]
        nblocks = self._scan_rows() // geom["c"]
        draws = pad_b * nprobe
        worst = int(pref[min(draws, len(pref)) - 1]) if len(pref) else 1
        ne = max(1, geom["nonempty"])
        e_distinct = ne * (1.0 - (1.0 - 1.0 / ne) ** draws)
        expected = int(
            math.ceil(1.5 * e_distinct * geom["avg_blocks"])
        ) + 8
        return min(_next_pow2(max(1, min(worst, expected)) + 1),
                   _next_pow2(max(1, nblocks)), draws * geom["m"])

    def _use_ranges(self, pad_b: int, nprobe: int) -> bool:
        """Route small batches to the exact-bucket-range scan. Guarded
        by the probe READ footprint in BYTES: every probe's slice is
        the static max-bucket length L, so skewed bucket sizes (or big
        dims) inflate the ranges read past what narrow covering blocks
        fetch. Measured crossover (fixed-warm latency_b1, same window):
        1M×384 ranges 1.27 vs narrow 1.38 ms/query (ranges reads
        ~4 MB/query) but 10M×768 ranges 1.97 vs narrow 0.67 (ranges
        reads ~17 MB/query) — an 8 MB budget splits the two."""
        lp = getattr(self, "latency_path", "auto")
        if lp in ("narrow", "wide"):
            return False
        if getattr(self, "_row_lo", None) is None:
            return False
        if lp == "ranges":
            return True
        bytes_per_row = self._slab.shape[1] * self._slab.dtype.itemsize
        read = self._range_L * min(nprobe, len(self._row_cnt))
        return (
            pad_b <= self.small_batch_threshold
            and read * bytes_per_row <= 1 << 23
        )

    def _kernel_gen(self) -> str:
        """Kernel generation for the Pallas path ("v1"/"v2").
        int4 requires v2 (v1 has no unpack). "auto" picks v2: the
        r3 on-chip A/Bs settled it — with dispatch overhead amortized
        (NB=64 stacks / in-flight serving) v2 measures 1.50 ms/batch-64
        vs v1 1.77 kernel-isolated at the 10M x 768 flagship geometry
        (~85% of the deduped-block DMA roofline), and wins the
        in-flight e2e at B=128 (13.7k vs 9.8k QPS same window). A v3
        (manual depth-buffered DMA, 1.75 ms same A/B) never beat the
        grid's own pipeline and was removed in r4."""
        kv = getattr(self, "kernel_version", "auto")
        if kv in ("v1", "v2"):
            if kv == "v1" and self._is_int4:
                return "v2"
            return kv
        return "v2"

    #: deepest k the Pallas scan serves; beyond it the lax path takes
    #: over. The kernel's k-pass fold scales its scoped VMEM with k
    #: (measured: k=200 needs 164 MB > the 128 MB cap; k=128 fits).
    #: r5 raised 64 -> 128 after the 20M int4 sweep showed the
    #: 0.961-recall op point (k'=100) paying the 10-75x-slower lax
    #: fallback; kernel-vs-lax candidate sets agree exactly at k=100
    #: and the kernel compiles clean. KERNEL_K_MAX in config overrides.
    KERNEL_K_MAX = 128

    def _use_kernel(self, k: int = 1) -> bool:
        """Pallas block-scan kernel vs the portable lax scan. 'auto'
        picks the kernel on real TPUs (Mosaic); 'pallas' forces it
        (interpret mode off-TPU — tests), 'lax' forces the scan."""
        if k > self.KERNEL_K_MAX:
            return False
        if self.ivf_kernel == "pallas":
            return True
        return self.ivf_kernel == "auto" and jax.default_backend() == "tpu"

    def _needs_build(self) -> bool:
        if IVFIndex._needs_build(self):
            return True
        # tombstone bloat: quarantined positions only return to service
        # at a rebuild, so heavy delete churn triggers one
        return bool(self._built_size) and (
            self._quar_len()
            > self.rebuild_fraction * self._built_size
        )

    def _pos_mask(self, slot_mask) -> np.ndarray | None:
        """Translate a slot-indexed filter mask into position space.
        Cached by object identity of (mask, _valid): the store hands
        the same cached mask object to every filtered search, and
        rebuilding the position translation (a ~selectivity*N gather)
        per call dominated filtered serving latency at 10M. Every
        mutation replaces the ``_valid`` device array, so state changes
        invalidate naturally; held refs keep the ids stable."""
        if slot_mask is None:
            return None
        cache = getattr(self, "_posmask_cache", None)
        if cache is None:
            cache = self._posmask_cache = {}
        key = (
            id(slot_mask), id(self._valid),
            getattr(self, "_layout_gen", 0),
        )
        hit = cache.get(key)
        if hit is not None:
            return hit[2]
        mask = np.zeros(self._cap, bool)
        n = min(len(slot_mask), self._cap)
        sel = np.nonzero(slot_mask[:n])[0]
        pos = self._pos_of[sel]
        mask[pos[pos >= 0]] = True
        while len(cache) >= 4:
            cache.pop(next(iter(cache)))
        cache[key] = (slot_mask, self._valid, mask)
        return mask

    def _mask_selectivity(self, slot_mask) -> float:
        """Fraction of live rows the mask passes, measured in POSITION
        space (external slot ids recycle independently of positions, so
        the flat-layout popcount over ``_next_slot`` misreads here)."""
        pm = self._pos_mask(slot_mask)
        return float(pm.sum()) / max(1, self._size)

    def _oracle_search_masked(self, queries, k, slot_mask):
        pm = self._pos_mask(slot_mask)
        scores, pos = self._exact_masked_base(queries, k, pm)
        return self._map_pos_to_slots(scores, pos)

    def _exact_masked_base(self, queries, k, pos_mask):
        """Exact masked scan over the position slab (the sharded mixin
        user swaps in the mesh flat scan)."""
        from wdbx_tpu.index.flat import FlatIndex

        return FlatIndex.search(self, queries, k, pos_mask)

    def _filter_plan(
        self, slot_mask, nprobe: int, nlist: int
    ) -> tuple[np.ndarray | None, int, bool]:
        """Plan a filtered search: ``(pos_mask, nprobe_eff, exact)``.
        Pushdown ANDs the position mask into row validity (the scan
        kernels then drop filtered rows for free) and boosts nprobe by
        a quantized ~1/selectivity factor so probed buckets still
        surface ~k matching candidates; very sparse filters route to
        the exact masked scan instead (reference filter semantics:
        wdbx/core/vector_store.py:414-463 post-filters on host — here
        the filter rides the device program)."""
        from wdbx_tpu.index.ivf import FILTER_EXACT_THRESHOLD, _filter_boost

        pm = self._pos_mask(slot_mask)
        if pm is None:
            return None, nprobe, False
        sel = float(pm.sum()) / max(1, self._size)
        if sel < FILTER_EXACT_THRESHOLD:
            return pm, nprobe, True
        boost = _filter_boost(sel, getattr(self, "_filter_boosts", None))
        return pm, min(nlist, nprobe * boost), False

    # -- background-rebuild journal: swap-time drain + replay ----------------
    # Every slot journaled during the COW window has a STALE snapshot
    # row: its dest position in the new layout must be invalidated
    # (else a removed slot is resurrected as "known": _pos_of >= 0 at a
    # dead row means a double-decrement on re-remove and updates
    # scattering into the dead row), and — if it is still live
    # ("dirty") — its CURRENT row must be replayed into the fresh
    # region. VERDICT r3 ask #5: doing all of that under the swap-time
    # write lock (device fetch of every dirty row + O(cap) host map
    # rebuild) stalled rebuild p99 at 5.6x steady. The split here:
    # _prestage_bg_journal + _prepare_bg_swap run OFF the lock;
    # _bg_dirty_rows + _bg_delta_fixup pay only the final delta under
    # it. Shared by the single-device and mesh-striped engines — the
    # subtlest logic in the serve-through rebuild lives in ONE place.

    def _bg_dirty_rows(self, journal, fetch_rows, staged=None,
                       refetch=None):
        """Current rows of the journal's surviving "dirty" slots for
        the swap-time replay. Staged copies (pre-fetched off the lock)
        are assembled on DEVICE — only the unstaged remainder pays a
        fetch + upload while the write lock is held. ``refetch`` (the
        swap-time delta journal) forces a fresh fetch even for staged
        slots: a slot that mutated AFTER its staging round has a stale
        staged copy, and the last copy must win."""
        dirty = np.asarray(
            sorted(s for s, v in journal.items() if v == "dirty"),
            np.int64,
        )
        rows = None
        if len(dirty):
            cur_pos = self._positions_of(dirty)
            known = cur_pos >= 0
            dirty = dirty[known]
            cur_pos = cur_pos[known]
            if len(dirty):
                stage_of, staged_rows = staged if staged else ({}, None)
                rf = refetch if refetch is not None else ()
                hit = np.asarray(
                    [int(s) in stage_of and int(s) not in rf
                     for s in dirty], bool
                ) if staged_rows is not None else np.zeros(
                    len(dirty), bool
                )
                if staged_rows is not None and hit.any():
                    n_staged = int(staged_rows.shape[0])
                    sel = np.zeros(len(dirty), np.int32)
                    sel[hit] = [stage_of[int(s)] for s in dirty[hit]]
                    if (~hit).any():
                        fetched = np.asarray(
                            fetch_rows(cur_pos[~hit]), np.float32
                        )
                        pool = jnp.concatenate(
                            [staged_rows, jnp.asarray(fetched)], axis=0
                        )
                        sel[~hit] = n_staged + np.arange(
                            int((~hit).sum()), dtype=np.int32
                        )
                    else:
                        pool = staged_rows
                    rows = pool[jnp.asarray(sel)]
                else:
                    rows = np.asarray(fetch_rows(cur_pos), np.float32)
        return dirty, rows

    def _prepare_bg_swap(self, snap_slot_of, src, dest, merged, cap):
        """Pre-compute the post-swap slot maps OFF the write lock
        (VERDICT r3 ask #5: ``_install_built``'s O(cap) host fills and
        scatters — ~0.1 GB/s on a contended single-core host — were a
        lock-held stall at 10M rows). Journaled slots are dropped here;
        anything that mutates after this runs lands in the delta
        journal and is fixed up under the lock by
        :meth:`_bg_delta_fixup` (tiny). Returns
        ``(new_slot_of, new_pos_of, pre_dead)``."""
        slot_at_dest = snap_slot_of[src].copy()
        if merged:
            drop = np.fromiter(merged, np.int64, len(merged))
            hit = np.isin(slot_at_dest, drop)
            pre_dead = dest[hit]
            slot_at_dest[hit] = -1
        else:
            pre_dead = np.empty(0, np.int64)
        new_slot_of = np.full(cap, -1, np.int32)
        new_slot_of[dest] = slot_at_dest
        new_pos_of = np.full(cap, -1, np.int32)
        keep = slot_at_dest >= 0
        new_pos_of[slot_at_dest[keep]] = dest[keep].astype(np.int32)
        return new_slot_of, new_pos_of, pre_dead

    @staticmethod
    def _bg_delta_fixup(delta, new_slot_of, new_pos_of):
        """Null the pre-built maps' entries for slots that mutated
        after ``_prepare_bg_swap`` ran (write lock held; O(len(delta))).
        Returns the extra dest positions to invalidate in the new
        validity array."""
        extra_dead = []
        for s in delta:
            s = int(s)
            if s < len(new_pos_of):
                i = int(new_pos_of[s])
                if i >= 0:
                    new_slot_of[i] = -1
                    new_pos_of[s] = -1
                    extra_dead.append(i)
        return np.asarray(extra_dead, np.int64)

    def _prestage_bg_journal(self, fetch_rows, snap_gen,
                             rounds: int = 4, quiet: int = 8):
        """Iterative OFF-lock drain of the COW-window journal (the VM
        live-migration pattern): each round atomically swaps the live
        journal for a fresh one (brief write lock — a dict swap), then
        fetches the drained dirty slots' current rows with no lock
        held. Mutations landing during a fetch re-journal their slot,
        so a later round (or the swap-time delta) re-fetches it — the
        LAST copy always wins. Converges when a round drains at most
        ``quiet`` entries; whatever still lands after the final round
        is the swap-time delta, which is all the device traffic the
        write lock has to pay.

        Returns ``(merged_journal, (stage_of, staged_rows))`` where
        ``staged_rows`` is a device-resident row matrix (uploaded off
        the lock) and ``stage_of`` maps slot -> row index (later
        stagings override earlier ones)."""
        merged: dict[int, str] = {}
        slots_acc: list[int] = []
        rows_acc: list[np.ndarray] = []
        failed: set[int] = set()
        for _ in range(rounds):
            with self._mu.write():
                if (getattr(self, "_layout_gen", 0) != snap_gen
                        or not getattr(self, "_cow_writes", False)):
                    break  # window invalidated: the swap will abandon
                j = self._bg_journal
                if not j:
                    break
                self._bg_journal = {}
                dirty = np.asarray(
                    sorted(s for s, v in j.items() if v == "dirty"),
                    np.int64,
                )
                # positions read under the lock (consistent vs racing
                # mutators); a move AFTER this re-journals the slot, so
                # a later round or the swap-time delta re-fetches it
                pos = self._positions_of(dirty) if len(dirty) else None
            merged.update(j)
            if pos is not None:
                known = pos >= 0
                if known.any():
                    try:
                        rows = np.asarray(
                            fetch_rows(pos[known]), np.float32
                        )
                    except Exception:
                        # racing clear()/load()/remesh (or a transient
                        # device error) broke the off-lock gather —
                        # abandon staging. This round's journal is
                        # already merged, so its dirty slots must NOT
                        # resolve to an OLDER staged copy at swap time:
                        # drop them from the stage map (the swap then
                        # re-fetches them under the lock, or abandons on
                        # a dead generation)
                        failed.update(int(s) for s in dirty)
                        break
                    slots_acc.extend(int(s) for s in dirty[known])
                    rows_acc.append(rows)
            if len(j) <= quiet:
                break
        staged_rows = None
        if rows_acc:
            staged_rows = jax.device_put(
                jnp.asarray(np.concatenate(rows_acc, axis=0))
            )
            jax.block_until_ready(staged_rows)  # H2D paid off-lock
        stage_of = {
            s: i for i, s in enumerate(slots_acc) if s not in failed
        }
        return merged, (stage_of, staged_rows)

    def _replay_bg_dirty(self, dirty, rows):
        """Re-insert the journal's surviving mutated rows into the
        fresh region of the just-swapped layout, keeping their external
        slot ids (write lock held by the caller). ``rows`` may be a
        device array (the pre-staged path) — ``_scatter`` takes it
        without a host round trip."""
        pos = self._take_slots(len(dirty))
        self._scatter(pos, rows, True)
        self._slot_of[pos] = dirty.astype(np.int32)
        self._pos_of[dirty] = pos.astype(np.int32)
        self._residual.extend(int(p) for p in pos)


class ClusteredIVFIndex(ClusteredSlotMixin, IVFIndex):

    """IVF whose bucket layout lives *in* the slab (no side tables).

    Memory: corpus bytes + ~9 bytes/row of bookkeeping — vs the dense
    table's ~2.3x corpus. This is the index that fits 10M x 768 int8 on
    one 16 GB chip.
    """

    kind = "ivf_clustered"
    # clustered layout lives IN the flat slab (no side tables), so
    # slab-external checkpoints reconstruct via _slot_of + raw rows
    supports_slab_external = True

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        dtype: str = "float32",
        capacity: int = 1024,
        nlist: int = 100,
        nprobe: int = 8,
        train_threshold: int = 4096,
        rebuild_fraction: float = 0.2,
        kmeans_iters: int = 15,
        train_sample: int = 262_144,
    ):
        super().__init__(
            dim, metric=metric, dtype=dtype, capacity=capacity,
            nlist=nlist, nprobe=nprobe, train_threshold=train_threshold,
            rebuild_fraction=rebuild_fraction, kmeans_iters=kmeans_iters,
            train_sample=train_sample, assignments=1,
        )
        #: "auto" (Pallas block-scan kernel on TPU, lax scan elsewhere),
        #: "pallas" (force; interpret mode off-TPU), or "lax"
        self.ivf_kernel = "auto"
        #: scan-block DMA size; effective at the next build
        self.block_bytes_target = 786_432
        #: batches at/below this use the narrow-block (c/4) extents —
        #: the latency path; larger batches amortize wide blocks
        self.small_batch_threshold = 4
        #: small-batch program choice: "auto" scans the probed buckets'
        #: EXACT row ranges (dynamic slices — the dense-IVF program
        #: shape at zero memory duplication) when the probe footprint is
        #: small; "ranges"/"narrow" force; "wide" keeps serving blocks
        self.latency_path = "auto"
        #: when True, optimize() uses build_background() (serving keeps
        #: the old layout during the rebuild); config key
        #: IVF_BACKGROUND_REBUILD. Needs 2x-slab HBM headroom.
        self.background_rebuild = False

    def optimize(self, background: bool | None = None) -> None:
        """Rebuild the clustered layout. ``background`` forces the
        serve-through COW path on/off for THIS call only; ``None``
        defers to the configured ``background_rebuild``."""
        if self._size > 0:
            bg = self.background_rebuild if background is None else background
            if bg:
                self.build_background()
            else:
                self.build()

    # -- storage: position space + slot indirection -------------------------
    def _alloc(self, cap: int) -> None:
        super()._alloc(cap)
        self._slot_of = np.full(cap, -1, np.int32)  # pos -> slot
        self._pos_of = np.full(cap, -1, np.int32)  # slot -> pos
        self._free_slots: list[int] = []
        self._next_ext_slot = 0
        # Storage replaced wholesale (clear/load): make any in-flight
        # background rebuild abandon its now-stale snapshot at swap
        # time, and release its COW window HERE — otherwise a build()
        # issued right after clear/load hits _build_locked's in-flight
        # early-return and silently skips the rebuild.
        self._layout_gen = getattr(self, "_layout_gen", 0) + 1
        self._cow_writes = False
        self._bg_journal = {}

    def _grow(self, need: int) -> None:
        old_cap = self._cap
        slot_of, pos_of = self._slot_of, self._pos_of
        free_slots, next_ext = self._free_slots, self._next_ext_slot
        # FlatIndex._grow builds fresh slab/valid/scales directly (it does
        # not call _alloc), so pad the clustered bookkeeping by hand.
        super()._grow(need)
        so = np.full(self._cap, -1, np.int32)
        so[:old_cap] = slot_of
        self._slot_of = so
        po = np.full(self._cap, -1, np.int32)
        po[:old_cap] = pos_of
        self._pos_of = po
        self._free_slots = free_slots
        self._next_ext_slot = next_ext

    def _reset_overlay(self) -> None:
        self._centroids = None
        self._centroids_np = None
        self._bucket_start: np.ndarray | None = None  # (nlist+1,) int64
        self._blk_lo = None  # (nlist,) int32 device
        self._blk_hi = None
        self._m = 1  # max blocks per bucket (static, pow2)
        self._c = 1  # scan-block rows (set by _install_layout)
        self._u_prefix: np.ndarray | None = None  # sorted-desc blk counts cumsum
        self._nonempty = 0
        self._avg_blocks = 1.0
        self._residual: list[int] = []  # POSITIONS of unclustered rows
        self._residual_base = 0
        self._built_size = 0
        #: positions freed while trained INSIDE the clustered region,
        #: keyed by bucket: reusable only by rows that assign to the
        #: same bucket (so fresh rows never land in a foreign bucket's
        #: scanned blocks — the kernel path has no per-row bucket mask,
        #: see kernels/clustered_scan.py). Freed RESIDUAL-region
        #: positions (>= _fresh_base) recycle immediately via _free.
        self._quar: dict[int, list[int]] = {}
        self._quar_n = 0
        self._fresh_base = 0

    def _bucket_of_pos(self, pos: np.ndarray) -> np.ndarray:
        """Bucket whose extent covers each clustered-region position
        (positions are bucket-contiguous: start[b] <= pos < start[b+1]);
        -1 when the layout is unknown."""
        pos = np.asarray(pos, np.int64)
        if self._bucket_start is None:
            return np.full(len(pos), -1, np.int64)
        return np.searchsorted(self._bucket_start, pos, side="right") - 1

    # clear() is inherited: FlatIndex.clear re-allocs every array
    # (including the slot maps via _alloc), then IVFIndex.clear calls
    # this class's _reset_overlay.

    def compact(self):
        """Rebuilding IS compaction here (the permute packs live rows into
        [0, n_live)); external slots are stable, so the returned remap is
        the identity and the store's registry needs no rewrite."""
        with self._mu.write():
            if self.is_trained or self._size >= self.train_threshold:
                self._build_locked()
            else:
                self._compact_untrained_locked()
            live = np.nonzero(self._slot_of >= 0)[0]
            slots = np.sort(self._slot_of[live].astype(np.int64))
            return slots, slots

    def _compact_untrained_locked(self) -> None:
        """Pack live rows below the training threshold (no clustering)."""
        valid = np.asarray(self._valid)
        live_pos = np.nonzero(valid)[0]
        n = len(live_pos)
        if n and not (live_pos == np.arange(n)).all():
            rows = FlatIndex.get_vectors(self, live_pos)
            slot_of_live = self._slot_of[live_pos].copy()
            free_slots, next_ext = self._free_slots, self._next_ext_slot
            self._alloc(self._cap)  # resets mappings; slot state restored
            self._free_slots, self._next_ext_slot = free_slots, next_ext
            self._size = 0
            self._free = []
            self._next_slot = 0
            new_pos = FlatIndex.add_batch(self, rows)
            self._size = n
            self._slot_of[new_pos] = slot_of_live
            self._pos_of[:] = -1
            keep = slot_of_live >= 0
            self._pos_of[slot_of_live[keep]] = new_pos[keep].astype(np.int32)
        self._free = []
        self._next_slot = n

    # -- build: permute the slab into cluster order --------------------------
    def build(self) -> None:
        with self._mu.write():
            self._build_locked()

    def _build_locked(self) -> None:
        if getattr(self, "_cow_writes", False):
            # a background rebuild is in flight; it swaps in shortly —
            # a second (blocking) build here would clobber its snapshot
            return
        hwm = self._next_slot
        if self._size == 0 or hwm == 0:
            self._reset_overlay()
            return
        valid = np.asarray(self._valid[:hwm])
        live_pos = np.nonzero(valid)[0].astype(np.int64)
        centroids, assign = self._cluster_plan(
            self._slab, self._scales, live_pos
        )
        order = np.argsort(assign, kind="stable")
        src = live_pos[order]  # old position of the row landing at dest i
        counts = np.bincount(assign, minlength=len(centroids))
        new_slab, new_valid, new_scales = self._permute(
            self._slab, self._scales, src
        )
        self._install_built(
            src, counts, centroids, new_slab, new_valid, new_scales
        )

    def _cluster_plan(
        self, slab, scales, live_pos: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Train + assign the live rows of ``slab`` (device reads only,
        no index state touched — shared by the blocking and background
        builds). Returns ``(centroids, assign)``."""
        n_live = len(live_pos)
        if scales is None:
            scales = np.ones((1,), np.float32)

        @jax.jit
        def gather_rows(slab, scales, idx):
            rows = slab[idx]
            if self._is_int4:
                from wdbx_tpu.kernels.quant import unpack_int4

                rows = unpack_int4(rows)
            rows = rows.astype(jnp.float32)
            if self._is_quantized:
                rows = rows * scales[idx][:, None]
            if self.metric == "cosine":
                rows = rows / jnp.maximum(
                    jnp.linalg.norm(rows, axis=-1, keepdims=True), 1e-12
                )
            return rows

        nlist = min(self.nlist, n_live)
        sample = live_pos
        if n_live > self.train_sample:
            sel = np.random.default_rng(0).choice(
                n_live, self.train_sample, replace=False
            )
            sample = live_pos[np.sort(sel)]
        train = gather_rows(slab, scales, jnp.asarray(sample))
        centroids, _ = kmeans(
            train, num_clusters=nlist, iters=self.kmeans_iters
        )
        del train

        chunk = 131_072
        assign = np.empty(n_live, np.int32)
        for i in range(0, n_live, chunk):
            end = min(i + chunk, n_live)
            rows_chunk = gather_rows(
                slab, scales, jnp.asarray(live_pos[i:end])
            )
            assign[i:end] = np.asarray(_assign_blocked(rows_chunk, centroids))
            del rows_chunk
        return np.asarray(centroids), assign

    def _permute(self, slab, scales, src: np.ndarray, cap: int | None = None):
        """Chunked device permute of ``slab`` rows into cluster order.
        Peak HBM = old slab + new slab + one chunk (2x corpus transient;
        use build_from() for corpora above ~45% of HBM). Reads only its
        arguments — shared by the blocking and background builds."""
        cap = self._cap if cap is None else cap
        n_live = len(src)
        chunk = 131_072
        new_slab = jnp.zeros((cap, self._row_width), self._dtype)
        new_valid = jnp.zeros((cap,), jnp.bool_)
        new_scales = (
            jnp.zeros((cap,), jnp.float32) if self._is_quantized else None
        )
        # `start` stays a traced scalar: a static start would compile a
        # fresh donated-update program per chunk (77 compiles at 10M).
        copy_rows = jax.jit(
            lambda dst, src_slab, idx, start: jax.lax.dynamic_update_slice(
                dst, src_slab[idx], (start, 0)
            ),
            donate_argnums=(0,),
        )
        copy_scales = jax.jit(
            lambda dst, src_s, idx, start: jax.lax.dynamic_update_slice(
                dst, src_s[idx], (start,)
            ),
            donate_argnums=(0,),
        )
        for i in range(0, n_live, chunk):
            end = min(i + chunk, n_live)
            idx = jnp.asarray(src[i:end])
            start = jnp.int32(i)
            new_slab = copy_rows(new_slab, slab, idx, start)
            if self._is_quantized:
                new_scales = copy_scales(new_scales, scales, idx, start)
        if n_live:
            new_valid = new_valid.at[:n_live].set(True)
        return new_slab, new_valid, new_scales

    def _install_built(
        self, src, counts, centroids, new_slab, new_valid, new_scales,
        slot_src: np.ndarray | None = None,
        prebuilt: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> None:
        """Swap the permuted arrays in and rebuild mappings + overlay
        (the tail of a build; write lock held by the caller).
        ``slot_src`` overrides the slot-of-position map used to label
        dest rows — the background build passes its snapshot (current
        ``_slot_of`` may have drifted for rows it replays separately).
        ``prebuilt`` = (slot_of, pos_of) maps already computed OFF the
        lock by :meth:`_prepare_bg_swap` (+ delta fixup): the O(cap)
        fills/scatters below were a lock-held p99 stall at 10M rows."""
        n_live = len(src)
        self._slab = new_slab
        self._valid = new_valid
        if self._is_quantized:
            self._scales = new_scales

        if prebuilt is not None:
            self._slot_of, self._pos_of = prebuilt
        else:
            # slot mapping: dest i holds the row that lived at src[i]
            slot_at_dest = (
                self._slot_of if slot_src is None else slot_src
            )[src]
            self._slot_of[:] = -1
            self._slot_of[: n_live] = slot_at_dest
            self._pos_of[:] = -1
            keep = slot_at_dest >= 0
            self._pos_of[slot_at_dest[keep]] = np.arange(
                n_live, dtype=np.int32
            )[keep]

        self._install_layout(np.asarray(centroids), counts)
        # fresh adds start at the next block boundary: scanned blocks and
        # the residual buffer stay disjoint (kernel-path invariant)
        self._free = []
        self._quar = {}
        self._quar_n = 0
        self._next_slot = min(self._cap, -(-n_live // self._c) * self._c)
        self._fresh_base = self._next_slot
        self._residual = []
        self._residual_base = 0
        self._built_size = self._size

    def build_background(self) -> None:
        """Rebuild the cluster layout WITHOUT blocking searches (the
        reference's ``optimize`` is stop-the-world — reference
        wdbx/core/indexing.py:1124-1149; the blocking ``build`` here
        held the writer lock for 18-200+ s at 10M rows).

        Three phases: (1) brief write lock — snapshot array handles and
        flip mutators to copy-on-write so the snapshot buffers survive;
        (2) OFF-lock — train/assign/permute against the snapshot while
        searches (and mutations, at COW cost) proceed; (3) brief write
        lock — tombstone rows whose slots mutated during the build,
        swap the new layout in, and replay those mutations into the
        fresh region with their slot ids preserved.

        Peak HBM: 2x slab + one chunk, plus 1x more transiently per
        mutation batch during the window (COW) — use the blocking
        ``build()`` when that does not fit."""
        with self._mu.write():
            if getattr(self, "_cow_writes", False):
                return  # already rebuilding
            hwm = self._next_slot
            if self._size == 0 or hwm == 0:
                self._reset_overlay()
                return
            self._cow_writes = True
            self._bg_journal: dict[int, str] = {}
            snap_slab, snap_scales = self._slab, self._scales
            snap_valid = np.asarray(self._valid[:hwm])
            snap_slot_of = self._slot_of.copy()
            snap_cap = self._cap
            snap_gen = getattr(self, "_layout_gen", 0)
        done = False
        try:
            live_pos = np.nonzero(snap_valid)[0].astype(np.int64)
            centroids, assign = self._cluster_plan(
                snap_slab, snap_scales, live_pos
            )
            order = np.argsort(assign, kind="stable")
            src = live_pos[order]
            counts = np.bincount(assign, minlength=len(centroids))
            new_slab, new_valid, new_scales = self._permute(
                snap_slab, snap_scales, src, cap=snap_cap
            )
            # drain the window's journal OFF-lock (iterative pre-stage)
            # and pre-build the post-swap slot maps: the swap below then
            # pays device traffic + host map work only for the final
            # delta, not the whole window's mutations + O(cap) fills
            merged, staged = self._prestage_bg_journal(
                lambda p: FlatIndex.get_vectors(self, p), snap_gen
            )
            dest = np.arange(len(src), dtype=np.int64)
            new_slot_of, new_pos_of, pre_dead = self._prepare_bg_swap(
                snap_slot_of, src, dest, merged, snap_cap
            )
            done = True
        finally:
            if not done:
                with self._mu.write():
                    # release only OUR window — a clear()/load() that
                    # invalidated this build already closed it, and a
                    # new build may own the flag by now
                    if getattr(self, "_layout_gen", 0) == snap_gen:
                        self._cow_writes = False
        with self._mu.write():
            try:
                if getattr(self, "_layout_gen", 0) != snap_gen:
                    # clear()/load() replaced storage mid-build: the
                    # snapshot is from a dead generation — abandon it
                    # (the invalidation site already released the
                    # window; a new build may even own it by now)
                    return
                if self._cap != snap_cap:
                    # capacity grew mid-build: the permuted arrays no
                    # longer fit the live state — redo blocking (rare:
                    # needs an over-capacity ingest during the window)
                    self._cow_writes = False
                    self._build_locked()
                    return
                delta = self._bg_journal
                self._bg_journal = {}
                merged.update(delta)
                # the permute placed src[i] at new position i; the delta
                # (journaled after prepare) patches the prebuilt maps
                dirty, rows = self._bg_dirty_rows(
                    merged, lambda p: FlatIndex.get_vectors(self, p),
                    staged=staged, refetch=delta,
                )
                extra_dead = self._bg_delta_fixup(
                    delta, new_slot_of, new_pos_of
                )
                dead_dest = (
                    np.concatenate([pre_dead, extra_dead])
                    if len(extra_dead) else pre_dead
                )
                if len(dead_dest):
                    pad_n = _next_pow2(len(dead_dest))
                    pd = jnp.asarray(np.pad(
                        dead_dest, (0, pad_n - len(dead_dest)),
                        constant_values=snap_cap,  # OOB pad drops
                    ))
                    new_valid = new_valid.at[pd].set(False)
                self._cow_writes = False
                self._install_built(
                    src, counts, centroids, new_slab, new_valid,
                    new_scales, prebuilt=(new_slot_of, new_pos_of),
                )
                if rows is not None and len(dirty):
                    self._replay_bg_dirty(dirty, rows)
            finally:
                if getattr(self, "_layout_gen", 0) == snap_gen:
                    self._cow_writes = False

    def _install_layout(
        self, centroids: np.ndarray, counts: np.ndarray,
        c: int | None = None,
    ) -> None:
        """Set centroids/extents from bucket counts (rows are already
        laid out in cluster order in [0, sum(counts))). ``c`` must be
        the build-time block size when restoring persisted state —
        recomputing from the current capacity can change the geometry
        and move the fresh-row boundary inside a scanned block
        (duplicate candidates)."""
        nlist = len(counts)
        start = np.zeros(nlist + 1, np.int64)
        np.cumsum(counts, out=start[1:])
        if c is None:
            # row bytes via the STORAGE width (int4 packs two dims/byte)
            c = _block_rows(
                self._row_width, np.dtype(self._dtype).itemsize, self._cap,
                target=self.block_bytes_target,
            )
        def extents(cc: int) -> dict:
            lo = (start[:-1] // cc).astype(np.int32)
            hi = (-(-start[1:] // cc)).astype(np.int32)
            bn = hi - lo
            ne = counts > 0
            return dict(
                c=cc,
                m=_next_pow2(max(1, int(bn[ne].max()) if ne.any() else 1)),
                lo=jnp.asarray(lo),
                hi=jnp.asarray(hi),
                # worst-case distinct blocks for a batch: prefix sums of
                # the largest buckets' block counts (tightens the static
                # scan length far below B*P*m for realistic skews)
                u_prefix=np.cumsum(np.sort(bn[ne])[::-1]),
                nonempty=int(ne.sum()),
                avg_blocks=float(bn[ne].mean()) if ne.any() else 1.0,
            )

        main = extents(c)
        self._m = main["m"]
        self._c = c
        self._centroids = jnp.asarray(centroids)
        # host mirror for persistence: every caller passes a host array
        # here, and save() must not read the device copy back (~0.3 MB/s
        # D2H on tunnel-attached chips)
        self._centroids_np = np.asarray(centroids)
        self._bucket_start = start
        # exact per-bucket row ranges for the small-batch ranges path:
        # L is the static dynamic-slice length (max bucket rows, padded
        # to a lane-friendly multiple)
        cnt = (start[1:] - start[:-1]).astype(np.int32)
        self._row_lo = jnp.asarray(start[:-1].astype(np.int32))
        self._row_cnt = jnp.asarray(cnt)
        maxc = int(cnt.max()) if len(cnt) else 1
        # +512 margin: slice starts round down to a 512 boundary
        self._range_L = int(
            min(self._cap, -(-max(1, maxc) // 512) * 512 + 512)
        )
        self._blk_lo = main["lo"]
        self._blk_hi = main["hi"]
        self._u_prefix = main["u_prefix"]
        self._nonempty = main["nonempty"]
        self._avg_blocks = main["avg_blocks"]
        # Narrow-block geometry for the latency (small-batch) path:
        # B=1 queries need only the probed buckets' exact row ranges,
        # and c-wide covering blocks over-fetch ~2x; extents at c/4
        # track the ranges much tighter. Same slab, same invariants
        # (the fresh boundary is c-aligned, hence also c/4-aligned).
        c_s = max(256, c // 4)
        self._small = (
            extents(c_s)
            if c_s < c and self._cap % c_s == 0 else None
        )

    # -- streaming two-pass build --------------------------------------------
    def build_from(self, chunks_factory, *, train_chunks: int = 1):
        """Bulk-load a re-iterable chunk source straight into cluster
        order (the index must be empty). ``chunks_factory()`` returns an
        iterator of ``(n_i, dim)`` arrays (numpy or device); it is
        consumed twice — pass 1 trains centroids (on the first
        ``train_chunks`` chunks' worth of rows, up to ``train_sample``)
        and assigns every row, pass 2 writes rows to their final
        clustered positions. Peak HBM = final slab + one chunk, which is
        what fits 10M x 768 int8 on a single 16 GB chip.

        Returns ``(n_total,)`` slot ids in source order.
        """
        with self._mu.write():
            if self._size:
                raise ValueError("build_from requires an empty index")
            import time as _time
            _t0 = _time.perf_counter()

            @jax.jit
            def prep_rows(rows):
                rows = rows.astype(jnp.float32)
                if self.metric == "cosine":
                    rows = l2_normalize(rows)
                return rows

            # ---- pass 1: train + assign ----
            centroids = None
            assigns: list[np.ndarray] = []
            pending: list = []  # prepped chunks buffered until training
            pending_rows = 0
            total = 0
            timings = {"train": 0.0, "gen": 0.0, "assign": 0.0}

            def _train_and_flush():
                nonlocal centroids, pending
                tt = _time.perf_counter()
                train = jnp.concatenate(pending)[: self.train_sample] \
                    if len(pending) > 1 else pending[0][: self.train_sample]
                nlist = min(self.nlist, int(train.shape[0]))
                centroids, _ = kmeans(
                    train, num_clusters=nlist, iters=self.kmeans_iters
                )
                centroids.block_until_ready()
                timings["train"] += _time.perf_counter() - tt
                del train
                for p in pending:
                    assigns.append(np.asarray(_assign_blocked(p, centroids)))
                pending = []

            src = iter(chunks_factory())
            while True:
                tt = _time.perf_counter()
                raw = next(src, None)
                if raw is None:
                    break
                rows = prep_rows(jnp.asarray(raw) if not isinstance(
                    raw, jax.Array) else raw)
                rows.block_until_ready()
                timings["gen"] += _time.perf_counter() - tt
                total += rows.shape[0]
                tt = _time.perf_counter()
                if centroids is None:
                    pending.append(rows)
                    pending_rows += rows.shape[0]
                    if (len(pending) >= train_chunks
                            or pending_rows >= self.train_sample):
                        _train_and_flush()
                else:
                    assigns.append(np.asarray(_assign_blocked(rows, centroids)))
                timings["assign"] += _time.perf_counter() - tt
                del rows
            if centroids is None:  # source smaller than train_chunks
                if not pending:
                    return np.empty(0, np.int64)
                _train_and_flush()

            import logging

            _t1 = _time.perf_counter()
            assign = np.concatenate(assigns) if assigns else np.empty(0, np.int32)
            nlist = int(centroids.shape[0])
            counts = np.bincount(assign, minlength=nlist)
            start = np.zeros(nlist + 1, np.int64)
            np.cumsum(counts, out=start[1:])
            # dest position of every source row: bucket start + stable
            # within-bucket rank (one argsort over the corpus)
            order = np.argsort(assign, kind="stable")
            dest = np.empty(total, np.int64)
            dest[order] = np.arange(total)

            # ---- pass 2: scatter rows to final positions ----
            if self._cap < total:
                self._grow(total)
            elif self._round_cap(total) != self._cap:
                self._cap = self._round_cap(max(total, 1024))
                self._alloc(self._cap)

            row_off = 0
            for raw in chunks_factory():
                rows = prep_rows(jnp.asarray(raw) if not isinstance(
                    raw, jax.Array) else raw)
                n = rows.shape[0]
                d_idx = dest[row_off: row_off + n]
                pad_n = _next_pow2(max(n, 1))
                if pad_n != n:
                    rows = jnp.pad(rows, ((0, pad_n - n), (0, 0)))
                pslots = jnp.asarray(
                    np.pad(d_idx, (0, pad_n - n), constant_values=self._cap)
                )
                flags = jnp.asarray(
                    np.pad(np.ones(n, bool), (0, pad_n - n),
                           constant_values=False)
                )
                self._slab, self._valid = self._write_arrays(
                    rows, pslots, flags
                )
                row_off += n
                del rows

            self._size = total
            self._free = []
            self._free_slots = []
            self._quar = {}
            self._quar_n = 0
            # slots == positions for a fresh bulk load
            self._slot_of[:total] = np.arange(total, dtype=np.int32)
            self._pos_of[:total] = np.arange(total, dtype=np.int32)
            self._next_ext_slot = total
            self._install_layout(np.asarray(centroids), counts)
            # block-aligned fresh boundary (kernel-path invariant)
            self._next_slot = min(self._cap, -(-total // self._c) * self._c)
            self._fresh_base = self._next_slot
            self._residual = []
            self._residual_base = 0
            self._built_size = total
            logging.getLogger("wdbx_tpu.index").info(
                "build_from: %d rows, pass1 %.1fs (source %.1fs, train "
                "%.1fs, assign %.1fs), pass2(scatter) %.1fs", total,
                _t1 - _t0, timings["gen"], timings["train"],
                timings["assign"], _time.perf_counter() - _t1,
            )
            return dest.copy()  # dest == slot ids (identity mapping)

    # -- query ---------------------------------------------------------------
    def _search_read_locked(self, queries, k, slot_mask):
        if not self.is_trained:
            scores, pos = FlatIndex.search(self, queries, k, self._pos_mask(
                slot_mask))
            return self._map_pos_to_slots(scores, pos)
        queries = self._prep(queries)
        b = len(queries)
        pad_b = _next_pow2(max(b, 1))
        nlist = int(self._centroids.shape[0])
        nprobe = min(self.nprobe, nlist)
        pm, nprobe, use_exact = self._filter_plan(slot_mask, nprobe, nlist)
        # narrow-block geometry at small batch: covering blocks at the
        # serving width c over-fetch ~2x for one query's few probed
        # buckets; c/4 extents track the exact bucket row ranges much
        # tighter (latency regime — VERDICT r2 ask #5)
        geom = (
            self._small
            if pad_b <= self.small_batch_threshold
            and getattr(self, "latency_path", "auto") != "wide"
            and getattr(self, "_small", None) else None
        )
        c_eff = geom["c"] if geom else self._c
        m_eff = geom["m"] if geom else self._m
        blk_lo = geom["lo"] if geom else self._blk_lo
        blk_hi = geom["hi"] if geom else self._blk_hi
        u = self._scan_u(pad_b, nprobe, geom)
        size = self._size
        if use_exact or (
            self.batch_flat_fallback and (u * c_eff >= max(1, size))
        ):
            scores, pos = FlatIndex.search(self, queries, k, pm)
            return self._map_pos_to_slots(scores, pos)

        if isinstance(queries, jax.Array):
            q = jnp.pad(queries, ((0, pad_b - b), (0, 0)))
        else:
            q = np.pad(queries, ((0, pad_b - b), (0, 0)))

        valid = self._valid
        if pm is not None:
            # cached device AND (see FlatIndex._masked_valid_dev): pm
            # is itself cached per (mask, state), so repeat filtered
            # searches skip both the translation and the bitmap upload
            valid = self._masked_valid_dev(valid, pm, self._cap)

        residual = list(self._residual)
        r_n = len(residual)
        r_cap = _next_pow2(max(r_n, 1)) if r_n else 0
        residual_pos = np.pad(
            np.asarray(residual, np.int32), (0, r_cap - r_n),
            constant_values=self._cap,
        )
        scales = (
            self._scales if self._scales is not None
            else np.ones((1,), np.float32)  # unused placeholder (non-int8)
        )
        if self._use_ranges(pad_b, nprobe):
            scores, pos = _clustered_search_ranges(
                self._slab, valid, scales, self._centroids,
                self._row_lo, self._row_cnt,
                residual_pos, np.int32(r_n), q,
                k=k, nprobe=nprobe, L=self._range_L,
                precision=self._precision, int8=self._is_int8,
                normalize=self.metric == "cosine", int4=self._is_int4,
            )
        elif self._use_kernel(k):
            scores, pos = _clustered_search_kernelpath(
                self._slab, valid, scales,
                self._centroids, blk_lo, blk_hi,
                residual_pos, np.int32(r_n), q,
                k=k, nprobe=nprobe, u=u, m=m_eff, c=c_eff,
                precision=self._precision, int8=self._is_int8,
                normalize=self.metric == "cosine",
                interpret=jax.default_backend() != "tpu",
                int4=self._is_int4, kern=self._kernel_gen(),
                qprec=getattr(self, "kernel_qprec", "bf16"),
            )
        else:
            scores, pos = _clustered_search(
                self._slab, valid, scales,
                self._centroids, blk_lo,
                blk_hi, residual_pos, np.int32(r_n), q,
                k=k, nprobe=nprobe, u=u, m=m_eff, c=c_eff,
                precision=self._precision, int8=self._is_int8,
                normalize=self.metric == "cosine", int4=self._is_int4,
            )
        scores, pos = jax.device_get((scores[:b], pos[:b]))
        return self._map_pos_to_slots(
            np.asarray(scores), np.asarray(pos, np.int64)
        )

    # search() is inherited from IVFIndex (build-if-stale under the write
    # lock, then _search_read_locked under read).

    def search_pipelined(self, qstack, k, materialize: bool = True):
        """Serve a (NB, B, d) stack in one dispatch (see FlatIndex).

        ``materialize=False`` returns raw device arrays (scores,
        positions) without blocking, so a serving loop can keep several
        dispatches in flight — the ~30 ms host round trip and the
        query-stack H2D overlap device compute instead of serializing
        with it (the same double-buffered pattern that took the flat
        engine from ~62k to ~97k QPS). Resolve with
        ``resolve_pipelined`` BEFORE mutating the index (positions are
        mapped to slots at resolve time)."""
        if self._needs_build():
            with self._mu.write():
                self._maybe_build()
        with self._mu.read():
            if not self.is_trained:
                if not materialize:
                    return FlatIndex.search_pipelined(
                        self, qstack, k, materialize=False
                    )
                scores, pos = FlatIndex.search_pipelined(self, qstack, k)
                return self._map_pos_to_slots(scores, pos)
            qstack = _as_qstack(qstack)
            nb, b, _ = qstack.shape
            nlist = int(self._centroids.shape[0])
            nprobe = min(self.nprobe, nlist)
            # narrow-block extents for single/small-query stacks (the
            # latency-serving shape (NB, 1, d)) — same selection as
            # _search_read_locked
            geom = (
                self._small
                if b <= self.small_batch_threshold
                and getattr(self, "latency_path", "auto") != "wide"
                and getattr(self, "_small", None) else None
            )
            c_eff = geom["c"] if geom else self._c
            m_eff = geom["m"] if geom else self._m
            blk_lo = geom["lo"] if geom else self._blk_lo
            blk_hi = geom["hi"] if geom else self._blk_hi
            u = self._scan_u(b, nprobe, geom)
            residual = list(self._residual)
            r_n = len(residual)
            r_cap = _next_pow2(max(r_n, 1)) if r_n else 0
            residual_pos = np.pad(
                np.asarray(residual, np.int32), (0, r_cap - r_n),
                constant_values=self._cap,
            )
            scales = (
                self._scales if self._scales is not None
                else np.ones((1,), np.float32)
            )
            if self._use_ranges(b, nprobe):
                scores, pos = _clustered_ranges_pipelined(
                    self._slab, self._valid, scales, self._centroids,
                    self._row_lo, self._row_cnt,
                    residual_pos, np.int32(r_n), qstack,
                    k=k, nprobe=nprobe, L=self._range_L,
                    precision=self._precision, int8=self._is_int8,
                    normalize=self.metric == "cosine",
                    int4=self._is_int4,
                )
            elif self._use_kernel(k):
                scores, pos = _clustered_kernelpath_pipelined(
                    self._slab, self._valid, scales,
                    self._centroids, blk_lo, blk_hi,
                    residual_pos, np.int32(r_n), qstack,
                    k=k, nprobe=nprobe, u=u, m=m_eff, c=c_eff,
                    precision=self._precision, int8=self._is_int8,
                    normalize=self.metric == "cosine",
                    interpret=jax.default_backend() != "tpu",
                    int4=self._is_int4, kern=self._kernel_gen(),
                    qprec=getattr(self, "kernel_qprec", "bf16"),
                )
            else:
                scores, pos = _clustered_search_pipelined(
                    self._slab, self._valid, scales,
                    self._centroids, blk_lo,
                    blk_hi, residual_pos, np.int32(r_n), qstack,
                    k=k, nprobe=nprobe, u=u, m=m_eff, c=c_eff,
                    precision=self._precision, int8=self._is_int8,
                    normalize=self.metric == "cosine", int4=self._is_int4,
                )
            if not materialize:
                return scores, pos  # in-flight device arrays
            scores, pos = jax.device_get((scores, pos))
        # _map_pos_to_slots is elementwise: map the (NB, B, k) stack at once
        return self._map_pos_to_slots(
            np.asarray(scores), np.asarray(pos, np.int64)
        )

    def resolve_pipelined(self, handle):
        """Materialize a ``search_pipelined(..., materialize=False)``
        result: one transfer for both outputs, then the position->slot
        mapping (which is why this is an instance method here, unlike
        FlatIndex's static resolve)."""
        scores, pos = jax.device_get(handle)
        return self._map_pos_to_slots(
            np.asarray(scores), np.asarray(pos, np.int64)
        )

    def _oracle_search(self, queries, k):
        scores, pos = FlatIndex.search(self, queries, k)
        return self._map_pos_to_slots(scores, pos)

    def get_vectors(self, slots: np.ndarray) -> np.ndarray:
        return FlatIndex.get_vectors(self, self._positions_of(slots))

    # -- persistence ----------------------------------------------------------
    def _slots_for_positions(self, positions: np.ndarray) -> np.ndarray:
        return self._slot_of[np.asarray(positions, np.int64)]

    def _host_valid(self, hwm: int) -> np.ndarray:
        """Positions are live exactly where a slot label exists. The
        parent's freelist derivation over-claims here: a build rounds
        ``_next_slot`` up to a block boundary, and the padding
        positions are neither free nor quarantined."""
        return self._slot_of[:hwm] >= 0

    def save(self, path: str, skip_slab: bool = False) -> None:
        with self._mu.read():
            FlatIndex._save_locked(self, path, skip_slab=skip_slab)
            hwm = self._next_slot
            arrays = dict(
                slot_of=self._slot_of[:hwm],
                residual=np.asarray(self._residual, np.int32),
            )
            if self.is_trained:
                cnp = getattr(self, "_centroids_np", None)
                arrays["centroids"] = (
                    cnp if cnp is not None else np.asarray(self._centroids)
                )
                arrays["bucket_start"] = self._bucket_start
            np.savez(path + ".ivfc.npz", **arrays)
            with open(path + ".ivfc.json", "w") as f:
                json.dump(
                    {
                        "nlist": self.nlist,
                        "nprobe": self.nprobe,
                        "trained": self.is_trained,
                        "built_size": self._built_size,
                        "residual_base": self._residual_base,
                        "next_ext_slot": self._next_ext_slot,
                        "free_slots": self._free_slots,
                        "pos_quarantine": self._quar_flat(),
                        "block_rows": self._c,
                        "fresh_base": self._fresh_base,
                    },
                    f,
                )

    def load(self, path: str) -> bool:
        with self._mu.write():
            if not FlatIndex._load_locked(self, path):
                return False
            # _load_locked sets _cap/_place without _alloc: size the
            # clustered bookkeeping to the (possibly new) capacity
            self._slot_of = np.full(self._cap, -1, np.int32)
            self._pos_of = np.full(self._cap, -1, np.int32)
            self._free_slots = []
            self._next_ext_slot = 0
            self._reset_overlay()
            if not os.path.exists(path + ".ivfc.json"):
                return self._adopt_foreign_checkpoint(path)
            with open(path + ".ivfc.json") as f:
                meta = json.load(f)
            self.nlist = meta["nlist"]
            self.nprobe = meta["nprobe"]
            self._built_size = int(meta.get("built_size", 0))
            self._residual_base = int(meta.get("residual_base", 0))
            self._next_ext_slot = int(meta.get("next_ext_slot", 0))
            self._free_slots = [int(s) for s in meta.get("free_slots", [])]
            # legacy checkpoints (no fresh_base) default to the high-water
            # mark: conservatively quarantine everything below it rather
            # than risking recycled positions inside scanned blocks
            self._fresh_base = int(
                meta.get("fresh_base", self._next_slot)
            )
            data = np.load(path + ".ivfc.npz")
            hwm = self._next_slot
            slot_of = np.asarray(data["slot_of"], np.int32)
            # drop labels on DEAD rows: checkpoints written before r4
            # kept the moved-from label of updated slots, and mapping
            # those here (last assignment wins) pointed slots at their
            # dead old rows — see update_slots' stale-label note.
            # _loaded_valid_np is the host snapshot _load_locked kept —
            # round-tripping the device array here measured ~0.2 MB/s
            # on the tunneled chip.
            live = getattr(self, "_loaded_valid_np", None)
            if live is None or len(live) != hwm:
                live = np.asarray(self._valid[:hwm])
            slot_of = np.where(live, slot_of, -1)
            self._slot_of[:hwm] = slot_of
            keep = slot_of >= 0
            self._pos_of[slot_of[keep]] = np.arange(hwm, dtype=np.int32)[keep]
            self._residual = [int(p) for p in data["residual"]]
            if meta.get("trained") and "centroids" in data:
                centroids = np.asarray(data["centroids"])
                start = np.asarray(data["bucket_start"], np.int64)
                counts = np.diff(start)
                self._install_layout(
                    centroids, counts,
                    c=int(meta.get("block_rows", 0)) or None,
                )
            # after the layout install so holes re-key to their buckets
            # (bucket -1 = never recycled when the layout is absent)
            self._quarantine_positions(np.asarray(
                meta.get("pos_quarantine", []), np.int64
            ))
            return True

    def get_stats(self) -> dict:
        stats = FlatIndex.get_stats(self)
        stats.update(
            nlist=self.nlist,
            nprobe=self.nprobe,
            trained=self.is_trained,
            residual=len(self._residual),
            layout="clustered",
            # quarantined positions are tombstones awaiting recycling or
            # the next build — count them so store.optimize() triggers
            # compaction
            tombstones=len(self._free) + self._quar_len(),
        )
        return stats
