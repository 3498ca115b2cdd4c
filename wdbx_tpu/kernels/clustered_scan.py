"""Pallas scan over a scalar-prefetched block list of a clustered slab.

The serving kernel for ``ClusteredIVFIndex``: identical streaming shape
to ``kernels/fused_topk.py`` (score a tile on the MXU, fold into a
running per-query top-k in VMEM scratch — scores never touch HBM),
except the grid walks the batch's DEDUPED PROBED BLOCK LIST instead of
the whole slab: ``PrefetchScalarGridSpec`` hands the block ids to the
index maps, so Pallas pipelines the *gathered* block DMAs with compute
(pallas_guide.md 'PrefetchScalarGridSpec'). The XLA lax.scan equivalent
pays ~45-115us of fixed cost per step; this kernel pays DMA time.

``n_ways`` blocks are fetched per GRID STEP (separate prefetched input
refs, one concatenated matmul, one fold): the per-step fixed cost
(grid bookkeeping + the k-pass fold) measured ~11us at c=2048 — 4-5x
the 1.5 MB DMA — so amortizing it over 4 blocks is most of the
roofline gap. Non-contiguous per-way positions ride the fold's
``col_pos`` vector.

No bucket-membership mask: every valid row of a scanned block is a
candidate for every query in the batch. Extra candidates from buckets a
query did not probe can only improve recall (scores are true
similarities); the index layer guarantees no duplicates by keeping
fresh/updated rows strictly above the block-aligned clustered boundary
(see ClusteredIVFIndex mutation rules).

Deduplicated-away (or sentinel) entries in the block list carry ok=0
and are masked to -inf inside the kernel; the dedup pins them all to
one block id, so their DMAs collapse into (at most) one fetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wdbx_tpu.kernels.fused_topk import (
    NEG,
    _fold_topk,
    _fold_topk_pairs,
    _group_reduce,
    _pair_reduce,
)
from wdbx_tpu.kernels.quant import prep_query_block


def _kernel(uniq_ref, ok_ref, q_ref, *rest, k: int, c: int, group: int,
            n_ways: int, int8: bool):
    # rest layout: n_ways block refs, n_ways valid refs,
    #              [n_ways scale refs if int8], out_v, out_i, tv, ti
    blk_refs = rest[:n_ways]
    valid_refs = rest[n_ways:2 * n_ways]
    off = 2 * n_ways
    if int8:
        scale_refs = rest[off:off + n_ways]
        off += n_ways
    out_v_ref, out_i_ref, tv, ti = rest[off:off + 4]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        tv[:] = jnp.full_like(tv, NEG)
        ti[:] = jnp.full_like(ti, -1)

    # Per-way matmuls, then concat the small (B, c) f32 score tiles —
    # concatenating the ROW tiles first would copy 6-12 MB of VMEM per
    # step for no compute benefit.
    q = q_ref[:]
    way_scores = []
    for j in range(n_ways):
        rows = blk_refs[j][:]
        s = jax.lax.dot_general(
            q, rows.astype(q.dtype) if int8 else rows,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, c)
        if int8:
            s = s * scale_refs[j][:]
        way_scores.append(s)
    scores = (
        jnp.concatenate(way_scores, axis=1) if n_ways > 1 else way_scores[0]
    )
    # per-way validity (dedup ok is a scalar per way) and global
    # positions for the fold's non-contiguous columns
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    masks = []
    positions = []
    for j in range(n_ways):
        okj = ok_ref[n_ways * i + j]
        masks.append((valid_refs[j][:] != 0) & (okj != 0))  # (1, c)
        positions.append(col_iota + uniq_ref[n_ways * i + j] * c)
    mask = jnp.concatenate(masks, axis=1)  # (1, W*c)
    col_pos = jnp.concatenate(positions, axis=1)
    scores = jnp.where(mask, scores, NEG)
    _fold_topk(scores, 0, tv, ti, k, group=group, col_pos=col_pos)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        out_v_ref[:] = tv[:]
        out_i_ref[:] = ti[:]


def _kernel_v2(uniq_ref, ok_ref, meta_ref, q_ref, qs_ref, *rest, k: int,
               c: int, group: int, n_ways: int, int8: bool,
               int4: bool = False, qprec: str = "bf16"):
    """v2 step body: int8×int8 MXU matmul (quantized queries), per-way
    group-reduce before any concat (the v1 (B, W*c) concat copied 2M
    f32 per step), and full compute skip on dedup-padding steps (live
    entries sort first in the dedup's popularity priority, so padding
    is a suffix — ``meta[0]`` holds the live step count).

    ``qprec="bf16"`` keeps queries in bf16 against int8/int4 rows
    (v1's numerics inside v2's structure): query int8-quantization
    noise costs ~2 points of raw recall@10 at 10M×768 (0.972 vs
    0.991), and the scan is DMA-bound, so the int8×int8 MXU rate is
    not load-bearing."""
    # rest layout: n_ways block refs, n_ways valid refs,
    #              [n_ways scale refs if int8], out_v, out_i, tv, ti
    blk_refs = rest[:n_ways]
    valid_refs = rest[n_ways:2 * n_ways]
    off = 2 * n_ways
    if int8:
        scale_refs = rest[off:off + n_ways]
        off += n_ways
    out_v_ref, out_i_ref, tv, ti = rest[off:off + 4]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        tv[:] = jnp.full_like(tv, NEG)
        ti[:] = jnp.full_like(ti, -1)

    @pl.when(i < meta_ref[0])
    def _work():
        b = q_ref.shape[0]
        q = q_ref[:]
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        way_m, way_mi = [], []
        for j in range(n_ways):
            rows = blk_refs[j][:]
            if int4:
                from wdbx_tpu.kernels.quant import unpack_int4_kernel

                rows = unpack_int4_kernel(rows)
            if int8 and qprec != "int8":
                # bf16 queries (the default; the fallback arm must
                # mirror the wrapper's quantization choice exactly, or
                # an unrecognized qprec sends bf16 queries into the
                # int8 dot and fails Mosaic compilation)
                s = jax.lax.dot_general(
                    q, rows.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale_refs[j][:]
            elif int8:
                # int8×int8 → int32 rides the MXU at 2× the bf16 rate
                # and skips v1's 6M-element int8→bf16 cast per step;
                # per-query dequant (qs_ref) is constant per row, so it
                # applies once at emit — only the per-DB-row scale has
                # to touch the (B, c) tile here.
                s = jax.lax.dot_general(
                    q, rows,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * scale_refs[j][:]
            else:
                s = jax.lax.dot_general(
                    q, rows,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (B, c) f32
            okj = ok_ref[n_ways * i + j]
            mask = (valid_refs[j][:] != 0) & (okj != 0)  # (1, c)
            s = jnp.where(mask, s, NEG)
            pos = col_iota + uniq_ref[n_ways * i + j] * c
            if group and group < c:
                m, mi = _group_reduce(s, 0, group, col_pos=pos)
            else:
                m, mi = s, jnp.broadcast_to(pos, (b, c))
            way_m.append(m)
            way_mi.append(mi)
        m = jnp.concatenate(way_m, axis=1) if n_ways > 1 else way_m[0]
        mi = jnp.concatenate(way_mi, axis=1) if n_ways > 1 else way_mi[0]
        # second-stage interleaved reduce: (B, W*G) → (B, G) keeps the
        # k-pass fold width constant in n_ways (survivor stats match
        # v1, which reduced (B, W*c) → (B, G) in one pass)
        if group and m.shape[1] > group:
            m, mi = _pair_reduce(m, mi, group)
        _fold_topk_pairs(m, mi, tv, ti, k)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        if int8 and qprec == "int8":  # bf16 arm wrote true scores to tv
            # masked entries are exactly NEG: scaling them by a small
            # qscale would pull them above the caller's `v <= NEG`
            # -inf rewrite, so they pass through unscaled
            out_v_ref[:] = jnp.where(
                tv[:] <= NEG, tv[:], tv[:] * qs_ref[:]
            )
        else:
            out_v_ref[:] = tv[:]
        out_i_ref[:] = ti[:]


@functools.partial(
    jax.jit, static_argnames=("k", "c", "interpret", "group", "n_ways",
                              "int4", "qprec")
)
def clustered_block_topk_v2(
    slab: jax.Array,      # (cap, dw), cap % c == 0 (dw = d/2 for int4)
    valid_i8: jax.Array,  # (1, cap) int8
    scales: jax.Array | None,  # (1, cap) f32 for int8/int4, else None
    uniq: jax.Array,      # (u,) int32 block ids (deduped; dups ok=0)
    ok: jax.Array,        # (u,) int32 1=live block, 0=masked (suffix)
    q: jax.Array,         # (B, d) float — quantized here for int8/int4
    k: int,
    c: int,
    interpret: bool = False,
    group: int | None = None,
    n_ways: int = 8,
    int4: bool = False,
    qprec: str = "bf16",
) -> tuple[jax.Array, jax.Array]:
    """v2 of ``clustered_block_topk``: same contract, restructured step
    body (see ``_kernel_v2``). Queries arrive as floats; for int8/int4
    slabs ``qprec`` picks the query side of the MXU:

    - ``"bf16"`` (default): bf16 queries × int8 rows — v1's numerics,
      full raw recall (0.991+ at 10M×768). The scan is DMA-bound, so
      the cheaper matmul below costs no throughput.
    - ``"int8"``: symmetric per-query-row quantization (scale =
      max|q|/127), int8×int8→int32 at 2× the bf16 MXU rate — ~2 points
      of raw recall@10 at 10M×768 (0.972); recall-neutral through the
      store's f32 re-rank path. For compute-dense geometries.

    Batches under 32 rows pad to the int8 sublane tile internally
    (outputs slice back).
    ``int4=True`` marks ``slab`` as nibble-packed (uint8, half width);
    blocks unpack on the VPU before the matmul — half the DMA per row."""
    qprec = str(qprec).lower()
    cap, d = slab.shape
    u = uniq.shape[0]
    while n_ways > 1 and u % n_ways:
        n_ways //= 2
    if group is None:
        steps = u // max(1, n_ways)
        group = 256 if steps >= 16 and k <= 32 and c % 256 == 0 else 0
    int8 = scales is not None
    qq, qs, b_out = prep_query_block(q, slab.dtype, int8, qprec)
    b = qq.shape[0]
    # dedup's popularity priority sorts live entries first, so padding
    # is a suffix and steps past it skip all compute. Use the LAST live
    # index (not the live count) so interior ok=0 holes — shouldn't
    # happen, but robustness beats an assumption — can never cut off a
    # live entry.
    u_idx = jnp.arange(u, dtype=jnp.int32)
    nlive = jnp.max(jnp.where(ok > 0, u_idx + 1, 0))
    meta = ((nlive + n_ways - 1) // n_ways).reshape(1).astype(jnp.int32)

    way_specs = [
        pl.BlockSpec(
            (c, d),
            (lambda j: (
                lambda i, uniq, ok, meta: (uniq[n_ways * i + j], 0)
            ))(j),
            memory_space=pltpu.VMEM,
        )
        for j in range(n_ways)
    ]
    valid_specs = [
        pl.BlockSpec(
            (1, c),
            (lambda j: (
                lambda i, uniq, ok, meta: (0, uniq[n_ways * i + j])
            ))(j),
            memory_space=pltpu.VMEM,
        )
        for j in range(n_ways)
    ]
    in_specs = [
        pl.BlockSpec((b, qq.shape[1]), lambda i, uniq, ok, meta: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda i, uniq, ok, meta: (0, 0),
                     memory_space=pltpu.VMEM),
        *way_specs,
        *valid_specs,
    ]
    operands = [qq, qs] + [slab] * n_ways + [valid_i8] * n_ways
    if int8:
        in_specs.extend(
            pl.BlockSpec(
                (1, c),
                (lambda j: (
                    lambda i, uniq, ok, meta: (0, uniq[n_ways * i + j])
                ))(j),
                memory_space=pltpu.VMEM,
            )
            for j in range(n_ways)
        )
        operands.extend([scales] * n_ways)
        blk_bytes = c * d
    else:
        blk_bytes = c * d * slab.dtype.itemsize
    kern = functools.partial(
        _kernel_v2, k=k, c=c, group=group, n_ways=n_ways, int8=int8,
        int4=int4, qprec=qprec,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # uniq, ok, meta drive maps + step skip
        grid=(u // n_ways,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda i, uniq, ok, meta: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i, uniq, ok, meta: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
    )
    out_v, out_i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # d is the STORAGE width: int4 packs two dims per
            # byte, so real flops are doubled
            flops=2 * b * u * c * (d * (2 if int4 else 1)),
            bytes_accessed=u * blk_bytes + b * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(uniq, ok, meta, *operands)
    return out_v[:b_out], out_i[:b_out]


@functools.partial(
    jax.jit, static_argnames=("k", "c", "interpret", "group", "n_ways")
)
def clustered_block_topk(
    slab: jax.Array,      # (cap, d), cap % c == 0
    valid_i8: jax.Array,  # (1, cap) int8
    scales: jax.Array | None,  # (1, cap) f32 for int8 slabs, else None
    uniq: jax.Array,      # (u,) int32 block ids (deduped; dups ok=0)
    ok: jax.Array,        # (u,) int32 1=live block, 0=masked
    q: jax.Array,         # (B, d) — bf16/f32 to match slab scoring
    k: int,
    c: int,
    interpret: bool = False,
    group: int | None = None,
    n_ways: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Running top-k of ``q`` against the listed slab blocks. Returns
    ``(values, positions)`` each (B, k); positions are global slab row
    indices. Masked-out entries surface as ``NEG``/-1."""
    cap, d = slab.shape
    b = q.shape[0]
    u = uniq.shape[0]
    while n_ways > 1 and u % n_ways:
        n_ways //= 2
    if group is None:
        # Clustered corpora concentrate the true top-k in ONE tile, so
        # grouped-fold collisions cost ~C(k,2)/group of recall (measured
        # at 1M x 768: group=128 -> 0.975, group=256 -> 0.991 at the
        # SAME throughput, exact fold -> 1.000 at +40% time). 256 is the
        # free point; few-tile scans (latency path) fold exactly.
        steps = u // max(1, n_ways)
        group = 256 if steps >= 16 and k <= 32 and c % 256 == 0 else 0
    int8 = scales is not None

    way_specs = [
        pl.BlockSpec(
            (c, d),
            (lambda j: (lambda i, uniq, ok: (uniq[n_ways * i + j], 0)))(j),
            memory_space=pltpu.VMEM,
        )
        for j in range(n_ways)
    ]
    valid_specs = [
        pl.BlockSpec(
            (1, c),
            (lambda j: (lambda i, uniq, ok: (0, uniq[n_ways * i + j])))(j),
            memory_space=pltpu.VMEM,
        )
        for j in range(n_ways)
    ]
    in_specs = [
        pl.BlockSpec((b, d), lambda i, uniq, ok: (0, 0),
                     memory_space=pltpu.VMEM),
        *way_specs,
        *valid_specs,
    ]
    operands = [q] + [slab] * n_ways + [valid_i8] * n_ways
    if int8:
        in_specs.extend(
            pl.BlockSpec(
                (1, c),
                (lambda j: (lambda i, uniq, ok: (0, uniq[n_ways * i + j])))(
                    j
                ),
                memory_space=pltpu.VMEM,
            )
            for j in range(n_ways)
        )
        operands.extend([scales] * n_ways)
        blk_bytes = c * d
    else:
        blk_bytes = c * d * slab.dtype.itemsize
    kern = functools.partial(
        _kernel, k=k, c=c, group=group, n_ways=n_ways, int8=int8
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # uniq, ok drive the index maps
        grid=(u // n_ways,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda i, uniq, ok: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i, uniq, ok: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
    )
    out_v, out_i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * u * c * d,
            bytes_accessed=u * blk_bytes + b * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(uniq, ok, *operands)
    return out_v, out_i
