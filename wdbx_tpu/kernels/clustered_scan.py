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

from wdbx_tpu.kernels.fused_topk import NEG, _fold_topk


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
        group = 256 if steps >= 16 and k <= 32 else 0
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
