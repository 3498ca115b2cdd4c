"""Pallas scan over a scalar-prefetched block list of a clustered slab.

The serving kernel for ``ClusteredIVFIndex``: identical streaming shape
to ``kernels/fused_topk.py`` (score a (c, d) tile on the MXU, fold into
a running per-query top-k in VMEM scratch — scores never touch HBM),
except the grid walks the batch's DEDUPED PROBED BLOCK LIST instead of
the whole slab: ``PrefetchScalarGridSpec`` hands the block ids to the
index maps, so Pallas pipelines the *gathered* block DMAs with compute
(pallas_guide.md 'PrefetchScalarGridSpec'). The XLA lax.scan equivalent
pays ~45-115us of fixed cost per step; this kernel pays DMA time.

No bucket-membership mask: every valid row of a scanned block is a
candidate for every query in the batch. Extra candidates from buckets a
query did not probe can only improve recall (scores are true
similarities); the index layer guarantees no duplicates by keeping
fresh/updated rows strictly above the block-aligned clustered boundary
(see ClusteredIVFIndex mutation rules).

Deduplicated-away (or sentinel) entries in the block list carry ok=0 and
are masked to -inf inside the kernel — their DMA is wasted but their
candidates never surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wdbx_tpu.kernels.fused_topk import NEG, _default_group, _fold_topk


def _kernel(uniq_ref, ok_ref, q_ref, blk_ref, valid_ref,
            out_v_ref, out_i_ref, tv, ti, *, k: int, c: int, group: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        tv[:] = jnp.full_like(tv, NEG)
        ti[:] = jnp.full_like(ti, -1)

    scores = jax.lax.dot_general(
        q_ref[:], blk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, c)
    ok = ok_ref[i]
    valid = valid_ref[:]  # (1, c) int8
    scores = jnp.where((valid != 0) & (ok != 0), scores, NEG)
    _fold_topk(scores, uniq_ref[i] * c, tv, ti, k, group=group)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        out_v_ref[:] = tv[:]
        out_i_ref[:] = ti[:]


def _kernel_int8(uniq_ref, ok_ref, q_ref, blk_ref, valid_ref, scales_ref,
                 out_v_ref, out_i_ref, tv, ti, *, k: int, c: int,
                 group: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        tv[:] = jnp.full_like(tv, NEG)
        ti[:] = jnp.full_like(ti, -1)

    scores = jax.lax.dot_general(
        q_ref[:], blk_ref[:].astype(q_ref.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, c)
    scores = scores * scales_ref[:]  # dequantize the score tile (VPU)
    ok = ok_ref[i]
    valid = valid_ref[:]
    scores = jnp.where((valid != 0) & (ok != 0), scores, NEG)
    _fold_topk(scores, uniq_ref[i] * c, tv, ti, k, group=group)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        out_v_ref[:] = tv[:]
        out_i_ref[:] = ti[:]


@functools.partial(
    jax.jit, static_argnames=("k", "c", "interpret", "group")
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
) -> tuple[jax.Array, jax.Array]:
    """Running top-k of ``q`` against the listed slab blocks. Returns
    ``(values, positions)`` each (B, k); positions are global slab row
    indices. Masked-out entries surface as ``NEG``/-1."""
    cap, d = slab.shape
    b = q.shape[0]
    u = uniq.shape[0]
    if group is None:
        group = _default_group(u * c, c, k)
    in_specs = [
        pl.BlockSpec((b, d), lambda i, uniq, ok: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, d), lambda i, uniq, ok: (uniq[i], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, uniq, ok: (0, uniq[i]),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q, slab, valid_i8]
    if scales is not None:
        kern = functools.partial(_kernel_int8, k=k, c=c, group=group)
        in_specs.append(
            pl.BlockSpec((1, c), lambda i, uniq, ok: (0, uniq[i]),
                         memory_space=pltpu.VMEM)
        )
        operands.append(scales)
        blk_bytes = c * d
    else:
        kern = functools.partial(_kernel, k=k, c=c, group=group)
        blk_bytes = c * d * slab.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # uniq, ok drive the index maps
        grid=(u,),
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
        ),
        interpret=interpret,
    )(uniq, ok, *operands)
    return out_v, out_i
