"""Pallas IVF bucket-scan kernel with scalar-prefetched probe indices.

The lax.scan IVF path (index/ivf.py) issues one bucket DMA per step and
waits on it — ~0.3-0.45ms/step of DMA latency at 1M x 384, which
dominates single-query time. This kernel hands the probe list to
``PrefetchScalarGridSpec``: the grid's block index map reads the
prefetched probe ids, so Pallas pipelines bucket fetches with compute
(automatic double buffering, pallas_guide.md 'PrefetchScalarGridSpec')
— the next bucket streams in while the current one is scored.

Each grid step scores one (query, bucket) pair on the MXU and selects a
per-bucket top-k with k VPU max/argmax/mask passes (no sort). The tiny
(B*P, k) results merge outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.4e38


def _kernel(probes_ref, qidx_ref, rows_ref, slot_ref, valid_ref, q_ref,
            outv_ref, outi_ref, *, k: int):
    i = pl.program_id(0)
    qi = qidx_ref[i]
    qrow = q_ref[pl.ds(qi, 1), :]  # (1, d)
    blk = rows_ref[0]  # (C, d)
    s = jax.lax.dot_general(
        qrow.astype(blk.dtype), blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    s = jnp.where(valid_ref[0][None, :] != 0, s, NEG)
    slots = slot_ref[0][None, :]  # (1, C)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    for j in range(k):
        m = jnp.max(s, axis=-1)  # (1,)
        am = jnp.argmax(s, axis=-1).astype(jnp.int32)
        onehot = col == am[:, None]
        picked = jnp.sum(jnp.where(onehot, slots, 0), axis=-1)
        outv_ref[0, j] = m[0]
        outi_ref[0, j] = picked[0]
        s = jnp.where(onehot, NEG, s)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def ivf_bucket_scan(
    bucket_rows: jax.Array,   # (nlist, C, d)
    bucket_slot: jax.Array,   # (nlist, C) int32
    bucket_valid: jax.Array,  # (nlist, C) bool
    probes: jax.Array,        # (S,) int32 bucket ids (flattened B*P)
    qidx: jax.Array,          # (S,) int32 owning-query row for each probe
    q: jax.Array,             # (B, d)
    k: int = 10,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns per-probe ``(values, slots)`` of shape ``(S, k)``."""
    nlist, c, d = bucket_rows.shape
    s_len = probes.shape[0]
    valid_i8 = bucket_valid.astype(jnp.int8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # probes, qidx drive the index maps
        grid=(s_len,),
        in_specs=[
            pl.BlockSpec(
                (1, c, d), lambda i, probes, qidx: (probes[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c), lambda i, probes, qidx: (probes[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c), lambda i, probes, qidx: (probes[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q, whole batch
        ],
        out_specs=[
            pl.BlockSpec((1, k), lambda i, probes, qidx: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, probes, qidx: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_v, out_i = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s_len, k), jnp.float32),
            jax.ShapeDtypeStruct((s_len, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * s_len * c * d,
            bytes_accessed=s_len * c * d * bucket_rows.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(probes, qidx, bucket_rows, bucket_slot, valid_i8, q)
    return out_v, out_i
