"""Pallas IVF bucket-scan kernel with scalar-prefetched probe indices.

The lax.scan IVF path (index/ivf.py) issues one bucket DMA per step and
waits on it — ~0.3-0.45ms/step of DMA latency at 1M x 384, which
dominates single-query time. This kernel hands the probe list to
``PrefetchScalarGridSpec``: the grid's block index map reads the
prefetched probe ids, so Pallas pipelines bucket fetches with compute
(automatic double buffering, pallas_guide.md 'PrefetchScalarGridSpec')
— the next bucket streams in while the current one is scored.

Mosaic shape rules drive two quirks:
  * single-row 2D blocks like ``(1, cap_b)`` are illegal (second-to-last
    dim must be 8-divisible or full), so the validity mask ships as an
    8x-replicated ``(nlist, 8, cap_b)`` int8 table whose ``(1, 8,
    cap_b)`` blocks are legal, and per-step results accumulate in a
    full-size VMEM scratch emitted on the last step;
  * the kernel returns bucket-local *positions*; the caller encodes
    ``bucket * cap_b + pos`` and decodes to slab slots on the host
    (avoids shipping the slot table through the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.4e38


def _kernel(probes_ref, qidx_ref, rows_ref, valid8_ref, q_ref,
            outv_ref, outp_ref, acc_v, acc_p, *, k: int):
    i = pl.program_id(0)
    qi = qidx_ref[i]
    qrow = q_ref[pl.ds(qi, 1), :]  # (1, d)
    blk = rows_ref[0]  # (C, d)
    s = jax.lax.dot_general(
        qrow.astype(blk.dtype), blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    valid = valid8_ref[0][0:1, :]  # (1, C) row of the replicated mask
    s = jnp.where(valid != 0, s, NEG)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    k_pad = acc_v.shape[1]
    vals = jnp.full((1, k_pad), NEG, jnp.float32)
    poss = jnp.full((1, k_pad), 0, jnp.int32)
    for j in range(k):
        m = jnp.max(s, axis=-1)  # (1,)
        am = jnp.argmax(s, axis=-1).astype(jnp.int32)
        onehot = col == am[:, None]
        lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1) == j
        vals = jnp.where(lane, m[:, None], vals)
        poss = jnp.where(lane, am[:, None], poss)
        s = jnp.where(onehot, NEG, s)
    acc_v[pl.ds(i, 1), :] = vals
    acc_p[pl.ds(i, 1), :] = poss

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        outv_ref[:] = acc_v[:]
        outp_ref[:] = acc_p[:]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def ivf_bucket_scan(
    bucket_rows: jax.Array,   # (nlist, C, d)
    bucket_valid8: jax.Array,  # (nlist, 8, C) int8 (replicated mask)
    probes: jax.Array,        # (S,) int32 bucket ids (flattened B*P)
    qidx: jax.Array,          # (S,) int32 owning-query row for each probe
    q: jax.Array,             # (B, d)
    k: int = 10,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns per-probe ``(values, bucket-local positions)``, each
    ``(S, k)``.

    Contract: ``k <= 128`` (the selection loop masks one result lane per
    iteration and the lane-aligned result width is 128 — more would
    silently truncate), and ``bucket_rows`` must be a float table
    (f32/bf16): the query is cast to the table dtype for the MXU dot, so
    an int8 table would truncate unit-norm query values to 0 and return
    garbage scores. int8 code tables take the lax dedup scan
    (index/ivf.py ``use_pallas`` gate)."""
    nlist, c, d = bucket_rows.shape
    s_len = probes.shape[0]
    k_pad = 128  # lane-aligned result width; sliced to k on return
    if k > k_pad:
        raise ValueError(
            f"ivf_bucket_scan supports k <= {k_pad}, got {k} "
            "(route deeper fetches to the lax scan)"
        )
    if not jnp.issubdtype(bucket_rows.dtype, jnp.floating):
        raise TypeError(
            f"ivf_bucket_scan requires a float bucket table, got "
            f"{bucket_rows.dtype} (int8 tables must use the lax path)"
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # probes, qidx drive the index maps
        grid=(s_len,),
        in_specs=[
            pl.BlockSpec(
                (1, c, d), lambda i, probes, qidx: (probes[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, c), lambda i, probes, qidx: (probes[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q, whole batch
        ],
        out_specs=[
            pl.BlockSpec((s_len, k_pad), lambda i, probes, qidx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_len, k_pad), lambda i, probes, qidx: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_len, k_pad), jnp.float32),
            pltpu.VMEM((s_len, k_pad), jnp.int32),
        ],
    )
    out_v, out_p = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s_len, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((s_len, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * s_len * c * d,
            bytes_accessed=s_len * c * d * bucket_rows.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(probes, qidx, bucket_rows, bucket_valid8, q)
    return out_v[:, :k], out_p[:, :k]
