"""Exact (brute-force) similarity search: one MXU matmul + fused top-k.

This is the TPU replacement for the reference's per-query C++ calls into
hnswlib ``knn_query`` (reference wdbx/core/indexing.py:490) and FAISS
``index.search`` (reference wdbx/core/indexing.py:1013): all queries in a
batch are scored against the whole database slab with a single
``jnp.dot`` that XLA tiles onto the 128x128 systolic array, and top-k
selection happens on device without materializing host copies.

It doubles as the recall oracle for the ANN (IVF) index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


@partial(jax.jit, static_argnames=("k", "precision", "method", "normalize"))
def exact_search(
    db: jax.Array,
    queries: jax.Array,
    k: int,
    valid: jax.Array | None = None,
    precision: str = "highest",
    scales: jax.Array | None = None,
    method: str = "exact",
    normalize: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-k inner-product search of ``queries`` against ``db``.

    Args:
      db: ``(N, d)`` database slab. May be float32, bfloat16 or int8
        (int8 callers should pre-scale; see kernels/quant.py). For cosine
        similarity, rows must be pre-normalized (the store layer does this,
        mirroring reference wdbx/core/indexing.py:851-856).
      queries: ``(B, d)`` query batch, pre-normalized for cosine.
      k: static top-k.
      valid: optional ``(N,)`` bool mask; invalid slots (tombstones /
        unused capacity) score ``-inf`` and can never enter the top-k.
        This replaces the reference's zero-vector tombstones that leak
        into results (reference wdbx/core/indexing.py:525-560).

    Returns:
      ``(scores, indices)`` of shape ``(B, k)``; scores are float32,
      indices are int32 slot positions into ``db``. Slots masked invalid
      surface with score ``-inf`` (callers drop them host-side).

    ``precision`` controls the MXU pass count for float32 inputs:
    ``"highest"`` (true f32 via multi-pass, the exactness oracle) or
    ``"default"`` (single bf16 pass, ~6x faster — fine for ANN ranking).
    bfloat16/int8 slabs are unaffected.
    """
    if normalize:
        # folded in so callers spend one dispatch per query batch (a
        # separate normalize costs a full ~30ms tunnel round trip here)
        from wdbx_tpu.ops.normalize import l2_normalize

        queries = l2_normalize(queries)
    if db.dtype == jnp.int8:
        from wdbx_tpu.kernels.quant import int8_score

        scores = int8_score(db, scales, queries, precision=precision)
    else:
        scores = score_block(db, queries, precision=precision)
    if valid is not None:
        scores = jnp.where(valid[None, :], scores, NEG_INF)
    k_eff = min(k, db.shape[0])
    if method == "approx":
        # TPU-optimized approximate top-k (hardware bitonic reduce):
        # ~4x faster than the sort-based exact lowering at N ~ 1M, with
        # a configurable recall target. The right default for serving.
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, k_eff, recall_target=0.98
        )
    else:
        top_scores, top_idx = jax.lax.top_k(scores, k_eff)
    if k_eff < k:
        pad = k - k_eff
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_idx = jnp.pad(top_idx, ((0, 0), (0, pad)), constant_values=-1)
    return top_scores, top_idx.astype(jnp.int32)


def score_block(
    db: jax.Array, queries: jax.Array, precision: str = "highest"
) -> jax.Array:
    """``(B, N)`` inner products with float32 accumulation on the MXU."""
    if db.dtype != queries.dtype and jnp.issubdtype(db.dtype, jnp.floating):
        # Match the slab dtype (e.g. bf16) so the MXU runs a native pass;
        # int8 slabs keep float queries (mixed int8 x f32 is handled by
        # the quantized path in kernels/quant.py).
        queries = queries.astype(db.dtype)
    return jax.lax.dot_general(
        queries,
        db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
