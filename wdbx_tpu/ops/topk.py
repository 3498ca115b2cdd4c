"""Top-k merge across shards / blocks.

The reference merges shard results on the host: concatenate every shard's
top-k, Python-sort by score, truncate (reference
wdbx/core/vector_store.py:384-389). Here the merge is a device op — a
concat + ``lax.top_k`` over the candidate axis — so it composes under
``jit`` and under ``shard_map`` (after an all-gather of per-shard
candidates over ICI).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def topk_merge(
    scores: jax.Array,
    ids: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge candidate sets into a single top-k.

    Args:
      scores: ``(B, C)`` candidate scores (e.g. ``C = n_shards * k``),
        with ``-inf`` padding for absent candidates.
      ids: ``(B, C)`` int32/int64 global identifiers aligned with scores.
      k: static output size.

    Returns:
      ``(top_scores, top_ids)`` of shape ``(B, k)``.
    """
    c = scores.shape[-1]
    k_eff = min(k, c)
    top_scores, pos = jax.lax.top_k(scores, k_eff)
    top_ids = jnp.take_along_axis(ids, pos, axis=-1)
    if k_eff < k:
        pad = k - k_eff
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
    return top_scores, top_ids
