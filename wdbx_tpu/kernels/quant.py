"""Int8 row quantization for HBM-resident embedding slabs.

This is the equal-memory story from BASELINE.json's 10Mx768 config: the
reference stores float32 and leans on FAISS for memory tricks; here the
slab is int8 with one float32 scale per row — 4x less HBM traffic per
query scan, which is the whole game for a bandwidth-bound scorer.

Symmetric per-row scheme: ``scale = max|x| / 127``, ``q = round(x /
scale)``. Scoring multiplies the int8 dot product back by the row scale
(queries stay in bf16/f32, so no query-side quantization error), and
f32 accumulation on the MXU keeps the reduction exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``(N, d) float -> (int8 values, (N,) float32 scales)``."""
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def dequantize_rows(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[:, None]


def int8_score(
    q_values: jax.Array,
    scales: jax.Array,
    queries: jax.Array,
    precision: str = "default",
) -> jax.Array:
    """``(B, N)`` scores against an int8 slab.

    The int8 rows are widened to bf16 in-register (HBM still only moves
    1 byte/element — the cast happens after the read, XLA fuses it into
    the matmul operand load); per-row scales fold in after the MXU pass.
    """
    s = jax.lax.dot_general(
        queries.astype(jnp.bfloat16),
        q_values.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return s * scales[None, :]
