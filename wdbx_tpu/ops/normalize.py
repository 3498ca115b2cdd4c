"""L2 normalization.

Behavioral parity: the reference L2-normalizes vectors before FAISS
inner-product add/search so IP == cosine (reference
wdbx/core/indexing.py:851-856) and exposes a host-side helper
(reference wdbx/utils/data_utils.py:291-306). Here normalization is a
jitted device op so it fuses into the surrounding scoring program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("eps",))
def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize the last axis to unit L2 norm.

    Zero vectors are returned unchanged (norm clamped by ``eps``), matching
    the reference's guard against division by zero
    (reference wdbx/utils/data_utils.py:303-305).
    """
    x = x.astype(jnp.float32)
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, eps * eps))
    return x * inv
