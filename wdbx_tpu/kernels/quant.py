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


# -- int4 (packed pairs) ------------------------------------------------------
# Capacity scheme for slabs 2x past int8's reach (10M x 768 in ~3.9 GB,
# 20M x 768 on one 16 GB chip): two signed nibbles per byte with one
# f32 scale per row, scale = max|x| / 7. Raw int4 top-10 recall is ~0.75
# on unit-norm corpora (round-2 measurement) — serving pairs it with the
# store's exact re-rank over an over-fetched candidate set, which is
# the FAISS quantized-index role (reference wdbx/core/indexing.py:709-758).
#
# Packing layout: byte j of a row holds dim j in the LOW nibble and dim
# j + d/2 in the HIGH nibble (offset-8 codes). Unpacking is then a
# nibble split + one concat — no interleave — and dim order round-trips
# exactly. d must be even (embedding dims are).


@jax.jit
def quantize_rows_int4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``(N, d) float -> ((N, d//2) uint8 packed codes, (N,) scales)``."""
    x = x.astype(jnp.float32)
    n, d = x.shape
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(absmax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -7, 7) + 8.0  # [1, 15]
    q = q.astype(jnp.uint8)
    lo, hi = q[:, : d // 2], q[:, d // 2:]
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def unpack_int4(packed: jax.Array) -> jax.Array:
    """``(..., d//2) uint8 -> (..., d) int8`` codes in [-7, 7]."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-1)


def unpack_int4_kernel(rows: jax.Array) -> jax.Array:
    """In-kernel (Mosaic-safe) nibble unpack: the -8 bias runs in i32
    because Mosaic has no i8 vector subtract, then truncates back
    (codes stay in [-7, 7], no wrap). One implementation shared by the
    fused and clustered scan kernels so the packing layout (dim j low
    nibble, dim j + d/2 high) can never diverge between them."""
    r32 = rows.astype(jnp.int32)
    lo = ((r32 & 0xF) - 8).astype(jnp.int8)
    hi = (((r32 >> 4) & 0xF) - 8).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=1)


@jax.jit
def dequantize_rows_int4(packed: jax.Array, scale: jax.Array) -> jax.Array:
    return unpack_int4(packed).astype(jnp.float32) * scale[:, None]


def prep_query_block(
    q: jax.Array, slab_dtype, int8: bool, qprec: str,
) -> tuple[jax.Array, jax.Array, int]:
    """Shared query-side prep for the v2 clustered scan kernel:
    validates ``qprec``, picks the query representation for the MXU
    against an int8/int4 slab, and pads sub-32-row batches up to the
    int8 sublane tile. Returns ``(qq, qs, b_out)`` where ``b_out`` is
    the caller's true batch (outputs slice back to it).

    One implementation so the two kernel generations can never diverge
    numerically — the kernel A/B benchmarks compare them directly, and
    a quantization-floor tweak applied to one side only would corrupt
    the comparison silently.

    - ``qprec="bf16"`` (default): bf16 queries; ``qs`` is a zeros
      placeholder (no query dequant at emit).
    - ``qprec="int8"``: symmetric per-query-row quantization
      (scale = max|q|/127, 1e-20 floor), int8 codes + per-row scale.
    """
    qprec = str(qprec).lower()
    if qprec not in ("bf16", "int8"):
        raise ValueError(f"qprec must be 'bf16' or 'int8', got {qprec!r}")
    b = q.shape[0]
    if int8 and qprec == "int8":
        qf = q.astype(jnp.float32)
        qmax = jnp.maximum(
            jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-20
        )
        qs = (qmax / 127.0).astype(jnp.float32)  # (B, 1)
        qq = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    elif int8:
        qq = q.astype(jnp.bfloat16)
        qs = jnp.zeros((b, 1), jnp.float32)  # unused (no query dequant)
    else:
        qq = q.astype(slab_dtype)
        qs = jnp.zeros((b, 1), jnp.float32)  # unused
    b_out = b
    if int8 and b < 32:
        # int8 sublane tile is (32, 128): pad the query block up to 32
        # rows (the latency path serves B=1) and slice outputs after
        qq = jnp.pad(qq, ((0, 32 - b), (0, 0)))
        qs = jnp.pad(qs, ((0, 32 - b), (0, 0)), constant_values=1.0)
    return qq, qs, b_out
