"""Flat (exact) device index: one HBM slab, one matmul, recall 1.0.

This is the TPU answer to both the reference's numpy brute-force path and
``IndexFlatIP`` (reference wdbx/core/indexing.py:715-725): the whole
database lives in device HBM as a fixed-capacity slab, queries are scored
in a single MXU matmul with fused top-k, and mutation is a batched
scatter instead of per-vector C++ inserts (the hot loop at reference
wdbx/core/indexing.py:378).

Mutability vs XLA static shapes:
  * capacity slabs — the slab is a power-of-two capacity plus one trash
    row; adds scatter into free slots, growth doubles capacity (a new
    compile per doubling, amortized O(log N) compiles over a DB's life);
  * tombstone mask — deletes flip a validity bit; dead slots score -inf
    and are recycled by later adds;
  * bucketed batching — add/query batches pad to the next power of two so
    the number of traced shapes stays logarithmic.
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wdbx_tpu.index.base import VectorIndex
from wdbx_tpu.ops.exact_search import exact_search
from wdbx_tpu.ops.normalize import l2_normalize

#: name -> STORAGE dtype. "int4" stores two signed nibbles per uint8
#: byte (kernels/quant.py packing) with a per-row f32 scale — the
#: capacity tier past int8 (10M x 768 in ~3.9 GB slab).
_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "int8": jnp.int8,
    "int4": jnp.uint8,
}


def _as_qstack(qstack):
    """Host query-stack ingestion for the pipelined serving paths.
    Half-precision numpy stacks (float16 / ml_dtypes.bfloat16) are
    preserved instead of upcast — HALF the H2D bytes per dispatch,
    which is the serving wall on network/tunnel-attached devices
    (measured 3× QPS from eliminating the f32 upload at 10M×768).
    Rankings are unaffected: the per-query normalize / quantization
    scale is a positive per-row scalar. Everything else uploads f32."""
    if isinstance(qstack, jax.Array):
        return qstack
    a = np.asarray(qstack)
    if a.dtype == np.float16 or a.dtype.name == "bfloat16":
        return a
    return np.asarray(a, np.float32)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _fused_block_for(itemsize: int, dim: int, rows: int) -> int:
    """Budgeted fused-kernel tile (see FlatIndex._fused_block): largest
    block whose double-buffered db tile fits scoped VMEM and divides
    ``rows``."""
    budget = 15_000_000
    for block in (8192, 4096, 2048, 1024, 512, 256):
        if block > rows or rows % block:
            continue
        if 2 * block * dim * itemsize <= budget:
            return block
    return min(256, rows)


def _write_body(slab, valid, vecs, slots, flags):
    slab = slab.at[slots].set(vecs.astype(slab.dtype))
    valid = valid.at[slots].set(flags)
    return slab, valid


def _write_quantized_body(slab, valid, scales, vecs, slots, flags):
    from wdbx_tpu.kernels.quant import quantize_rows

    q, s = quantize_rows(vecs)
    slab = slab.at[slots].set(q)
    scales = scales.at[slots].set(s)
    valid = valid.at[slots].set(flags)
    return slab, valid, scales


def _tombstone_body(valid, slots):
    return valid.at[slots].set(False)


def _write_quantized4_body(slab, valid, scales, vecs, slots, flags):
    from wdbx_tpu.kernels.quant import quantize_rows_int4

    q, s = quantize_rows_int4(vecs)
    slab = slab.at[slots].set(q)
    scales = scales.at[slots].set(s)
    valid = valid.at[slots].set(flags)
    return slab, valid, scales


def _requant_body(slab, valid, scales, q, row_scales, slots, flags,
                  normalize):
    """Slab-restore write: dequantize int8 raw codes ON DEVICE (host
    dequant allocated GBs of f32 temporaries and quadrupled H2D)."""
    from wdbx_tpu.ops.normalize import l2_normalize as _l2n

    rows = q.astype(jnp.float32) * row_scales[:, None]
    if normalize:
        rows = _l2n(rows)
    return _write_quantized_body(slab, valid, scales, rows, slots, flags)


def _requant4_body(slab, valid, scales, q, row_scales, slots, flags,
                   normalize):
    from wdbx_tpu.ops.normalize import l2_normalize as _l2n

    rows = q.astype(jnp.float32) * row_scales[:, None]
    if normalize:
        rows = _l2n(rows)
    return _write_quantized4_body(slab, valid, scales, rows, slots, flags)


@partial(jax.jit, static_argnames=("new_cap",))
def _grow_copy(old, new_cap):
    """Copy-grow with the minimal HBM peak (old + new only): the zero
    extension fuses into the output allocation instead of existing as a
    separate full-size argument."""
    out = jnp.zeros((new_cap,) + old.shape[1:], old.dtype)
    return jax.lax.dynamic_update_slice(out, old, (0,) * old.ndim)


_write = jax.jit(_write_body, donate_argnums=(0, 1))
_write_quantized = jax.jit(_write_quantized_body, donate_argnums=(0, 1, 2))
_write_quantized4 = jax.jit(_write_quantized4_body, donate_argnums=(0, 1, 2))
_requant = jax.jit(_requant_body, donate_argnums=(0, 1, 2),
                   static_argnames=("normalize",))
_requant4 = jax.jit(_requant4_body, donate_argnums=(0, 1, 2),
                    static_argnames=("normalize",))
_tombstone = jax.jit(_tombstone_body, donate_argnums=(0,))
# Copy-on-write twins: a background rebuild holds references to the
# current arrays as its read snapshot, so mutations in that window must
# NOT donate them (the snapshot buffer would be destroyed mid-build).
# Cost: one HBM-to-HBM copy of the touched array per mutation batch.
_write_cow = jax.jit(_write_body)
_write_quantized_cow = jax.jit(_write_quantized_body)
_write_quantized4_cow = jax.jit(_write_quantized4_body)
_tombstone_cow = jax.jit(_tombstone_body)


@jax.jit
def _unpack4(slab):
    from wdbx_tpu.kernels.quant import unpack_int4

    return unpack_int4(slab)


@partial(jax.jit, static_argnames=("k", "precision"))
def _exact_pipelined(slab, qstack, valid, scales, k, precision):
    """lax.scan of exact_search over a (NB, B, d) query stack — the
    non-Pallas pipelined path (CPU mesh tests, f32 oracles)."""

    def step(carry, q):
        s, i = exact_search(
            slab, q, k=k, valid=valid, precision=precision,
            scales=scales, method="exact", normalize=False,
        )
        return carry, (s, i)

    _, (scores, idx) = jax.lax.scan(step, 0, qstack)
    return scores, idx


class FlatIndex(VectorIndex):
    kind = "flat"

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        dtype: str = "float32",
        capacity: int = 1024,
        topk_method: str = "auto",
    ):
        super().__init__(dim, metric)
        if dtype not in _DTYPES:
            raise ValueError(f"unsupported slab dtype: {dtype}")
        if dtype == "int4" and dim % 2:
            raise ValueError("int4 slabs need an even dimension "
                             "(two dims pack per byte)")
        if topk_method not in ("auto", "exact", "approx", "fused"):
            raise ValueError(f"unsupported topk method: {topk_method}")
        #: "auto" resolves per search: the fused Pallas kernel on TPU
        #: (no HBM score matrix — the roofline path; the grouped fold is
        #: mildly approximate at 64+ tiles, measured recall@10 ~0.994 at
        #: 1M rows — set topk_method="exact" for the exact oracle), the
        #: XLA exact path elsewhere (Mosaic interpret mode is debug-only).
        self.topk_method = topk_method
        #: "npz" (host gather, portable) or "orbax" (sharded device I/O)
        self.persist_backend = "npz"
        self.dtype_name = dtype
        self._dtype = _DTYPES[dtype]
        self._precision = "highest" if dtype == "float32" else "default"
        self._cap = self._round_cap(capacity)
        #: the configured INDEX_CAPACITY floor: load() must not shrink
        #: below it, or a resumed bulk ingest re-enters the incremental
        #: copy-grows the presize exists to avoid (HBM holds old+new
        #: slabs during a grow)
        self._declared_cap = self._cap
        self._scales = None  # (cap,) f32 per-row scales; int8 slabs only
        self._alloc(self._cap)
        self._size = 0
        self._free: list[int] = []
        self._next_slot = 0

    # -- storage ----------------------------------------------------------
    # Padded scatter lanes target slot == capacity, which is out of
    # bounds: JAX scatters DROP out-of-bounds updates, so padding is free.
    _CAP_CHUNK = 1 << 20

    def _round_cap(self, need: int) -> int:
        """Power-of-two below 1M rows; 1M-row granularity above (a pow2
        cap for a 10M corpus would waste 6.7M rows of HBM). Growth calls
        request 1.5x so recompiles stay amortized."""
        if need <= self._CAP_CHUNK:
            return _next_pow2(need)
        return -(-need // self._CAP_CHUNK) * self._CAP_CHUNK

    @property
    def _is_int8(self) -> bool:
        return self._dtype == jnp.int8

    @property
    def _is_int4(self) -> bool:
        return self.dtype_name == "int4"

    @property
    def _is_quantized(self) -> bool:
        return self._is_int8 or self._is_int4

    @property
    def _row_width(self) -> int:
        """Storage columns per row (int4 packs two dims per byte)."""
        return self.dim // 2 if self._is_int4 else self.dim

    def _alloc(self, cap: int) -> None:
        self._slab = jnp.zeros((cap, self._row_width), self._dtype)
        self._valid = jnp.zeros((cap,), jnp.bool_)
        if self._is_quantized:
            self._scales = jnp.zeros((cap,), jnp.float32)

    def _grow(self, need: int) -> None:
        # HBM peak during a copy-grow is old + new slab: jitted
        # zeros+dynamic_update_slice fuses the zero-fill into the output
        # allocation. (The eager ``zeros().at[:cap].set(old)`` this
        # replaces materialized the zeros as a 3rd full-size buffer PLUS
        # a scatter temp — 21 GB for a 6->9 GB grow, OOM on a 16 GB
        # chip.) Past half of HBM even old+new cannot fit; bulk loads at
        # that scale should presize via INDEX_CAPACITY (the reference
        # declares capacity the same way, HNSW_MAX_ELEMENTS —
        # reference wdbx/core/indexing.py:245).
        new_cap = self._round_cap(max(need, int(self._cap * 1.5)))
        self._slab = _grow_copy(self._slab, new_cap)
        self._valid = _grow_copy(self._valid, new_cap)
        if self._is_quantized:
            self._scales = _grow_copy(self._scales, new_cap)
        self._cap = new_cap

    def _take_slots(self, n: int) -> np.ndarray:
        slots = []
        while self._free and len(slots) < n:
            slots.append(self._free.pop())
        fresh = n - len(slots)
        if fresh:
            if self._next_slot + fresh > self._cap:
                self._grow(self._next_slot + fresh)
            slots.extend(range(self._next_slot, self._next_slot + fresh))
            self._next_slot += fresh
        return np.asarray(slots, np.int64)

    def _prep(self, vectors) -> np.ndarray:
        if isinstance(vectors, jax.Array):
            # Device arrays stay on device — no host round trip for
            # ingest pipelines that generate/embed on the TPU.
            if vectors.ndim == 1:
                vectors = vectors[None, :]
        else:
            vectors = np.asarray(vectors, np.float32)
            if vectors.ndim == 1:
                vectors = vectors[None, :]
        if vectors.shape[-1] != self.dim:
            raise ValueError(
                f"vector dimension {vectors.shape[-1]} != index dimension {self.dim}"
            )
        return vectors

    def _scatter(self, slots: np.ndarray, vectors: np.ndarray, flag: bool) -> None:
        n = len(slots)
        pad_n = _next_pow2(max(n, 1))
        # quantized slabs quantize inside the write kernel; keep floats
        # until then.
        staging = jnp.float32 if self._is_quantized else self._dtype
        if pad_n != n:  # avoid a full copy when already aligned
            pad_fn = jnp.pad if isinstance(vectors, jax.Array) else np.pad
            vectors = pad_fn(vectors, ((0, pad_n - n), (0, 0)))
        vecs = jnp.asarray(vectors, staging)
        if self.metric == "cosine":
            vecs = l2_normalize(vecs).astype(staging)
        pslots = jnp.asarray(
            np.pad(slots, (0, pad_n - n), constant_values=self._cap)
        )
        flags = jnp.asarray(
            np.pad(np.full(n, flag), (0, pad_n - n), constant_values=False)
        )
        self._slab, self._valid = self._write_arrays(vecs, pslots, flags)

    def _write_arrays(self, vecs, pslots, flags):
        cow = getattr(self, "_cow_writes", False)
        if self._is_int4:
            wq = _write_quantized4_cow if cow else _write_quantized4
            slab, valid, self._scales = wq(
                self._slab, self._valid, self._scales, vecs, pslots, flags
            )
            return slab, valid
        if self._is_int8:
            wq = _write_quantized_cow if cow else _write_quantized
            slab, valid, self._scales = wq(
                self._slab, self._valid, self._scales, vecs, pslots, flags
            )
            return slab, valid
        w = _write_cow if cow else _write
        return w(self._slab, self._valid, vecs, pslots, flags)

    def _tombstone_arrays(self, pslots):
        t = _tombstone_cow if getattr(self, "_cow_writes", False) else _tombstone
        return t(self._valid, pslots)

    def _abstract_arrays(self) -> dict:
        """Restore targets for the orbax backend (subclasses attach
        shardings)."""
        out = {
            "slab": jax.ShapeDtypeStruct(
                (self._cap, self._row_width), self._dtype
            ),
            "valid": jax.ShapeDtypeStruct((self._cap,), jnp.bool_),
        }
        if self._is_quantized:
            out["scales"] = jax.ShapeDtypeStruct((self._cap,), jnp.float32)
        return out

    def _place(
        self,
        slab_np: np.ndarray,
        valid_np: np.ndarray,
        scales_np: np.ndarray | None = None,
    ) -> None:
        self._slab = jnp.asarray(slab_np, self._dtype)
        self._valid = jnp.asarray(valid_np)
        if scales_np is not None:
            self._scales = jnp.asarray(scales_np)

    # -- VectorIndex ------------------------------------------------------
    def add_batch(self, vectors: np.ndarray) -> np.ndarray:
        with self._mu.write():
            vectors = self._prep(vectors)
            slots = self._take_slots(len(vectors))
            self._scatter(slots, vectors, True)
            self._size += len(vectors)
            return slots

    def update_slots(self, slots: np.ndarray, vectors: np.ndarray) -> None:
        with self._mu.write():
            vectors = self._prep(vectors)
            self._scatter(np.asarray(slots, np.int64), vectors, True)

    def remove_slots(self, slots: np.ndarray) -> None:
        slots = np.asarray(slots, np.int64)
        if len(slots) == 0:
            return
        with self._mu.write():
            pad_n = _next_pow2(len(slots))
            pslots = jnp.asarray(
                np.pad(slots, (0, pad_n - len(slots)), constant_values=self._cap)
            )
            self._valid = self._tombstone_arrays(pslots)
            self._size -= len(slots)
            self._free.extend(int(s) for s in slots)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        slot_mask: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = self._prep(queries)
        b = len(queries)
        pad_b = _next_pow2(max(b, 1))
        if isinstance(queries, jax.Array):
            q = jnp.pad(queries, ((0, pad_b - b), (0, 0)))
        else:
            # Stay numpy: the transfer rides the jit dispatch (an explicit
            # jnp.asarray is a separate blocking round trip).
            q = np.pad(queries, ((0, pad_b - b), (0, 0)))
        normalize = self.metric == "cosine"
        # Read lock held through materialization: mutators donate the old
        # slab buffer to XLA, which would invalidate it under an
        # in-flight search. Concurrent searches share the read side.
        with self._mu.read():
            slab, valid, scales, cap = (
                self._slab, self._valid, self._scales, self._cap,
            )
            if slot_mask is not None:
                valid = self._masked_valid_dev(valid, slot_mask, cap)
            method = self._resolve_topk()
            if self._is_int4 and method != "fused":
                # exact/XLA fallback: unpack to int8 codes on device
                # (the fused kernel unpacks per TILE instead — a
                # whole-slab copy cannot exist at the capacity tier)
                slab = _unpack4(slab)
            if method == "fused":
                from wdbx_tpu.kernels.fused_topk import fused_topk_search

                scores, idx = fused_topk_search(
                    slab, q, valid, k=min(k, cap),
                    block_n=self._fused_block(len(q)),
                    interpret=jax.default_backend() != "tpu",  # Mosaic: TPU-only
                    scales=scales if self._is_quantized else None,
                    normalize=normalize,  # folded into the one dispatch
                    int4=self._is_int4,
                )
                if scores.shape[1] < k:
                    pad = k - scores.shape[1]
                    scores = jnp.pad(scores, ((0, 0), (0, pad)),
                                     constant_values=-jnp.inf)
                    idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
            else:
                scores, idx = exact_search(
                    slab, q, k=k, valid=valid, precision=self._precision,
                    scales=scales, method=method,
                    normalize=normalize,
                )
            # one transfer for both outputs (two np.asarray calls are two
            # blocking round trips through the tunnel)
            scores, idx = jax.device_get((scores[:b], idx[:b]))
            scores = np.asarray(scores)
            slots = np.asarray(idx, np.int64)
        slots[scores == -np.inf] = -1
        return scores, slots

    def _resolve_topk(self) -> str:
        if self.topk_method != "auto":
            return self.topk_method
        return "fused" if jax.default_backend() == "tpu" else "exact"

    def _fused_block(self, b: int) -> int:
        """Largest kernel tile fitting the 16MB scoped-VMEM limit.

        Measured scoped usage is dominated by the DOUBLE-BUFFERED db
        tile (2 * block * dim * itemsize): 8192x384 bf16 (12.6 MB)
        compiles at B=128 while 4096x512 f32 (16.8 MB) does not
        ('Scoped allocation with size 16.38M and limit 16.00M'), so the
        budget models that term with ~1 MB of headroom. Bigger tiles =
        fewer, larger DMAs = closer to the HBM roofline (measured
        1.96 -> 1.61 ms/batch-128 going 2048 -> 8192)."""
        return _fused_block_for(
            self._slab.dtype.itemsize, self.dim, self._cap
        )

    def search_pipelined(
        self, qstack: np.ndarray, k: int, materialize: bool = True
    ):
        """Serve a (NB, B, d) stack of query batches in ONE device
        dispatch: `lax.scan` of the fused kernel (TPU) or the exact XLA
        path (elsewhere). This is the throughput-serving entry — each
        dispatch costs a host round trip (~30 ms on tunneled devices),
        so batches are pipelined device-side and materialized once.
        Returns (NB, B, k) scores/slots with tombstones already -1.

        ``materialize=False`` returns the raw device arrays without
        blocking — callers keeping multiple dispatches in flight
        (double-buffered serving) resolve them later with
        ``resolve_pipelined``. NOTE: the read lock is released at
        return, so a caller must resolve before mutating the index.
        """
        qstack = _as_qstack(qstack)
        assert qstack.ndim == 3 and qstack.shape[-1] == self.dim
        normalize = self.metric == "cosine"
        with self._mu.read():  # held through materialization (donation)
            slab, valid, scales, cap = (
                self._slab, self._valid, self._scales, self._cap,
            )
            if self._resolve_topk() == "fused":
                from wdbx_tpu.kernels.fused_topk import (
                    fused_topk_search_batched,
                )

                scores, idx = fused_topk_search_batched(
                    slab, qstack, valid, k=min(k, cap),
                    block_n=self._fused_block(qstack.shape[1]),
                    interpret=jax.default_backend() != "tpu",
                    scales=scales if self._is_quantized else None,
                    normalize=normalize,  # folded into the one dispatch
                    int4=self._is_int4,
                )
            else:
                if self._is_int4:
                    # exact/XLA fallback only: the fused kernel above
                    # unpacks per tile instead
                    slab = _unpack4(slab)
                if normalize:
                    flat = l2_normalize(qstack.reshape(-1, self.dim))
                    qstack = flat.reshape(qstack.shape)
                scores, idx = _exact_pipelined(
                    slab, qstack, valid, scales,
                    k=min(k, cap), precision=self._precision,
                )
            if not materialize:
                return scores, idx  # in-flight device arrays
            scores, idx = jax.device_get((scores, idx))
            scores = np.asarray(scores)
            slots = np.asarray(idx, np.int64)
        slots[scores == -np.inf] = -1
        return scores, slots

    @staticmethod
    def resolve_pipelined(handle) -> tuple[np.ndarray, np.ndarray]:
        """Materialize a ``search_pipelined(..., materialize=False)``
        result (one transfer for both outputs)."""
        scores, idx = jax.device_get(handle)
        scores = np.asarray(scores)
        slots = np.asarray(idx, np.int64)
        slots[scores == -np.inf] = -1
        return scores, slots

    def _masked_valid_dev(self, valid, mask_np, cap):
        """Cached device AND of ``valid`` with a host filter mask.
        Filtered serving calls this with the STORE'S cached mask object
        every search — without the cache each call re-uploads the full
        bitmap (10 MB at 10M rows ≈ 100 ms on the tunneled chip) and
        re-runs the AND. Keyed by object identity of (mask, valid):
        every mutation replaces the ``_valid`` device array, so a state
        change invalidates naturally, and the cache holds refs to both
        keys so their ids cannot be recycled while cached. Bounded to a
        few live filters (each entry pins ~2 bitmap-sized device
        buffers)."""
        cache = getattr(self, "_maskdev_cache", None)
        if cache is None:
            cache = self._maskdev_cache = {}
        key = (id(mask_np), id(valid))
        hit = cache.get(key)
        if hit is not None:
            return hit[2]
        full = np.zeros(cap, bool)
        n = min(len(mask_np), cap)
        full[:n] = mask_np[:n]
        dev = jnp.logical_and(valid, jnp.asarray(full))
        while len(cache) >= 4:
            cache.pop(next(iter(cache)))
        cache[key] = (mask_np, valid, dev)
        return dev

    def _mask_selectivity(self, slot_mask) -> float:
        """Fraction of LIVE rows a filter mask passes. Counts only bits
        on assigned slots and subtracts freed ones — a raw popcount over
        the whole mask inflates selectivity when callers pass broad or
        cached masks covering deleted slots, mis-routing sparse filters
        past the exact-scan threshold."""
        m = np.asarray(slot_mask[: self._next_slot], bool)
        matched = int(np.count_nonzero(m))
        # dead-but-unrecycled slots: the free list plus (on IVF layouts)
        # the rebuild quarantine
        dead = list(self._free) + list(getattr(self, "_quarantine", []))
        if dead and matched:
            fr = np.asarray([s for s in dead if s < len(m)], np.int64)
            if len(fr):
                matched -= int(np.count_nonzero(m[fr]))
        return matched / max(1, self._size)

    def get_vectors(self, slots: np.ndarray) -> np.ndarray:
        slots = np.asarray(slots, np.int64)
        with self._mu.read():  # exclude buffer donation mid-gather
            if self._is_int4:
                packed = np.asarray(self._slab[slots], np.uint8)
                lo = (packed & 0xF).astype(np.int8) - 8
                hi = (packed >> 4).astype(np.int8) - 8
                host = np.concatenate([lo, hi], axis=-1).astype(np.float32)
            else:
                host = np.asarray(self._slab[slots], np.float32)
            if self._is_quantized:
                host = host * np.asarray(
                    self._scales[slots], np.float32
                )[:, None]
        return host

    def compact(self) -> tuple[np.ndarray, np.ndarray]:
        """Repack live rows into the lowest slots, reclaiming tombstone
        fragmentation (the op the reference's fake deletes can never do,
        reference wdbx/core/indexing.py:525-560). Returns
        ``(old_slots, new_slots)`` so the caller can remap its id table;
        rows are moved with one device gather + scatter.
        """
        with self._mu.write():
            valid = np.asarray(self._valid)
            live = np.nonzero(valid)[0]
            n = len(live)
            old_slots = live.astype(np.int64)
            new_slots = np.arange(n, dtype=np.int64)
            moved = old_slots[old_slots != new_slots]
            if len(moved) == 0:
                self._free = []
                self._next_slot = n
                return old_slots, new_slots
            rows = self.get_vectors(old_slots)  # dequantized f32 (n, dim)
            self._alloc(self._cap)
            self._size = 0
            self._free = []
            self._next_slot = 0
            if n:
                re_slots = self.add_batch(rows)
                assert (re_slots == new_slots).all()
            return old_slots, new_slots

    def clear(self) -> None:
        with self._mu.write():
            self._alloc(self._cap)
            self._size = 0
            self._free = []
            self._next_slot = 0
            # an abandoned slab-external load must not leave a pending
            # restore against state that no longer exists
            self._slab_restore_pending = False

    def count(self) -> int:
        return self._size

    @property
    def capacity(self) -> int:
        return self._cap

    # -- persistence ------------------------------------------------------
    # Layout: <path>.npz holds the slab (bf16 saved as raw uint16 bits) +
    # validity; <path>.meta.json holds scalars. Mirrors the reference's
    # <path>.bin + <path>.mapping scheme (reference
    # wdbx/core/indexing.py:317-344) without pickle.
    #
    # ``skip_slab`` writes a SLAB-EXTERNAL checkpoint: everything except
    # the slab itself (valid/scales/meta), with the slab reconstructed
    # at load from the store's raw row source via ``restore_slab`` —
    # the device->host gather is the save wall on tunnel-attached
    # devices (~20 MB/s D2H vs ~1 GB/s H2D measured here), so the
    # checkpoint flows host->device only.
    supports_slab_external = True

    def save(self, path: str, skip_slab: bool = False) -> None:
        with self._mu.read():  # consistent slab/valid view vs. donation
            self._save_locked(path, skip_slab=skip_slab)

    def _save_locked(self, path: str, skip_slab: bool = False) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if self.persist_backend == "orbax":
            from wdbx_tpu.store import persist

            arrays = {"slab": self._slab, "valid": self._valid}
            if self._is_quantized:
                arrays["scales"] = self._scales
            persist.save_arrays(path, arrays)
            skip_slab = False
        else:
            hwm = self._next_slot
            if skip_slab:
                # Slab-external saves must be D2H-FREE end to end: on a
                # tunnel-attached chip even the 10 MB valid bitmap reads
                # back at ~0.3 MB/s (the three small gathers this branch
                # replaces measured 203 s of a 227 s save at 10M rows).
                #  * valid derives on host — device valid is True exactly
                #    on allocated positions minus the free list and the
                #    rebuild quarantine (the same equivalence
                #    _mask_selectivity relies on).
                #  * scales are omitted — restore_slab regenerates them
                #    through the device requantize at load.
                arrays = {"valid": self._host_valid(hwm)}
            else:
                arrays = {"valid": np.asarray(self._valid)[:hwm]}
                # Host-side slicing: partial slices of sharded slabs are
                # ambiguous for the partitioner, a full host gather is
                # not.
                slab = np.asarray(self._slab)[:hwm]
                if slab.dtype not in (np.float32, np.int8, np.uint8):
                    slab = slab.view(np.uint16)
                arrays["slab"] = slab
                if self._is_quantized:
                    arrays["scales"] = np.asarray(self._scales)[:hwm]
            np.savez(path + ".npz", **arrays)
        meta = self._persist_meta()
        if skip_slab:
            meta["slab_external"] = True
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)

    def _host_valid(self, hwm: int) -> np.ndarray:
        """Validity bitmap reconstructed from host bookkeeping (no
        device readback): allocated positions are live unless they sit
        on the free list or in the clustered rebuild quarantine."""
        valid = np.ones(hwm, bool)
        dead = [int(p) for p in self._free if p < hwm]
        quar = getattr(self, "_pos_quarantine", None)
        if quar:
            dead += [int(p) for p in quar if p < hwm]
        if dead:
            valid[np.asarray(dead, np.int64)] = False
        return valid

    def _persist_meta(self) -> dict:
        return {
            "dim": self.dim,
            "metric": self.metric,
            "dtype": self.dtype_name,
            "size": self._size,
            "next_slot": self._next_slot,
            "free": self._free,
            "kind": self.kind,
            "backend": self.persist_backend,
            "capacity": self._cap,
        }

    def load(self, path: str) -> bool:
        with self._mu.write():
            return self._load_locked(path)

    def _load_locked(self, path: str) -> bool:
        if not os.path.exists(path + ".meta.json"):
            return False
        # storage is being replaced wholesale: an in-flight background
        # rebuild must abandon its snapshot (same guard as clear())
        self._layout_gen = getattr(self, "_layout_gen", 0) + 1
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        if meta["dim"] != self.dim:
            raise ValueError(
                f"persisted index dim {meta['dim']} != configured {self.dim}"
            )
        self.dtype_name = meta["dtype"]
        self._dtype = _DTYPES[self.dtype_name]
        self._precision = "highest" if self.dtype_name == "float32" else "default"
        if meta.get("backend") == "orbax":
            from wdbx_tpu.store import persist

            if not persist.exists(path):
                return False
            self._cap = int(meta["capacity"])
            restored = persist.load_arrays(path, self._abstract_arrays())
            if restored is None:
                return False
            self._slab = restored["slab"]
            self._valid = restored["valid"]
            if "scales" in restored:
                self._scales = restored["scales"]
            self._size = int(meta["size"])
            self._next_slot = int(meta["next_slot"])
            self._free = [int(s) for s in meta["free"]]
            self.persist_backend = "orbax"
            return True
        if not os.path.exists(path + ".npz"):
            return False
        data = np.load(path + ".npz")
        hwm = int(meta["next_slot"])
        self._cap = self._round_cap(
            max(hwm, 1024, getattr(self, "_declared_cap", 0))
        )
        # drop the constructor-presized slab BEFORE allocating the
        # loaded one — holding both transiently doubles HBM at exactly
        # the scales INDEX_CAPACITY exists for
        self._slab = self._valid = self._scales = None
        valid = np.asarray(data["valid"], bool)
        if meta.get("slab_external"):
            # slab omitted from the checkpoint: zero-fill ON DEVICE and
            # let restore_slab() refill from the raw row source. A host
            # np.zeros here cost ~70 s at 10M x 768 (7.7 GB of page
            # first-touch at this host's ~110 MB/s) plus a 7.7 GB H2D
            # upload of zeros — all overwritten by the restore.
            slab_np = None
        else:
            slab = data["slab"]
            if slab.dtype == np.uint16:
                slab = slab.view(jnp.bfloat16)
            # Assemble on host, then place once (device_put handles
            # sharded placement in the subclass).
            slab_np = np.zeros(
                (self._cap, self._row_width), np.asarray(slab).dtype
            )
            if hwm:
                slab_np[:hwm] = slab
        valid_np = np.zeros((self._cap,), bool)
        scales_np = (
            np.zeros((self._cap,), np.float32) if self._is_quantized
            else None
        )
        if hwm:
            valid_np[:hwm] = valid[:hwm]
            # slab-external checkpoints omit scales (restore_slab's
            # device requantize regenerates them) — leave the zeros
            if self._is_quantized and "scales" in data:
                scales_np[:hwm] = data["scales"]
        if slab_np is None:
            self._slab = jnp.zeros(
                (self._cap, self._row_width), self._dtype
            )
            self._valid = jnp.asarray(valid_np)
            if self._is_quantized:
                self._scales = jnp.asarray(scales_np)
        else:
            self._place(slab_np, valid_np, scales_np)
        self._size = int(meta["size"])
        self._next_slot = hwm
        self._free = [int(s) for s in meta["free"]]
        # host-side validity snapshot: subclass loads and restore_slab
        # read this instead of round-tripping the device array (the
        # device->host gather is pathologically slow on tunneled chips)
        self._loaded_valid_np = valid_np[:hwm].copy()
        # unconditional: a stale pending flag from an earlier FAILED
        # slab-external load must not leak into this (possibly
        # full-slab) checkpoint and trigger a bogus restore
        self._slab_restore_pending = bool(meta.get("slab_external"))
        return True

    def _slots_for_positions(self, positions: np.ndarray) -> np.ndarray:
        """Slab position -> external slot (identity for flat slabs;
        clustered layouts override with their position map)."""
        return positions

    def restore_slab(self, reader, chunk: int = 262_144) -> bool:
        """Refill the device slab from a host row source after loading
        a slab-external checkpoint. ``reader(slots) -> (rows_f32,
        have)`` is the store's raw-row gather. Rows go H2D in chunks
        and re-quantize on device through the same write kernel the
        add path uses — scales regenerate self-consistently, and the
        checkpoint never pays the device->host slab gather.

        Known recovery caveat (same unacknowledged-window class as the
        reference's save cadence): a slot freed AND recycled by a new
        id between the checkpoint and a crash restores with the newer
        row under the checkpointed id. Deletes alone are safe — the
        store keeps raw bytes for freed slots until they are
        rewritten."""
        if not getattr(self, "_slab_restore_pending", False):
            return False
        valid_host = self._loaded_valid_np
        pos_all = np.nonzero(valid_host)[0]
        slots_all = np.asarray(
            self._slots_for_positions(pos_all), np.int64
        )
        # iterate in SLOT order: clustered layouts permute positions,
        # and a slot-ordered pass turns the raw-store gather into
        # sequential memmap reads (the measured restore wall)
        order = np.argsort(slots_all, kind="stable")
        pos_all = pos_all[order]
        slots_all = slots_all[order]
        with self._mu.write():
            for lo in range(0, len(pos_all), chunk):
                pos = pos_all[lo:lo + chunk]
                slots = slots_all[lo:lo + chunk]
                rows, row_scales, have = reader(slots)
                if not have.all():
                    raise ValueError(
                        f"slab restore: raw store is missing "
                        f"{int((~have).sum())} of {len(pos)} rows — "
                        "checkpoint unusable without its row source"
                    )
                if row_scales is not None:
                    self._scatter_requant(pos, rows, row_scales)
                else:
                    self._scatter(pos, np.asarray(rows, np.float32), True)
            self._slab_restore_pending = False
        return True

    def _scatter_requant(
        self, slots: np.ndarray, q: np.ndarray, row_scales: np.ndarray
    ) -> None:
        """Restore-path scatter of int8 raw codes: dequantize + (re-)
        quantize on device — only the int8 bytes cross the host
        boundary."""
        n = len(slots)
        pad_n = _next_pow2(max(n, 1))
        if pad_n != n:
            q = np.pad(q[:n], ((0, pad_n - n), (0, 0)))
            row_scales = np.pad(
                row_scales[:n], (0, pad_n - n), constant_values=1.0
            )
        else:
            q, row_scales = q[:n], row_scales[:n]
        pslots = jnp.asarray(
            np.pad(slots, (0, pad_n - n), constant_values=self._cap)
        )
        flags = jnp.asarray(
            np.pad(np.full(n, True), (0, pad_n - n), constant_values=False)
        )
        body = _requant4 if self._is_int4 else _requant
        self._slab, self._valid, self._scales = body(
            self._slab, self._valid, self._scales,
            jnp.asarray(q), jnp.asarray(row_scales), pslots, flags,
            normalize=self.metric == "cosine",
        )
        # the q/row_scales host buffers are caller-reused scratch; the
        # transfers above must complete before the caller refills them
        jax.block_until_ready(self._valid)

    def get_stats(self) -> dict:
        stats = super().get_stats()
        stats.update(
            dtype=self.dtype_name,
            tombstones=len(self._free),
            hbm_bytes=int(self._slab.size) * self._slab.dtype.itemsize,
        )
        return stats
