"""Device-sharded flat index: the corpus partitioned over a mesh axis.

The reference fans a query out to per-shard C++ indexes on threads and
merges on the host (reference wdbx/core/vector_store.py:323-345, and the
never-wired TCP forwarding at wdbx/core/distributed.py:698-834). Here
the whole multi-shard search is ONE compiled XLA program under
``shard_map``: every device scores its local slab slice on its MXU,
takes a local top-k, all-gathers the tiny (B, k) candidate sets over ICI
and merges — no host in the loop.

Slot ids are global row numbers in the logically-concatenated slab, so
the host-side id↔slot bookkeeping inherited from FlatIndex is unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wdbx_tpu.index.flat import FlatIndex, _next_pow2
from wdbx_tpu.ops.exact_search import score_block
from wdbx_tpu.ops.normalize import l2_normalize


def _build_search(mesh: Mesh, axis: str, k: int, precision: str):
    def local(slab_l, valid_l, q):
        scores = score_block(slab_l, q, precision=precision)
        scores = jnp.where(valid_l[None, :], scores, -jnp.inf)
        k_local = min(k, slab_l.shape[0])
        s, i = jax.lax.top_k(scores, k_local)
        base = jax.lax.axis_index(axis) * slab_l.shape[0]
        gi = i.astype(jnp.int32) + base
        # Tiny (B, k) candidate sets ride ICI; the big slab never moves.
        all_s = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
        k_eff = min(k, all_s.shape[-1])
        top, pos = jax.lax.top_k(all_s, k_eff)
        return top, jnp.take_along_axis(all_i, pos, axis=1)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis), P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,  # post-all-gather merge is replicated by construction
        )
    )


class ShardedFlatIndex(FlatIndex):
    kind = "sharded_flat"

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        dtype: str = "float32",
        capacity: int = 1024,
        mesh: Mesh | None = None,
        axis: str = "shard",
    ):
        if mesh is None:
            from wdbx_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(axis=axis)
        self.mesh = mesh
        self.axis = axis
        self.n_devices = mesh.devices.size
        self._search_cache: dict[tuple[int, int], object] = {}
        self._write_fn = None
        self._tombstone_fn = None
        super().__init__(dim, metric=metric, dtype=dtype, capacity=capacity)

    # -- sharded storage ---------------------------------------------------
    def _round_cap(self, need: int) -> int:
        per_dev = _next_pow2(max(128, -(-need // self.n_devices)))
        return per_dev * self.n_devices

    def _sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def _alloc(self, cap: int) -> None:
        self._slab = jax.device_put(
            jnp.zeros((cap, self.dim), self._dtype),
            self._sharding(P(self.axis, None)),
        )
        self._valid = jax.device_put(
            jnp.zeros((cap,), jnp.bool_), self._sharding(P(self.axis))
        )

    def _grow(self, need: int) -> None:
        new_cap = self._round_cap(need)
        pad = new_cap - self._cap
        self._slab = jax.device_put(
            jnp.pad(self._slab, ((0, pad), (0, 0))),
            self._sharding(P(self.axis, None)),
        )
        self._valid = jax.device_put(
            jnp.pad(self._valid, (0, pad)), self._sharding(P(self.axis))
        )
        self._cap = new_cap
        self._search_cache.clear()

    def _write_arrays(self, vecs, pslots, flags):
        # Scatter into a sharded slab needs an explicit out_sharding; XLA
        # routes each update row to the owning device. The jitted fn is
        # memoized per instance (jit caches on function identity).
        if self._write_fn is None:
            slab_s = self._sharding(P(self.axis, None))
            valid_s = self._sharding(P(self.axis))

            @partial(jax.jit, donate_argnums=(0, 1))
            def write(slab, valid, v, s, f):
                slab = slab.at[s].set(v.astype(slab.dtype), out_sharding=slab_s)
                valid = valid.at[s].set(f, out_sharding=valid_s)
                return slab, valid

            self._write_fn = write
        return self._write_fn(self._slab, self._valid, vecs, pslots, flags)

    def _tombstone_arrays(self, pslots):
        if self._tombstone_fn is None:
            valid_s = self._sharding(P(self.axis))

            @partial(jax.jit, donate_argnums=(0,))
            def tomb(valid, s):
                return valid.at[s].set(False, out_sharding=valid_s)

            self._tombstone_fn = tomb
        return self._tombstone_fn(self._valid, pslots)

    # -- sharded search ----------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        slot_mask: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = self._prep(queries)
        b = len(queries)
        pad_b = _next_pow2(max(b, 1))
        q = jnp.asarray(np.pad(queries, ((0, pad_b - b), (0, 0))))
        if self.metric == "cosine":
            q = l2_normalize(q)
        if self._dtype != jnp.float32:
            q = q.astype(self._dtype)
        valid = self._valid
        if slot_mask is not None:
            mask = np.zeros(self._cap, bool)
            mask[: len(slot_mask)] = slot_mask[: self._cap]
            valid = jnp.logical_and(
                valid, jax.device_put(jnp.asarray(mask), self._sharding(P(self.axis)))
            )
        key = (k, self._cap)
        fn = self._search_cache.get(key)
        if fn is None:
            fn = _build_search(self.mesh, self.axis, k, self._precision)
            self._search_cache[key] = fn
        scores, slots = fn(self._slab, valid, q)
        scores = np.asarray(scores[:b])
        out = np.asarray(slots[:b], np.int64)
        if scores.shape[1] < k:  # fewer than k candidates exist mesh-wide
            pad = k - scores.shape[1]
            scores = np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf)
            out = np.pad(out, ((0, 0), (0, pad)), constant_values=-1)
        out[scores == -np.inf] = -1
        return scores, out

    def _place(self, slab_np: np.ndarray, valid_np: np.ndarray) -> None:
        self._slab = jax.device_put(
            jnp.asarray(slab_np, self._dtype), self._sharding(P(self.axis, None))
        )
        self._valid = jax.device_put(
            jnp.asarray(valid_np), self._sharding(P(self.axis))
        )

    def get_stats(self) -> dict:
        stats = super().get_stats()
        stats.update(
            devices=self.n_devices,
            mesh_axis=self.axis,
            rows_per_device=self._cap // self.n_devices,
        )
        return stats
