"""Device-sharded flat index: the corpus partitioned over a mesh axis.

The reference fans a query out to per-shard C++ indexes on threads and
merges on the host (reference wdbx/core/vector_store.py:323-345, and the
never-wired TCP forwarding at wdbx/core/distributed.py:698-834). Here
the whole multi-shard search is ONE compiled XLA program under
``shard_map``: every device scores its local slab slice on its MXU,
takes a local top-k, all-gathers the tiny (B, k) candidate sets over ICI
and merges — no host in the loop.

Layout: the slab is ``(n_dev, rows_per_dev, dim)`` sharded on axis 0,
and slot id ``s`` lives at ``(s % n_dev, s // n_dev)``. Striding by
device means sequentially-allocated slots round-robin across the mesh
(balanced load from the first insert), and a slot's owning device never
changes when capacity grows — rows_per_dev doubles, ``s % n_dev`` does
not. Slot ids stay the stable host-side handles FlatIndex bookkeeping
expects.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wdbx_tpu.index.flat import (
    FlatIndex,
    _as_qstack,
    _fused_block_for,
    _next_pow2,
)
from wdbx_tpu.ops.exact_search import score_block
from wdbx_tpu.ops.normalize import l2_normalize


def _build_search(mesh: Mesh, axis: str, k: int, precision: str, int8: bool,
                  method: str = "exact", normalize: bool = False,
                  replica_axis: str | None = None,
                  interpret: bool = False, int4: bool = False):
    # ``int8`` means "per-row scales exist" (int8 OR int4 callers pass
    # _is_quantized); ``int4`` marks nibble-packed rows — the fused
    # kernel unpacks per tile in VMEM, the blocked fallback below
    # unpacks per 8192-row block
    def _int4_topk(slab_l, valid_l, scales_l, q, k_local):
        """Blocked int4 scan: unpack one row-block at a time inside a
        lax.scan — a whole-slab unpack would materialize a 2x int8 (4x
        bf16) copy of the local slab per batch, which cannot exist at
        the capacity tier this dtype is FOR (20M x 768 packed is
        7.7 GB of a 16 GB chip). Takes the (1, rows, dw) shard_map
        locals directly: the reshape is layout-free, where a [0] slice
        first would materialize a packed copy per batch."""
        from wdbx_tpu.kernels.quant import unpack_int4

        rows = slab_l.shape[1]
        blk = 8192
        while blk > 1 and rows % blk:
            blk //= 2
        nblk = rows // blk
        slab_b = slab_l.reshape(nblk, blk, slab_l.shape[2])
        valid_b = valid_l.reshape(nblk, blk)
        scales_b = scales_l.reshape(nblk, blk)
        off = jnp.arange(nblk, dtype=jnp.int32) * blk
        qq = q.astype(jnp.bfloat16)
        kb = min(k_local, blk)

        def step(carry, x):
            rb, vb, sb, o = x
            s = jax.lax.dot_general(
                qq, unpack_int4(rb).astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * sb[None, :]
            s = jnp.where(vb[None, :], s, -jnp.inf)
            v_, i_ = jax.lax.top_k(s, kb)
            return carry, (v_, i_.astype(jnp.int32) + o)

        _, (vs, is_) = jax.lax.scan(
            step, 0, (slab_b, valid_b, scales_b, off)
        )
        b = q.shape[0]
        flat_s = vs.transpose(1, 0, 2).reshape(b, nblk * kb)
        flat_i = is_.transpose(1, 0, 2).reshape(b, nblk * kb)
        s, sel = jax.lax.top_k(flat_s, min(k_local, flat_s.shape[-1]))
        return s, jnp.take_along_axis(flat_i, sel, axis=1)

    def local(slab_l, valid_l, scales_l, q):
        n_dev = jax.lax.axis_size(axis)
        rows = slab_l.shape[1]
        k_local = min(k, rows)
        if normalize:  # folded in: saves one dispatch round trip per call
            q = l2_normalize(q)
        if method == "fused" and rows % 256 == 0:
            # The roofline kernel runs per device inside shard_map
            # (Pallas composes with shard_map): the local (rows, d)
            # block streams through VMEM with the grouped fold — no
            # (B, rows) score matrix in HBM on ANY chip. Inside
            # shard_map the [0] reshape is local, not a GSPMD slice.
            # int4 slabs stay PACKED: the kernel unpacks per tile.
            from wdbx_tpu.kernels.fused_topk import fused_topk_search

            s, i = fused_topk_search(
                slab_l[0], q, valid_l[0], k=k_local,
                block_n=_fused_block_for(
                    slab_l.dtype.itemsize, slab_l.shape[2], rows
                ),
                interpret=interpret,
                scales=scales_l[0] if int8 else None,
                int4=int4,
            )
            s = jnp.where(s <= -3.0e38, -jnp.inf, s)
            i = i.astype(jnp.int32)
        elif int4:
            s, i = _int4_topk(slab_l, valid_l, scales_l, q, k_local)
        else:
            # Contract against the 3D slab directly — slicing slab_l[0]
            # first makes XLA materialize a full copy of the local slab
            # per query batch (measured 20x slowdown at 10M x 768).
            if int8:
                qq = q.astype(jnp.bfloat16)
                slab_t = slab_l.astype(jnp.bfloat16)
            else:
                qq = q.astype(slab_l.dtype)
                slab_t = slab_l
            scores = jax.lax.dot_general(
                qq, slab_t, (((1,), (2,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )[:, 0, :]  # (B, 1, rows) -> (B, rows)
            if int8:
                scores = scores * scales_l[0][None, :]
            scores = jnp.where(valid_l[0][None, :], scores, -jnp.inf)
            if method == "approx":
                # TPU selection hardware; the sort-based lowering costs
                # seconds at 10M rows.
                s, i = jax.lax.approx_max_k(
                    scores, k_local, recall_target=0.98
                )
            else:
                s, i = jax.lax.top_k(scores, k_local)
            i = i.astype(jnp.int32)
        # slot = local_row * n_dev + device_index
        gi = i * n_dev + jax.lax.axis_index(axis)
        # Tiny (B, k) candidate sets ride ICI; the big slab never moves.
        all_s = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
        k_eff = min(k, all_s.shape[-1])
        top, pos = jax.lax.top_k(all_s, k_eff)
        return top, jnp.take_along_axis(all_i, pos, axis=1)

    def local_stack(slab_l, valid_l, scales_l, qstack):
        """Whole (NB, B, d) stack served inside ONE shard_map: the
        per-device batched kernel scans NB batches locally, then a
        SINGLE all_gather moves the (NB, B, k) candidate stacks over
        ICI and the merge vectorizes over NB. Measured 2.3x faster than
        scan-of-shard_map (per-step partitioning + per-step collectives,
        benchmarks/mesh_pipeline_exp.py)."""
        n_dev = jax.lax.axis_size(axis)
        rows = slab_l.shape[1]
        k_local = min(k, rows)
        if method == "fused" and rows % 256 == 0:
            from wdbx_tpu.kernels.fused_topk import fused_topk_search_batched

            s, i = fused_topk_search_batched(
                slab_l[0], qstack, valid_l[0], k=k_local,
                block_n=_fused_block_for(
                    slab_l.dtype.itemsize, slab_l.shape[2], rows
                ),
                interpret=interpret,
                scales=scales_l[0] if int8 else None, normalize=normalize,
                int4=int4,
            )  # (NB, B, k_local)
            s = jnp.where(s <= -3.4e38, -jnp.inf, s)
            i = i.astype(jnp.int32)
        else:
            if normalize:
                nb_, b_, d_ = qstack.shape
                qstack = l2_normalize(qstack.reshape(-1, d_)).reshape(
                    qstack.shape
                )

            def step(carry, q):
                if int4:
                    s_, i_ = _int4_topk(
                        slab_l, valid_l, scales_l, q, k_local
                    )
                    return carry, (s_, i_)
                if int8:
                    qq = q.astype(jnp.bfloat16)
                    slab_t = slab_l.astype(jnp.bfloat16)
                else:
                    qq = q.astype(slab_l.dtype)
                    slab_t = slab_l
                scores = jax.lax.dot_general(
                    qq, slab_t, (((1,), (2,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )[:, 0, :]
                if int8:
                    scores = scores * scales_l[0][None, :]
                scores = jnp.where(valid_l[0][None, :], scores, -jnp.inf)
                if method == "approx":
                    s_, i_ = jax.lax.approx_max_k(
                        scores, k_local, recall_target=0.98
                    )
                else:
                    s_, i_ = jax.lax.top_k(scores, k_local)
                return carry, (s_, i_.astype(jnp.int32))

            _, (s, i) = jax.lax.scan(step, 0, qstack)
        gi = i * n_dev + jax.lax.axis_index(axis)
        all_s = jax.lax.all_gather(s, axis, axis=2, tiled=True)
        all_i = jax.lax.all_gather(gi, axis, axis=2, tiled=True)
        k_eff = min(k, all_s.shape[-1])
        top, pos = jax.lax.top_k(all_s, k_eff)
        return top, jnp.take_along_axis(all_i, pos, axis=2)

    # With a (replica, shard) mesh the slab replicates over the replica
    # axis (absent from its spec) while the QUERY BATCH shards over it —
    # each replica group serves its slice of the batch independently
    # (data-parallel serving on top of corpus sharding).
    q_spec = P(replica_axis, None)
    slab_specs = (P(axis, None, None), P(axis, None), P(axis, None))
    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=slab_specs + (q_spec,),
        out_specs=(q_spec, q_spec),
        check_vma=False,  # post-all-gather merge is replicated by construction
    )
    qs_spec = P(None, replica_axis, None)
    pipelined = jax.jit(jax.shard_map(
        local_stack,
        mesh=mesh,
        in_specs=slab_specs + (qs_spec,),
        out_specs=(qs_spec, qs_spec),
        check_vma=False,
    ))

    fn = jax.jit(mapped)
    fn.pipelined = pipelined
    return fn


class ShardedFlatIndex(FlatIndex):
    kind = "sharded_flat"
    #: sharded slabs keep their own save path (no slab-external
    #: reconstruction wired for mesh-striped layouts yet)
    supports_slab_external = False
    #: packed int4 is supported: the fused kernel unpacks per tile and
    #: the exact fallback per 8192-row block — the packed slab never
    #: expands in HBM. (ShardedIVFIndex still rejects int4 through the
    #: IVFIndex constructor: its dense bucket tables have no unpack.)
    _INT4_OK = True

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        dtype: str = "float32",
        capacity: int = 1024,
        mesh: Mesh | None = None,
        axis: str = "shard",
        replicas: int = 1,
    ):
        if dtype == "int4" and not self._INT4_OK:
            raise ValueError(
                "int4 is supported by 'flat', 'sharded_flat', "
                "'ivf_clustered' and 'sharded_clustered' — the "
                "dense-table IVF's bucket tables have no nibble unpack"
            )
        if mesh is None:
            if replicas > 1:
                from wdbx_tpu.parallel.mesh import make_mesh2

                mesh = make_mesh2(replicas, axes=("replica", axis))
            else:
                from wdbx_tpu.parallel.mesh import make_mesh

                mesh = make_mesh(axis=axis)
        self.mesh = mesh
        self.axis = axis
        self.replica_axis = (
            "replica" if "replica" in mesh.axis_names else None
        )
        self.replicas = (
            int(mesh.shape["replica"]) if self.replica_axis else 1
        )
        #: number of corpus shards (slot striping runs over these)
        self.n_devices = int(mesh.shape[axis])
        self._search_cache: dict[tuple[int, int], object] = {}
        self._write_fn = None
        self._tombstone_fn = None
        self._write_fn_cow = None
        self._tombstone_fn_cow = None
        super().__init__(dim, metric=metric, dtype=dtype, capacity=capacity)

    # -- sharded storage ---------------------------------------------------
    def _round_cap(self, need: int) -> int:
        per_need = max(128, -(-need // self.n_devices))
        if per_need <= self._CAP_CHUNK:
            per_dev = _next_pow2(per_need)
        else:  # 1M-row-per-device granularity past the pow2 regime
            per_dev = -(-per_need // self._CAP_CHUNK) * self._CAP_CHUNK
        return per_dev * self.n_devices

    @property
    def rows_per_device(self) -> int:
        return self._cap // self.n_devices

    def _sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def _resolve_sharded_topk(self) -> str:
        """auto -> the fused Pallas kernel per shard on TPU (roofline),
        the exact XLA path elsewhere (interpret-mode Mosaic is
        debug-grade; CPU meshes take top_k)."""
        if self.topk_method != "auto":
            return self.topk_method
        return "fused" if jax.default_backend() == "tpu" else "exact"

    def _slot_coords(self, slots: jnp.ndarray):
        """slot id → (device_row, local_row); OOB pad slots map to
        local_row == rows_per_device, which the scatter drops."""
        return slots % self.n_devices, slots // self.n_devices

    def _alloc(self, cap: int) -> None:
        rpd = cap // self.n_devices
        self._slab = jax.device_put(
            jnp.zeros(
                (self.n_devices, rpd, self._row_width), self._dtype
            ),
            self._sharding(P(self.axis, None, None)),
        )
        self._valid = jax.device_put(
            jnp.zeros((self.n_devices, rpd), jnp.bool_),
            self._sharding(P(self.axis, None)),
        )
        # Scales always exist here (ones for float dtypes) so the
        # shard_map search signature is uniform; 4 bytes/row is noise.
        self._scales = jax.device_put(
            jnp.ones((self.n_devices, rpd), jnp.float32),
            self._sharding(P(self.axis, None)),
        )

    def _grow(self, need: int) -> None:
        new_cap = self._round_cap(max(need, int(self._cap * 1.5)))
        pad = new_cap // self.n_devices - self.rows_per_device
        self._slab = jax.device_put(
            jnp.pad(self._slab, ((0, 0), (0, pad), (0, 0))),
            self._sharding(P(self.axis, None, None)),
        )
        self._valid = jax.device_put(
            jnp.pad(self._valid, ((0, 0), (0, pad))),
            self._sharding(P(self.axis, None)),
        )
        self._scales = jax.device_put(
            jnp.pad(self._scales, ((0, 0), (0, pad)), constant_values=1.0),
            self._sharding(P(self.axis, None)),
        )
        self._cap = new_cap
        self._search_cache.clear()

    def _write_arrays(self, vecs, pslots, flags):
        # Scatter into the sharded slab needs an explicit out_sharding;
        # XLA routes each update row to its owning device. Memoized per
        # instance (jit caches on function identity). During a
        # background rebuild's COW window (``_cow_writes``) the
        # non-donating variant runs instead: donation would invalidate
        # the snapshot buffers the off-lock build phase is reading.
        cow = getattr(self, "_cow_writes", False)
        attr = "_write_fn_cow" if cow else "_write_fn"
        if getattr(self, attr, None) is None:
            slab_s = self._sharding(P(self.axis, None, None))
            valid_s = self._sharding(P(self.axis, None))
            int8 = self._is_int8
            int4 = self._is_int4

            def write(slab, valid, scales, v, s, f, n_dev):
                dev, row = s % n_dev, s // n_dev
                if int8 or int4:
                    from wdbx_tpu.kernels.quant import (
                        quantize_rows, quantize_rows_int4,
                    )

                    qv, sc = (
                        quantize_rows_int4(v) if int4 else quantize_rows(v)
                    )
                    slab = slab.at[dev, row].set(qv, out_sharding=slab_s)
                    scales = scales.at[dev, row].set(sc, out_sharding=valid_s)
                else:
                    slab = slab.at[dev, row].set(
                        v.astype(slab.dtype), out_sharding=slab_s
                    )
                valid = valid.at[dev, row].set(f, out_sharding=valid_s)
                return slab, valid, scales

            donate = () if cow else (0, 1, 2)
            setattr(self, attr, partial(
                jax.jit, donate_argnums=donate, static_argnums=(6,)
            )(write))
        slab, valid, self._scales = getattr(self, attr)(
            self._slab, self._valid, self._scales, vecs, pslots, flags,
            self.n_devices,
        )
        return slab, valid

    def _tombstone_arrays(self, pslots):
        cow = getattr(self, "_cow_writes", False)
        attr = "_tombstone_fn_cow" if cow else "_tombstone_fn"
        if getattr(self, attr, None) is None:
            valid_s = self._sharding(P(self.axis, None))

            def tomb(valid, s, n_dev):
                return valid.at[s % n_dev, s // n_dev].set(
                    False, out_sharding=valid_s
                )

            donate = () if cow else (0,)
            setattr(self, attr, partial(
                jax.jit, donate_argnums=donate, static_argnums=(2,)
            )(tomb))
        return getattr(self, attr)(self._valid, pslots, self.n_devices)

    def _place(
        self,
        slab_np: np.ndarray,
        valid_np: np.ndarray,
        scales_np: np.ndarray | None = None,
    ) -> None:
        # slot-ordered (cap, dim) host layout → (n_dev, rpd, dim) striped
        rpd = self._cap // self.n_devices
        slab3 = np.ascontiguousarray(
            slab_np.reshape(
                rpd, self.n_devices, self._row_width
            ).transpose(1, 0, 2)
        )
        valid2 = np.ascontiguousarray(
            valid_np.reshape(rpd, self.n_devices).T
        )
        self._slab = jax.device_put(
            jnp.asarray(slab3, self._dtype), self._sharding(P(self.axis, None, None))
        )
        self._valid = jax.device_put(
            jnp.asarray(valid2), self._sharding(P(self.axis, None))
        )
        if scales_np is None:
            scales_np = np.ones(self._cap, np.float32)
        scales2 = np.ascontiguousarray(scales_np.reshape(rpd, self.n_devices).T)
        self._scales = jax.device_put(
            jnp.asarray(scales2), self._sharding(P(self.axis, None))
        )

    def _host_replicated(self, x) -> np.ndarray:
        """Host copy of a mesh-sharded array. Under multi-controller, a
        sharded array spans non-addressable devices and cannot be
        fetched directly — replicate it over the mesh first (an
        all-gather every process participates in)."""
        if jax.process_count() > 1:
            x = jax.jit(
                lambda a: a, out_shardings=self._sharding(P())
            )(x)
        return np.asarray(x)

    def _host_slot_view(self) -> tuple[np.ndarray, np.ndarray]:
        """Full slab gathered to host in slot order (cap, dim). Under
        multi-controller the fetch replicates first (every device holds
        a full copy transiently — for pod-scale slabs use the orbax
        persistence backend instead of npz/remesh paths that need
        this)."""
        slab = self._host_replicated(self._slab).transpose(1, 0, 2).reshape(
            -1, self._row_width
        )
        valid = self._host_replicated(self._valid).T.reshape(-1)
        return slab, valid

    # -- sharded search ----------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        slot_mask: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = self._prep(queries)
        b = len(queries)
        # batch shards over the replica axis; keep it divisible (round
        # UP to a replica multiple — max() alone breaks for replica
        # counts that are not powers of two)
        pad_b = _next_pow2(max(b, 1))
        pad_b = -(-pad_b // self.replicas) * self.replicas
        q = jnp.asarray(np.pad(queries, ((0, pad_b - b), (0, 0))))
        # (normalization happens inside the compiled program)
        if self._dtype == jnp.bfloat16:
            q = q.astype(jnp.bfloat16)  # int8 slabs keep float queries
        method = self._resolve_sharded_topk()
        with self._mu.read():  # exclude slab donation during compute
            valid = self._valid
            if slot_mask is not None:
                mask = np.zeros(self._cap, bool)
                mask[: len(slot_mask)] = slot_mask[: self._cap]
                mask2 = mask.reshape(self.rows_per_device, self.n_devices).T
                valid = jnp.logical_and(
                    valid,
                    jax.device_put(
                        jnp.asarray(np.ascontiguousarray(mask2)),
                        self._sharding(P(self.axis, None)),
                    ),
                )
            key = (k, self._cap, method)
            fn = self._search_cache.get(key)
            if fn is None:
                fn = _build_search(
                    self.mesh, self.axis, k, self._precision,
                    self._is_quantized,
                    method=method, normalize=self.metric == "cosine",
                    replica_axis=self.replica_axis,
                    interpret=jax.default_backend() != "tpu",
                    int4=self._is_int4,
                )
                self._search_cache[key] = fn
            scores, slots = fn(self._slab, valid, self._scales, q)
            # full host gather, then slice: partial slices of
            # replica-sharded outputs are ambiguous for the partitioner
            scores = np.asarray(scores)[:b]
            out = np.asarray(slots, np.int64)[:b]
        if scores.shape[1] < k:  # fewer than k candidates exist mesh-wide
            pad = k - scores.shape[1]
            scores = np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf)
            out = np.pad(out, ((0, 0), (0, pad)), constant_values=-1)
        out[scores == -np.inf] = -1
        return scores, out

    def search_pipelined(
        self, qstack: np.ndarray, k: int, materialize: bool = True
    ) -> tuple[np.ndarray, np.ndarray]:
        """Serve a (NB, B, d) stack in ONE dispatch: lax.scan of the
        shard_map'd mesh search (local MXU scoring + ICI all-gather
        merge per step). The multi-chip throughput-serving entry.

        ``materialize=False`` returns an opaque in-flight handle for
        double-buffered serving; resolve with ``resolve_pipelined``
        before mutating the index."""
        qstack = _as_qstack(qstack)
        assert qstack.ndim == 3 and qstack.shape[-1] == self.dim
        nb, b, _ = qstack.shape
        pad_b = _next_pow2(max(b, 1))
        pad_b = -(-pad_b // self.replicas) * self.replicas
        if pad_b != b:
            qstack = np.pad(qstack, ((0, 0), (0, pad_b - b), (0, 0)))
        method = self._resolve_sharded_topk()
        with self._mu.read():
            key = (k, self._cap, method)
            fn = self._search_cache.get(key)
            if fn is None:
                fn = _build_search(
                    self.mesh, self.axis, k, self._precision,
                    self._is_quantized,
                    method=method, normalize=self.metric == "cosine",
                    replica_axis=self.replica_axis,
                    interpret=jax.default_backend() != "tpu",
                    int4=self._is_int4,
                )
                self._search_cache[key] = fn
            scores, slots = fn.pipelined(
                self._slab, self._valid, self._scales, qstack
            )
            if not materialize:
                return ("sflat", scores, slots, b, k)
            scores, slots = jax.device_get(
                (scores[:, :b], slots[:, :b])
            )
        return ShardedFlatIndex._finish_sharded_pipelined(scores, slots, k)

    @staticmethod
    def _finish_sharded_pipelined(scores, slots, k: int):
        """Host post-processing shared by the blocking and in-flight
        paths: k-pad (k can exceed rows_per_device) + tombstone -1s."""
        scores = np.asarray(scores)
        out = np.asarray(slots, np.int64)
        if scores.shape[-1] < k:
            pad = k - scores.shape[-1]
            scores = np.pad(scores, ((0, 0), (0, 0), (0, pad)),
                            constant_values=-np.inf)
            out = np.pad(out, ((0, 0), (0, 0), (0, pad)),
                         constant_values=-1)
        out[scores == -np.inf] = -1
        return scores, out

    def resolve_pipelined(self, handle):
        """Materialize an in-flight ``search_pipelined`` handle."""
        _, scores, slots, b, k = handle
        scores, slots = jax.device_get((scores, slots))
        return ShardedFlatIndex._finish_sharded_pipelined(
            np.asarray(scores)[:, :b], np.asarray(slots)[:, :b], k
        )

    # -- live re-meshing ----------------------------------------------------
    def adopt_mesh(self, mesh: Mesh) -> None:
        """Install a new topology with EMPTY storage (cold re-host).

        ``remesh()`` moves live data, which requires reading the old
        mesh — impossible when a device is truly unreachable. This
        variant discards in-memory state and re-allocates on the new
        mesh; the caller then reloads from checkpoint (``load()`` /
        ``store.recover()`` place onto the current mesh only)."""
        with self._mu.write():
            if self.axis not in mesh.axis_names:
                raise ValueError(
                    f"new mesh lacks axis {self.axis!r}: {mesh.axis_names}"
                )
            self.mesh = mesh
            self.replica_axis = (
                "replica" if "replica" in mesh.axis_names else None
            )
            self.replicas = (
                int(mesh.shape["replica"]) if self.replica_axis else 1
            )
            self.n_devices = int(mesh.shape[self.axis])
            self._search_cache.clear()
            self._write_fn = None
            self._tombstone_fn = None
            self._write_fn_cow = None
            self._tombstone_fn_cow = None
            self._cap = self._round_cap(max(self._next_slot, 1024))
            self._alloc(self._cap)
            self._size = 0
            self._free = []
            self._next_slot = 0

    def remesh(self, mesh: Mesh) -> None:
        """Re-host the index on a different mesh IN PLACE — the
        degraded-topology failover path (lose a device, keep serving on
        the survivors) and the scale-up path (add devices, re-stripe).

        Slot ids are mesh-independent integers, so external bookkeeping
        (store registries) survives untouched; only the physical
        striping changes: slot ``s`` moves from ``(s % n_old, s // n_old)``
        to ``(s % n_new, s // n_new)``. Data routes through the host
        slot-order view (`_place` re-stripes onto the new mesh) — this
        is a rare disaster-recovery/elasticity event, and the stripe
        permutation is not expressible as a sharded reshape for a
        device-to-device path without a bespoke all-to-all program
        (future optimization).
        """
        with self._mu.write():
            if self.axis not in mesh.axis_names:
                raise ValueError(
                    f"new mesh lacks axis {self.axis!r}: {mesh.axis_names}"
                )
            hwm = self._next_slot
            old_ndev = self.n_devices
            slab_np, valid_np = self._host_slot_view()
            scales_np = self._host_replicated(self._scales).T.reshape(-1)

            # adopt the new topology
            self.mesh = mesh
            self.replica_axis = (
                "replica" if "replica" in mesh.axis_names else None
            )
            self.replicas = (
                int(mesh.shape["replica"]) if self.replica_axis else 1
            )
            self.n_devices = int(mesh.shape[self.axis])
            self._search_cache.clear()
            self._write_fn = None
            self._tombstone_fn = None
            self._write_fn_cow = None
            self._tombstone_fn_cow = None
            new_cap = self._round_cap(max(hwm, 1024))

            def fit(x, fill, dtype):
                out_shape = (new_cap,) + x.shape[1:]
                out = np.full(out_shape, fill, dtype)
                n = min(new_cap, x.shape[0])
                out[:n] = x[:n]
                return out

            self._cap = new_cap
            self._place(
                fit(slab_np, 0, slab_np.dtype),
                fit(valid_np, False, bool),
                fit(scales_np, 1.0, np.float32),
            )
            self._free = [s for s in self._free if s < new_cap]
            import logging

            logging.getLogger("wdbx_tpu.parallel").info(
                "remeshed %d -> %d devices (cap %d, %d live rows)",
                old_ndev, self.n_devices, new_cap, self._size,
            )

    def get_vectors(self, slots: np.ndarray) -> np.ndarray:
        slots = np.asarray(slots, np.int64)
        with self._mu.read():
            slab, _ = self._host_slot_view()
            rows = slab[slots]
            if self._is_int4:
                # host nibble unpack (kernels/quant.py layout: dim j
                # low nibble, dim j + d/2 high)
                lo = (rows & 0xF).astype(np.int8) - 8
                hi = (rows >> 4).astype(np.int8) - 8
                rows = np.concatenate([lo, hi], axis=-1)
            rows = rows.astype(np.float32)
            if self._is_quantized:
                scales = self._host_replicated(self._scales).T.reshape(-1)
                rows = rows * scales[slots][:, None]
        return rows

    # -- persistence -------------------------------------------------------
    def _abstract_arrays(self) -> dict:
        rpd = self._cap // self.n_devices
        out = {
            "slab": jax.ShapeDtypeStruct(
                (self.n_devices, rpd, self._row_width), self._dtype,
                sharding=self._sharding(P(self.axis, None, None)),
            ),
            "valid": jax.ShapeDtypeStruct(
                (self.n_devices, rpd), jnp.bool_,
                sharding=self._sharding(P(self.axis, None)),
            ),
            "scales": jax.ShapeDtypeStruct(
                (self.n_devices, rpd), jnp.float32,
                sharding=self._sharding(P(self.axis, None)),
            ),
        }
        return out

    def save(self, path: str) -> None:
        with self._mu.read():  # exclude slab donation mid-checkpoint
            self._sharded_save_locked(path)

    def _sharded_save_locked(self, path: str) -> None:
        import json
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if self.persist_backend == "orbax":
            # Per-device shard I/O, no host gather — the path that scales
            # to pod-sized slabs.
            from wdbx_tpu.store import persist

            persist.save_arrays(
                path,
                {"slab": self._slab, "valid": self._valid,
                 "scales": self._scales},
            )
            with open(path + ".meta.json", "w") as f:
                json.dump(self._persist_meta(), f)
            return
        # npz: slot-ordered host layout, interchangeable with FlatIndex
        # checkpoints across device counts.
        slab, valid = self._host_slot_view()
        hwm = self._next_slot
        slab = slab[:hwm]
        if slab.dtype not in (np.float32, np.int8, np.uint8):
            slab = slab.view(np.uint16)
        arrays = {"slab": slab, "valid": valid[:hwm]}
        if self._is_quantized:
            arrays["scales"] = self._host_replicated(self._scales).T.reshape(-1)[:hwm]
        np.savez(path + ".npz", **arrays)
        with open(path + ".meta.json", "w") as f:
            json.dump(self._persist_meta(), f)

    def get_stats(self) -> dict:
        stats = super().get_stats()
        stats.update(
            devices=self.n_devices,
            mesh_axis=self.axis,
            replicas=self.replicas,
            rows_per_device=self.rows_per_device,
        )
        return stats
