"""Mesh-sharded cluster-ordered IVF: zero-copy bucket layout × N chips.

Scales ``ClusteredIVFIndex`` (wdbx_tpu/index/clustered.py) over a device
mesh while keeping its memory story (the bucket table IS the slab — no
corpus duplication, so per-chip capacity is the full HBM minus the slab
itself).

Layout: every bucket's rows stripe ROUND-ROBIN across devices — row r
of bucket b lives on device ``r % n_dev`` at the next local position of
that device's copy of b. Each device therefore holds ~1/n of EVERY
bucket, contiguously, in a locally cluster-ordered slab with its own
extents. Consequences:

  * storage balance is exact (±1 row per bucket per device);
  * query load balance is exact: every probe scans ~1/n of its bucket
    on every device simultaneously;
  * global position encoding is the striped one ShardedFlatIndex
    already uses (``pos = local_row * n_dev + device``), so the sharded
    scatter/tombstone machinery and slot-order persistence work
    unchanged, and fresh adds allocated past a uniform local boundary
    land balanced round-robin across devices.

Search is ONE shard_map program: replicated probe selection against
replicated centroids, per-device block dedup over LOCAL extents,
per-device block scan (the scalar-prefetch Pallas kernel on TPU, a
lax scan elsewhere), local residual merge, then a single all-gather of
the (B, k) candidate sets over ICI and an identical merge everywhere.

The disjointness invariant of the single-device class carries over in
global position space (freed positions quarantine until rebuild,
updates move the row, fresh rows start above the block-aligned local
boundary), so no per-row bucket mask is needed in any scan path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from wdbx_tpu.index.clustered import (
    ClusteredSlotMixin, _block_rows, _dedup_blocks,
)
from wdbx_tpu.index.flat import _as_qstack, _next_pow2
from wdbx_tpu.index.ivf import IVFIndex
from wdbx_tpu.ops.kmeans import kmeans
from wdbx_tpu.ops.normalize import l2_normalize
from wdbx_tpu.parallel.sharded_flat import ShardedFlatIndex

NEG = -3.4e38


def _build_clustered_search(
    mesh, axis, *, k, nprobe, u, m, c, precision, int8, normalize,
    use_kernel, interpret, replica_axis=None, use_ranges=False, L=0,
    kern="v1", qprec="bf16", int4=False,
):
    """shard_map'd cluster query; per-batch and (NB,B,d)-stack variants.

    ``use_ranges`` selects the small-batch latency program (r3): each
    device scans the probed buckets' EXACT local row ranges as
    contiguous dynamic slices (per-bucket rows are contiguous within a
    device under round-robin striping). The ``blk_lo_l``/``blk_hi_l``
    operand slots then carry the (n_dev, nlist) local row starts and
    counts instead of block extents — same shapes, same shardings."""

    def _unp(rows):
        # int4 slabs store two signed nibbles per byte: unpack before
        # any contraction (the Pallas kernels unpack per block in VMEM
        # via their own int4 flag; these are the XLA legs)
        if not int4:
            return rows
        from wdbx_tpu.kernels.quant import unpack_int4

        return unpack_int4(rows)

    def local(slab_l, valid_l, scales_l, blk_lo_l, blk_hi_l, centroids,
              residual_l, rcount_l, q):
        n_dev = jax.lax.axis_size(axis)
        rpd = slab_l.shape[1]
        d = slab_l.shape[2]
        b = q.shape[0]
        if normalize:
            q = l2_normalize(q)
        cs = jax.lax.dot_general(
            q, centroids, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        p_eff = min(nprobe, centroids.shape[0])
        _, probe = jax.lax.top_k(cs, p_eff)
        slab2 = slab_l[0]  # (rpd, d) — local inside shard_map
        valid1 = valid_l[0]
        scales1 = scales_l[0]
        if not use_ranges:
            nblocks = rpd // c
            uniq, ok = _dedup_blocks(
                probe, blk_lo_l[0], blk_hi_l[0], nblocks, u, m,
                valid=valid_l[0], c=c,
            )
        if use_ranges:
            row_lo1, row_cnt1 = blk_lo_l[0], blk_hi_l[0]
            Ls = max(1, min(L, rpd))
            flat_probe = probe.reshape(-1)
            owner = jax.lax.broadcasted_iota(
                jnp.int32, (b, p_eff), 0
            ).reshape(-1)

            def step(carry, x):
                pj, ow = x
                lo = jnp.take(row_lo1, pj)
                cnt = jnp.take(row_cnt1, pj)
                # aligned slice starts (see index/clustered.py ranges)
                start = jnp.clip((lo // 512) * 512, 0, rpd - Ls)
                rows = jax.lax.dynamic_slice(
                    slab2, (start, jnp.int32(0)), (Ls, d)
                )
                v = jax.lax.dynamic_slice(valid1, (start,), (Ls,))
                pos = start + jnp.arange(Ls, dtype=jnp.int32)
                in_bucket = v & (pos >= lo) & (pos < lo + cnt)
                if int8:
                    s = jax.lax.dot_general(
                        q.astype(jnp.bfloat16),
                        _unp(rows).astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    ) * jax.lax.dynamic_slice(
                        scales1, (start,), (Ls,)
                    )[None, :]
                else:
                    s = jax.lax.dot_general(
                        q.astype(rows.dtype), rows,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                is_owner = jax.lax.broadcasted_iota(
                    jnp.int32, (b, 1), 0
                ) == ow
                s = jnp.where(is_owner & in_bucket[None, :], s, -jnp.inf)
                return carry, (s, pos)

            _, (ss, pp) = jax.lax.scan(step, 0, (flat_probe, owner))
            flat_s = jnp.moveaxis(ss, 0, 1).reshape(b, -1)
            flat_p = jnp.broadcast_to(
                pp.reshape(1, -1), (b, pp.size)
            )
            k_eff = min(k, flat_s.shape[-1])
            s_loc, sel = jax.lax.top_k(flat_s, k_eff)
            kp = jnp.take_along_axis(flat_p, sel, axis=-1)
            if k_eff < k:
                s_loc = jnp.pad(s_loc, ((0, 0), (0, k - k_eff)),
                                constant_values=-jnp.inf)
                kp = jnp.pad(kp, ((0, 0), (0, k - k_eff)),
                             constant_values=0)
        elif use_kernel:
            from wdbx_tpu.kernels.clustered_scan import (
                clustered_block_topk,
                clustered_block_topk_v2,
            )

            sc_arg = (
                scales1.astype(jnp.float32).reshape(1, -1) if int8
                else None
            )
            if kern == "v2":
                kv, kp = clustered_block_topk_v2(
                    slab2, valid1.astype(jnp.int8).reshape(1, -1),
                    sc_arg,
                    uniq.astype(jnp.int32), ok.astype(jnp.int32),
                    q if int8 else q.astype(slab2.dtype),
                    k=min(k, rpd), c=c, interpret=interpret,
                    qprec=qprec, int4=int4,
                )
            else:
                qk = (q.astype(jnp.bfloat16) if int8
                      else q.astype(slab2.dtype))
                kv, kp = clustered_block_topk(
                    slab2, valid1.astype(jnp.int8).reshape(1, -1),
                    sc_arg,
                    uniq.astype(jnp.int32), ok.astype(jnp.int32), qk,
                    k=min(k, rpd), c=c, interpret=interpret,
                )
            s_loc = jnp.where(kv <= NEG, -jnp.inf, kv)
            if s_loc.shape[-1] < k:  # k can exceed rows_per_device
                pad = k - s_loc.shape[-1]
                s_loc = jnp.pad(s_loc, ((0, 0), (0, pad)),
                                constant_values=-jnp.inf)
                kp = jnp.pad(kp, ((0, 0), (0, pad)), constant_values=0)
        else:
            # portable lax block scan — kernel semantics (no bucket
            # mask; disjointness invariant makes foreign rows free
            # extra candidates)
            slab3 = slab2.reshape(nblocks, c, d)
            v2 = valid1.reshape(nblocks, c)
            s2 = scales1.reshape(nblocks, c)
            k_blk = min(k, c)

            def step(carry, x):
                blk, okk = x
                rows = _unp(
                    jax.lax.dynamic_index_in_dim(slab3, blk, 0, False)
                )
                v = jax.lax.dynamic_index_in_dim(v2, blk, 0, False)
                if int8:
                    sc = jax.lax.dynamic_index_in_dim(s2, blk, 0, False)
                    s = jax.lax.dot_general(
                        q.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    ) * sc[None, :]
                else:
                    s = jax.lax.dot_general(
                        q.astype(rows.dtype), rows, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                s = jnp.where(v[None, :] & okk, s, -jnp.inf)
                if s.shape[-1] >= 16 * k_blk:
                    v_, i_ = jax.lax.approx_max_k(
                        s, k_blk, recall_target=0.998
                    )
                else:
                    v_, i_ = jax.lax.top_k(s, k_blk)
                return carry, (v_, blk * c + i_)

            _, (vals, pos) = jax.lax.scan(step, 0, (uniq, ok))
            u_eff = vals.shape[0]
            flat_s = vals.transpose(1, 0, 2).reshape(b, u_eff * k_blk)
            flat_p = pos.transpose(1, 0, 2).reshape(b, u_eff * k_blk)
            k_eff = min(k, flat_s.shape[-1])
            s_loc, sel = jax.lax.top_k(flat_s, k_eff)
            kp = jnp.take_along_axis(flat_p, sel, axis=-1)
            if k_eff < k:
                s_loc = jnp.pad(s_loc, ((0, 0), (0, k - k_eff)),
                                constant_values=-jnp.inf)
                kp = jnp.pad(kp, ((0, 0), (0, k - k_eff)),
                             constant_values=0)

        # local residual (fresh rows on THIS device)
        r_cap = residual_l.shape[1]
        if r_cap:
            rpos = residual_l[0]
            rows = _unp(slab2[rpos])
            if int8:
                rows = rows.astype(jnp.bfloat16)
                rq = q.astype(jnp.bfloat16)
            else:
                rq = q.astype(rows.dtype)
            r_s = jax.lax.dot_general(
                rq, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            if int8:
                r_s = r_s * scales1[rpos][None, :]
            live = jnp.arange(r_cap) < rcount_l[0]
            r_valid = jnp.logical_and(valid1[rpos], live)
            r_s = jnp.where(r_valid[None, :], r_s, -jnp.inf)
            all_s = jnp.concatenate([s_loc, r_s], axis=-1)
            all_p = jnp.concatenate(
                [kp, jnp.broadcast_to(rpos, (b, r_cap))], axis=-1
            )
            s_loc, sel = jax.lax.top_k(all_s, k)
            kp = jnp.take_along_axis(all_p, sel, axis=-1)

        # local row -> global striped position, then ICI merge
        gp = kp * n_dev + jax.lax.axis_index(axis)
        gp = jnp.where(s_loc == -jnp.inf, -1, gp)
        all_s = jax.lax.all_gather(s_loc, axis, axis=1, tiled=True)
        all_p = jax.lax.all_gather(gp, axis, axis=1, tiled=True)
        top, sel = jax.lax.top_k(all_s, min(k, all_s.shape[-1]))
        return top, jnp.take_along_axis(all_p, sel, axis=1)

    # On a (replica, shard) mesh the slab/extents replicate over the
    # replica axis (absent from their specs) while the query batch
    # shards over it — data-parallel serving on top of corpus sharding,
    # same scheme as ShardedFlatIndex.
    slab_specs = (
        P(axis, None, None), P(axis, None), P(axis, None),
        P(axis, None), P(axis, None), P(), P(axis, None), P(axis),
    )
    q_spec = P(replica_axis, None)
    mapped = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=slab_specs + (q_spec,),
        out_specs=(q_spec, q_spec),
        check_vma=False,
    ))

    def local_stack(slab_l, valid_l, scales_l, blk_lo_l, blk_hi_l,
                    centroids, residual_l, rcount_l, qstack):
        def step(carry, q):
            s, i = local(slab_l, valid_l, scales_l, blk_lo_l, blk_hi_l,
                         centroids, residual_l, rcount_l, q)
            return carry, (s, i)

        _, out = jax.lax.scan(step, 0, qstack)
        return out

    qs_spec = P(None, replica_axis, None)
    pipelined = jax.jit(jax.shard_map(
        local_stack, mesh=mesh,
        in_specs=slab_specs + (qs_spec,),
        out_specs=(qs_spec, qs_spec),
        check_vma=False,
    ))
    mapped.pipelined = pipelined
    return mapped


class ShardedClusteredIndex(ClusteredSlotMixin, IVFIndex, ShardedFlatIndex):
    """Cluster-ordered IVF striped over a mesh (see module docstring).

    MRO mirrors ShardedIVFIndex: IVF triggers/tuning above
    ShardedFlatIndex storage. Memory per chip = corpus/n_dev + ~9
    bytes/row of bookkeeping — the multi-chip extension of the index
    that fits 10M x 768 int8 on one chip.
    """

    kind = "sharded_clustered"
    #: the per-device v2 scan kernel unpacks int4 nibbles per block
    #: in VMEM — the capacity tier scales across the mesh here
    _INT4_OK = True

    def __init__(self, dim, metric="cosine", dtype="float32",
                 capacity=1024, mesh=None, axis="shard", nlist=128,
                 nprobe=8, train_threshold=4096, rebuild_fraction=0.2,
                 kmeans_iters=15, train_sample=262_144, replicas=1):
        ShardedFlatIndex.__init__(
            self, dim, metric=metric, dtype=dtype, capacity=capacity,
            mesh=mesh, axis=axis, replicas=replicas,
        )
        self.nlist = nlist
        self.nprobe = nprobe
        self.assignments = 1
        self.train_threshold = train_threshold
        self.rebuild_fraction = rebuild_fraction
        self.kmeans_iters = kmeans_iters
        self.train_sample = train_sample
        self.batch_flat_fallback = True
        self.topk_method = "auto"
        self.block_bytes_target = 786_432
        #: "auto" | "pallas" | "lax" (see ClusteredIVFIndex)
        self.ivf_kernel = "auto"
        #: batches at/below this take the exact-bucket-range latency
        #: program (see ClusteredIVFIndex.latency_path)
        self.small_batch_threshold = 4
        self.latency_path = "auto"
        #: when True, optimize() uses build_background() (serving keeps
        #: the old layout during the rebuild); config key
        #: IVF_BACKGROUND_REBUILD. Needs 2x-slab HBM headroom.
        self.background_rebuild = False
        self._filter_boosts: dict[int, int] = {}
        self._cluster_cache: dict[tuple, object] = {}
        self._reset_overlay()

    # -- overlay state -------------------------------------------------------
    def _reset_overlay(self) -> None:
        self._centroids = None  # (nlist, d) replicated
        self._centroids_np = None
        self._blk_lo = None  # (n_dev, nlist) int32, sharded
        self._blk_hi = None
        self._row_lo = None  # (n_dev, nlist) int32, sharded
        self._row_cnt = None
        self._range_L = 1
        self._local_counts: np.ndarray | None = None  # (n_dev, nlist)
        self._local_starts: np.ndarray | None = None  # (n_dev, nlist+1)
        self._m = 1
        self._c = 1
        self._u_prefix: np.ndarray | None = None
        self._nonempty = 0
        self._avg_blocks = 1.0
        self._residual: list[int] = []  # GLOBAL striped positions
        self._residual_base = 0
        self._built_size = 0
        # bucket -> quarantined positions in that bucket's extent (-1 =
        # bucket unknown; see ClusteredSlotMixin)
        self._quar: dict[int, list[int]] = {}
        self._quar_n = 0
        self._fresh_base = 0  # positions >= this are residual-region
        self._slot_of = np.full(self._cap, -1, np.int32)
        self._pos_of = np.full(self._cap, -1, np.int32)
        self._free_slots: list[int] = []
        self._next_ext_slot = 0
        self._cluster_cache = getattr(self, "_cluster_cache", {})
        self._cluster_cache.clear()

    def _grow(self, need: int) -> None:
        old_cap = self._cap
        slot_of, pos_of = self._slot_of, self._pos_of
        ShardedFlatIndex._grow(self, need)
        so = np.full(self._cap, -1, np.int32)
        so[:old_cap] = slot_of
        self._slot_of = so
        po = np.full(self._cap, -1, np.int32)
        po[:old_cap] = pos_of
        self._pos_of = po

    def clear(self) -> None:
        with self._mu.write():
            ShardedFlatIndex.clear(self)
            self._reset_overlay()
            # storage replaced wholesale: abandon any in-flight
            # background build's snapshot at swap time
            self._invalidate_bg_window()

    def _invalidate_bg_window(self) -> None:
        """Kill any in-flight background rebuild (caller holds the
        write lock). Bumping the generation makes the builder abandon
        its snapshot at swap time; releasing the COW window HERE (not
        at the builder's eventual swap) matters because callers like
        ``remesh`` immediately issue a blocking ``build()`` that would
        otherwise hit ``_build_locked``'s in-flight early-return and
        silently skip the rebuild they promised."""
        self._layout_gen = getattr(self, "_layout_gen", 0) + 1
        self._cow_writes = False
        self._bg_journal = {}

    def optimize(self, background: bool | None = None) -> None:
        """Rebuild the striped cluster layout. ``background`` forces
        the serve-through COW path on/off for THIS call only; ``None``
        defers to the configured ``background_rebuild``."""
        if self._size > 0:
            bg = self.background_rebuild if background is None else background
            if bg:
                self.build_background()
            else:
                self.build()

    def compact(self):
        with self._mu.write():
            self._build_locked()
            live = np.nonzero(self._slot_of >= 0)[0]
            slots = np.sort(self._slot_of[live].astype(np.int64))
            return slots, slots

    # -- build ---------------------------------------------------------------
    def build_from(self, chunks_factory, *, train_chunks: int = 1):
        """Chunked bulk load + one clustered build (API parity with
        :meth:`ClusteredIVFIndex.build_from`). Mesh-striped slabs take
        adds through the flat overlay and permute into stripes at
        ``build()``, so the single-device engine's two-pass streaming
        layout does not apply — each chunk lands once (device arrays
        stay on device; the scatter rides the jit dispatch) and the
        build runs at the end. ``train_chunks`` is accepted for
        signature parity; training draws from ``train_sample`` rows of
        the built slab. Returns ``(n_total,)`` slot ids in source
        order."""
        if self._size:
            raise ValueError("build_from requires an empty index")
        slots = [np.empty(0, np.int64)]
        for rows in chunks_factory():
            slots.append(np.asarray(self.add_batch(rows), np.int64))
        self.build()
        return np.concatenate(slots)

    def build(self) -> None:
        with self._mu.write():
            self._build_locked()

    def _build_locked(self) -> None:
        if getattr(self, "_cow_writes", False):
            # a background rebuild is in flight; it swaps in shortly —
            # a second (blocking) build here would clobber its snapshot
            return
        hwm = self._next_slot
        if self._size == 0 or hwm == 0:
            self._reset_overlay()
            return
        n_dev = self.n_devices
        valid_h = self._host_replicated(self._valid).T.reshape(-1)[:hwm]
        live_pos = np.nonzero(valid_h)[0].astype(np.int64)
        n_live = len(live_pos)

        centroids, assign = self._plan_clusters(
            self._slab, self._scales, live_pos, n_dev
        )
        order, dest, local_counts, local_starts = self._striped_layout(
            assign, len(centroids), n_dev
        )

        # Round-robin striping hands low-numbered devices up to one
        # extra row per bucket, so the max per-device row count can
        # exceed rows_per_device at high occupancy — grow first (striped
        # global positions survive a grow: s % n_dev is unchanged).
        need_local = int(local_starts[:, -1].max()) if n_live else 0
        if need_local > self.rows_per_device:
            self._grow(need_local * n_dev)

        src_global = live_pos[order]
        slab_n, valid_n, scales_n = self._permute_striped(
            self._slab, self._scales, src_global, dest, self._cap, n_dev
        )
        self._install_striped(
            src_global, dest, local_counts, local_starts, centroids,
            slab_n, valid_n, scales_n,
        )

    def _plan_clusters(self, slab, scales, live_pos, n_dev):
        """Train centroids + assign every live row, reading ONLY the
        explicit array operands (so the background build can run it
        off-lock against an immutable snapshot)."""
        n_live = len(live_pos)
        repl = self._sharding(P())

        @jax.jit
        def gather_rows(slab, scales, pos):
            dev, row = pos % n_dev, pos // n_dev
            # gathers from sharded operands need an explicit out sharding
            rows = slab.at[dev, row].get(out_sharding=repl)
            if self._is_int4:
                from wdbx_tpu.kernels.quant import unpack_int4

                rows = unpack_int4(rows)
            rows = rows.astype(jnp.float32)
            if self._is_quantized:
                scl = scales.at[dev, row].get(out_sharding=repl)
                rows = rows * scl[:, None]
            if self.metric == "cosine":
                rows = rows / jnp.maximum(
                    jnp.linalg.norm(rows, axis=-1, keepdims=True), 1e-12
                )
            return rows

        nlist = min(self.nlist, n_live)
        sample = live_pos
        if n_live > self.train_sample:
            sel = np.random.default_rng(0).choice(
                n_live, self.train_sample, replace=False
            )
            sample = live_pos[np.sort(sel)]
        train = gather_rows(slab, scales, jnp.asarray(sample))
        centroids, _ = kmeans(
            train, num_clusters=nlist, iters=self.kmeans_iters
        )
        del train

        from wdbx_tpu.index.clustered import _assign_blocked

        chunk = 131_072
        assign = np.empty(n_live, np.int32)
        for i in range(0, n_live, chunk):
            end = min(i + chunk, n_live)
            rows_chunk = gather_rows(
                slab, scales, jnp.asarray(live_pos[i:end])
            )
            assign[i:end] = np.asarray(_assign_blocked(rows_chunk, centroids))
            del rows_chunk
        return np.asarray(centroids), assign

    def _striped_layout(self, assign, nlist, n_dev):
        """Pure-numpy striped cluster layout: rows of bucket b, in
        stable order, go to device (rank % n_dev) at local rank
        (rank // n_dev); device-local layout is bucket-contiguous over
        that device's subset."""
        n_live = len(assign)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        counts = np.bincount(assign, minlength=nlist)
        starts = np.zeros(nlist + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        rank_in_bucket = np.arange(n_live) - starts[sorted_assign]
        dev = (rank_in_bucket % n_dev).astype(np.int64)
        local_rank = rank_in_bucket // n_dev
        # per-(device, bucket) counts and local starts
        local_counts = np.zeros((n_dev, nlist), np.int64)
        np.add.at(local_counts, (dev, sorted_assign), 1)
        local_starts = np.zeros((n_dev, nlist + 1), np.int64)
        np.cumsum(local_counts, axis=1, out=local_starts[:, 1:])
        local_row = local_starts[dev, sorted_assign] + local_rank
        dest = (local_row * n_dev + dev).astype(np.int64)  # global striped
        return order, dest, local_counts, local_starts

    def _permute_striped(self, slab, scales, src_global, dest, cap, n_dev):
        """Move live rows of the explicit (snapshot-safe) source arrays
        into FRESH arrays at ``cap`` in cluster-striped order. Peak HBM
        = old slab + new slab (2x corpus transient)."""
        repl = self._sharding(P())
        slab_s = self._sharding(P(self.axis, None, None))
        v_s = self._sharding(P(self.axis, None))
        rpd = cap // n_dev
        slab_n = jax.device_put(
            jnp.zeros((n_dev, rpd, self._row_width), self._dtype), slab_s
        )
        valid_n = jax.device_put(jnp.zeros((n_dev, rpd), jnp.bool_), v_s)
        scales_n = jax.device_put(jnp.ones((n_dev, rpd), jnp.float32), v_s)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def move(slab_new, valid_new, scales_new, slab_old, scales_old,
                 src, dst):
            sdev, srow = src % n_dev, src // n_dev
            ddev, drow = dst % n_dev, dst // n_dev
            rows = slab_old.at[sdev, srow].get(out_sharding=repl)
            sc = scales_old.at[sdev, srow].get(out_sharding=repl)
            slab_new = slab_new.at[ddev, drow].set(rows, out_sharding=slab_s)
            scales_new = scales_new.at[ddev, drow].set(sc, out_sharding=v_s)
            valid_new = valid_new.at[ddev, drow].set(True, out_sharding=v_s)
            return slab_new, valid_new, scales_new

        chunk = 131_072
        for i in range(0, len(src_global), chunk):
            end = min(i + chunk, len(src_global))
            slab_n, valid_n, scales_n = move(
                slab_n, valid_n, scales_n, slab, scales,
                jnp.asarray(src_global[i:end]), jnp.asarray(dest[i:end]),
            )
        return slab_n, valid_n, scales_n

    def _install_striped(
        self, src_global, dest, local_counts, local_starts, centroids,
        slab_n, valid_n, scales_n, slot_src=None, prebuilt=None,
    ) -> None:
        """Swap the permuted arrays in and rebuild mappings + overlay
        (write lock held by the caller). ``slot_src`` overrides the
        slot-of-position map labeling dest rows — the background build
        passes its snapshot (the live ``_slot_of`` has drifted for rows
        it replays separately). ``prebuilt`` = (slot_of, pos_of) maps
        computed OFF the lock by ``_prepare_bg_swap`` + delta fixup
        (the O(cap) fills below stall p99 at 10M+ rows)."""
        n_dev = self.n_devices
        self._slab, self._valid, self._scales = slab_n, valid_n, scales_n

        if prebuilt is not None:
            self._slot_of, self._pos_of = prebuilt
        else:
            # host slot mapping follows the permutation
            slot_at_dest = (
                self._slot_of if slot_src is None else slot_src
            )[src_global]
            self._slot_of[:] = -1
            self._slot_of[dest] = slot_at_dest
            self._pos_of[:] = -1
            keep = slot_at_dest >= 0
            self._pos_of[slot_at_dest[keep]] = dest[keep].astype(np.int32)

        self._install_layout(np.asarray(centroids), local_counts)
        self._free = []
        self._quar = {}
        self._quar_n = 0
        # uniform local boundary: max aligned local clustered end
        max_local = int(local_starts[:, -1].max()) if len(src_global) else 0
        boundary = -(-max_local // self._c) * self._c
        self._next_slot = min(self._cap, boundary * n_dev)
        self._fresh_base = self._next_slot
        self._residual = []
        self._residual_base = 0
        self._built_size = self._size

    def build_background(self) -> None:
        """Rebuild the striped cluster layout WITHOUT blocking searches
        — the sharded analog of ``ClusteredIVFIndex.build_background``
        (the reference's ``optimize`` is stop-the-world, reference
        wdbx/core/indexing.py:1124-1149; at multi-chip corpus scale a
        blocking rebuild stalls serving for minutes).

        Three phases: (1) brief write lock — snapshot array handles and
        flip mutators to copy-on-write (sharded writes switch to their
        non-donating variants so the snapshot buffers survive);
        (2) OFF-lock — train/assign/permute against the snapshot into
        fresh sharded arrays while searches and mutations proceed;
        (3) brief write lock — drop journaled rows from the new layout,
        swap it in, and replay mutated slots into the fresh region.

        Falls back to the blocking build at swap time when capacity
        changed mid-window (a grow donated nothing — the snapshot is
        intact — but the permuted arrays no longer fit) or when the
        striping would overflow rows_per_device (growth cannot happen
        off-lock). A ``remesh``/``clear``/``load`` during the window
        bumps ``_layout_gen`` and the stale snapshot is abandoned.

        Peak HBM: 2x slab (+1x transiently per COW mutation batch)."""
        with self._mu.write():
            if getattr(self, "_cow_writes", False):
                return  # already rebuilding
            hwm = self._next_slot
            if self._size == 0 or hwm == 0:
                self._reset_overlay()
                return
            self._cow_writes = True
            self._bg_journal: dict[int, str] = {}
            n_dev = self.n_devices
            snap_slab, snap_scales = self._slab, self._scales
            snap_valid_h = (
                self._host_replicated(self._valid).T.reshape(-1)[:hwm]
            )
            snap_slot_of = self._slot_of.copy()
            snap_cap = self._cap
            snap_gen = getattr(self, "_layout_gen", 0)
        overflow = False
        slab_n = valid_n = scales_n = None
        try:
            live_pos = np.nonzero(snap_valid_h)[0].astype(np.int64)
            centroids, assign = self._plan_clusters(
                snap_slab, snap_scales, live_pos, n_dev
            )
            order, dest, local_counts, local_starts = self._striped_layout(
                assign, len(centroids), n_dev
            )
            src_global = live_pos[order]
            need_local = (
                int(local_starts[:, -1].max()) if len(live_pos) else 0
            )
            if need_local > snap_cap // n_dev:
                overflow = True  # growth can't happen off-lock
                merged, staged, prep = {}, None, None
            else:
                slab_n, valid_n, scales_n = self._permute_striped(
                    snap_slab, snap_scales, src_global, dest, snap_cap,
                    n_dev,
                )
                # pre-stage the window's journal OFF-lock and pre-build
                # the post-swap slot maps (see the single-device twin):
                # the swap pays only the final delta
                merged, staged = self._prestage_bg_journal(
                    lambda p: ShardedFlatIndex.get_vectors(self, p),
                    snap_gen,
                )
                prep = self._prepare_bg_swap(
                    snap_slot_of, src_global, dest, merged, snap_cap
                )
        except BaseException:
            # Phase 2 reads live mesh handles (self._sharding/axis) off
            # the lock, so a concurrent remesh/clear/load can make the
            # jitted gather/permute fail mid-flight (donated or
            # re-striped operands). That failure belongs to a dead
            # generation: abandon quietly. A same-generation failure is
            # real — release OUR window (only ours: the invalidation
            # site may have opened a new one) and surface it.
            with self._mu.write():
                stale = getattr(self, "_layout_gen", 0) != snap_gen
                if not stale:
                    self._cow_writes = False
            if stale:
                return
            raise
        with self._mu.write():
            try:
                if getattr(self, "_layout_gen", 0) != snap_gen:
                    # clear()/load()/remesh replaced storage mid-build:
                    # the snapshot is from a dead generation — abandon
                    # (the invalidation site already released the COW
                    # window; a new build may even own it by now)
                    return
                if (self._cap != snap_cap or overflow
                        or self.n_devices != n_dev):
                    self._cow_writes = False
                    self._build_locked()
                    return
                delta = self._bg_journal
                self._bg_journal = {}
                merged.update(delta)
                new_slot_of, new_pos_of, pre_dead = prep
                dirty, rows = self._bg_dirty_rows(
                    merged,
                    lambda p: ShardedFlatIndex.get_vectors(self, p),
                    staged=staged, refetch=delta,
                )
                extra_dead = self._bg_delta_fixup(
                    delta, new_slot_of, new_pos_of
                )
                dead_dest = (
                    np.concatenate([pre_dead, extra_dead])
                    if len(extra_dead) else pre_dead
                )
                if len(dead_dest):
                    pad_n = _next_pow2(len(dead_dest))
                    pd = jnp.asarray(np.pad(
                        dead_dest, (0, pad_n - len(dead_dest)),
                        constant_values=snap_cap,  # OOB pad drops
                    ))
                    v_s = self._sharding(P(self.axis, None))
                    valid_n = jax.jit(
                        lambda v, s: v.at[s % n_dev, s // n_dev].set(
                            False, out_sharding=v_s
                        )
                    )(valid_n, pd)
                self._cow_writes = False
                self._install_striped(
                    src_global, dest, local_counts, local_starts,
                    centroids, slab_n, valid_n, scales_n,
                    prebuilt=(new_slot_of, new_pos_of),
                )
                if rows is not None and len(dirty):
                    self._replay_bg_dirty(dirty, rows)
            finally:
                # release only OUR window: on the stale-generation
                # abandon path the invalidation site already closed it,
                # and a new build may own the flag by now
                if getattr(self, "_layout_gen", 0) == snap_gen:
                    self._cow_writes = False

    def _install_layout(
        self, centroids: np.ndarray, local_counts: np.ndarray,
        c: int | None = None,
    ) -> None:
        n_dev, nlist = local_counts.shape
        rpd = self.rows_per_device
        if c is None:
            # row bytes via the STORAGE width (int4 packs two dims/byte)
            c = _block_rows(
                self._row_width, np.dtype(self._dtype).itemsize, rpd,
                target=self.block_bytes_target,
            )
        # NOTE: load() passes the PERSISTED c — recomputing from the
        # current capacity can change the block geometry and move the
        # fresh-row boundary inside a scanned block (duplicate results).
        self._c = c
        local_starts = np.zeros((n_dev, nlist + 1), np.int64)
        np.cumsum(local_counts, axis=1, out=local_starts[:, 1:])
        blk_lo = (local_starts[:, :-1] // c).astype(np.int32)
        blk_hi = (-(-local_starts[:, 1:] // c)).astype(np.int32)
        blk_n = blk_hi - blk_lo
        nonempty = local_counts > 0
        self._m = _next_pow2(
            max(1, int(blk_n[nonempty].max()) if nonempty.any() else 1)
        )
        self._nonempty = int(nonempty.any(axis=0).sum())
        self._avg_blocks = (
            float(blk_n[nonempty].mean()) if nonempty.any() else 1.0
        )
        # worst-case prefix over the max-per-bucket block counts
        per_bucket_max = blk_n.max(axis=0)
        self._u_prefix = np.cumsum(
            np.sort(per_bucket_max[per_bucket_max > 0])[::-1]
        )
        self._local_counts = local_counts
        self._local_starts = local_starts
        sh = self._sharding(P(self.axis, None))
        self._centroids = jax.device_put(
            jnp.asarray(centroids, jnp.float32), self._sharding(P())
        )
        # host mirror for persistence (see ClusteredIVFIndex)
        self._centroids_np = np.asarray(centroids, np.float32)
        self._blk_lo = jax.device_put(jnp.asarray(blk_lo), sh)
        self._blk_hi = jax.device_put(jnp.asarray(blk_hi), sh)
        # exact per-(device, bucket) row ranges for the small-batch
        # ranges path; L = static slice length (max local bucket rows)
        self._row_lo = jax.device_put(
            jnp.asarray(local_starts[:, :-1].astype(np.int32)), sh
        )
        self._row_cnt = jax.device_put(
            jnp.asarray(local_counts.astype(np.int32)), sh
        )
        maxc = int(local_counts.max()) if local_counts.size else 1
        # +512 margin: slice starts round down to a 512 boundary
        self._range_L = int(
            max(1, min(rpd, -(-max(1, maxc) // 512) * 512 + 512))
        )
        self._cluster_cache.clear()

    def _bucket_of_pos(self, pos: np.ndarray) -> np.ndarray:
        """Bucket whose per-device extent covers each clustered-region
        position (striping: device = pos % n_dev, local row =
        pos // n_dev); -1 when the layout is unknown."""
        pos = np.asarray(pos, np.int64)
        starts = self._local_starts
        if starts is None:
            return np.full(len(pos), -1, np.int64)
        dev, row = pos % self.n_devices, pos // self.n_devices
        out = np.full(len(pos), -1, np.int64)
        for d in np.unique(dev):
            m = dev == d
            out[m] = np.searchsorted(starts[d], row[m], side="right") - 1
        return out

    # -- query ---------------------------------------------------------------
    def _scan_rows(self) -> int:
        return self.rows_per_device

    def _residual_arrays(self):
        """Pack global residual positions into a per-device (n_dev,
        r_cap) LOCAL-row table + per-device counts."""
        n_dev = self.n_devices
        res = np.asarray(self._residual, np.int64)
        per_dev: list[np.ndarray] = [
            res[res % n_dev == j] // n_dev for j in range(n_dev)
        ]
        r_max = max((len(p) for p in per_dev), default=0)
        r_cap = _next_pow2(max(r_max, 1)) if r_max else 0
        table = np.full((n_dev, max(r_cap, 1)), self.rows_per_device,
                        np.int32)
        counts = np.zeros((n_dev,), np.int32)
        for j, p in enumerate(per_dev):
            table[j, : len(p)] = p.astype(np.int32)
            counts[j] = len(p)
        if r_cap == 0:
            table = table[:, :0]
        return table, counts

    def _search_fn(self, k, nprobe, u, use_ranges=False):
        qprec = getattr(self, "kernel_qprec", "bf16")
        key = (k, nprobe, u, self._m, self._c, self._cap,
               self._use_kernel(k), use_ranges, self._range_L,
               self._kernel_gen(), qprec)
        fn = self._cluster_cache.get(key)
        if fn is None:
            fn = _build_clustered_search(
                self.mesh, self.axis, k=k, nprobe=nprobe, u=u, m=self._m,
                c=self._c, precision=self._precision,
                int8=self._is_quantized,
                normalize=self.metric == "cosine",
                use_kernel=self._use_kernel(k),
                interpret=jax.default_backend() != "tpu",
                replica_axis=self.replica_axis,
                use_ranges=use_ranges, L=self._range_L,
                kern=self._kernel_gen(), qprec=qprec,
                int4=self._is_int4,
            )
            self._cluster_cache[key] = fn
        return fn

    def _use_ranges(self, pad_b: int, nprobe: int) -> bool:
        lp = getattr(self, "latency_path", "auto")
        if lp in ("narrow", "wide") or self._row_lo is None:
            return False
        if lp == "ranges":
            return True
        nlist = int(self._row_cnt.shape[1]) if self._row_cnt is not None \
            else 1
        # bytes-based footprint gate (see ClusteredIVFIndex._use_ranges:
        # the static slice length is max-bucket-sized, so the rows-only
        # gate mispicked ranges at 10M×768 where narrow reads ~3x less)
        bytes_per_row = self._slab.shape[-1] * self._slab.dtype.itemsize
        read = self._range_L * min(nprobe, nlist)
        return (
            pad_b <= self.small_batch_threshold
            and read * bytes_per_row <= 1 << 23
        )

    def search(self, queries, k, slot_mask=None):
        if self._needs_build():
            with self._mu.write():
                self._maybe_build()
        with self._mu.read():
            if not self.is_trained:
                scores, pos = ShardedFlatIndex.search(
                    self, queries, k, self._pos_mask(slot_mask)
                )
                return self._map_pos_to_slots(scores, pos)
            queries = self._prep(queries)
            b = len(queries)
            # batch shards over the replica axis; keep it divisible
            # (round UP to a replica multiple)
            pad_b = _next_pow2(max(b, 1))
            pad_b = -(-pad_b // self.replicas) * self.replicas
            nlist = int(self._centroids.shape[0])
            nprobe = min(self.nprobe, nlist)
            pm, nprobe, use_exact = self._filter_plan(
                slot_mask, nprobe, nlist
            )
            u = self._scan_u(pad_b, nprobe)
            if use_exact or (
                self.batch_flat_fallback
                and u * self._c * self.n_devices >= max(1, self._size)
            ):
                scores, pos = ShardedFlatIndex.search(self, queries, k, pm)
                return self._map_pos_to_slots(scores, pos)
            valid = self._valid
            if pm is not None:
                # filter pushdown: stripe the position mask like the
                # slab (global pos = local_row * n_dev + device) and AND
                # it into row validity — the block scan and residual
                # legs then drop filtered rows on device
                mask2 = pm.reshape(self.rows_per_device, self.n_devices).T
                valid = jnp.logical_and(
                    valid,
                    jax.device_put(
                        jnp.asarray(np.ascontiguousarray(mask2)),
                        self._sharding(P(self.axis, None)),
                    ),
                )
            q = np.pad(np.asarray(queries, np.float32),
                       ((0, pad_b - b), (0, 0)))
            table, counts = self._residual_arrays()
            ranges = self._use_ranges(pad_b, nprobe)
            fn = self._search_fn(k, nprobe, u, use_ranges=ranges)
            ext_lo = self._row_lo if ranges else self._blk_lo
            ext_hi = self._row_cnt if ranges else self._blk_hi
            scores, pos = fn(
                self._slab, valid, self._scales, ext_lo,
                ext_hi, self._centroids,
                jax.device_put(jnp.asarray(table),
                               self._sharding(P(self.axis, None))),
                jax.device_put(jnp.asarray(counts),
                               self._sharding(P(self.axis))),
                q,
            )
            # full host gather, then slice: partial slices of replica-
            # sharded outputs are ambiguous for the partitioner
            scores, pos = jax.device_get((scores, pos))
        return self._map_pos_to_slots(
            np.asarray(scores)[:b], np.asarray(pos, np.int64)[:b]
        )

    def search_pipelined(self, qstack, k, materialize: bool = True):
        """(NB, B, d) stack in one mesh dispatch. ``materialize=False``
        returns an opaque in-flight handle for double-buffered serving;
        resolve with ``resolve_pipelined`` before mutating the index
        (positions map to slots at resolve time)."""
        if self._needs_build():
            with self._mu.write():
                self._maybe_build()
        with self._mu.read():
            if not self.is_trained:
                if not materialize:
                    h = ShardedFlatIndex.search_pipelined(
                        self, qstack, k, materialize=False
                    )
                    return ("sclu_flat", h)
                scores, pos = ShardedFlatIndex.search_pipelined(
                    self, qstack, k
                )
                return self._map_pos_to_slots(scores, pos)
            qstack = _as_qstack(qstack)
            nb, b, _ = qstack.shape
            pad_b = _next_pow2(max(b, 1))
            pad_b = -(-pad_b // self.replicas) * self.replicas
            if pad_b != b:
                # dtype-preserving pad (half-precision stacks stay half)
                qstack = np.pad(
                    np.asarray(qstack),
                    ((0, 0), (0, pad_b - b), (0, 0)),
                )
            nlist = int(self._centroids.shape[0])
            nprobe = min(self.nprobe, nlist)
            u = self._scan_u(pad_b, nprobe)  # padded lanes draw probes too
            table, counts = self._residual_arrays()
            ranges = self._use_ranges(pad_b, nprobe)
            fn = self._search_fn(k, nprobe, u, use_ranges=ranges)
            ext_lo = self._row_lo if ranges else self._blk_lo
            ext_hi = self._row_cnt if ranges else self._blk_hi
            scores, pos = fn.pipelined(
                self._slab, self._valid, self._scales, ext_lo,
                ext_hi, self._centroids,
                jax.device_put(jnp.asarray(table),
                               self._sharding(P(self.axis, None))),
                jax.device_put(jnp.asarray(counts),
                               self._sharding(P(self.axis))),
                qstack,
            )
            if not materialize:
                return ("sclu", scores, pos, b)
            # full host gather, then slice (partial slices of replica-
            # sharded outputs are ambiguous for the partitioner)
            scores, pos = jax.device_get((scores, pos))
        # _map_pos_to_slots is elementwise: the (NB, B, k) stack maps in
        # one pass
        return self._map_pos_to_slots(
            np.asarray(scores)[:, :b], np.asarray(pos, np.int64)[:, :b]
        )

    def resolve_pipelined(self, handle):
        """Materialize an in-flight ``search_pipelined`` handle."""
        if handle[0] == "sclu_flat":  # untrained fallback: positions
            scores, pos = ShardedFlatIndex.resolve_pipelined(
                self, handle[1]
            )
            return self._map_pos_to_slots(scores, pos)
        _, scores, pos, b = handle
        scores, pos = jax.device_get((scores, pos))
        return self._map_pos_to_slots(
            np.asarray(scores)[:, :b], np.asarray(pos, np.int64)[:, :b]
        )

    def _oracle_search(self, queries, k):
        scores, pos = ShardedFlatIndex.search(self, queries, k)
        return self._map_pos_to_slots(scores, pos)

    def _exact_masked_base(self, queries, k, pos_mask):
        return ShardedFlatIndex.search(self, queries, k, pos_mask)

    def get_vectors(self, slots: np.ndarray) -> np.ndarray:
        return ShardedFlatIndex.get_vectors(self, self._positions_of(slots))

    def adopt_mesh(self, mesh) -> None:
        """Cold re-host: empty storage on the new topology (the caller
        reloads from checkpoint); cluster overlay resets with it."""
        ShardedFlatIndex.adopt_mesh(self, mesh)
        with self._mu.write():
            self._reset_overlay()
            self._invalidate_bg_window()

    def remesh(self, mesh) -> None:
        """Re-stripe onto a new mesh and rebuild the cluster layout
        there (extents are per-device, so topology invalidates them)."""
        was_trained = self.is_trained
        ShardedFlatIndex.remesh(self, mesh)
        with self._mu.write():
            # re-striping invalidates an in-flight background build's
            # position math: abandon its snapshot + release the window
            # so the build() below actually runs
            self._invalidate_bg_window()
            # remesh preserved global positions; only the overlay and
            # the oversized mapping arrays need refitting
            slot_of, pos_of = self._slot_of, self._pos_of
            resid, quar = self._residual, self._quar_flat()
            free_s, next_ext = self._free_slots, self._next_ext_slot
            self._reset_overlay()
            n = min(len(slot_of), self._cap)
            self._slot_of[:n] = slot_of[:n]
            self._pos_of[:n] = pos_of[:n]
            self._residual = [p for p in resid if p < self._cap]
            # per-device extents are stale on the new topology, so the
            # holes land under bucket -1 (counted, never recycled); the
            # build() below clears them when trained
            self._quarantine_positions(np.asarray(
                [p for p in quar if p < self._cap], np.int64
            ))
            self._free_slots = free_s
            self._next_ext_slot = next_ext
        if was_trained and self._size:
            self.build()

    # -- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        import json

        with self._mu.read():
            self._sharded_save_locked(path)
            hwm = self._next_slot
            arrays = dict(
                slot_of=self._slot_of[:hwm],
                residual=np.asarray(self._residual, np.int64),
            )
            if self.is_trained:
                cnp = getattr(self, "_centroids_np", None)
                arrays["centroids"] = (
                    cnp if cnp is not None else np.asarray(self._centroids)
                )
                arrays["local_counts"] = self._local_counts
            np.savez(path + ".ivfsc.npz", **arrays)
            with open(path + ".ivfsc.json", "w") as f:
                json.dump(
                    {
                        "nlist": self.nlist,
                        "nprobe": self.nprobe,
                        "trained": self.is_trained,
                        "built_size": self._built_size,
                        "residual_base": self._residual_base,
                        "next_ext_slot": self._next_ext_slot,
                        "free_slots": self._free_slots,
                        "pos_quarantine": self._quar_flat(),
                        "next_slot": self._next_slot,
                        "block_rows": self._c,
                        "fresh_base": self._fresh_base,
                    },
                    f,
                )

    def load(self, path: str) -> bool:
        import json
        import os

        with self._mu.write():
            if not ShardedFlatIndex._load_locked(self, path):
                return False
            self._invalidate_bg_window()
            self._reset_overlay()
            self._slot_of = np.full(self._cap, -1, np.int32)
            self._pos_of = np.full(self._cap, -1, np.int32)
            if not os.path.exists(path + ".ivfsc.json"):
                return self._adopt_foreign_checkpoint(path)
            with open(path + ".ivfsc.json") as f:
                meta = json.load(f)
            self.nlist = meta["nlist"]
            self.nprobe = meta["nprobe"]
            self._built_size = int(meta.get("built_size", 0))
            self._residual_base = int(meta.get("residual_base", 0))
            self._next_ext_slot = int(meta.get("next_ext_slot", 0))
            self._free_slots = [int(s) for s in meta.get("free_slots", [])]
            self._next_slot = int(meta.get("next_slot", self._next_slot))
            # legacy default = high-water mark (conservative quarantine)
            self._fresh_base = int(
                meta.get("fresh_base", self._next_slot)
            )
            data = np.load(path + ".ivfsc.npz")
            hwm = min(len(data["slot_of"]), self._cap)
            slot_of = np.asarray(data["slot_of"], np.int32)[:hwm]
            # drop labels on DEAD rows (stale moved-from labels in
            # pre-r4 checkpoints — see ClusteredIVFIndex.load).
            # _loaded_valid_np is the slot-ordered host snapshot the
            # base loader kept from the npz — same layout .T.reshape
            # recovers from the round-robin striping, without the
            # device round-trip (~0.2 MB/s D2H on tunneled chips, plus
            # an all-gather under multi-controller)
            live = getattr(self, "_loaded_valid_np", None)
            if live is None or len(live) < hwm:
                live = self._host_replicated(
                    self._valid
                ).T.reshape(-1)[:hwm]
            else:
                live = live[:hwm]
            slot_of = np.where(live, slot_of, -1)
            self._slot_of[:hwm] = slot_of
            keep = slot_of >= 0
            self._pos_of[slot_of[keep]] = np.arange(hwm, dtype=np.int32)[keep]
            self._residual = [int(p) for p in data["residual"]]
            rebuilt = False
            if meta.get("trained") and "centroids" in data:
                local_counts = np.asarray(data["local_counts"], np.int64)
                if local_counts.shape[0] != self.n_devices:
                    # checkpoint from a different mesh size: the striped
                    # row layout was already re-striped by the base
                    # loader, but per-device extents are meaningless on
                    # this topology — rebuild the overlay here instead
                    # of installing silently-wrong extents
                    import logging

                    logging.getLogger("wdbx_tpu.parallel").info(
                        "checkpoint built on %d devices, mesh has %d — "
                        "rebuilding cluster layout",
                        local_counts.shape[0], self.n_devices,
                    )
                    self._build_locked()
                    rebuilt = True
                else:
                    self._install_layout(
                        np.asarray(data["centroids"]), local_counts,
                        c=int(meta.get("block_rows", 0)) or None,
                    )
            # after the layout install so holes re-key to their buckets;
            # a _build_locked repacked live rows, making the checkpoint's
            # hole positions meaningless — drop them in that case
            if not rebuilt:
                self._quarantine_positions(np.asarray(
                    [
                        int(p) for p in meta.get("pos_quarantine", [])
                        if int(p) < self._cap
                    ],
                    np.int64,
                ))
            return True

    def get_stats(self) -> dict:
        stats = ShardedFlatIndex.get_stats(self)
        stats.update(
            nlist=self.nlist,
            nprobe=self.nprobe,
            trained=self.is_trained,
            residual=len(self._residual),
            layout="sharded_clustered",
            tombstones=len(self._free) + self._quar_len(),
        )
        return stats
