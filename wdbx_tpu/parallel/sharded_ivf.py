"""Mesh-sharded IVF: bucket tables partitioned over devices, centroids
replicated, probe scan + merge as ONE shard_map program.

This is the multi-chip form of ``IVFIndex`` (the reference's distributed
answer is TCP forwarding to per-node HNSW indexes, reference
wdbx/core/distributed.py:698-834 — never wired; here the whole cluster
query is one compiled XLA program):

  * the base slab is the ``ShardedFlatIndex`` striped layout — mutation,
    tombstones, persistence, growth and the fresh/residual buffer all
    inherit unchanged;
  * the IVF overlay shards ``bucket_rows (nlist, cap_b, d)`` /
    ``bucket_slot`` / ``bucket_valid`` over the mesh axis in nlist-major
    blocks (device d owns buckets [d*L, (d+1)*L)); centroids are tiny
    and replicate;
  * a query batch runs replicated probe selection (every device scores
    all centroids — one small matmul, no comm), then each device
    QUOTA-COMPACTS the probed buckets it owns: the (B*P,) probe list is
    ranked local-first with `top_k` and the first Q = ~2*B*P/n_dev
    entries are scanned (`lax.scan` of dynamic-sliced buckets — fixed
    trip count keeps XLA happy; overflow beyond the 2x slack drops the
    lowest-ranked probes, a bounded recall cost that vanishes as probes
    spread across devices);
  * per-device candidates mask-reduce to (B, k) local top-k, all-gather
    over ICI (tiny (B, k) sets — the tables never move), and merge with
    the residual brute-scan of fresh adds, all inside the same program.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wdbx_tpu.index.flat import _as_qstack, _next_pow2
from wdbx_tpu.index.ivf import IVFIndex
from wdbx_tpu.ops.kmeans import kmeans
from wdbx_tpu.ops.normalize import l2_normalize
from wdbx_tpu.parallel.sharded_flat import ShardedFlatIndex


@lru_cache(maxsize=16)
def _mask_bucket_valid_auto(mesh, axis):
    """Cached ``auto_axes`` wrapper of the bucket-mask AND for
    Explicit-axes meshes (the gather inside has no sharding rule under
    strict inference; a fresh jit per call would recompile on every
    filtered search)."""
    from wdbx_tpu.index.ivf import _mask_bucket_valid_body

    return jax.jit(
        jax.sharding.auto_axes(
            _mask_bucket_valid_body, out_sharding=P(axis, None),
        )
    )


def _build_ivf_search(mesh, axis, *, k, k_bucket, nprobe, quota, nlist,
                      cap_b, precision, int8, normalize, n_dev):
    """shard_map'd cluster query: probe-select -> local quota scan ->
    residual scan -> all-gather merge. Bucket tables are sharded on
    ``axis``; centroids/queries/residual metadata are replicated."""
    local_n = nlist // n_dev

    def local(centroids, b_rows_l, b_slot_l, b_valid_l, b_scale_l,
              slab_l, valid_l, scales_l, residual_slots, residual_count, q):
        me = jax.lax.axis_index(axis)
        b = q.shape[0]
        if normalize:
            q = l2_normalize(q)

        # 1. Replicated probe selection (centroids are replicated).
        cs = jax.lax.dot_general(
            q, centroids, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        _, probe = jax.lax.top_k(cs, nprobe)  # (B, P) global bucket ids
        flat = probe.reshape(-1)  # (B*P,)
        bp = flat.shape[0]
        qidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nprobe)

        # 2. Quota compaction: rank my buckets first, keep Q of them.
        is_local = (flat >= me * local_n) & (flat < (me + 1) * local_n)
        prio = jnp.where(is_local, bp - jnp.arange(bp, dtype=jnp.int32), 0)
        _, sel = jax.lax.top_k(prio, quota)  # indices into flat
        sel_bucket = jnp.take(flat, sel) - me * local_n
        sel_ok = jnp.take(is_local, sel)
        sel_q = jnp.take(qidx, sel)
        sel_bucket = jnp.clip(sel_bucket, 0, local_n - 1)

        # 3. Fixed-trip scan over the quota (sequential DMAs; the
        # batched 3D gather lowers pathologically on TPU).
        def step(carry, x):
            bucket, qi, ok = x
            blk = jax.lax.dynamic_index_in_dim(b_rows_l, bucket, 0, False)
            bslots = jax.lax.dynamic_index_in_dim(b_slot_l, bucket, 0, False)
            bvalid = jax.lax.dynamic_index_in_dim(b_valid_l, bucket, 0, False)
            qrow = jax.lax.dynamic_index_in_dim(q, qi, 0, False)
            if int8:
                # int8 code tables: score codes, dequantize the score row
                bscale = jax.lax.dynamic_index_in_dim(
                    b_scale_l, bucket, 0, False
                )
                s = jax.lax.dot_general(
                    qrow[None, :].astype(jnp.bfloat16),
                    blk.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )[0] * bscale
            else:
                s = jax.lax.dot_general(
                    qrow[None, :].astype(blk.dtype), blk,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )[0]
            s = jnp.where(bvalid & ok, s, -jnp.inf)
            v, i = jax.lax.top_k(s, k_bucket)
            return carry, (v, jnp.take(bslots, i))

        _, (vals, slots) = jax.lax.scan(
            step, 0, (sel_bucket, sel_q, sel_ok)
        )  # (Q, k_b)

        # 4. Regroup per query: (B, Q*k_b) via a one-hot query mask.
        qmask = sel_q[None, :] == jnp.arange(b, dtype=jnp.int32)[:, None]
        cand_v = jnp.where(
            qmask[:, :, None], vals[None, :, :], -jnp.inf
        ).reshape(b, -1)
        cand_s = jnp.broadcast_to(
            slots[None, :, :], (b,) + slots.shape
        ).reshape(b, -1)

        # 5. Residual (fresh-buffer) scan over MY slots of the slab.
        r_cap = residual_slots.shape[0]
        if r_cap:
            rows = slab_l[0][residual_slots // n_dev]  # (R, d) local rows
            if int8:
                rows = rows.astype(jnp.bfloat16)
                rq = q.astype(jnp.bfloat16)
            else:
                rq = q.astype(rows.dtype)
            r_scores = jax.lax.dot_general(
                rq, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            if int8:
                r_scores = r_scores * scales_l[0][residual_slots // n_dev][None, :]
            mine = (residual_slots % n_dev) == me
            live = jnp.arange(r_cap) < residual_count
            r_valid = valid_l[0][residual_slots // n_dev] & mine & live
            r_scores = jnp.where(r_valid[None, :], r_scores, -jnp.inf)
            cand_v = jnp.concatenate([cand_v, r_scores], axis=-1)
            cand_s = jnp.concatenate(
                [cand_s,
                 jnp.broadcast_to(residual_slots[None, :], (b, r_cap))],
                axis=-1,
            )

        # 6. Local top-k, then tiny (B, k) sets ride ICI.
        k_local = min(k, cand_v.shape[-1])
        lv, lp = jax.lax.top_k(cand_v, k_local)
        ls = jnp.take_along_axis(cand_s, lp, axis=-1)
        all_v = jax.lax.all_gather(lv, axis, axis=1, tiled=True)
        all_s = jax.lax.all_gather(ls, axis, axis=1, tiled=True)
        k_eff = min(k, all_v.shape[-1])
        top, pos = jax.lax.top_k(all_v, k_eff)
        return top, jnp.take_along_axis(all_s, pos, axis=1)

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),              # centroids (replicated)
            P(axis, None, None),  # bucket_rows
            P(axis, None),    # bucket_slot
            P(axis, None),    # bucket_valid
            P(axis, None),    # bucket_scale (ones when not int8)
            P(axis, None, None),  # slab (striped)
            P(axis, None),    # valid
            P(axis, None),    # scales
            P(),              # residual_slots
            P(),              # residual_count
            P(),              # queries (replicated batch)
        ),
        out_specs=(P(), P()),
        check_vma=False,  # post-all-gather merge replicated by construction
    )

    @jax.jit
    def pipelined(centroids, b_rows, b_slot, b_valid, b_scale, slab, valid,
                  scales, residual_slots, residual_count, qstack):
        def step(carry, q):
            s, i = mapped(centroids, b_rows, b_slot, b_valid, b_scale, slab,
                          valid, scales, residual_slots, residual_count, q)
            return carry, (s, i)

        _, out = jax.lax.scan(step, 0, qstack)
        return out

    fn = jax.jit(mapped)
    fn.pipelined = pipelined
    return fn


class ShardedIVFIndex(IVFIndex, ShardedFlatIndex):
    """IVF overlay on the mesh-striped slab. MRO: IVF bookkeeping
    (residual/quarantine/rebuild triggers) runs above ShardedFlatIndex
    storage; build() and search() are overridden for the sharded
    layout."""

    kind = "sharded_ivf"
    #: the dense bucket tables gather raw codes with no nibble unpack
    #: (same rule as single-device IVFIndex) — int4 stays flat/clustered
    _INT4_OK = False

    def __init__(self, dim, metric="cosine", dtype="float32",
                 capacity=1024, mesh=None, axis="shard", nlist=128,
                 nprobe=8, train_threshold=4096, rebuild_fraction=0.2,
                 kmeans_iters=15, train_sample=262_144, quota_slack=2.0):
        # ShardedFlatIndex.__init__ consumes mesh/axis then calls up to
        # FlatIndex through the MRO; IVF knobs are set after.
        ShardedFlatIndex.__init__(
            self, dim, metric=metric, dtype=dtype, capacity=capacity,
            mesh=mesh, axis=axis,
        )
        self.nlist = nlist
        self.nprobe = nprobe
        self.assignments = 1
        self.train_threshold = train_threshold
        self.rebuild_fraction = rebuild_fraction
        self.kmeans_iters = kmeans_iters
        self.train_sample = train_sample
        #: per-device probe quota = slack * B*P/n_dev (2.0 keeps the
        #: drop probability negligible for hash-uniform bucket loads)
        self.quota_slack = quota_slack
        self.batch_flat_fallback = True
        self.topk_method = "auto"
        self.ivf_kernel = "lax"
        self._filter_boosts: dict[int, int] = {}
        self._ivf_search_cache: dict[tuple, object] = {}
        self._reset_overlay()

    # -- build --------------------------------------------------------------
    def build(self) -> None:
        with self._mu.write():
            self._sharded_build_locked()

    def adopt_mesh(self, mesh) -> None:
        """Cold re-host: empty storage on the new topology (caller
        reloads from checkpoint); the bucket overlay resets."""
        ShardedFlatIndex.adopt_mesh(self, mesh)
        with self._mu.write():
            self._reset_overlay()
            self._ivf_search_cache.clear()

    def remesh(self, mesh) -> None:
        """Re-stripe the slab on the new mesh, then rebuild the bucket
        overlay there (tables are mesh-partitioned, so a topology change
        invalidates them wholesale)."""
        was_trained = self.is_trained
        ShardedFlatIndex.remesh(self, mesh)
        with self._mu.write():
            self._reset_overlay()
            self._ivf_search_cache.clear()
        if was_trained and self._size:
            self.build()

    def _sharded_build_locked(self) -> None:
        hwm = self._next_slot
        if self._size == 0 or hwm == 0:
            self._reset_overlay()
            return
        # Only the (small) validity mask comes to the host; rows are
        # gathered from the striped slab on DEVICE in chunks — a dense
        # host gather is 30 GB of f32 at 10M x 768 and runs at this
        # sandbox's ~15 MB/s host first-touch.
        valid_h = self._host_replicated(self._valid).T.reshape(-1)[:hwm]
        live_slots = np.nonzero(valid_h)[0].astype(np.int32)
        n_live = len(live_slots)
        n_dev = self.n_devices

        repl = self._sharding(P())  # replicated NamedSharding

        @jax.jit
        def gather_rows(slab, scales, slots):
            dev, row = slots % n_dev, slots // n_dev
            # gathers from sharded operands need an explicit out sharding
            rows = slab.at[dev, row].get(out_sharding=repl).astype(
                jnp.float32
            )
            if self._is_int8:
                scl = scales.at[dev, row].get(out_sharding=repl)
                rows = rows * scl[:, None]
            if self.metric == "cosine":
                rows = rows / jnp.maximum(
                    jnp.linalg.norm(rows, axis=-1, keepdims=True), 1e-12
                )
            return rows

        # nlist must split evenly over the mesh axis.
        nlist = min(self.nlist, max(self.n_devices, n_live))
        nlist = max(self.n_devices,
                    (nlist // self.n_devices) * self.n_devices)
        sample = live_slots
        if n_live > self.train_sample:
            sel = np.random.default_rng(0).choice(
                n_live, self.train_sample, replace=False
            )
            sample = live_slots[np.sort(sel)]
        train = gather_rows(self._slab, self._scales, jnp.asarray(sample))
        centroids, _ = kmeans(train, num_clusters=nlist,
                              iters=self.kmeans_iters)
        del train

        n_choices = min(4, nlist)
        assign_fn = jax.jit(
            lambda r, c: jax.lax.top_k(
                jax.lax.dot_general(
                    r, c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ),
                n_choices,
            )[1].astype(jnp.int32)
        )
        chunk = 131_072
        assign_multi = np.empty((n_live, n_choices), np.int32)
        for i in range(0, n_live, chunk):
            end = min(i + chunk, n_live)
            rows_chunk = gather_rows(
                self._slab, self._scales, jnp.asarray(live_slots[i:end])
            )
            assign_multi[i:end] = np.asarray(assign_fn(rows_chunk, centroids))
            del rows_chunk

        from wdbx_tpu.index.ivf import _capped_placement, _pack_slot_positions

        placed, cap_b = _capped_placement(assign_multi, nlist)
        keep = placed >= 0
        leftover_slots = live_slots[~keep]
        assign = placed[keep]
        kept_slots = live_slots[keep]
        n_entries = len(assign)

        bucket_slot = np.full((nlist, cap_b), self._cap, np.int32)
        bucket_valid = np.zeros((nlist, cap_b), bool)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        starts = np.searchsorted(sorted_assign, np.arange(nlist))
        pos_within = np.arange(n_entries) - starts[sorted_assign]
        bucket_slot[sorted_assign, pos_within] = kept_slots[order]
        bucket_valid[sorted_assign, pos_within] = True

        # Tables: int8 slabs keep raw codes + a per-row scale table
        # (bf16 would double table HBM); float slabs store bf16. Chunked
        # scatter with donated sharded accumulators.
        table_dtype = jnp.int8 if self._is_int8 else jnp.bfloat16
        table_s = self._sharding(P(self.axis, None, None))
        flag_s = self._sharding(P(self.axis, None))
        bucket_rows = jax.device_put(
            jnp.zeros((nlist, cap_b, self.dim), table_dtype), table_s
        )
        bucket_scale = (
            jax.device_put(jnp.zeros((nlist, cap_b), jnp.float32), flag_s)
            if self._is_int8 else None
        )
        scatter_rows = jax.jit(
            lambda tbl, slab, slots, c, p: tbl.at[c, p].set(
                slab.at[slots % n_dev, slots // n_dev]
                .get(out_sharding=repl).astype(table_dtype),
                out_sharding=table_s,
            ),
            donate_argnums=(0,),
            out_shardings=table_s,
        )
        scatter_scale = jax.jit(
            lambda tbl, scl, slots, c, p: tbl.at[c, p].set(
                scl.at[slots % n_dev, slots // n_dev]
                .get(out_sharding=repl),
                out_sharding=flag_s,
            ),
            donate_argnums=(0,),
            out_shardings=flag_s,
        )
        slot_sorted = kept_slots[order].astype(np.int32)
        for i in range(0, n_entries, chunk):
            end = min(i + chunk, n_entries)
            s_idx = jnp.asarray(slot_sorted[i:end])
            c_idx = jnp.asarray(sorted_assign[i:end])
            p_idx = jnp.asarray(pos_within[i:end])
            bucket_rows = scatter_rows(
                bucket_rows, self._slab, s_idx, c_idx, p_idx
            )
            if self._is_int8:
                bucket_scale = scatter_scale(
                    bucket_scale, self._scales, s_idx, c_idx, p_idx
                )
        self._bucket_rows = bucket_rows
        self._bucket_scale = bucket_scale
        self._centroids = jnp.asarray(np.asarray(centroids))
        self._bucket_slot = jax.device_put(jnp.asarray(bucket_slot), flag_s)
        self._bucket_valid = jax.device_put(jnp.asarray(bucket_valid), flag_s)
        self._bucket_slot_np = bucket_slot
        self._slot_bucket_c, self._slot_bucket_p = _pack_slot_positions(
            kept_slots[order], sorted_assign.astype(np.int32),
            pos_within.astype(np.int32), self._cap, 1,
        )
        self._valid8_cache = None
        self._residual = [int(x) for x in leftover_slots]
        self._residual_base = len(self._residual)
        self._free.extend(self._quarantine)
        self._quarantine = []
        self._built_size = self._size
        self._ivf_search_cache.clear()

    def _invalidate_bucket_entries(self, slots) -> None:
        cs, ps = self._take_bucket_positions(slots)
        if len(cs):
            flag_s = self._sharding(P(self.axis, None))
            upd = jax.jit(
                lambda bv, c, p: bv.at[c, p].set(
                    False, out_sharding=flag_s
                ),
                out_shardings=flag_s,
            )
            self._bucket_valid = upd(
                self._bucket_valid, jnp.asarray(cs), jnp.asarray(ps)
            )
            self._valid8_cache = None

    # -- query ----------------------------------------------------------------
    def search(self, queries, k, slot_mask=None):
        if self._needs_build():
            with self._mu.write():
                self._maybe_build()
        with self._mu.read():
            return self._sharded_ivf_search(queries, k, slot_mask)

    def _sharded_ivf_search(self, queries, k, slot_mask):
        from wdbx_tpu.index.ivf import (
            FILTER_EXACT_THRESHOLD,
            _filter_boost,
        )

        if not self.is_trained:
            return ShardedFlatIndex.search(self, queries, k, slot_mask)
        queries = self._prep(queries)
        b = len(queries)
        pad_b = _next_pow2(max(b, 1))
        nlist = int(self._bucket_slot.shape[0])
        cap_b = int(self._bucket_slot.shape[1])
        nprobe = min(self.nprobe, nlist)
        bucket_valid = self._bucket_valid
        base_valid = self._valid
        if slot_mask is not None:
            # filter pushdown (sharded): AND the mask into the sharded
            # bucket-validity table (bucket-resident rows) and into the
            # striped row validity (residual leg); boost nprobe so the
            # thinned buckets still surface ~k matches. Very sparse
            # filters take the exact masked flat path instead.
            sel = self._mask_selectivity(slot_mask)
            if sel < FILTER_EXACT_THRESHOLD:
                return ShardedFlatIndex.search(self, queries, k, slot_mask)
            nprobe = min(
                nlist, nprobe * _filter_boost(sel, self._filter_boosts)
            )
            mask = np.zeros(self._cap, bool)
            mask[: len(slot_mask)] = slot_mask[: self._cap]
            with jax.sharding.set_mesh(self.mesh):
                bucket_valid = _mask_bucket_valid_auto(
                    self.mesh, self.axis
                )(bucket_valid, self._bucket_slot, jnp.asarray(mask))
            mask2 = mask.reshape(self.rows_per_device, self.n_devices).T
            base_valid = jnp.logical_and(
                base_valid,
                jax.device_put(
                    jnp.asarray(np.ascontiguousarray(mask2)),
                    self._sharding(P(self.axis, None)),
                ),
            )
        if self.batch_flat_fallback and (
            pad_b * nprobe * cap_b >= max(1, self._size)
        ):
            return ShardedFlatIndex.search(self, queries, k, slot_mask)
        q = np.pad(np.asarray(queries, np.float32),
                   ((0, pad_b - b), (0, 0)))

        r_n = len(self._residual)
        r_cap = _next_pow2(max(r_n, 1)) if r_n else 0
        residual_slots = np.pad(
            np.asarray(self._residual, np.int32), (0, r_cap - r_n),
            constant_values=self._cap - self.n_devices,  # in-range dummy
        )
        bp = pad_b * nprobe
        quota = min(bp, max(
            8, int(math.ceil(bp / self.n_devices * self.quota_slack))
        ))
        k_bucket = min(k, cap_b)
        key = (k, k_bucket, nprobe, quota, nlist, cap_b, r_cap, pad_b)
        fn = self._ivf_search_cache.get(key)
        if fn is None:
            fn = _build_ivf_search(
                self.mesh, self.axis, k=k, k_bucket=k_bucket,
                nprobe=nprobe, quota=quota, nlist=nlist, cap_b=cap_b,
                precision=self._precision, int8=self._is_int8,
                normalize=self.metric == "cosine",
                n_dev=self.n_devices,
            )
            self._ivf_search_cache[key] = fn
        b_scale = self._bucket_scale
        if b_scale is None:  # placeholder with the sharded table shape
            b_scale = self._bucket_valid
        scores, slots = fn(
            self._centroids, self._bucket_rows, self._bucket_slot,
            bucket_valid, b_scale, self._slab, base_valid,
            self._scales, residual_slots, np.int32(r_n), q,
        )
        scores, slots = jax.device_get((scores[:b], slots[:b]))
        scores = np.asarray(scores)
        out = np.asarray(slots, np.int64)
        if scores.shape[1] < k:
            pad = k - scores.shape[1]
            scores = np.pad(scores, ((0, 0), (0, pad)),
                            constant_values=-np.inf)
            out = np.pad(out, ((0, 0), (0, pad)), constant_values=-1)
        out[scores == -np.inf] = -1
        return scores, out

    def search_pipelined(self, qstack, k, materialize: bool = True):
        """(NB, B, d) stack through the shard_map'd cluster query in one
        dispatch (scan of the mesh program); flat fallback when
        untrained. ``materialize=False`` returns an opaque in-flight
        handle for double-buffered serving; resolve with
        ``resolve_pipelined`` before mutating the index."""
        if self._needs_build():
            with self._mu.write():
                self._maybe_build()
        with self._mu.read():
            if not self.is_trained:
                return ShardedFlatIndex.search_pipelined(
                    self, qstack, k, materialize=materialize
                )
            qstack = _as_qstack(qstack)
            nb, b, _ = qstack.shape
            nlist = int(self._bucket_slot.shape[0])
            cap_b = int(self._bucket_slot.shape[1])
            nprobe = min(self.nprobe, nlist)
            r_n = len(self._residual)
            r_cap = _next_pow2(max(r_n, 1)) if r_n else 0
            residual_slots = np.pad(
                np.asarray(self._residual, np.int32), (0, r_cap - r_n),
                constant_values=self._cap - self.n_devices,
            )
            bp = b * nprobe
            quota = min(bp, max(
                8, int(math.ceil(bp / self.n_devices * self.quota_slack))
            ))
            key = (k, min(k, cap_b), nprobe, quota, nlist, cap_b, r_cap, b)
            fn = self._ivf_search_cache.get(key)
            if fn is None:
                fn = _build_ivf_search(
                    self.mesh, self.axis, k=k, k_bucket=min(k, cap_b),
                    nprobe=nprobe, quota=quota, nlist=nlist, cap_b=cap_b,
                    precision=self._precision, int8=self._is_int8,
                    normalize=self.metric == "cosine", n_dev=self.n_devices,
                )
                self._ivf_search_cache[key] = fn
            b_scale = self._bucket_scale
            if b_scale is None:
                b_scale = self._bucket_valid
            scores, slots = fn.pipelined(
                self._centroids, self._bucket_rows, self._bucket_slot,
                self._bucket_valid, b_scale, self._slab, self._valid,
                self._scales, residual_slots, np.int32(r_n), qstack,
            )
            if not materialize:
                return ("sivf", scores, slots)
            scores, slots = jax.device_get((scores, slots))
        scores = np.asarray(scores)
        out = np.asarray(slots, np.int64)
        out[scores == -np.inf] = -1
        return scores, out

    def resolve_pipelined(self, handle):
        """Materialize an in-flight ``search_pipelined`` handle."""
        if handle[0] == "sflat":  # untrained fallback handle
            return ShardedFlatIndex.resolve_pipelined(self, handle)
        _, scores, slots = handle
        scores, slots = jax.device_get((scores, slots))
        scores = np.asarray(scores)
        out = np.asarray(slots, np.int64)
        out[scores == -np.inf] = -1
        return scores, out

    def _oracle_search(self, queries, k):
        return ShardedFlatIndex.search(self, queries, k)

    def _oracle_search_masked(self, queries, k, slot_mask):
        return ShardedFlatIndex.search(self, queries, k, slot_mask)

    # -- persistence ----------------------------------------------------------
    # Inherits IVFIndex.save/load; the bucket tables round-trip through
    # host npz (small indexes) — large deployments should rebuild() from
    # the slab checkpoint instead (the slab uses the orbax backend).
    def load(self, path: str) -> bool:
        ok = super().load(path)
        if ok and self.is_trained:
            # re-place host-loaded tables with mesh shardings
            flag_s = self._sharding(P(self.axis, None))
            table_s = self._sharding(P(self.axis, None, None))
            self._bucket_slot = jax.device_put(self._bucket_slot, flag_s)
            self._bucket_valid = jax.device_put(self._bucket_valid, flag_s)
            self._bucket_rows = jax.device_put(self._bucket_rows, table_s)
            self._ivf_search_cache.clear()
        return ok
