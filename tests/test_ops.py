"""Unit tests for the device op layer (exact search, normalize, merge, kmeans)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wdbx_tpu.ops import exact_search, kmeans, l2_normalize, topk_merge


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestNormalize:
    def test_unit_norm(self, rng):
        x = rng.standard_normal((32, 384)).astype(np.float32) * 5
        out = np.asarray(l2_normalize(jnp.asarray(x)))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)

    def test_zero_vector_safe(self):
        out = np.asarray(l2_normalize(jnp.zeros((2, 8))))
        assert np.all(np.isfinite(out))
        np.testing.assert_array_equal(out, 0.0)


class TestExactSearch:
    def test_matches_numpy_oracle(self, rng):
        db = _normed(rng, 1000, 64)
        q = _normed(rng, 16, 64)
        scores, idx = exact_search(jnp.asarray(db), jnp.asarray(q), k=10)
        ref = q @ db.T
        ref_idx = np.argsort(-ref, axis=-1)[:, :10]
        ref_scores = np.take_along_axis(ref, ref_idx, axis=-1)
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-4, atol=1e-5)
        # Indices may permute within score ties; compare via scores per rank.
        got = np.take_along_axis(ref, np.asarray(idx), axis=-1)
        np.testing.assert_allclose(got, ref_scores, rtol=1e-4, atol=1e-5)

    def test_self_query_is_top1(self, rng):
        db = _normed(rng, 500, 32)
        scores, idx = exact_search(jnp.asarray(db), jnp.asarray(db[:8]), k=1)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(8))
        np.testing.assert_allclose(np.asarray(scores)[:, 0], 1.0, rtol=1e-4)

    def test_valid_mask_excludes(self, rng):
        db = _normed(rng, 100, 16)
        valid = np.ones(100, bool)
        valid[:50] = False
        _, idx = exact_search(
            jnp.asarray(db), jnp.asarray(db[:4]), k=5, valid=jnp.asarray(valid)
        )
        assert np.all(np.asarray(idx) >= 50)

    def test_k_exceeds_n_pads(self, rng):
        db = _normed(rng, 3, 8)
        scores, idx = exact_search(jnp.asarray(db), jnp.asarray(db[:2]), k=8)
        assert scores.shape == (2, 8)
        assert np.all(np.asarray(scores)[:, 3:] == -np.inf)
        assert np.all(np.asarray(idx)[:, 3:] == -1)

    def test_bf16_db_recall(self, rng):
        db = _normed(rng, 2000, 128)
        q = _normed(rng, 8, 128)
        _, idx32 = exact_search(jnp.asarray(db), jnp.asarray(q), k=10)
        _, idx16 = exact_search(
            jnp.asarray(db, dtype=jnp.bfloat16), jnp.asarray(q), k=10
        )
        overlap = np.mean(
            [
                len(set(a.tolist()) & set(b.tolist())) / 10
                for a, b in zip(np.asarray(idx32), np.asarray(idx16))
            ]
        )
        assert overlap >= 0.9


class TestTopkMerge:
    def test_merge_two_shards(self):
        s = jnp.asarray([[0.9, 0.5, 0.1, 0.95, 0.4, 0.2]])
        i = jnp.asarray([[0, 1, 2, 100, 101, 102]])
        scores, ids = topk_merge(s, i, k=3)
        np.testing.assert_allclose(np.asarray(scores)[0], [0.95, 0.9, 0.5], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ids)[0], [100, 0, 1])

    def test_neg_inf_padding_sinks(self):
        s = jnp.asarray([[-np.inf, 0.3, -np.inf, 0.7]])
        i = jnp.asarray([[-1, 5, -1, 9]])
        scores, ids = topk_merge(s, i, k=2)
        np.testing.assert_array_equal(np.asarray(ids)[0], [9, 5])

    def test_k_exceeds_candidates(self):
        s = jnp.asarray([[0.5, 0.1]])
        i = jnp.asarray([[3, 4]])
        scores, ids = topk_merge(s, i, k=4)
        assert scores.shape == (1, 4)
        assert np.asarray(scores)[0, 2] == -np.inf


class TestKmeans:
    def test_recovers_separated_clusters(self, rng):
        # 4 well-separated direction clusters on the sphere.
        centers = _normed(rng, 4, 32)
        pts = np.concatenate(
            [
                c + 0.05 * rng.standard_normal((64, 32)).astype(np.float32)
                for c in centers
            ]
        )
        pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        cents, assign = kmeans(jnp.asarray(pts), num_clusters=4, iters=20)
        assign = np.asarray(assign)
        # Every ground-truth cluster maps to one dominant learned cluster.
        for g in range(4):
            block = assign[g * 64 : (g + 1) * 64]
            dominant = np.bincount(block, minlength=4).max()
            assert dominant >= 60
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(cents), axis=-1), 1.0, rtol=1e-4
        )

    def test_assignment_is_nearest_centroid(self, rng):
        pts = _normed(rng, 200, 16)
        cents, assign = kmeans(jnp.asarray(pts), num_clusters=8, iters=10)
        sims = pts @ np.asarray(cents).T
        np.testing.assert_array_equal(np.asarray(assign), np.argmax(sims, axis=-1))


class TestClusteredKernelV2Matrix:
    """Property matrix for the v2 block-scan kernel (interpret mode):
    across dtypes, widths, batch sizes, groups, and padded block lists,
    v2's top-k must agree with the exact oracle over the scanned rows
    (up to quantization noise on the VALUES; positions checked by
    score-parity, not identity — ties may reorder)."""

    @pytest.mark.parametrize("int_mode", ["bf16", "int8", "int4"])
    @pytest.mark.parametrize("b", [1, 8, 64])
    def test_matches_exact_over_scanned_rows(self, int_mode, b):
        import jax.numpy as jnp

        from wdbx_tpu.kernels.clustered_scan import clustered_block_topk_v2
        from wdbx_tpu.kernels.quant import quantize_rows_int4

        # stable per-case seed (hash() is salted per process -> flaky)
        seed = ["bf16", "int8", "int4"].index(int_mode) * 1000 + b
        rng = np.random.default_rng(seed)
        d, c, k = 64, 256, 8
        nblocks = 24
        cap = nblocks * c
        slab = rng.standard_normal((cap, d)).astype(np.float32)
        slab /= np.linalg.norm(slab, axis=1, keepdims=True)
        valid = (rng.random(cap) > 0.1).astype(np.int8).reshape(1, -1)
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        live = 10
        u = 16  # live entries first, padding pinned + masked
        real = rng.permutation(nblocks)[:live].astype(np.int32)
        uniq = np.full(u, nblocks - 1, np.int32)
        uniq[:live] = real
        ok = np.zeros(u, np.int32)
        ok[:live] = 1
        int4 = int_mode == "int4"
        if int_mode == "bf16":
            sl = jnp.asarray(slab, jnp.bfloat16)
            sc = None
            stored = np.asarray(sl, np.float32)
        elif int_mode == "int8":
            s_row = (np.abs(slab).max(axis=1) / 127.0).astype(np.float32)
            codes = np.clip(
                np.round(slab / s_row[:, None]), -127, 127
            ).astype(np.int8)
            sl = jnp.asarray(codes)
            sc = jnp.asarray(s_row.reshape(1, -1))
            stored = codes.astype(np.float32) * s_row[:, None]
        else:
            packed, s_row = quantize_rows_int4(jnp.asarray(slab))
            sl = packed
            sc = jnp.asarray(np.asarray(s_row).reshape(1, -1))
            lo = (np.asarray(packed) & 0xF).astype(np.int8) - 8
            hi = (np.asarray(packed) >> 4).astype(np.int8) - 8
            stored = np.concatenate([lo, hi], axis=1).astype(
                np.float32
            ) * np.asarray(s_row)[:, None]
        v, p = clustered_block_topk_v2(
            sl, jnp.asarray(valid), sc, jnp.asarray(uniq),
            jnp.asarray(ok), jnp.asarray(q),
            k=k, c=c, interpret=True, n_ways=4, int4=int4,
        )
        v, p = np.asarray(v), np.asarray(p)
        assert v.shape == (b, k) and p.shape == (b, k)
        rows = np.concatenate([np.arange(x * c, (x + 1) * c) for x in real])
        rows = rows[valid[0, rows] != 0]
        ref = q @ stored[rows].T  # exact over STORED (quantized) values
        ref_top = -np.sort(-ref, axis=1)[:, :k]
        # score parity: the kernel's k-th value within quantization-of-q
        # noise of the exact k-th over the same candidate set
        tol = 0.05 if int_mode != "bf16" else 0.02
        np.testing.assert_allclose(v, ref_top, atol=tol, rtol=0.05)
        # positions are from scanned, valid rows only
        rowset = set(rows.tolist())
        assert all(int(x) in rowset for x in p.ravel())

    def test_all_masked_returns_neg(self):
        import jax.numpy as jnp

        from wdbx_tpu.kernels.clustered_scan import clustered_block_topk_v2

        d, c = 64, 256
        cap = 8 * c
        sl = jnp.zeros((cap, d), jnp.bfloat16)
        uniq = np.full(8, 7, np.int32)
        ok = np.zeros(8, np.int32)  # nothing live
        v, p = clustered_block_topk_v2(
            sl, jnp.ones((1, cap), jnp.int8), None,
            jnp.asarray(uniq), jnp.asarray(ok),
            jnp.ones((4, d), jnp.float32),
            k=5, c=c, interpret=True, n_ways=4,
        )
        assert (np.asarray(v) <= -3.0e38).all()


class TestKernelContracts:
    """Regressions for the r3 kernel-layer review: silent-wrongness
    modes must raise (or route to a correct path) instead."""

    def _slab(self, rng, nblocks=8, c=256, d=64, dtype=None):
        import jax.numpy as jnp

        cap = nblocks * c
        slab = rng.standard_normal((cap, d)).astype(np.float32)
        slab /= np.linalg.norm(slab, axis=1, keepdims=True)
        return jnp.asarray(slab, dtype or jnp.bfloat16)

    def test_ivf_bucket_scan_rejects_deep_k(self, rng):
        import jax.numpy as jnp

        from wdbx_tpu.kernels.ivf_scan import ivf_bucket_scan

        rows = jnp.zeros((4, 256, 64), jnp.bfloat16)
        v8 = jnp.ones((4, 8, 256), jnp.int8)
        probes = jnp.zeros(4, jnp.int32)
        qidx = jnp.zeros(4, jnp.int32)
        q = jnp.zeros((2, 64), jnp.float32)
        with pytest.raises(ValueError, match="k <= 128"):
            ivf_bucket_scan(rows, v8, probes, qidx, q, k=200,
                            interpret=True)

    def test_ivf_bucket_scan_rejects_int8_table(self, rng):
        import jax.numpy as jnp

        from wdbx_tpu.kernels.ivf_scan import ivf_bucket_scan

        rows = jnp.zeros((4, 256, 64), jnp.int8)
        v8 = jnp.ones((4, 8, 256), jnp.int8)
        probes = jnp.zeros(4, jnp.int32)
        qidx = jnp.zeros(4, jnp.int32)
        q = jnp.zeros((2, 64), jnp.float32)
        with pytest.raises(TypeError, match="float bucket table"):
            ivf_bucket_scan(rows, v8, probes, qidx, q, k=10,
                            interpret=True)

    def test_ivf_index_routes_deep_fetch_to_lax(self, rng):
        """k*assignments > 128 must fall back to the (exact) lax scan,
        not truncate candidates inside the pallas kernel."""
        from wdbx_tpu.index.ivf import IVFIndex

        # k=150 > 128: crosses the kernel's result-lane budget, so the
        # router MUST take the lax scan (k=80 would legally stay on the
        # pallas kernel and never exercise the fallback)
        d, n, k = 32, 3000, 150
        idx = IVFIndex(d, nlist=8, nprobe=8, train_threshold=256)
        idx.ivf_kernel = "pallas"
        idx.batch_flat_fallback = False
        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        slots = idx.add_batch(db)
        idx.build()
        q = rng.standard_normal((4, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        _, got = idx.search(q, k)
        exp = slots[np.argsort(-(q @ db.T), axis=-1)[:, :k]]
        recall = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(got, exp)
        ])
        assert recall >= 0.95, recall

    def test_group_reduce_rejects_partial_tail(self):
        import jax.numpy as jnp

        from wdbx_tpu.kernels.fused_topk import _group_reduce, _pair_reduce

        s = jnp.zeros((2, 384), jnp.float32)
        with pytest.raises(ValueError, match="multiple of group"):
            _group_reduce(s, 0, 256)
        with pytest.raises(ValueError, match="multiple of group"):
            _pair_reduce(s, jnp.zeros((2, 384), jnp.int32), 256)

