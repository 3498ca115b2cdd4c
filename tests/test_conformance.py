"""Feature x engine conformance matrix (VERDICT r3 ask #8).

Every serving engine is run through the SAME capability checklist, so a
new feature can no longer silently skip an engine (int4 was "flat and
clustered only" for a round before anyone noticed, and filter pushdown
landed on the sharded paths untested). A new engine must be added to
ENGINES; a new capability gets a new check here.

The matrix encodes the intended support table explicitly: capabilities
an engine REJECTS are asserted to reject (e.g. int4 on the dense-table
layouts raises, it does not silently degrade).
"""

import numpy as np
import pytest

from wdbx_tpu.index.clustered import ClusteredIVFIndex
from wdbx_tpu.index.flat import FlatIndex
from wdbx_tpu.index.ivf import IVFIndex
from wdbx_tpu.parallel import (
    ShardedClusteredIndex,
    ShardedFlatIndex,
    ShardedIVFIndex,
)

N, D, K = 3000, 16, 10


def _normed(rng, n, d=D):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _ann_kwargs():
    return dict(nlist=16, nprobe=16, train_threshold=256)


ENGINES = {
    "flat": (FlatIndex, {}),
    "ivf_dense": (IVFIndex, _ann_kwargs()),
    "ivf_clustered": (ClusteredIVFIndex, _ann_kwargs()),
    "sharded_flat": (ShardedFlatIndex, {}),
    "sharded_ivf": (ShardedIVFIndex, _ann_kwargs()),
    "sharded_clustered": (ShardedClusteredIndex, _ann_kwargs()),
}

#: engines where the int4 capacity tier is SUPPORTED; the rest must
#: reject it loudly (dense bucket tables have no nibble unpack)
INT4_OK = {"flat", "ivf_clustered", "sharded_flat", "sharded_clustered"}
#: engines with a serve-through background rebuild
BG_REBUILD = {"ivf_clustered", "sharded_clustered"}
#: ANN engines (carry tune/tune_filtered; flat is always exact)
ANN = {"ivf_dense", "ivf_clustered", "sharded_ivf", "sharded_clustered"}


def _make(name, dtype="float32"):
    cls, kw = ENGINES[name]
    idx = cls(D, dtype=dtype, **kw)
    if hasattr(idx, "batch_flat_fallback"):
        idx.batch_flat_fallback = False
    if hasattr(idx, "topk_method"):
        idx.topk_method = "exact"
    return idx


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    return _normed(rng, N), _normed(rng, 8), rng


@pytest.mark.parametrize("engine", sorted(ENGINES))
class TestConformance:
    def test_crud_and_exact_recall(self, engine, corpus):
        db, q, rng = corpus
        idx = _make(engine)
        slots = np.asarray(idx.add_batch(db))
        if hasattr(idx, "build"):
            idx.build()
        # self-query identity
        _, got = idx.search(db[:8], 1)
        assert (got.ravel() == slots[:8]).all()
        # update moves the row
        target = _normed(rng, 1)
        idx.update_slots(slots[5:6], target)
        _, g2 = idx.search(target, 1)
        assert int(g2.ravel()[0]) == int(slots[5])
        # remove hides it
        idx.remove_slots(slots[5:6])
        _, g3 = idx.search(target, 1)
        assert int(g3.ravel()[0]) != int(slots[5])
        assert idx.count() == N - 1

    @pytest.mark.parametrize("dtype", ["int8", "int4"])
    def test_quantized_tiers(self, engine, corpus, dtype):
        db, q, rng = corpus
        if dtype == "int4" and engine not in INT4_OK:
            with pytest.raises(ValueError, match="int4"):
                _make(engine, dtype=dtype)
            return
        idx = _make(engine, dtype=dtype)
        slots = np.asarray(idx.add_batch(db))
        if hasattr(idx, "build"):
            idx.build()
        _, got = idx.search(q, K)
        exact = slots[np.argsort(-(q @ db.T), axis=-1)[:, :K]]
        recall = np.mean([
            len(set(map(int, a[a >= 0])) & set(map(int, b))) / K
            for a, b in zip(got, exact)
        ])
        floor = 0.8 if dtype == "int4" else 0.9
        assert recall >= floor, (engine, dtype, recall)

    def test_filter_mask_confines_results(self, engine, corpus):
        db, q, rng = corpus
        idx = _make(engine)
        slots = np.asarray(idx.add_batch(db))
        if hasattr(idx, "build"):
            idx.build()
        mask = np.zeros(int(slots.max()) + 1, bool)
        mask[slots[rng.random(N) < 0.10]] = True
        _, got = idx.search(q, K, slot_mask=mask)
        assert all(mask[int(g)] for g in got.ravel() if g >= 0)

    def test_deep_overfetch(self, engine, corpus):
        """k' = 200 (the store's re-rank over-fetch) must serve on every
        engine — the Pallas kernels cap at KERNEL_K_MAX and must route
        off-kernel, not crash or truncate."""
        db, q, rng = corpus
        idx = _make(engine)
        slots = np.asarray(idx.add_batch(db))
        if hasattr(idx, "build"):
            idx.build()
        _, got = idx.search(q[:2], 200)
        assert got.shape == (2, 200)
        assert (got[:, 0] >= 0).all()
        for row in got:
            ids = [int(g) for g in row if g >= 0]
            assert len(ids) == len(set(ids)), "duplicate candidates"

    def test_save_load_roundtrip(self, engine, corpus, tmp_path):
        db, q, rng = corpus
        idx = _make(engine)
        slots = np.asarray(idx.add_batch(db))
        if hasattr(idx, "build"):
            idx.build()
        path = str(tmp_path / "ckpt")
        idx.save(path)
        idx2 = _make(engine)
        assert idx2.load(path)
        assert idx2.count() == idx.count()
        _, got = idx2.search(db[:4], 1)
        assert (got.ravel() == slots[:4]).all()

    def test_tuners(self, engine, corpus):
        db, q, rng = corpus
        if engine not in ANN:
            pytest.skip("flat engines are always exact")
        idx = _make(engine)
        slots = np.asarray(idx.add_batch(db))
        idx.build()
        assert idx.tune(q, k=K, target_recall=0.9) >= 0.9
        mask = np.zeros(int(slots.max()) + 1, bool)
        mask[slots[rng.random(N) < 0.15]] = True
        assert idx.tune_filtered(q, mask, k=K, target_recall=0.9) >= 0.9

    def test_background_rebuild(self, engine, corpus):
        db, q, rng = corpus
        if engine not in BG_REBUILD:
            pytest.skip("no serve-through rebuild on this engine")
        idx = _make(engine)
        slots = np.asarray(idx.add_batch(db))
        idx.build()
        idx.remove_slots(slots[:100])
        idx.build_background()  # synchronous call still exercises the path
        assert idx.count() == N - 100
        _, got = idx.search(db[200:204], 1)
        assert (got.ravel() == slots[200:204]).all()
