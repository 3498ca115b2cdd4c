"""Slab-external checkpoints: quantized slabs reconstruct from the raw
store on load instead of round-tripping device->host at save (the D2H
gather measured ~20 MB/s on the tunneled chip vs ~1 GB/s H2D — it alone
made 10M-scale save()/load() minutes instead of seconds)."""

import glob
import os

import numpy as np
import pytest

from wdbx_tpu.core.config import WDBXConfig
from wdbx_tpu.store.vector_store import VectorStore


def _store(tmp_path, **over):
    cfg = {
        "VECTOR_DIMENSION": 16,
        "DATA_DIR": str(tmp_path),
        "VECTOR_STORE_AUTOSAVE_INTERVAL": 0,
        "INDEX_TYPE": "flat",
        "INDEX_DTYPE": "int8",
        "RAW_STORE": "memmap",
        "RAW_STORE_DTYPE": "float32",
    }
    cfg.update(over)
    return VectorStore(WDBXConfig(cfg))


def _fill(store, n, dim=16, seed=0):
    r = np.random.default_rng(seed)
    vecs = r.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    store.bulk_load([f"v{i:04d}" for i in range(n)], vecs,
                    metadata_columns={"num": np.arange(n)})
    return vecs


def _npz_keys(tmp_path):
    [gen] = glob.glob(os.path.join(str(tmp_path), "checkpoint", "g*"))
    path = os.path.join(gen, "indices", "shard_0.npz")
    return set(np.load(path).keys())


@pytest.mark.parametrize("index_type,extra", [
    ("flat", {}),
    ("flat", {"INDEX_DTYPE": "int4", "RAW_STORE_DTYPE": "int8"}),
    ("ivf_clustered", {"IVF_NLIST": 16, "IVF_TRAIN_THRESHOLD": 16,
                       "IVF_NPROBE": 16}),
])
def test_slab_external_roundtrip(tmp_path, index_type, extra):
    store = _store(tmp_path, INDEX_TYPE=index_type, **extra)
    _fill(store, 300)
    store.delete("v0007")
    q = np.random.default_rng(9).standard_normal((4, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    want = store.search_batch(q, limit=5)
    store.save()
    # the checkpoint must NOT contain the slab
    keys = _npz_keys(tmp_path)
    assert "slab" not in keys, f"slab persisted anyway: {keys}"
    assert "valid" in keys

    re = _store(tmp_path, INDEX_TYPE=index_type, **extra)
    assert re.count() == 299
    got = re.search_batch(q, limit=5)
    for w_row, g_row in zip(want, got):
        assert [h[0] for h in g_row] == [h[0] for h in w_row]
        np.testing.assert_allclose(
            [h[1] for h in g_row], [h[1] for h in w_row], atol=2e-2
        )
    # mutations after restore keep working
    v = np.random.default_rng(1).standard_normal(16).astype(np.float32)
    re.store("new", v / np.linalg.norm(v), {"num": -1})
    assert re.get("new") is not None


def test_f32_slab_keeps_full_checkpoint(tmp_path):
    """Non-quantized slabs are not eligible (re-quantization would not
    be lossless for them): slab stays in the checkpoint."""
    store = _store(tmp_path, INDEX_DTYPE="float32")
    _fill(store, 50)
    store.save()
    assert "slab" in _npz_keys(tmp_path)


def test_checkpoint_slab_full_forces_slab(tmp_path):
    store = _store(tmp_path, CHECKPOINT_SLAB="full")
    _fill(store, 50)
    store.save()
    assert "slab" in _npz_keys(tmp_path)


def test_raw_gap_falls_back_to_full_slab(tmp_path):
    """A live slot without a raw row disqualifies the shard: the slab
    persists in full rather than depending on rows it can't get back."""
    store = _store(tmp_path)
    _fill(store, 60)
    # wound the raw store out-of-band: drop one live row's flag
    slot = int(store.registries[0].lookup("v0030"))
    store.raws.drop(0, np.asarray([slot]))
    store.save()
    assert "slab" in _npz_keys(tmp_path)
    re = _store(tmp_path)
    assert re.count() == 60
    assert re.get("v0030") is not None  # slab had the row even if raw lost it


def test_lost_raw_after_save_is_detected(tmp_path):
    """Raw files deleted after a slab-external save: load refuses the
    unusable checkpoint and comes up fresh (reference fallback), not
    with a silently zeroed slab."""
    store = _store(tmp_path)
    _fill(store, 60)
    store.save()
    assert "slab" not in _npz_keys(tmp_path)
    del store
    for f in glob.glob(os.path.join(str(tmp_path), "vectors", "raw_*")):
        os.remove(f)
    re = _store(tmp_path)
    assert re.count() == 0


def test_slab_external_survives_recover(tmp_path):
    store = _store(tmp_path)
    _fill(store, 80)
    store.save()
    assert store.recover(0, clear_on_failure=True)
    assert store.count() == 80
    got = store.get("v0042")
    assert got is not None and got[1]["num"] == 42


def test_post_save_delete_then_crash_recovers_checkpoint_state(tmp_path):
    """A delete AFTER a slab-external save must not poison the
    checkpoint: simulated crash (no second save) + reload serves the
    at-save state, not a fresh shard (the eager raws.drop regression)."""
    store = _store(tmp_path)
    _fill(store, 60)
    store.save()
    assert "slab" not in _npz_keys(tmp_path)
    assert store.delete("v0012")  # post-save mutation, never saved
    del store  # crash: no save after the delete
    re = _store(tmp_path)
    assert re.count() == 60, "whole-shard loss on restore"
    got = re.get("v0012")  # at-save semantics: the row is back
    assert got is not None and got[1]["num"] == 12
