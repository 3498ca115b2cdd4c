"""Multi-device tests on the faked 8-device CPU mesh: sharded search
parity with single-device flat, growth, persistence, and the control
plane. These are the multi-device tests the reference entirely lacks
(SURVEY.md §4)."""

import asyncio

import jax
import numpy as np

from wdbx_tpu.core.config import WDBXConfig
from wdbx_tpu.parallel import ShardedFlatIndex, ShardEngine, make_mesh


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestMesh:
    def test_eight_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("shard",)

    def test_subset(self):
        assert make_mesh(4).devices.size == 4


class TestShardedFlatIndex:
    def test_matches_exact_oracle(self, rng):
        idx = ShardedFlatIndex(dim=32, capacity=2048)
        db = _normed(rng, 1500, 32)
        slots = idx.add_batch(db)
        q = _normed(rng, 8, 32)
        scores, got = idx.search(q, k=10)
        ref = np.argsort(-(q @ db.T), axis=-1)[:, :10]
        ref_slots = slots[ref]
        # identical top-k sets (scores may tie-permute)
        for a, b in zip(got, ref_slots):
            assert set(a.tolist()) == set(b.tolist())

    def test_capacity_is_device_aligned(self):
        idx = ShardedFlatIndex(dim=8, capacity=100)
        assert idx.capacity % 8 == 0

    def test_growth(self, rng):
        idx = ShardedFlatIndex(dim=8, capacity=8)
        vecs = _normed(rng, 5000, 8)
        idx.add_batch(vecs)
        assert idx.count() == 5000
        _, got = idx.search(vecs[4321], k=1)
        assert got[0, 0] == 4321

    def test_remove_and_mask(self, rng):
        idx = ShardedFlatIndex(dim=8)
        vecs = _normed(rng, 40, 8)
        slots = idx.add_batch(vecs)
        idx.remove_slots(slots[:10])
        _, got = idx.search(vecs[0], k=5)
        assert slots[0] not in got[0]
        mask = np.zeros(idx.capacity, bool)
        mask[slots[20:]] = True
        _, got = idx.search(vecs[25], k=3, slot_mask=mask)
        assert got[0, 0] == slots[25]

    def test_persistence(self, rng, temp_dir):
        idx = ShardedFlatIndex(dim=8)
        vecs = _normed(rng, 30, 8)
        slots = idx.add_batch(vecs)
        idx.save(f"{temp_dir}/sharded")
        idx2 = ShardedFlatIndex(dim=8)
        assert idx2.load(f"{temp_dir}/sharded")
        _, got = idx2.search(vecs[:3], k=1)
        np.testing.assert_array_equal(got[:, 0], slots[:3])

    def test_stats(self):
        idx = ShardedFlatIndex(dim=8)
        s = idx.get_stats()
        assert s["devices"] == 8
        assert s["type"] == "sharded_flat"

    def test_store_integration(self, rng, temp_dir):
        from wdbx_tpu.store.vector_store import VectorStore

        cfg = WDBXConfig(
            {
                "VECTOR_DIMENSION": 8,
                "NUM_SHARDS": 1,
                "DATA_DIR": temp_dir,
                "INDEX_TYPE": "sharded_flat",
            }
        )
        store = VectorStore(cfg)
        vecs = {f"v{i}": rng.standard_normal(8).astype(np.float32) for i in range(64)}
        store.batch_store(vecs)
        hits = store.search(vecs["v33"], limit=1)
        assert hits[0][0] == "v33"


class TestShardEngine:
    def test_initialize_and_allocation(self, temp_dir):
        cfg = WDBXConfig(
            {"DATA_DIR": temp_dir, "DISTRIBUTED_REPLICATION_FACTOR": 2}
        )
        engine = ShardEngine(cfg)
        asyncio.run(engine.initialize())
        alloc = engine.allocation()
        assert len(alloc["shards"]) == 8
        shard0 = alloc["shards"]["0"]
        assert len(shard0["replicas"]) == 1
        assert shard0["replicas"][0] != shard0["primary"]
        import os

        assert os.path.exists(f"{temp_dir}/shard_allocation.json")
        stats = engine.get_stats()
        assert stats["initialized"] and len(stats["devices"]) == 8
        assert engine.is_local_shard(0)


class TestReplicatedMesh:
    def test_replica_groups_serve_batch_slices(self, rng):
        from wdbx_tpu.parallel import ShardedFlatIndex

        idx = ShardedFlatIndex(dim=16, replicas=2)  # 2 replicas x 4 shards
        assert idx.replicas == 2 and idx.n_devices == 4
        vecs = _normed(rng, 200, 16)
        slots = idx.add_batch(vecs)
        scores, got = idx.search(vecs[:8], k=1)
        np.testing.assert_array_equal(got[:, 0], slots[:8])
        np.testing.assert_allclose(scores[:, 0], 1.0, rtol=1e-4)

    def test_replicated_deletes_and_growth(self, rng):
        from wdbx_tpu.parallel import ShardedFlatIndex

        idx = ShardedFlatIndex(dim=8, replicas=4, capacity=8)  # 4x2 mesh
        vecs = _normed(rng, 600, 8)
        slots = idx.add_batch(vecs)
        idx.remove_slots(slots[:10])
        _, got = idx.search(vecs[0], k=5)
        assert slots[0] not in got[0]
        _, got = idx.search(vecs[500:503], k=1)
        np.testing.assert_array_equal(got[:, 0], slots[500:503])

    def test_stats_report_replicas(self):
        from wdbx_tpu.parallel import ShardedFlatIndex

        idx = ShardedFlatIndex(dim=8, replicas=2)
        s = idx.get_stats()
        assert s["replicas"] == 2 and s["devices"] == 4


def test_shard_engine_health_check(temp_dir):
    from wdbx_tpu.core.config import WDBXConfig

    engine = ShardEngine(WDBXConfig({"DATA_DIR": temp_dir}))
    asyncio.run(engine.initialize())
    report = engine.health_check()
    assert report["healthy"]
    assert len(report["devices"]) == 8
    assert all(v == "ok" for v in report["devices"].values())


class TestShardedIVF:
    def _mk(self, rng, n=2048, d=32, nlist=16, nprobe=4):
        from wdbx_tpu.parallel.sharded_ivf import ShardedIVFIndex

        idx = ShardedIVFIndex(dim=d, nlist=nlist, nprobe=nprobe,
                              train_threshold=256)
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
        slots = idx.add_batch(vecs)
        idx.build()
        return idx, vecs, slots

    def test_build_shards_tables(self, rng):
        idx, vecs, slots = self._mk(rng)
        assert idx.is_trained
        assert idx._bucket_rows.shape[0] % idx.n_devices == 0
        # bucket tables live sharded over the mesh axis
        spec = idx._bucket_rows.sharding.spec
        assert spec[0] == idx.axis, spec

    def test_self_query_and_recall(self, rng):
        idx, vecs, slots = self._mk(rng)
        idx.batch_flat_fallback = False
        idx.nprobe = 16  # probe everything: exact
        scores, got = idx.search(vecs[:32], k=1)
        np.testing.assert_array_equal(got[:, 0], slots[:32])
        # tuned recall vs the sharded exact oracle
        idx.nprobe = 4
        achieved = idx.tune(vecs[100:164], k=10, target_recall=0.9)
        assert achieved >= 0.9, achieved

    def test_fresh_adds_visible(self, rng):
        idx, vecs, slots = self._mk(rng)
        idx.batch_flat_fallback = False
        late = rng.standard_normal((5, 32)).astype(np.float32)
        late /= np.linalg.norm(late, axis=-1, keepdims=True)
        late_slots = idx.add_batch(late)
        _, got = idx.search(late, k=1)
        np.testing.assert_array_equal(got[:, 0], late_slots)

    def test_delete_after_build_invisible(self, rng):
        idx, vecs, slots = self._mk(rng)
        idx.batch_flat_fallback = False
        idx.nprobe = 16
        idx.remove_slots(slots[:4])
        _, got = idx.search(vecs[:4], k=5)
        for qi in range(4):
            assert slots[qi] not in got[qi]

    def test_candidates_span_devices(self, rng):
        idx, vecs, slots = self._mk(rng, n=4096, nlist=32, nprobe=32)
        idx.batch_flat_fallback = False
        _, got = idx.search(vecs[:64], k=10)
        owners = {int(s) % idx.n_devices for s in got.flatten() if s >= 0}
        assert len(owners) == idx.n_devices, owners

    def test_masked_search_falls_to_exact(self, rng):
        idx, vecs, slots = self._mk(rng)
        mask = np.zeros(idx.capacity, bool)
        allowed = slots[::3]
        mask[allowed] = True
        _, got = idx.search(vecs[:8], k=5, slot_mask=mask)
        allowed_set = set(int(s) for s in allowed)
        for row in got:
            for s in row:
                assert s < 0 or int(s) in allowed_set

    def test_masked_search_pushdown_above_threshold(self, rng, monkeypatch):
        """Round-3: ≥2% selectivity masks ride the bucket tables (AND
        into bucket_valid + striped row validity), not the exact scan."""
        from wdbx_tpu.parallel.sharded_flat import ShardedFlatIndex

        idx, vecs, slots = self._mk(rng, n=4096, nlist=16, nprobe=4)
        idx.batch_flat_fallback = False
        called = []
        orig = ShardedFlatIndex.search

        def spy(self_, q, k, m=None):
            called.append(1)
            return orig(self_, q, k, m)

        monkeypatch.setattr(ShardedFlatIndex, "search", spy)
        mask = np.zeros(idx.capacity, bool)
        allowed = slots[: len(slots) // 2]  # 50%
        mask[allowed] = True
        q = vecs[:8]
        _, got = idx.search(q, k=10, slot_mask=mask)
        assert not called, "50% filter must use bucket pushdown"
        allowed_set = set(int(s) for s in allowed)
        live = [int(s) for row in got for s in row if s >= 0]
        assert live and all(s in allowed_set for s in live)
        # recall vs the filtered exact oracle
        sub = np.asarray(allowed)
        exact = sub[np.argsort(-(q @ vecs[sub].T), axis=-1)[:, :10]]
        recall = np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / 10
             for a, b in zip(got, exact)]
        )
        assert recall >= 0.8, recall
        # sparse (<2%) still routes exact
        sparse = np.zeros(idx.capacity, bool)
        sparse[slots[:40]] = True  # ~1%
        idx.search(q, k=5, slot_mask=sparse)
        assert called

    def test_factory(self):
        from wdbx_tpu.index import create_index
        from wdbx_tpu.core.config import WDBXConfig

        idx = create_index("sharded_ivf", 16, WDBXConfig({"IVF_NLIST": 8}))
        assert idx.kind == "sharded_ivf" and idx.nlist == 8


class TestFailover:
    def test_plan_recovery_uses_replicas(self, temp_dir):
        """Replica metadata must be CONSUMED on failure: a dead primary's
        shard is re-targeted at its first healthy replica."""
        import asyncio

        from wdbx_tpu.core.config import WDBXConfig
        from wdbx_tpu.parallel.shard_engine import ShardEngine

        engine = ShardEngine(WDBXConfig({
            "DATA_DIR": temp_dir, "DISTRIBUTED_REPLICATION_FACTOR": 2,
        }))
        asyncio.run(engine.initialize())
        alloc = engine.allocation()
        devices = [p["primary"] for p in alloc["shards"].values()]
        # fake a dead device 0
        health = {
            "healthy": False,
            "devices": {
                d: ("error: down" if i == 0 else "ok")
                for i, d in enumerate(devices)
            },
        }
        plan = engine.plan_recovery(health)
        assert 0 in plan
        expected_replica = alloc["shards"]["0"]["replicas"][0]
        assert plan[0] == expected_replica
        # healthy shards are untouched
        assert all(s == 0 for s in plan)

    def test_heal_recovers_from_checkpoint(self, temp_dir):
        """WDBX.heal(): dead primary -> shard reloaded from its last
        checkpoint; data is still queryable afterwards."""
        import asyncio
        from unittest import mock

        from wdbx_tpu import WDBX

        db = WDBX(vector_dimension=8, num_shards=2, data_dir=temp_dir,
                  enable_plugins=False, enable_distributed=True)
        asyncio.run(db.initialize())
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((20, 8)).astype(np.float32)
        for i, v in enumerate(vecs):
            db.vector_store(v, {"i": i}, f"v{i}")
        db.store.save()  # checkpoint
        # clobber shard 0 in memory (simulated device loss)
        db.store.indices[0].clear()
        alloc = db.shard_engine.allocation()
        bad = alloc["shards"]["0"]["primary"]
        with mock.patch.object(
            db.shard_engine, "health_check",
            return_value={"healthy": False, "devices": {
                d["primary"]: ("error: down" if d["primary"] == bad else "ok")
                for d in alloc["shards"].values()
            }},
        ):
            report = db.heal()
        assert 0 in report["recovered_shards"]
        hits = db.vector_search(vecs[0], limit=1)
        assert hits[0][0] == "v0"


class TestRemesh:
    def test_flat_remesh_preserves_data(self, rng):
        """8 -> 4 devices: same slots, same search results, adds work."""
        idx = ShardedFlatIndex(8, capacity=64)
        vecs = _normed(rng, 40, 8)
        slots = idx.add_batch(vecs)
        _, pre = idx.search(vecs[:5], 3)
        idx.remesh(make_mesh(4))
        assert idx.n_devices == 4
        _, post = idx.search(vecs[:5], 3)
        assert (pre == post).all()
        assert idx.count() == 40
        # mutation still works on the new topology
        more = idx.add_batch(_normed(rng, 6, 8))
        _, got = idx.search(np.asarray(idx.get_vectors(more[:1])), 1)
        assert got.ravel()[0] == more[0]
        idx.remove_slots(slots[:2])
        assert idx.count() == 44

    def test_remesh_up(self, rng):
        idx = ShardedFlatIndex(8, mesh=make_mesh(2), capacity=64)
        vecs = _normed(rng, 16, 8)
        idx.add_batch(vecs)
        idx.remesh(make_mesh(8))
        assert idx.n_devices == 8
        _, got = idx.search(vecs[:3], 1)
        assert (got.ravel() == np.arange(3)).all()

    def test_sharded_ivf_remesh_rebuilds(self, rng):
        from wdbx_tpu.parallel.sharded_ivf import ShardedIVFIndex

        idx = ShardedIVFIndex(16, nlist=8, nprobe=8, train_threshold=64)
        vecs = _normed(rng, 600, 16)
        idx.add_batch(vecs)
        idx.build()
        assert idx.is_trained
        idx.remesh(make_mesh(4))
        assert idx.is_trained  # rebuilt on the new mesh
        idx.batch_flat_fallback = False
        _, got = idx.search(vecs[:5], 1)
        assert (got.ravel() == np.arange(5)).all()

    def test_degraded_mesh_excludes_dead(self, temp_dir):
        from unittest import mock

        engine = ShardEngine(WDBXConfig({"DATA_DIR": temp_dir}))
        asyncio.run(engine.initialize())
        devices = [str(d) for d in engine.mesh.devices.flat]
        health = {"healthy": False, "devices": {
            d: ("error: down" if i == 2 else "ok")
            for i, d in enumerate(devices)
        }}
        degraded = engine.degraded_mesh(health)
        left = [str(d) for d in degraded.devices.flat]
        assert len(left) == len(devices) - 1 and devices[2] not in left
        # all healthy -> same mesh object
        ok = {"healthy": True, "devices": {d: "ok" for d in devices}}
        assert engine.degraded_mesh(ok) is engine.mesh

    def test_cold_rehost_adopt_mesh(self, rng, temp_dir):
        """adopt_mesh + checkpoint reload: the fallback when the old
        mesh is unreachable and a live remesh gather is impossible."""
        idx = ShardedFlatIndex(8, capacity=64)
        vecs = _normed(rng, 24, 8)
        slots = idx.add_batch(vecs)
        import os

        path = os.path.join(temp_dir, "cold")
        idx.save(path)
        idx.adopt_mesh(make_mesh(4))
        assert idx.n_devices == 4 and idx.count() == 0  # cold = empty
        assert idx.load(path)  # reload lands on the new mesh
        _, got = idx.search(vecs[:5], 1)
        assert (got.ravel() == slots[:5]).all()

    def test_heal_cold_rehosts_when_remesh_fails(self, temp_dir):
        """A truly-dead device makes the live remesh gather raise; heal
        must fall back to adopt_mesh + checkpoint reload, not abort."""
        from unittest import mock

        from wdbx_tpu import WDBX

        db = WDBX(vector_dimension=8, num_shards=1, data_dir=temp_dir,
                  enable_plugins=False, enable_distributed=True,
                  config={"INDEX_TYPE": "sharded_flat"})
        asyncio.run(db.initialize())
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((16, 8)).astype(np.float32)
        for i, v in enumerate(vecs):
            db.vector_store(v, {"i": i}, f"v{i}")
        db.store.save()
        n_before = db.store.indices[0].n_devices
        devices = [str(d) for d in db.shard_engine.mesh.devices.flat]
        health = {"healthy": False, "devices": {
            d: ("error: down" if i == 0 else "ok")
            for i, d in enumerate(devices)
        }}
        with mock.patch.object(
            db.shard_engine, "health_check", return_value=health
        ), mock.patch.object(
            db.store.indices[0], "remesh",
            side_effect=RuntimeError("device unreachable"),
        ):
            report = db.heal(allow_remesh=True)
        assert report["remeshed_to"]
        assert db.store.indices[0].n_devices == n_before - 1
        hits = db.vector_search(vecs[2], limit=1)
        assert hits[0][0] == "v2"

    def test_sharded_clustered_load_on_different_mesh(self, rng, temp_dir):
        """A trained checkpoint from an 8-device mesh must rebuild its
        per-device extents when loaded on a 4-device mesh (installing
        the persisted (8, nlist) extents would silently corrupt
        results)."""
        import os

        from wdbx_tpu.parallel.sharded_clustered import ShardedClusteredIndex

        idx = ShardedClusteredIndex(16, nlist=8, nprobe=8,
                                    train_threshold=64)
        idx.batch_flat_fallback = False
        vecs = _normed(rng, 600, 16)
        slots = idx.add_batch(vecs)
        idx.build()
        path = os.path.join(temp_dir, "xmesh")
        idx.save(path)
        idx2 = ShardedClusteredIndex(16, mesh=make_mesh(4), nlist=8,
                                     nprobe=8, train_threshold=64)
        idx2.batch_flat_fallback = False
        assert idx2.load(path)
        assert idx2.is_trained and idx2.n_devices == 4
        _, got = idx2.search(vecs[:8], 1)
        assert (got.ravel() == slots[:8]).all()

    def test_heal_escalates_to_remesh(self, temp_dir):
        """Layer 3: a dead device leaves the topology; the store's
        sharded index re-stripes onto the survivors and keeps serving."""
        from unittest import mock

        from wdbx_tpu import WDBX

        db = WDBX(vector_dimension=8, num_shards=1, data_dir=temp_dir,
                  enable_plugins=False, enable_distributed=True,
                  config={"INDEX_TYPE": "sharded_flat"})
        asyncio.run(db.initialize())
        rng = np.random.default_rng(1)
        vecs = rng.standard_normal((24, 8)).astype(np.float32)
        for i, v in enumerate(vecs):
            db.vector_store(v, {"i": i}, f"v{i}")
        db.store.save()
        n_before = db.store.indices[0].n_devices
        devices = [str(d) for d in db.shard_engine.mesh.devices.flat]
        health = {"healthy": False, "devices": {
            d: ("error: down" if i == 0 else "ok")
            for i, d in enumerate(devices)
        }}
        with mock.patch.object(
            db.shard_engine, "health_check", return_value=health
        ):
            report = db.heal(allow_remesh=True)
        assert report["remeshed_to"] and len(report["remeshed_to"]) == \
            n_before - 1
        assert db.store.indices[0].n_devices == n_before - 1
        hits = db.vector_search(vecs[3], limit=1)
        assert hits[0][0] == "v3"


MULTIHOST_WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())  # repo root (python adds the script dir)
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import asyncio
from wdbx_tpu.core.config import WDBXConfig
from wdbx_tpu.parallel.shard_engine import ShardEngine

engine = ShardEngine(WDBXConfig({"DATA_DIR": sys.argv[3]}))
asyncio.run(engine.initialize())
alloc = engine.allocation()
assert alloc["process_count"] == 2, alloc["process_count"]
n = len(alloc["shards"])
assert n == 8, n  # 2 processes x 4 local devices
local = [s for s in range(n) if engine.is_local_shard(s)]
assert len(local) == 4, local
# DCN control plane up: a psum across both processes' devices
import jax.numpy as jnp
total = jax.jit(lambda x: jnp.sum(x))(jnp.ones((n,)))
assert float(total) == n
print(f"proc{pid} OK local={local}", flush=True)
"""


MULTIHOST_DATA_WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import numpy as np
from wdbx_tpu.parallel.sharded_flat import ShardedFlatIndex
from wdbx_tpu.parallel.sharded_clustered import ShardedClusteredIndex
from wdbx_tpu.parallel.mesh import make_mesh

# data plane: add/search/tombstone on a mesh spanning both processes
mesh = make_mesh()
assert mesh.devices.size == 8
idx = ShardedFlatIndex(dim=16, capacity=8 * 16, mesh=mesh)
rng = np.random.default_rng(0)  # identical inserts on both controllers
vecs = rng.standard_normal((32, 16)).astype(np.float32)
slots = idx.add_batch(vecs)
scores, got = idx.search(vecs[:8], k=3)
assert (got[:, 0] == slots[:8]).all(), got[:, 0]
idx.remove_slots(slots[:2])
_, got2 = idx.search(vecs[:2], k=1)
assert got2[0, 0] != slots[0] and got2[1, 0] != slots[1]

# clustered build: kmeans + striped permute + shard_map query over DCN
c = ShardedClusteredIndex(dim=16, nlist=8, nprobe=8, train_threshold=64)
c.batch_flat_fallback = False
cv = rng.standard_normal((600, 16)).astype(np.float32)
cv /= np.linalg.norm(cv, axis=-1, keepdims=True)
cs = c.add_batch(cv)
c.build()
assert c.is_trained
_, cg = c.search(cv[:8], k=3)
assert (cg[:, 0] == cs[:8]).all(), cg[:, 0]

# orbax persistence: per-process shard I/O, no host gather
tmpdir = sys.argv[3]
idx.persist_backend = "orbax"
path = os.path.join(tmpdir, "mh_orbax")
idx.save(path)
idx2 = ShardedFlatIndex(dim=16, capacity=8 * 16, mesh=mesh)
idx2.persist_backend = "orbax"
assert idx2.load(path), "orbax multi-host load failed"
_, og = idx2.search(vecs[2:6], k=1)
assert (og.ravel() == slots[2:6]).all(), og.ravel()
print(f"proc{pid} DATA OK", flush=True)
"""


class TestMultiHost:
    def _run_workers(self, script_text, tmp_path, extra_args=(), timeout=240):
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        script = tmp_path / "worker.py"
        script.write_text(script_text)
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(port), str(pid),
                 *extra_args],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd="/root/repo",
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append((p.returncode, out))
        return outs

    def test_two_process_data_plane(self, tmp_path, temp_dir):
        """Multi-controller DATA plane: striped scatter insert, shard_map
        search + all-gather merge, tombstones, the full clustered build
        (kmeans, permute, block-scan query), and an orbax save/load
        round trip (per-process shard I/O) across two processes over
        the gloo/DCN backend."""
        outs = self._run_workers(
            MULTIHOST_DATA_WORKER, tmp_path, extra_args=(temp_dir,)
        )
        for rc, out in outs:
            assert rc == 0, f"worker failed rc={rc}:\n{out[-2000:]}"
        assert "proc0 DATA OK" in outs[0][1]
        assert "proc1 DATA OK" in outs[1][1]

    def test_two_process_shard_engine(self, temp_dir, tmp_path):
        """Real multi-controller smoke test: two jax.distributed CPU
        processes (4 fake devices each) form one 8-device runtime;
        ShardEngine sees the global mesh and resolves shard locality per
        process. This is the DCN hook the reference's TCP coordinator
        stood in for (reference wdbx/core/distributed.py:547-648)."""
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        script = tmp_path / "worker.py"
        script.write_text(MULTIHOST_WORKER)
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(port), str(pid), temp_dir],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd="/root/repo",
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=120)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append((p.returncode, out))
        for rc, out in outs:
            assert rc == 0, f"worker failed rc={rc}:\n{out[-2000:]}"
        assert "proc0 OK" in outs[0][1] and "proc1 OK" in outs[1][1]


class TestShardedPipelined:
    def test_sharded_flat_pipelined(self, rng):
        from wdbx_tpu.parallel import ShardedFlatIndex

        idx = ShardedFlatIndex(dim=16, capacity=1024)
        vecs = rng.standard_normal((300, 16)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
        slots = idx.add_batch(vecs)
        qs = vecs[:24].reshape(3, 8, 16)
        s3, i3 = idx.search_pipelined(qs, k=5)
        assert s3.shape == (3, 8, 5)
        for nb in range(3):
            _, i1 = idx.search(qs[nb], k=5)
            np.testing.assert_array_equal(i3[nb], i1)

    def test_sharded_ivf_pipelined(self, rng):
        from wdbx_tpu.parallel.sharded_ivf import ShardedIVFIndex

        idx = ShardedIVFIndex(dim=16, nlist=16, nprobe=16,
                              train_threshold=64)
        idx.batch_flat_fallback = False
        vecs = rng.standard_normal((512, 16)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
        slots = idx.add_batch(vecs)
        idx.build()
        qs = vecs[:16].reshape(2, 8, 16)
        s3, i3 = idx.search_pipelined(qs, k=1)
        assert s3.shape == (2, 8, 1)
        np.testing.assert_array_equal(i3.reshape(-1), slots[:16])

    def test_sharded_inflight_matches_blocking(self, rng):
        """materialize=False handles on the sharded engines resolve to
        the blocking path's exact output (double-buffered serving)."""
        from wdbx_tpu.parallel import ShardedFlatIndex
        from wdbx_tpu.parallel.sharded_ivf import ShardedIVFIndex

        vecs = rng.standard_normal((512, 16)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
        qs = vecs[:24].reshape(3, 8, 16)

        flat = ShardedFlatIndex(dim=16, capacity=1024)
        flat.add_batch(vecs)
        want = flat.search_pipelined(qs, k=5)
        got = flat.resolve_pipelined(
            flat.search_pipelined(qs, k=5, materialize=False)
        )
        np.testing.assert_array_equal(got[1], want[1])

        ivf = ShardedIVFIndex(dim=16, nlist=16, nprobe=16,
                              train_threshold=64)
        ivf.batch_flat_fallback = False
        ivf.add_batch(vecs)
        ivf.build()
        want = ivf.search_pipelined(qs, k=4)
        handles = [
            ivf.search_pipelined(qs, k=4, materialize=False)
            for _ in range(2)
        ]
        for h in handles:
            ss, ii = ivf.resolve_pipelined(h)
            np.testing.assert_array_equal(ii, want[1])
        # untrained fallback handle routes through the sflat resolve
        cold = ShardedIVFIndex(dim=16, train_threshold=10**9)
        cold.add_batch(vecs[:64])
        want = cold.search_pipelined(qs, k=2)
        got = cold.resolve_pipelined(
            cold.search_pipelined(qs, k=2, materialize=False)
        )
        np.testing.assert_array_equal(got[1], want[1])
        # k > rows_per_device on the untrained fallback must PAD to k
        # (MRO regression: IVFIndex._finish_pipelined shadows the sflat
        # one on ShardedIVF and slices instead of padding)
        tiny = ShardedIVFIndex(dim=16, train_threshold=10**9,
                               capacity=64)
        tiny.add_batch(vecs[:64])
        ks, kg = tiny.search_pipelined(qs, k=12)
        assert ks.shape == (3, 8, 12) and kg.shape == (3, 8, 12)
        ks2, kg2 = tiny.resolve_pipelined(
            tiny.search_pipelined(qs, k=12, materialize=False)
        )
        np.testing.assert_array_equal(kg2, kg)


def test_sharded_ivf_int8_tables(rng):
    """Sharded IVF must keep int8 code tables + scale table for int8
    slabs and return correct dequantized rankings (review finding r2:
    the old build host-gathered every row and stored bf16 tables)."""
    import jax.numpy as jnp

    from wdbx_tpu.parallel.sharded_ivf import ShardedIVFIndex

    idx = ShardedIVFIndex(dim=32, dtype="int8", nlist=16, nprobe=16,
                          train_threshold=64)
    idx.batch_flat_fallback = False
    vecs = _normed(rng, 1024, 32)
    slots = idx.add_batch(vecs)
    idx.build()
    assert idx._bucket_rows.dtype == jnp.int8
    assert idx._bucket_scale is not None
    assert idx._bucket_rows.sharding.spec[0] == idx.axis
    _, got = idx.search(vecs[:16], k=1)
    np.testing.assert_array_equal(got[:, 0], slots[:16])
    # pipelined path too
    qs = vecs[:16].reshape(2, 8, 32)
    _, got3 = idx.search_pipelined(qs, k=1)
    np.testing.assert_array_equal(got3.reshape(-1), slots[:16])


def test_sharded_fused_kernel_path(rng):
    """The fused Pallas kernel runs per shard INSIDE shard_map (the
    multi-chip roofline path); exercised in interpret mode on the CPU
    mesh with int8 scales."""
    from wdbx_tpu.parallel import ShardedFlatIndex

    for dtype in ("bfloat16", "int8"):
        idx = ShardedFlatIndex(dim=32, dtype=dtype, capacity=2048)
        idx.topk_method = "fused"
        vecs = _normed(rng, 600, 32)
        slots = idx.add_batch(vecs)
        idx.remove_slots(slots[:5])
        _, got = idx.search(vecs[5:13], k=3)
        np.testing.assert_array_equal(got[:, 0], slots[5:13])
        assert slots[0] not in got.flatten()
