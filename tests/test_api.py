"""REST API tests via aiohttp's test client — all 13 reference routes
plus the batched-search extension."""

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from wdbx_tpu import WDBX
from wdbx_tpu.api.server import WDBXAPIServer
from wdbx_tpu.plugins import WDBXPlugin


class FakeEmbedder(WDBXPlugin):
    name = "ollama"
    description = "fake"
    version = "0"

    async def create_embedding(self, text):
        rng = np.random.default_rng(abs(hash(text)) % 2**32)
        return rng.standard_normal(4).astype(float).tolist()


async def make_client(temp_dir, **server_kw):
    db = WDBX(vector_dimension=4, num_shards=2, data_dir=temp_dir,
              enable_plugins=False)
    db.register_plugin(FakeEmbedder(db))
    await db.initialize()
    server = WDBXAPIServer(db, **server_kw)
    client = TestClient(TestServer(server.app))
    await client.start_server()
    return client, db


class TestAPI:
    async def test_health(self, temp_dir):
        client, _ = await make_client(temp_dir)
        resp = await client.get("/api/v1/health")
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "healthy" and "version" in body
        await client.close()

    async def test_vector_crud_routes(self, temp_dir):
        client, _ = await make_client(temp_dir)
        resp = await client.post(
            "/api/v1/vectors",
            json={"vector": [1, 0, 0, 0], "metadata": {"t": 1}, "id": "v1"},
        )
        assert resp.status == 200
        assert (await resp.json())["vector_id"] == "v1"

        resp = await client.post(
            "/api/v1/vectors/search",
            json={"query_vector": [1, 0, 0, 0], "limit": 5},
        )
        results = (await resp.json())["results"]
        assert results[0]["vector_id"] == "v1"
        assert results[0]["similarity"] > 0.99
        assert results[0]["metadata"] == {"t": 1}

        resp = await client.get("/api/v1/vectors/v1")
        body = await resp.json()
        assert body["vector"] == [1.0, 0.0, 0.0, 0.0]

        resp = await client.put(
            "/api/v1/vectors/v1/metadata", json={"metadata": {"t": 2}}
        )
        assert (await resp.json())["success"]

        resp = await client.delete("/api/v1/vectors/v1")
        assert (await resp.json())["success"]
        assert (await client.get("/api/v1/vectors/v1")).status == 404
        assert (await client.delete("/api/v1/vectors/v1")).status == 404
        await client.close()

    async def test_batch_search_route(self, temp_dir):
        client, db = await make_client(temp_dir)
        for i in range(4):
            vec = [0.0] * 4
            vec[i] = 1.0
            db.vector_store(vec, id=f"e{i}")
        resp = await client.post(
            "/api/v1/vectors/search/batch",
            json={"query_vectors": [[1, 0, 0, 0], [0, 0, 1, 0]], "limit": 1},
        )
        body = await resp.json()
        assert body["results"][0][0]["vector_id"] == "e0"
        assert body["results"][1][0]["vector_id"] == "e2"
        await client.close()

    async def test_stats_and_clear(self, temp_dir):
        client, db = await make_client(temp_dir)
        db.vector_store([1, 0, 0, 0])
        resp = await client.get("/api/v1/stats")
        assert (await resp.json())["vector_count"] == 1
        resp = await client.post("/api/v1/clear")
        assert (await resp.json())["removed_vectors"] == 1
        await client.close()

    async def test_embeddings_routes(self, temp_dir):
        client, _ = await make_client(temp_dir)
        resp = await client.post("/api/v1/embeddings", json={"text": "hi"})
        assert resp.status == 200
        assert len((await resp.json())["embedding"]) == 4
        resp = await client.post(
            "/api/v1/embeddings/batch", json={"texts": ["a", "b"]}
        )
        assert len((await resp.json())["embeddings"]) == 2
        await client.close()

    async def test_embeddings_501_when_no_plugin(self, temp_dir):
        db = WDBX(vector_dimension=4, data_dir=temp_dir, enable_plugins=False)
        server = WDBXAPIServer(db)
        client = TestClient(TestServer(server.app))
        await client.start_server()
        resp = await client.post("/api/v1/embeddings", json={"text": "x"})
        assert resp.status == 501
        await client.close()

    async def test_plugins_routes(self, temp_dir):
        client, _ = await make_client(temp_dir)
        resp = await client.get("/api/v1/plugins")
        plugins = (await resp.json())["plugins"]
        assert any(p["name"] == "ollama" for p in plugins)
        resp = await client.get("/api/v1/plugins/ollama")
        assert (await resp.json())["name"] == "ollama"
        assert (await client.get("/api/v1/plugins/nope")).status == 404
        await client.close()

    async def test_api_key_auth(self, temp_dir):
        client, _ = await make_client(temp_dir, api_key="sekrit")
        assert (await client.get("/api/v1/health")).status == 200  # exempt
        assert (await client.get("/api/v1/stats")).status == 401
        resp = await client.get(
            "/api/v1/stats", headers={"X-API-Key": "sekrit"}
        )
        assert resp.status == 200
        await client.close()

    async def test_cors_preflight(self, temp_dir):
        client, _ = await make_client(
            temp_dir, api_key="sekrit", cors_origins=["http://app.example"]
        )
        # preflight is unauthenticated and answers Allow-* headers
        resp = await client.options(
            "/api/v1/vectors/v1/metadata",
            headers={
                "Origin": "http://app.example",
                "Access-Control-Request-Method": "PUT",
                "Access-Control-Request-Headers": "X-API-Key",
            },
        )
        assert resp.status == 204
        assert (
            resp.headers["Access-Control-Allow-Origin"] == "http://app.example"
        )
        assert "PUT" in resp.headers["Access-Control-Allow-Methods"]
        assert "X-API-Key" in resp.headers["Access-Control-Allow-Headers"]
        # disallowed origin gets no CORS headers
        resp = await client.options(
            "/api/v1/stats", headers={"Origin": "http://evil.example"}
        )
        assert resp.status == 204
        assert "Access-Control-Allow-Origin" not in resp.headers
        # actual responses still carry Allow-Origin
        resp = await client.get(
            "/api/v1/stats",
            headers={"X-API-Key": "sekrit", "Origin": "http://app.example"},
        )
        assert resp.headers["Access-Control-Allow-Origin"] == "http://app.example"
        await client.close()

    async def test_validation_errors(self, temp_dir):
        client, _ = await make_client(temp_dir)
        assert (await client.post("/api/v1/vectors", json={})).status == 422
        resp = await client.post(
            "/api/v1/vectors", json={"vector": [1.0, 2.0]}
        )
        assert resp.status == 400  # dim mismatch → ValueError → 400
        await client.close()


class TestQueryBatching:
    async def test_concurrent_requests_coalesce(self, temp_dir):
        import asyncio

        client, db = await make_client(temp_dir)
        for i in range(4):
            vec = [0.0] * 4
            vec[i] = 1.0
            db.vector_store(vec, id=f"b{i}")

        async def one(i):
            vec = [0.0] * 4
            vec[i % 4] = 1.0
            resp = await client.post(
                "/api/v1/vectors/search",
                json={"query_vector": vec, "limit": 1},
            )
            return (await resp.json())["results"][0]["vector_id"]

        results = await asyncio.gather(*(one(i) for i in range(16)))
        assert results == [f"b{i % 4}" for i in range(16)]
        resp = await client.get("/api/v1/stats")
        batching = (await resp.json())["query_batching"]
        assert batching["requests"] == 16
        assert batching["batches"] < 16  # actually coalesced
        await client.close()

    async def test_batching_respects_param_groups(self, temp_dir):
        import asyncio

        client, db = await make_client(temp_dir)
        for i in range(8):
            db.vector_store(
                np.eye(4)[i % 4].tolist(), id=f"p{i}", metadata={"v": i}
            )

        async def q(limit, flt):
            body = {"query_vector": [1, 0, 0, 0], "limit": limit}
            if flt:
                body["filter_metadata"] = flt
            resp = await client.post("/api/v1/vectors/search", json=body)
            return (await resp.json())["results"]

        r1, r2 = await asyncio.gather(q(1, None), q(5, {"v": {"$lt": 4}}))
        assert len(r1) == 1
        assert all(h["metadata"]["v"] < 4 for h in r2)
        await client.close()


class TestVisualize:
    async def test_visualize_html_json_png(self, temp_dir):
        client, db = await make_client(temp_dir)
        rng = np.random.default_rng(0)
        for i in range(20):
            await db.vector_store_async(
                rng.standard_normal(4).tolist(), {"g": i % 2}, f"v{i}"
            )
        resp = await client.get("/api/v1/visualize")
        assert resp.status == 200
        html = await resp.text()
        assert resp.content_type == "text/html"
        assert "WDBX live dashboard" in html and "<canvas" in html
        resp = await client.get("/api/v1/visualize?format=json")
        spec = await resp.json()
        assert len(spec["points"]) == 20 and spec["components"] == 2
        resp = await client.get("/api/v1/visualize?format=png")
        body = await resp.json()
        import base64

        png = base64.b64decode(body["image_base64"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        await client.close()

    async def test_visualize_dashboard_controls_round_trip(self, temp_dir):
        """The reference Dash app's controls (method / components /
        filter — reference wdbx/utils/visualization.py:560-680) map to
        query params; the rendered page echoes the selected state."""
        client, db = await make_client(temp_dir)
        rng = np.random.default_rng(0)
        for i in range(24):
            await db.vector_store_async(
                rng.standard_normal(4).tolist(),
                {"source": "web" if i % 2 else "file"}, f"v{i}"
            )
        # t-SNE + 3D + key=value filter
        resp = await client.get(
            "/api/v1/visualize?method=tsne&components=3&filter=source=web"
        )
        assert resp.status == 200
        html = await resp.text()
        assert 'name="method"' in html and 'name="components"' in html
        assert '<option value="tsne" selected' in html
        assert '<option value="3" selected' in html
        assert '"components": 3' in html
        # json format honors method/components/filter too
        resp = await client.get(
            "/api/v1/visualize?format=json&components=3"
            '&filter={"source": "web"}'
        )
        spec = await resp.json()
        assert spec["components"] == 3
        assert len(spec["points"]) == 12  # half match the filter
        assert len(spec["points"][0]) == 3
        # validation
        resp = await client.get("/api/v1/visualize?method=lle")
        assert resp.status == 400
        resp = await client.get("/api/v1/visualize?components=5")
        assert resp.status == 400
        resp = await client.get("/api/v1/visualize?filter=no-equals-sign")
        assert resp.status == 400
        await client.close()

    async def test_visualize_empty_store_404(self, temp_dir):
        client, _ = await make_client(temp_dir)
        resp = await client.get("/api/v1/visualize")
        assert resp.status == 404
        resp = await client.get("/api/v1/visualize?format=bogus")
        assert resp.status in (400, 404)
        await client.close()


class TestWarmup:
    async def test_warmup_traces_batch_widths(self, temp_dir):
        client, db = await make_client(temp_dir)
        rng = np.random.default_rng(0)
        for i in range(20):
            db.vector_store(rng.standard_normal(4).tolist(), id=f"w{i}")
        server = WDBXAPIServer(db)
        n = await server.warmup()
        assert n == 8  # 1,2,4,...,128
        # empty store short-circuits
        db2 = WDBX(vector_dimension=4, data_dir=temp_dir + "/e",
                   enable_plugins=False)
        assert await WDBXAPIServer(db2).warmup() == 0
        await client.close()


class TestOpsRoutes:
    async def test_metrics_prometheus_format(self, temp_dir):
        client, db = await make_client(temp_dir)
        db.vector_store([1, 0, 0, 0], id="m1")
        await client.post(
            "/api/v1/vectors/search",
            json={"query_vector": [1, 0, 0, 0], "limit": 1},
        )
        resp = await client.get("/api/v1/metrics")
        assert resp.status == 200
        text = await resp.text()
        assert "wdbx_vector_count 1" in text
        assert 'wdbx_op_latency_ms{op="' in text
        assert "wdbx_batcher_requests" in text
        await client.close()

    async def test_save_route_checkpoints(self, temp_dir):
        client, db = await make_client(temp_dir)
        db.vector_store([0, 1, 0, 0], id="s1")
        resp = await client.post("/api/v1/save")
        assert (await resp.json())["saved"]
        # a fresh instance sees the checkpoint
        db2 = WDBX(vector_dimension=4, num_shards=2, data_dir=temp_dir,
                   enable_plugins=False)
        assert db2.get_vector("s1") is not None
        await client.close()


async def test_tune_endpoint(temp_dir):
    import numpy as np

    db = WDBX(vector_dimension=16, num_shards=1, data_dir=temp_dir,
              enable_plugins=False,
              config={"INDEX_TYPE": "ivf_clustered",
                      "IVF_TRAIN_THRESHOLD": 64, "IVF_NLIST": 4,
                      "IVF_NPROBE": 1})
    await db.initialize()
    server = WDBXAPIServer(db)
    client = TestClient(TestServer(server.app))
    await client.start_server()
    rng = np.random.default_rng(0)
    for i in range(200):
        v = rng.standard_normal(16)
        db.vector_store((v / np.linalg.norm(v)).tolist(), {"i": i}, f"v{i}")
    db.optimize()
    resp = await client.post("/api/v1/tune", json={"target_recall": 0.9})
    assert resp.status == 200
    report = await resp.json()
    assert report["achieved"] >= 0.9
    assert report["shards"]
    await client.close()
