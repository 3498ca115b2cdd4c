"""Basic usage — store, search, filter, persist.

Functional parity with the reference example (reference
examples/basic_usage.py): create a DB, store vectors with metadata,
similarity-search, read stats — plus the TPU-native batch paths.
"""

import asyncio

import numpy as np

from wdbx_tpu import WDBX


async def main() -> None:
    db = WDBX(vector_dimension=384, num_shards=2, data_dir="./wdbx_data_example")
    await db.initialize()

    rng = np.random.default_rng(42)

    # Store one vector with metadata.
    vec = rng.standard_normal(384).astype(np.float32)
    vid = await db.vector_store_async(vec.tolist(), {"title": "hello", "rank": 1})
    print(f"stored {vid}")

    # Batch-store 10k vectors in one compiled scatter per shard.
    vectors = {
        f"doc-{i}": rng.standard_normal(384).astype(np.float32)
        for i in range(10_000)
    }
    metadata = {f"doc-{i}": {"rank": i % 100} for i in range(10_000)}
    count = await db.batch_store_async(vectors, metadata)
    print(f"batch stored {count} vectors; total {db.count_vectors()}")

    # Top-5 search (BASELINE config 1: flat cosine, 10k x 384, top-5).
    hits = await db.vector_search_async(vec.tolist(), limit=5)
    for hit_id, score, meta in hits:
        print(f"  {hit_id}  score={score:.4f}  {meta}")

    # Filtered search: only rank < 10.
    hits = await db.vector_search_async(
        vectors["doc-123"].tolist(), limit=5,
        filter_metadata={"rank": {"$lt": 10}},
    )
    print(f"filtered hits: {[h[0] for h in hits]}")

    # Batched queries — one MXU matmul for the whole batch.
    queries = np.stack([vectors[f"doc-{i}"] for i in range(64)])
    results = await db.vector_search_batch_async(queries, limit=3)
    print(f"batch search: {len(results)} result lists; "
          f"self-hit rate {sum(r[0][0] == f'doc-{i}' for i, r in enumerate(results)) / 64:.2f}")

    print({k: v for k, v in db.get_stats().items() if k != "indices"})
    await db.shutdown()


if __name__ == "__main__":
    asyncio.run(main())
