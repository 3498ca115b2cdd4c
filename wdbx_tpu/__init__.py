"""wdbx_tpu — a TPU-native vector database framework.

Re-imagines the capabilities of the WDBX reference (a pure-Python vector DB
over hnswlib/FAISS; see reference wdbx/__init__.py) as a JAX/XLA/Pallas
engine: embeddings live in device HBM, scoring is a blocked matmul on the
MXU with fused top-k, ANN indexing is an IVF/ScaNN-style partitioned scan
instead of a graph walk, and multi-shard search maps onto a
jax.sharding.Mesh with collective top-k merges.

Public surface mirrors the reference facade (reference wdbx/core/wdbx.py:21):

    from wdbx_tpu import WDBX
    db = WDBX(vector_dimension=384, num_shards=2)
    await db.initialize()
    vid = await db.vector_store_async(vec, {"tag": "a"})
    hits = await db.vector_search_async(query, limit=10)
"""

__version__ = "0.1.0"

__all__ = [
    "WDBX", "WDBXConfig", "VectorStore", "FlatIndex", "IVFIndex",
    "ShardedFlatIndex", "ShardedIVFIndex", "__version__",
]

_LAZY = {
    "WDBX": ("wdbx_tpu.core.wdbx", "WDBX"),
    "WDBXConfig": ("wdbx_tpu.core.config", "WDBXConfig"),
    "VectorStore": ("wdbx_tpu.store.vector_store", "VectorStore"),
    "FlatIndex": ("wdbx_tpu.index.flat", "FlatIndex"),
    "IVFIndex": ("wdbx_tpu.index.ivf", "IVFIndex"),
    "ShardedFlatIndex": ("wdbx_tpu.parallel.sharded_flat", "ShardedFlatIndex"),
    "ShardedIVFIndex": ("wdbx_tpu.parallel.sharded_ivf", "ShardedIVFIndex"),
}


def __getattr__(name):  # lazy: keep `import wdbx_tpu.ops` light
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'wdbx_tpu' has no attribute {name!r}")
