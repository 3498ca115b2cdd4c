"""Device-resident vector indexes.

Replaces the reference's hnswlib/FAISS wrappers (reference
wdbx/core/indexing.py): scoring runs as compiled XLA programs over HBM
slabs instead of per-vector C++ graph walks.
"""

from wdbx_tpu.index.base import VectorIndex, create_index
from wdbx_tpu.index.clustered import ClusteredIVFIndex
from wdbx_tpu.index.flat import FlatIndex
from wdbx_tpu.index.ivf import IVFIndex

__all__ = [
    "VectorIndex",
    "FlatIndex",
    "IVFIndex",
    "ClusteredIVFIndex",
    "create_index",
]
