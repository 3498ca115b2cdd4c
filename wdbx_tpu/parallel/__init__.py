"""Multi-device layer: mesh construction, device-sharded indexes, and the
shard control plane.

This is the TPU-native replacement for the reference's entire distributed
stack (reference wdbx/core/distributed.py): instead of a pickle-over-TCP
coordinator with greedy shard allocation and per-request socket hops, the
vector corpus is sharded across a ``jax.sharding.Mesh`` and the
scatter-gather top-k merge is an XLA all-gather over ICI inside one
compiled program (SURVEY.md §2.9's mapping table).
"""

from wdbx_tpu.parallel.mesh import make_mesh, make_mesh2
from wdbx_tpu.parallel.shard_engine import ShardEngine
from wdbx_tpu.parallel.sharded_clustered import ShardedClusteredIndex
from wdbx_tpu.parallel.sharded_flat import ShardedFlatIndex
from wdbx_tpu.parallel.sharded_ivf import ShardedIVFIndex

__all__ = [
    "make_mesh", "make_mesh2", "ShardedFlatIndex", "ShardedIVFIndex",
    "ShardedClusteredIndex", "ShardEngine",
]
