"""Device compute primitives for the TPU vector engine."""

from wdbx_tpu.ops.normalize import l2_normalize
from wdbx_tpu.ops.exact_search import exact_search, score_block
from wdbx_tpu.ops.topk import topk_merge
from wdbx_tpu.ops.kmeans import kmeans

__all__ = ["l2_normalize", "exact_search", "score_block", "topk_merge", "kmeans"]
