"""Continuous batching for the embedding forward pass.

The reference batched per request (32-item sub-batches inside one upload,
``embedder.py:359-373``); concurrent uploads/queries each paid their own
device round-trips. Here a single background scheduler coalesces *all*
concurrent embed work into device batches (SURVEY.md §7 layer 5):

* callers ``await submit(texts)`` — any number of concurrent coroutines;
* the scheduler drains the queue every ``max_wait_ms`` (or immediately at
  ``max_batch`` items), runs ONE bucketed forward for the union, and
  resolves each caller's future with its slice;
* batches stay shape-bucketed (``models.minilm.TextEncoder``), so mixed
  traffic still hits the compiled executables.

Effect: one upload with 3 chunks and a query arriving together cost one
device dispatch instead of two, and N concurrent requests scale to the
encoder's batch dimension instead of serializing.
"""

from __future__ import annotations

import asyncio
import logging
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class EmbedBatcher:
    def __init__(
        self,
        encoder,
        # 256 is the measured per-chip throughput knee for MiniLM on v5e
        # (23.5k chunks/s at 256 vs 20.4k at 512 — bigger batches spend
        # longer per dispatch without more MXU utilization).
        max_batch: int = 256,
        max_wait_ms: float = 3.0,
    ) -> None:
        self.encoder = encoder
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._queue: asyncio.Queue = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None
        self._loop = None
        self.stats = {"batches": 0, "items": 0, "max_batch_seen": 0}

    def start(self) -> None:
        loop = asyncio.get_event_loop()
        if self._loop is not loop:
            # The queue/worker are bound to an event loop; if the caller's
            # loop changed (tests, re-served apps), rebind cleanly.
            if self._task is not None and not self._task.done():
                self._task.cancel()
            self._queue = asyncio.Queue()
            self._task = None
            self._loop = loop
        if self._task is None or self._task.done():
            self._task = loop.create_task(self._run())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    async def submit(self, texts: Sequence[str]) -> np.ndarray:
        """→ (len(texts), dim) embeddings, batched with concurrent callers."""
        if not texts:
            return np.zeros((0, self.encoder.dim), np.float32)
        self.start()
        future: asyncio.Future = asyncio.get_event_loop().create_future()
        await self._queue.put((list(texts), future))
        return await future

    async def _run(self) -> None:
        while True:
            texts, future = await self._queue.get()
            pending: List = [(texts, future)]
            total = len(texts)
            deadline = asyncio.get_event_loop().time() + self.max_wait
            while total < self.max_batch:
                timeout = deadline - asyncio.get_event_loop().time()
                if timeout <= 0:
                    break
                try:
                    texts, future = await asyncio.wait_for(
                        self._queue.get(), timeout
                    )
                    pending.append((texts, future))
                    total += len(texts)
                except asyncio.TimeoutError:
                    break
            await self._flush(pending, total)

    async def _flush(self, pending, total: int) -> None:
        union: List[str] = []
        for texts, _ in pending:
            union.extend(texts)
        try:
            vecs = await asyncio.to_thread(self.encoder.encode, union)
        except Exception as e:  # noqa: BLE001
            for _, future in pending:
                if not future.done():
                    future.set_exception(e)
            return
        self.stats["batches"] += 1
        self.stats["items"] += total
        self.stats["max_batch_seen"] = max(
            self.stats["max_batch_seen"], total
        )
        offset = 0
        for texts, future in pending:
            if not future.done():
                future.set_result(vecs[offset : offset + len(texts)])
            offset += len(texts)
