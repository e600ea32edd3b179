"""Raw-content retriever over the KV store.

Behavioral counterpart of the reference's ``MultiVectorRetriever``
(``app/utils/retriever.py:93-1015``) with redis-server replaced by the
native C++ KV (same key schema, so real-Redis corpora port unchanged):

* keys — ``doc:{doc_id}:{item_id}`` → gzip(json ``{id, type, raw, summary
  [, path]}``); ``doc_index:{doc_id}`` → json item-id list;
  ``doc_meta:{doc_id}`` → json ``{doc_id, filename, item_count,
  chunks{text,table,image}, timestamp, compressed}`` (``:311-369``);
* gzip level 6 compression with measured ratio stat (``:277-284, 1008``);
* item-id → key codec assuming 2-token doc ids (``:610-637``);
* LRU cache over retrieved items, cleared on delete (``:659-661``);
* index-assisted delete with scan fallback, batched (``:639-726``);
* list_all via ``doc_meta:*`` scan sorted by timestamp desc (``:832-891``);
* retry-with-backoff on every mutating path; stats/health shapes.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional

from multimodal_rag_tpu.caching import LRUCache
from multimodal_rag_tpu.config import settings
from multimodal_rag_tpu.storage.kv import open_kv

logger = logging.getLogger(__name__)


class MultiVectorRetriever:
    def __init__(
        self,
        kv=None,
        enable_compression: Optional[bool] = None,
        enable_cache: Optional[bool] = None,
        cache_size: Optional[int] = None,
        max_retries: int = 3,
        batch_size: int = 100,
    ):
        self._kv = kv
        self.enable_compression = (
            settings.RETRIEVER_ENABLE_COMPRESSION
            if enable_compression is None
            else enable_compression
        )
        enable_cache = (
            settings.RETRIEVER_ENABLE_CACHE
            if enable_cache is None
            else enable_cache
        )
        self.cache = (
            LRUCache(cache_size or settings.RETRIEVER_CACHE_SIZE)
            if enable_cache
            else None
        )
        self.max_retries = max_retries
        self.batch_size = batch_size
        self.is_initialized = False
        self.stats = {
            "total_stored": 0,
            "total_retrieved": 0,
            "total_deleted": 0,
            "compression_ratio": 1.0,
            "cache_hits": 0,
            "cache_misses": 0,
        }

    async def initialize(self) -> None:
        if self.is_initialized:
            return
        if self._kv is None:
            self._kv = await asyncio.to_thread(
                open_kv, settings.KV_BACKEND, settings.KV_PERSIST_DIR
            )
        self.is_initialized = True
        logger.info(
            "MultiVectorRetriever ready (%s backend, %d keys)",
            type(self._kv).__name__, self._kv.count(),
        )

    async def cleanup(self) -> None:
        if self._kv is not None:
            await asyncio.to_thread(self._kv.save)
        self.is_initialized = False

    # ------------------------------------------------------------------
    # Store (reference retriever.py:238-369)
    # ------------------------------------------------------------------

    def _encode_item(self, item: Dict[str, Any]) -> bytes:
        data = {
            "id": item["id"],
            "type": item["type"],
            "raw": item["raw"],
            "summary": item["summary"],
        }
        if item["type"] == "image" and "path" in item:
            data["path"] = item["path"]
        payload = json.dumps(data)
        if self.enable_compression:
            return self._kv.gzip(payload.encode("utf-8"), 6)
        return payload.encode("utf-8")

    def _decode_item(self, blob: bytes) -> Dict[str, Any]:
        if self.enable_compression:
            try:
                return json.loads(self._kv.gunzip(blob))
            except Exception:  # stored uncompressed
                pass
        return json.loads(blob.decode("utf-8"))

    async def store_raw_documents(
        self, doc_id: str, summaries: List[Dict[str, Any]], filename: str
    ) -> None:
        if not self.is_initialized:
            await self.initialize()
        start = time.time()
        for attempt in range(self.max_retries):
            try:
                await asyncio.to_thread(
                    self._store_sync, doc_id, summaries, filename
                )
                break
            except Exception as e:  # noqa: BLE001
                if attempt == self.max_retries - 1:
                    raise
                logger.warning("store attempt %d failed: %s", attempt + 1, e)
                await asyncio.sleep(2**attempt)

        if self.enable_compression and summaries:
            raw_total = comp_total = 0
            for item in summaries:
                payload = json.dumps(item)
                raw_total += len(payload)
                comp_total += len(self._kv.gzip(payload.encode(), 6))
            self.stats["compression_ratio"] = (
                comp_total / raw_total if raw_total else 1.0
            )
        self.stats["total_stored"] += len(summaries)
        logger.info(
            "Stored %d items for %s in %.2fs",
            len(summaries), doc_id, time.time() - start,
        )

    def _store_sync(
        self, doc_id: str, summaries: List[Dict[str, Any]], filename: str
    ) -> None:
        item_ids = []
        for item in summaries:
            self._kv.set(f"doc:{doc_id}:{item['id']}", self._encode_item(item))
            item_ids.append(item["id"])
        self._kv.set(f"doc_index:{doc_id}", json.dumps(item_ids).encode())
        meta = {
            "doc_id": doc_id,
            "filename": filename,
            "item_count": len(summaries),
            "chunks": {
                "text": sum(1 for s in summaries if s["type"] == "text"),
                "table": sum(1 for s in summaries if s["type"] == "table"),
                "image": sum(1 for s in summaries if s["type"] == "image"),
            },
            "timestamp": datetime.now(timezone.utc).isoformat(),
            "compressed": self.enable_compression,
        }
        self._kv.set(f"doc_meta:{doc_id}", json.dumps(meta).encode())
        self._kv.save()

    # ------------------------------------------------------------------
    # Retrieve (reference retriever.py:428-574)
    # ------------------------------------------------------------------

    @staticmethod
    def item_id_to_key(item_id: str) -> str:
        """``doc_abc123_chunk_0_a1b2c3`` → ``doc:doc_abc123:chunk_0_a1b2c3``
        (reference ``retriever.py:610-637``; assumes 2-token doc ids)."""
        parts = item_id.split("_")
        if len(parts) < 3:
            return f"doc:{item_id}"
        return f"doc:{'_'.join(parts[:2])}:{'_'.join(parts[2:])}"

    async def retrieve_raw_documents(
        self, ids: List[str]
    ) -> Dict[str, List[str]]:
        if not self.is_initialized:
            await self.initialize()
        if not ids:
            return {"text_chunks": [], "table_chunks": [], "image_chunks": []}

        cached: Dict[str, Dict[str, Any]] = {}
        to_fetch: List[str] = []
        if self.cache is not None:
            for item_id in ids:
                hit = self.cache.get(item_id)
                if hit is not None:
                    cached[item_id] = hit
                else:
                    to_fetch.append(item_id)
        else:
            to_fetch = list(ids)

        fetched: Dict[str, Dict[str, Any]] = {}
        if to_fetch:
            for attempt in range(self.max_retries):
                try:
                    fetched = await asyncio.to_thread(
                        self._fetch_sync, to_fetch
                    )
                    break
                except Exception as e:  # noqa: BLE001
                    if attempt == self.max_retries - 1:
                        raise
                    await asyncio.sleep(2**attempt)
            if self.cache is not None:
                for item_id, item in fetched.items():
                    self.cache.put(item_id, item)

        all_items = {**cached, **fetched}
        out = {"text_chunks": [], "table_chunks": [], "image_chunks": []}
        for item_id in ids:
            item = all_items.get(item_id)
            if not item:
                continue
            if item["type"] == "text":
                out["text_chunks"].append(item["raw"])
            elif item["type"] == "table":
                out["table_chunks"].append(item["raw"])
            elif item["type"] == "image":
                out["image_chunks"].append(item["raw"])

        self.stats["total_retrieved"] += len(ids)
        if self.cache is not None:
            cs = self.cache.get_stats()
            self.stats["cache_hits"] = cs["hits"]
            self.stats["cache_misses"] = cs["misses"]
        return out

    def _fetch_sync(self, ids: List[str]) -> Dict[str, Dict[str, Any]]:
        keys = [self.item_id_to_key(i) for i in ids]
        blobs = self._kv.mget(keys)
        items = {}
        for item_id, blob in zip(ids, blobs):
            if blob is None:
                continue
            try:
                items[item_id] = self._decode_item(blob)
            except Exception as e:  # noqa: BLE001
                logger.warning("failed to decode %s: %s", item_id, e)
        return items

    async def get_document_items(self, doc_id: str) -> List[Dict[str, Any]]:
        """All stored items of a document via its index."""
        if not self.is_initialized:
            await self.initialize()

        def fetch():
            index = self._kv.get(f"doc_index:{doc_id}")
            if not index:
                return []
            item_ids = json.loads(index)
            blobs = self._kv.mget([f"doc:{doc_id}:{i}" for i in item_ids])
            return [self._decode_item(b) for b in blobs if b is not None]

        return await asyncio.to_thread(fetch)

    # ------------------------------------------------------------------
    # Delete (reference retriever.py:639-830)
    # ------------------------------------------------------------------

    async def delete_document(self, doc_id: str) -> None:
        if not self.is_initialized:
            await self.initialize()
        for attempt in range(self.max_retries):
            try:
                await asyncio.to_thread(self._delete_sync, doc_id)
                break
            except Exception as e:  # noqa: BLE001
                if attempt == self.max_retries - 1:
                    raise
                await asyncio.sleep(2**attempt)
        if self.cache is not None:
            self.cache.clear()
        self.stats["total_deleted"] += 1

    def _delete_sync(self, doc_id: str) -> None:
        keys: List[str] = []
        index = self._kv.get(f"doc_index:{doc_id}")
        if index:
            item_ids = json.loads(index)
            keys = [f"doc:{doc_id}:{i}" for i in item_ids]
            keys.append(f"doc_index:{doc_id}")
        else:  # scan fallback (reference :697-711)
            keys = self._kv.scan(f"doc:{doc_id}:")
        keys.append(f"doc_meta:{doc_id}")
        for i in range(0, len(keys), self.batch_size):
            self._kv.delete(*keys[i : i + self.batch_size])
        self._kv.save()

    async def delete_all(self) -> int:
        if not self.is_initialized:
            await self.initialize()

        def wipe():
            keys = (
                self._kv.scan("doc:")
                + self._kv.scan("doc_meta:")
                + self._kv.scan("doc_index:")
            )
            for i in range(0, len(keys), self.batch_size):
                self._kv.delete(*keys[i : i + self.batch_size])
            self._kv.save()
            return len(keys)

        n = await asyncio.to_thread(wipe)
        if self.cache is not None:
            self.cache.clear()
        return n

    # Alias used by the reference API layer (api.py:454).
    delete_all_documents = delete_all

    # ------------------------------------------------------------------
    # Listing / stats / health (reference retriever.py:832-1004)
    # ------------------------------------------------------------------

    async def list_all_documents(self) -> List[Dict[str, Any]]:
        if not self.is_initialized:
            await self.initialize()

        def scan():
            docs = []
            for key in self._kv.scan("doc_meta:"):
                blob = self._kv.get(key)
                if blob:
                    try:
                        docs.append(json.loads(blob))
                    except Exception:  # noqa: BLE001
                        pass
            docs.sort(key=lambda d: d.get("timestamp", ""), reverse=True)
            return docs

        return await asyncio.to_thread(scan)

    async def get_stats(self) -> Dict[str, Any]:
        stats = {
            "kv": {
                "connected": self.is_initialized,
                "backend": type(self._kv).__name__ if self._kv else None,
            },
            "features": {
                "compression": self.enable_compression,
                "cache": self.cache is not None,
            },
            "operations": {
                "total_stored": self.stats["total_stored"],
                "total_retrieved": self.stats["total_retrieved"],
                "total_deleted": self.stats["total_deleted"],
            },
        }
        if self.enable_compression:
            stats["compression"] = {
                "ratio": self.stats["compression_ratio"],
                "savings_percent": (1 - self.stats["compression_ratio"]) * 100,
            }
        if self.cache is not None:
            stats["cache"] = self.cache.get_stats()
        return stats

    async def health_check(self) -> Dict[str, Any]:
        health = {
            "healthy": False,
            "kv_connected": False,
            "latency_ms": None,
            "error": None,
        }
        try:
            if not self.is_initialized:
                await self.initialize()
            start = time.time()
            ok = await asyncio.to_thread(self._kv.ping)
            health["latency_ms"] = round((time.time() - start) * 1000, 2)
            health["healthy"] = bool(ok)
            health["kv_connected"] = bool(ok)
        except Exception as e:  # noqa: BLE001
            health["error"] = str(e)
        return health
