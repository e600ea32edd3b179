"""Content summarizer: parallel LLM summaries with cache/retry/fallback.

Behavioral counterpart of the reference's ``ContentSummarizer``
(``app/utils/summarizer.py:73-826``): semaphore-bounded parallel fan-out,
MD5-keyed summary cache, exponential-backoff retry, quality validation
(min length, char diversity) with truncation-based fallback summaries, and
the same output item contract:

    {id, summary, raw, type}  (+ path for images, + metadata for text)

with text items re-identified as ``text_{idx}`` (``summarizer.py:630-636``)
— the id scheme the embedder and the Redis key codec rely on (SURVEY.md
§2.3.7).
"""

from __future__ import annotations

import asyncio
import hashlib
import logging
import time
from typing import Any, Dict, List, Optional

from multimodal_rag_tpu.caching import LRUCache
from multimodal_rag_tpu.config import settings

logger = logging.getLogger(__name__)


class ContentSummarizer:
    def __init__(
        self,
        mllm_adapter,
        enable_cache: Optional[bool] = None,
        cache_size: Optional[int] = None,
        max_concurrent: Optional[int] = None,
        max_retries: Optional[int] = None,
        enable_progress: bool = True,
        min_summary_length: int = 10,
        enable_fallback: bool = True,
    ):
        self.mllm = mllm_adapter
        self.max_concurrent = (
            max_concurrent
            if max_concurrent is not None
            else settings.SUMMARIZER_MAX_CONCURRENT
        )
        self.max_retries = (
            max_retries if max_retries is not None
            else settings.SUMMARIZER_MAX_RETRIES
        )
        self.enable_progress = enable_progress
        self.min_summary_length = min_summary_length
        self.enable_fallback = enable_fallback
        enable_cache = (
            settings.SUMMARIZER_ENABLE_CACHE
            if enable_cache is None
            else enable_cache
        )
        self.cache = (
            LRUCache(cache_size or settings.SUMMARIZER_CACHE_SIZE)
            if enable_cache
            else None
        )
        self.semaphore = asyncio.Semaphore(self.max_concurrent)
        # Circuit breaker: after this many consecutive adapter failures,
        # skip retries/backoff and go straight to fallback summaries (reset
        # on any success). Avoids minutes of 2^n sleeps per upload when the
        # LLM backend is down.
        self.breaker_threshold = 3
        self._consecutive_failures = 0
        self.stats = {
            "total_summaries": 0,
            "total_fallbacks": 0,
            "total_retries": 0,
            "total_failures": 0,
            "cache_hits": 0,
            "cache_misses": 0,
            "avg_summary_time": 0.0,
        }

    # ------------------------------------------------------------------
    # Single-item paths (reference summarizer.py:146-330)
    # ------------------------------------------------------------------

    @staticmethod
    def _cache_key(content: str, content_type: str, max_length: int) -> str:
        return hashlib.md5(
            f"{content_type}:{max_length}:{content}".encode("utf-8")
        ).hexdigest()

    async def summarize(
        self, content: str, content_type: str = "text", max_length: int = 300
    ) -> str:
        if not content or not content.strip():
            return ""
        cache_key = None
        if self.cache is not None:
            cache_key = self._cache_key(content, content_type, max_length)
            cached = self.cache.get(cache_key)
            if cached:
                self.stats["cache_hits"] += 1
                return cached
            self.stats["cache_misses"] += 1

        if len(content) > 10000:  # input cap (summarizer.py:180-182)
            content = content[:10000] + "..."

        start = time.time()
        summary = await self._summarize_with_retry(
            content, content_type, max_length
        )
        elapsed = time.time() - start

        self.stats["total_summaries"] += 1
        if self.stats["total_summaries"] == 1:
            self.stats["avg_summary_time"] = elapsed
        else:  # EMA, alpha 0.1 (summarizer.py:197-204)
            self.stats["avg_summary_time"] = (
                0.1 * elapsed + 0.9 * self.stats["avg_summary_time"]
            )

        if summary and self._is_valid_summary(summary):
            if self.cache is not None:
                self.cache.put(cache_key, summary)
            return summary
        logger.warning("Invalid summary generated (len=%d)", len(summary))
        return self._generate_fallback_summary(content, max_length)

    async def _summarize_with_retry(
        self, content: str, content_type: str, max_length: int
    ) -> str:
        tripped = self._consecutive_failures >= self.breaker_threshold
        attempts = 1 if tripped else self.max_retries
        for attempt in range(attempts):
            try:
                async with self.semaphore:
                    summary = await self.mllm.summarize(
                        content=content,
                        content_type=content_type,
                        max_length=max_length,
                    )
                self._consecutive_failures = 0
                return summary.strip()
            except Exception as e:  # noqa: BLE001
                self.stats["total_retries"] += 1
                self._consecutive_failures += 1
                if attempt == attempts - 1:
                    logger.error(
                        "Summarization failed after %d attempts: %s",
                        self.max_retries, e,
                    )
                    self.stats["total_failures"] += 1
                    if self.enable_fallback:
                        self.stats["total_fallbacks"] += 1
                        return self._generate_fallback_summary(
                            content, max_length
                        )
                    raise
                wait = 2**attempt
                await asyncio.sleep(wait)
        return self._generate_fallback_summary(content, max_length)

    async def summarize_image(
        self, image_base64: str, max_length: int = 300
    ) -> str:
        if not image_base64:
            return ""
        cache_key = None
        if self.cache is not None:
            cache_key = self._cache_key(image_base64, "image", max_length)
            cached = self.cache.get(cache_key)
            if cached:
                self.stats["cache_hits"] += 1
                return cached
            self.stats["cache_misses"] += 1

        tripped = self._consecutive_failures >= self.breaker_threshold
        attempts = 1 if tripped else self.max_retries
        for attempt in range(attempts):
            try:
                async with self.semaphore:
                    desc = await self.mllm.summarize(
                        content="",
                        content_type="image",
                        max_length=max_length,
                        image_base64=image_base64,
                    )
                self._consecutive_failures = 0
                desc = desc.strip()
                if desc and self._is_valid_summary(desc):
                    if self.cache is not None:
                        self.cache.put(cache_key, desc)
                    self.stats["total_summaries"] += 1
                    return desc
                return "Image content (description unavailable)"
            except Exception as e:  # noqa: BLE001
                self.stats["total_retries"] += 1
                self._consecutive_failures += 1
                if attempt == attempts - 1:
                    logger.error("Image summarization failed: %s", e)
                    self.stats["total_failures"] += 1
                    return "Image content (description unavailable)"
                await asyncio.sleep(2**attempt)
        return "Image content (description unavailable)"

    # ------------------------------------------------------------------
    # Batch paths (reference summarizer.py:330-548)
    # ------------------------------------------------------------------

    async def summarize_text_chunks(
        self, chunks: List[str], max_length: int = 300,
        show_progress: Optional[bool] = None,
    ) -> List[str]:
        if not chunks:
            return []
        if show_progress:
            logger.info("Summarizing %d text chunks…", len(chunks))
        results = await asyncio.gather(
            *(self.summarize(c, "text", max_length) for c in chunks),
            return_exceptions=True,
        )
        out = []
        for chunk, res in zip(chunks, results):
            if isinstance(res, Exception):
                out.append(self._generate_fallback_summary(chunk, max_length))
            else:
                out.append(res)
        return out

    async def summarize_tables(
        self, tables: List[Dict[str, Any]], max_length: int = 300,
        show_progress: Optional[bool] = None,
    ) -> List[str]:
        async def one(table):
            existing = table.get("summary")
            content = table.get("content", "")
            summary = await self.summarize(content, "table", max_length)
            return summary or existing or ""

        if show_progress and tables:
            logger.info("Summarizing %d tables…", len(tables))
        results = await asyncio.gather(
            *(one(t) for t in tables), return_exceptions=True
        )
        return [
            r if not isinstance(r, Exception)
            else self._generate_fallback_summary(
                tables[i].get("content", ""), max_length
            )
            for i, r in enumerate(results)
        ]

    async def summarize_images(
        self, images: List[Dict[str, Any]], max_length: int = 300,
        show_progress: Optional[bool] = None,
    ) -> List[str]:
        async def one(image):
            # OCR text (if the parser found any) enriches the description.
            desc = await self.summarize_image(
                image.get("base64", ""), max_length
            )
            ocr = (image.get("metadata") or {}).get("ocr_text")
            if ocr and "unavailable" in desc:
                return self._generate_fallback_summary(ocr, max_length)
            return desc

        if show_progress and images:
            logger.info("Summarizing %d images…", len(images))
        results = await asyncio.gather(
            *(one(img) for img in images), return_exceptions=True
        )
        return [
            r if not isinstance(r, Exception)
            else "Image content (description unavailable)"
            for r in results
        ]

    async def summarize_all(
        self,
        text_chunks: List[str],
        tables: List[Dict[str, Any]],
        images: List[Dict[str, Any]],
        max_length: int = 300,
        show_progress: bool = True,
    ) -> List[Dict[str, Any]]:
        """All content types in parallel → flat summary items
        (contract of reference summarizer.py:548-666)."""
        start = time.time()
        text_task = self.summarize_text_chunks(text_chunks, max_length)
        table_task = self.summarize_tables(tables, max_length)
        image_task = self.summarize_images(images, max_length)
        text_sums, table_sums, image_sums = await asyncio.gather(
            text_task, table_task, image_task
        )

        all_summaries: List[Dict[str, Any]] = []
        for idx, (chunk, summary) in enumerate(zip(text_chunks, text_sums)):
            all_summaries.append(
                {"id": f"text_{idx}", "summary": summary, "raw": chunk,
                 "type": "text"}
            )
        for table, summary in zip(tables, table_sums):
            all_summaries.append(
                {
                    "id": table.get("id", "table_0"),
                    "summary": summary,
                    "raw": table.get("content", ""),
                    "type": "table",
                }
            )
        for image, desc in zip(images, image_sums):
            all_summaries.append(
                {
                    "id": image.get("id", "image_0"),
                    "summary": desc,
                    "raw": image.get("base64", ""),
                    "path": image.get("path", ""),
                    "type": "image",
                }
            )
        if show_progress:
            total = len(text_chunks) + len(tables) + len(images)
            elapsed = max(time.time() - start, 1e-9)
            logger.info(
                "Summaries created: %d/%d in %.2fs (%.1f items/s)",
                len(all_summaries), total, elapsed, total / elapsed,
            )
        return all_summaries

    async def summarize_parsed_document(
        self,
        parsed_result: Dict[str, Any],
        max_length: int = 300,
        show_progress: bool = True,
    ) -> List[Dict[str, Any]]:
        """Parser output → summary items, with parser chunk metadata
        re-attached to the text items. The reference matched text items by
        position in the combined list (``summarizer.py:706-709``) which was
        only accidentally correct; here text items are matched by id."""
        chunks = parsed_result.get("text_chunks", [])
        summaries = await self.summarize_all(
            text_chunks=[c["content"] for c in chunks],
            tables=parsed_result.get("tables", []),
            images=parsed_result.get("images", []),
            max_length=max_length,
            show_progress=show_progress,
        )
        by_id = {
            item["id"]: item for item in summaries if item["type"] == "text"
        }
        for idx, chunk in enumerate(chunks):
            item = by_id.get(f"text_{idx}")
            if item is not None:
                item["metadata"] = chunk.get("metadata", {})
        return summaries

    # ------------------------------------------------------------------
    # Validation / fallback / stats (reference summarizer.py:723-800)
    # ------------------------------------------------------------------

    def _is_valid_summary(self, summary: str) -> bool:
        if not summary or not summary.strip():
            return False
        if len(summary.strip()) < self.min_summary_length:
            return False
        if len(set(summary.strip())) < 5:  # repetitive-garbage check
            return False
        return True

    def _generate_fallback_summary(self, content: str, max_length: int) -> str:
        """Truncation with sentence-boundary backoff (summarizer.py:743-771)."""
        if not content or not content.strip():
            return "Content unavailable"
        clean = content.strip()
        if len(clean) <= max_length:
            return clean
        truncated = clean[:max_length]
        boundary = max(
            truncated.rfind(". "), truncated.rfind("? "), truncated.rfind("! ")
        )
        if boundary > max_length // 2:
            return truncated[: boundary + 1]
        return truncated + "..."

    async def get_stats(self) -> Dict[str, Any]:
        stats = {
            "total_summaries": self.stats["total_summaries"],
            "total_failures": self.stats["total_failures"],
            "total_fallbacks": self.stats["total_fallbacks"],
            "total_retries": self.stats["total_retries"],
            "avg_summary_time": round(self.stats["avg_summary_time"], 3),
            "failure_rate": (
                self.stats["total_failures"]
                / max(self.stats["total_summaries"], 1)
            ),
        }
        if self.cache is not None:
            stats["cache"] = self.cache.get_stats()
        return stats

    async def clear_cache(self):
        if self.cache is not None:
            self.cache.clear()
