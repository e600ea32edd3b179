"""Embedding manager: batched TPU text encoding + vector-store operations.

Behavioral counterpart of the reference's ``EmbeddingManager``
(``app/utils/embedder.py:83-931``) with the torch/sentence-transformers +
ChromaDB internals replaced by the JAX encoder (``models.minilm``) and the
HBM-resident ``VectorStore``. Kept contracts:

* ``embed_and_store(summaries, doc_id)`` → counts ``{"text": n, "table": n,
  "image": n}``; record ids ``{doc_id}_{item_id}``; metadata ``{doc_id,
  item_id, type}``; document = summary text (reference ``:428-500``).
* ``query(text, n_results, filter_dict)`` → flattened ``{ids, distances,
  metadatas, documents}`` (reference ``:539-617``); distances are cosine
  distances over L2-normalized embeddings.
* LRU embedding cache keyed by text hash (reference ``:266-347``), batch
  encoding, retry-with-backoff on store ops, stats counters with the same
  key names (reference ``:137-143, 690-728``).

TPU difference: batching is shape-bucketed (``models.minilm.TextEncoder``)
instead of the reference's fixed 32-item sub-batches, and "device" reports
the JAX backend.
"""

from __future__ import annotations

import asyncio
import hashlib
import logging
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from multimodal_rag_tpu.caching import LRUCache
from multimodal_rag_tpu.config import settings
from multimodal_rag_tpu.models.minilm import TextEncoder
from multimodal_rag_tpu.vectorstore import VectorStore

logger = logging.getLogger(__name__)


class EmbeddingManager:
    def __init__(
        self,
        encoder: Optional[TextEncoder] = None,
        store: Optional[VectorStore] = None,
        batch_size: int = None,
        enable_cache: bool = None,
        cache_size: int = None,
        max_retries: int = 3,
        persist_dir: Optional[str] = None,
        use_batcher: bool = True,
    ) -> None:
        self.use_batcher = use_batcher
        self._batcher = None
        self.batch_size = batch_size or settings.EMBEDDER_BATCH_SIZE
        enable_cache = (
            settings.EMBEDDER_ENABLE_CACHE if enable_cache is None else enable_cache
        )
        self.cache = (
            LRUCache(cache_size or settings.EMBEDDER_CACHE_SIZE)
            if enable_cache
            else None
        )
        self.max_retries = max_retries
        self.persist_dir = persist_dir
        # Retrieval-convention prefixes (E5 "query: "/"passage: ", BGE
        # query instruction …) — resolved from the model family at
        # initialize(); EMBED_QUERY_PREFIX / EMBED_PASSAGE_PREFIX override.
        self._query_prefix = ""
        self._passage_prefix = ""
        # Debounced autosave (VECTOR_AUTOSAVE_S): the reference's Chroma
        # persisted on every add; flat shard files get the same crash
        # durability by saving shortly after each mutation burst instead
        # of only at graceful shutdown.
        self._persist_task: Optional[asyncio.Task] = None
        self._persist_again = False
        self._encoder = encoder
        self._store = store
        self._reranker = None
        self.is_initialized = False
        self.stats = {
            "total_embeddings_created": 0,
            "total_items_stored": 0,
            "total_queries": 0,
        }

    # ------------------------------------------------------------------
    # Lifecycle (reference embedder.py:152-264)
    # ------------------------------------------------------------------

    async def initialize(self) -> None:
        if self.is_initialized:
            return
        if self._encoder is None:
            import dataclasses

            import jax.numpy as jnp

            from multimodal_rag_tpu.models import encoder_families as ef
            from multimodal_rag_tpu.models.minilm import (
                MINILM_L6,
                find_local_checkpoint,
            )

            fam = ef.resolve_family(settings.SENTENCE_TRANSFORMER_MODEL)
            ckpt = settings.MMRAG_CHECKPOINT_PATH or find_local_checkpoint(
                fam.hint
            )
            compute_dtype = getattr(
                jnp, settings.COMPUTE_DTYPE, jnp.bfloat16
            )
            pooling = fam.pooling
            cfg = None
            if ckpt:
                # Checkpoint truth beats name heuristics for both the
                # architecture (config.json) and the pooling mode
                # (sentence-transformers 1_Pooling/config.json).
                pooling = ef.pooling_from_snapshot(ckpt) or pooling
                try:
                    cfg = ef.config_from_hf(
                        ckpt, compute_dtype=compute_dtype, pooling=pooling
                    )
                except OSError as e:
                    # Missing/unreadable config.json: the checkpoint may
                    # still be a bare MiniLM safetensors file — fall back
                    # to the default architecture and let the weight
                    # loader decide.
                    logger.warning(
                        "No usable config.json next to %s (%s); assuming "
                        "MiniLM-L6 architecture", ckpt, e,
                    )
                except ValueError:
                    # An EXPLICIT architecture rejection (unsupported
                    # model_type, dim mismatch): falling back to MiniLM
                    # here would random-init against a real checkpoint
                    # and serve semantically meaningless retrieval —
                    # the silent-garbage path config_from_hf exists to
                    # prevent. Fail loudly instead (review finding r3).
                    raise
            if cfg is None:
                cfg = dataclasses.replace(
                    MINILM_L6, compute_dtype=compute_dtype, pooling=pooling
                )
            self._family = fam
            self._query_prefix = self._resolve_prefix(
                settings.EMBED_QUERY_PREFIX, fam.query_prefix
            )
            self._passage_prefix = self._resolve_prefix(
                settings.EMBED_PASSAGE_PREFIX, fam.passage_prefix
            )
            if fam.name != "minilm":
                logger.info(
                    "Encoder family %s (pooling=%s, query_prefix=%r)",
                    fam.name, pooling, self._query_prefix,
                )
            self._encoder = await asyncio.to_thread(
                TextEncoder,
                cfg=cfg,
                seq_buckets=settings.seq_buckets,
                batch_buckets=settings.batch_buckets,
                checkpoint_path=ckpt or None,
            )
        if self._store is None:
            loaded = None
            if self.persist_dir:
                try:
                    loaded = await asyncio.to_thread(
                        VectorStore.load,
                        self.persist_dir,
                        settings.CHROMA_COLLECTION_NAME,
                    )
                    logger.info(
                        "Restored vector store (%d records)", loaded.count()
                    )
                except FileNotFoundError:
                    loaded = None
            if loaded is not None and loaded.dim != self._encoder.dim:
                # Same recovery posture as the cross-modal figure index
                # (crossmodal.py): embeddings from a different encoder are
                # unsearchable with the new one — start fresh, loudly.
                logger.warning(
                    "Persisted vector store dim=%d != encoder dim=%d "
                    "(SENTENCE_TRANSFORMER_MODEL changed?); starting a "
                    "FRESH store — prior vectors will be overwritten on "
                    "the next save. Re-ingest documents to re-embed.",
                    loaded.dim, self._encoder.dim,
                )
                loaded = None
            self._store = loaded or VectorStore(
                dim=self._encoder.dim,
                name=settings.CHROMA_COLLECTION_NAME,
                initial_capacity=settings.VECTOR_SHARD_CAPACITY,
            )
        self.is_initialized = True
        logger.info(
            "EmbeddingManager ready (dim=%d, devices=%d)",
            self._encoder.dim,
            self._store.n_devices,
        )

    def _schedule_persist(self) -> None:
        """Arm (or coalesce into) the debounced background save."""
        delay = settings.VECTOR_AUTOSAVE_S
        if not self.persist_dir or self._store is None or delay <= 0:
            return
        if self._persist_task is not None and not self._persist_task.done():
            self._persist_again = True
            return
        self._persist_again = False
        self._persist_task = asyncio.get_running_loop().create_task(
            self._persist_after(delay)
        )

    async def _persist_after(self, delay: float) -> None:
        try:
            while True:
                await asyncio.sleep(delay)
                await asyncio.to_thread(self._store.save, self.persist_dir)
                if not self._persist_again:
                    return
                self._persist_again = False  # mutations landed mid-save
        except asyncio.CancelledError:
            raise
        except Exception as e:  # noqa: BLE001 — autosave must not crash serving
            logger.warning("Vector-store autosave failed: %s", e)

    async def cleanup(self) -> None:
        if self._persist_task is not None:
            self._persist_task.cancel()
            self._persist_task = None
        if self.persist_dir and self._store is not None:
            await asyncio.to_thread(self._store.save, self.persist_dir)
        self.is_initialized = False

    @property
    def store(self) -> VectorStore:
        return self._store

    @property
    def encoder(self) -> TextEncoder:
        return self._encoder

    # ------------------------------------------------------------------
    # Embedding (reference embedder.py:266-426)
    # ------------------------------------------------------------------

    @staticmethod
    def _key(text: str) -> str:
        return hashlib.md5(text.encode("utf-8")).hexdigest()

    @staticmethod
    def _resolve_prefix(override: str, family_default: str) -> str:
        """EMBED_*_PREFIX override semantics: empty = family default,
        literal "none" = force no prefix, anything else = the prefix."""
        if not override:
            return family_default
        if override.strip().lower() == "none":
            return ""
        return override

    def _prefix_one(self, text: str, role: Optional[str]) -> str:
        if role == "query" and self._query_prefix:
            return self._query_prefix + text
        if role == "passage" and self._passage_prefix:
            return self._passage_prefix + text
        return text

    async def embed_texts_batch(
        self,
        texts: Sequence[str],
        show_progress: bool = False,
        role: Optional[str] = None,
    ) -> np.ndarray:
        """Texts → (N, dim) float32 unit-norm embeddings, LRU-cached.

        ``role`` ("query" | "passage" | None) applies the model family's
        retrieval prefix (E5/BGE conventions) before encoding; cache keys
        include the prefix so the two roles never collide."""
        if not self.is_initialized:
            await self.initialize()
        if len(texts) == 0:
            return np.zeros((0, self._encoder.dim), np.float32)
        if role is not None:
            texts = [self._prefix_one(t, role) for t in texts]

        out = np.empty((len(texts), self._encoder.dim), np.float32)
        todo_idx: List[int] = []
        todo_texts: List[str] = []
        if self.cache is not None:
            for i, text in enumerate(texts):
                hit = self.cache.get(self._key(text))
                if hit is not None:
                    out[i] = hit
                else:
                    todo_idx.append(i)
                    todo_texts.append(text)
        else:
            todo_idx = list(range(len(texts)))
            todo_texts = list(texts)

        if todo_texts:
            if show_progress and len(todo_texts) > 32:
                logger.info(
                    "Embedding %d texts (%d cache hits)…",
                    len(todo_texts), len(texts) - len(todo_texts),
                )
            if self.use_batcher:
                if self._batcher is None:
                    from multimodal_rag_tpu.serving import EmbedBatcher

                    self._batcher = EmbedBatcher(self._encoder)
                fresh = await self._batcher.submit(todo_texts)
            else:
                fresh = await asyncio.to_thread(
                    self._encoder.encode, todo_texts
                )
            for slot, row in zip(todo_idx, fresh):
                out[slot] = row
                if self.cache is not None:
                    self.cache.put(self._key(texts[slot]), row)
            self.stats["total_embeddings_created"] += len(todo_texts)
        return out

    # ------------------------------------------------------------------
    # Store + query (reference embedder.py:428-660)
    # ------------------------------------------------------------------

    async def embed_and_store(
        self, summaries: List[Dict[str, Any]], doc_id: str
    ) -> Dict[str, int]:
        """Embed summaries and insert into the vector store; returns counts
        keyed text/table/image (reference ``embedder.py:465-479``)."""
        if not self.is_initialized:
            await self.initialize()
        counts = {"text": 0, "table": 0, "image": 0}
        if not summaries:
            return counts
        start = time.time()
        texts = [item["summary"] for item in summaries]
        embeddings = await self.embed_texts_batch(
            texts, show_progress=True, role="passage"
        )

        ids, documents, metadatas = [], [], []
        for item in summaries:
            ids.append(f"{doc_id}_{item['id']}")
            documents.append(item["summary"])
            metadatas.append(
                {"doc_id": doc_id, "item_id": item["id"], "type": item["type"]}
            )
            if item["type"] in counts:
                counts[item["type"]] += 1

        await self._with_retry(
            self._store.add, ids, embeddings, documents, metadatas
        )
        self.stats["total_items_stored"] += len(summaries)
        self._schedule_persist()
        logger.info(
            "Stored %d embeddings for %s in %.2fs",
            len(ids), doc_id, time.time() - start,
        )
        return counts

    async def query(
        self,
        query_text: str,
        n_results: int = 5,
        filter_dict: Optional[Dict] = None,
    ) -> Dict[str, Any]:
        """Single query → flattened result dict (reference ``:539-617``).

        On the serving hot path (cache miss, no metadata filter, exact
        single-device search) the embed forward and the MIPS top-k run as
        ONE device dispatch (``VectorStore.search_fused``); otherwise the
        regular two-step path applies."""
        if not self.is_initialized:
            await self.initialize()
        if not query_text or not query_text.strip():
            raise ValueError("Query text cannot be empty")

        res = None
        prefixed_q = self._prefix_one(query_text, "query")
        cached = (
            self.cache.get(self._key(prefixed_q))
            if self.cache is not None
            else None
        )
        if (
            cached is None
            and filter_dict is None
            and hasattr(self._encoder, "prepare")
        ):
            fused = await asyncio.to_thread(self._fused_query, prefixed_q,
                                            n_results)
            if fused is not None:
                res, emb_row = fused
                self.stats["total_embeddings_created"] += 1
                if self.cache is not None:
                    self.cache.put(self._key(prefixed_q), emb_row)
        if res is None:
            emb = await self.embed_texts_batch([query_text], role="query")
            res = await self._with_retry(
                self._store.query, emb, n_results,
                ("metadatas", "documents", "distances"), filter_dict,
            )
        self.stats["total_queries"] += 1
        return {
            "ids": res["ids"][0],
            "distances": res["distances"][0],
            "metadatas": res["metadatas"][0],
            "documents": res["documents"][0],
        }

    def _fused_query(self, query_text: str, n_results: int):
        """Host half of the fused path: tokenize, then one jit dispatch of
        embed→top-k. Returns (results, embedding row) or None. The caller
        passes the already-prefixed query text (family conventions)."""
        ids, mask = self._encoder.prepare([query_text])
        out = self._store.search_fused(
            self._encoder.embed_fn,
            (self._encoder.params, ids, mask),
            n_results,
        )
        if out is None:
            return None
        res, emb = out
        # Row 0 is the real query; the rest is batch-bucket padding.
        return (
            {k: v[:1] for k, v in res.items()},
            np.asarray(emb[0], np.float32),
        )

    async def batch_query(
        self,
        query_texts: Sequence[str],
        n_results: int = 5,
        filter_dict: Optional[Dict] = None,
    ) -> List[Dict[str, Any]]:
        """Batched queries in one device pass (the reference fanned out
        per-query asyncio tasks, ``embedder.py:784-832``; on TPU a single
        batched MIPS call is strictly better)."""
        if not self.is_initialized:
            await self.initialize()
        if len(query_texts) == 0:
            return []
        emb = await self.embed_texts_batch(list(query_texts), role="query")
        res = await self._with_retry(
            self._store.query, emb, n_results,
            ("metadatas", "documents", "distances"), filter_dict,
        )
        self.stats["total_queries"] += len(query_texts)
        return [
            {
                "ids": res["ids"][i],
                "distances": res["distances"][i],
                "metadatas": res["metadatas"][i],
                "documents": res["documents"][i],
            }
            for i in range(len(query_texts))
        ]

    async def get_similar_documents(
        self, doc_id: str, item_id: str, n_results: int = 5
    ) -> Dict[str, Any]:
        """More-like-this by stored record id (reference ``:861-931``)."""
        if not self.is_initialized:
            await self.initialize()
        rec = self._store.get(
            ids=[f"{doc_id}_{item_id}"], include=("embeddings",)
        )
        if not rec["ids"]:
            return {"ids": [], "distances": [], "metadatas": [], "documents": []}
        emb = np.asarray(rec["embeddings"], np.float32)
        res = self._store.query(
            emb, n_results + 1, ("metadatas", "documents", "distances")
        )
        out = {
            "ids": res["ids"][0],
            "distances": res["distances"][0],
            "metadatas": res["metadatas"][0],
            "documents": res["documents"][0],
        }
        # Drop the record itself from its own neighbours.
        if out["ids"] and out["ids"][0] == f"{doc_id}_{item_id}":
            for key in out:
                out[key] = out[key][1:]
        else:
            for key in out:
                out[key] = out[key][:n_results]
        return out

    async def rerank_results(
        self,
        query_text: str,
        results: Dict[str, Any],
        top_k: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Rerank of a flattened query-result dict. The reference shipped
        this as a placeholder (``embedder.py:834-859``); here it runs a
        real model on the TPU (lazily built): a cross-encoder
        (``RERANK_MODE=cross``) or a ColBERT-style MaxSim late-interaction
        stage sharing the bi-encoder weights (``RERANK_MODE=maxsim``)."""
        if not results.get("documents"):
            return results
        if self._reranker is None:
            if settings.RERANK_MODE == "maxsim":
                from multimodal_rag_tpu.models.late_interaction import (
                    LateInteractionReranker,
                )

                if not self.is_initialized:
                    await self.initialize()
                self._reranker = LateInteractionReranker(self._encoder)
            else:
                from multimodal_rag_tpu.models.cross_encoder import (
                    CrossEncoderReranker,
                )

                self._reranker = await asyncio.to_thread(
                    CrossEncoderReranker,
                    checkpoint_path=settings.MMRAG_CROSS_ENCODER_PATH or None,
                )
        return await asyncio.to_thread(
            self._reranker.rerank, query_text, results, top_k
        )

    async def warmup(self, ingest_shapes: bool = True) -> None:
        """Pre-compile the hot shapes (first-call XLA compiles otherwise
        land on the first user request — observed ~30-90s on cold serving
        paths). ``ingest_shapes`` also compiles the full-batch bucket the
        continuous batcher coalesces uploads into (bulk ingest measured
        ~150s of first-process bucket compiles without it)."""
        if not self.is_initialized:
            await self.initialize()
        await self.embed_texts_batch(["warmup query"])
        if ingest_shapes and hasattr(self._encoder, "batch_buckets"):
            bb = self._encoder.batch_buckets[-1]
            # ~600-char chunks tokenize into the 128-token bucket; summary
            # texts (~300 chars) into 64 — warm both at full batch.
            for chars in (600, 250):
                texts = [("lorem ipsum " * 60)[:chars] + str(i)
                         for i in range(bb)]
                await self.embed_texts_batch(texts)
            # Reranker: first rerank=true query otherwise pays the
            # cross-encoder compile (~7 s measured on v5e).
            try:
                await self.rerank_results(
                    "warmup query",
                    {
                        "ids": ["w0"],
                        "documents": ["warmup passage " * 20],
                        "distances": [0.5],
                        "metadatas": [None],
                    },
                )
            except Exception:  # noqa: BLE001 — warmup must never fail init
                pass
        if self._store.count() == 0:
            # Temporary row so the search kernel compiles too.
            emb = await self.embed_texts_batch(["warmup document"])
            self._store.add(["__warmup__"], emb)
            await asyncio.to_thread(self._store.query, emb, 1)
            self._store.delete(ids=["__warmup__"])
        else:
            emb = await self.embed_texts_batch(["warmup query"])
            await asyncio.to_thread(self._store.query, emb, 1)

    async def delete_document(self, doc_id: str) -> int:
        if not self.is_initialized:
            await self.initialize()
        n = await self._with_retry(self._store.delete, None, {"doc_id": doc_id})
        self._schedule_persist()
        logger.info("Deleted %d vectors for doc %s", n, doc_id)
        return n

    async def delete_all(self) -> None:
        if not self.is_initialized:
            await self.initialize()
        await asyncio.to_thread(self._store.delete_all)
        self._schedule_persist()

    # Alias used by the reference API layer (api.py:453).
    delete_all_documents = delete_all

    # ------------------------------------------------------------------
    # Ops / stats (reference embedder.py:690-760, 969-1004)
    # ------------------------------------------------------------------

    async def _with_retry(self, fn, *args):
        for attempt in range(self.max_retries):
            try:
                return await asyncio.to_thread(fn, *args)
            except Exception as e:  # noqa: BLE001 — parity with reference
                if attempt == self.max_retries - 1:
                    raise
                wait = 2**attempt
                logger.warning(
                    "%s attempt %d failed: %s; retrying in %ds",
                    fn.__name__, attempt + 1, e, wait,
                )
                await asyncio.sleep(wait)

    async def get_collection_stats(self) -> Dict[str, Any]:
        if not self.is_initialized:
            await self.initialize()
        import jax

        stats = {
            "name": settings.CHROMA_COLLECTION_NAME,
            "count": self._store.count(),
            "model": settings.SENTENCE_TRANSFORMER_MODEL,
            "device": jax.default_backend(),
            "embedding_dim": self._encoder.dim,
            "batch_size": self.batch_size,
            "pooling": getattr(
                getattr(self._encoder, "cfg", None), "pooling", "mean"
            ),
            "stats": dict(self.stats),
        }
        if self.cache is not None:
            stats["cache"] = self.cache.get_stats()
        return stats

    async def health_check(self) -> Dict[str, Any]:
        try:
            if not self.is_initialized:
                await self.initialize()
            return {
                "status": "healthy",
                "count": self._store.count(),
                "devices": self._store.n_devices,
            }
        except Exception as e:  # noqa: BLE001
            return {"status": "unhealthy", "error": str(e)}

    def get_stats(self) -> Dict[str, Any]:
        out = dict(self.stats)
        if self.cache is not None:
            out["cache"] = self.cache.get_stats()
        if self._batcher is not None:
            out["batcher"] = dict(self._batcher.stats)
        return out
