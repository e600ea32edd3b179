"""Bulk corpus ingest: directory → parse → summarize → embed → store.

BASELINE.json config 3 is a *batch* ingest workload (100k-chunk corpora) —
the reference only ingests one HTTP upload at a time. This tool drives the
same pipeline components the server uses, with document-level concurrency
on the host side and the continuous-batching embed scheduler coalescing all
chunks into full device batches (serving.EmbedBatcher), then prints ONE
JSON line with per-stage counts and throughput.

Usage:
    python -m multimodal_rag_tpu.tools.bulk_ingest DIR [DIR...]
        [--concurrency 8] [--fallback-summaries] [--persist]

``--fallback-summaries`` skips LLM calls entirely (truncation summaries) —
the right mode for embedding-throughput runs and offline corpora.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time
from pathlib import Path
from typing import List

SUPPORTED = {
    ".pdf", ".docx", ".pptx", ".html", ".htm", ".txt", ".md",
    ".png", ".jpg", ".jpeg",
}


def find_files(roots: List[str]) -> List[Path]:
    out: List[Path] = []
    for root in roots:
        p = Path(root)
        if p.is_file():
            out.append(p)
        else:
            out.extend(
                f for f in sorted(p.rglob("*"))
                if f.is_file() and f.suffix.lower() in SUPPORTED
            )
    return out


async def ingest_corpus(
    files: List[Path],
    concurrency: int = 8,
    fallback_summaries: bool = True,
    persist: bool = False,
    components=None,
) -> dict:
    from multimodal_rag_tpu.config import settings
    from multimodal_rag_tpu.embedder import EmbeddingManager
    from multimodal_rag_tpu.ingest.parser import DocumentParser
    from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
    from multimodal_rag_tpu.models.adapters import FakeLLMAdapter, MLLMAdapter
    from multimodal_rag_tpu.storage.retriever import MultiVectorRetriever

    if components is not None:
        parser, summarizer, embedder, retriever = components
    else:
        parser = DocumentParser()
        adapter = FakeLLMAdapter() if fallback_summaries else MLLMAdapter()
        summarizer = ContentSummarizer(adapter)
        embedder = EmbeddingManager(
            persist_dir=settings.VECTOR_PERSIST_DIR if persist else None
        )
        retriever = MultiVectorRetriever()
        await embedder.initialize()
        await retriever.initialize()

    # Pre-compile the full-batch encoder buckets off the ingest clock
    # (first-process compiles otherwise dominate wall time).
    t_warm = time.time()
    try:
        await embedder.warmup()
    except Exception:  # noqa: BLE001
        pass
    warmup_s = time.time() - t_warm

    sem = asyncio.Semaphore(concurrency)
    stats = {"docs": 0, "failed": 0, "text": 0, "table": 0, "image": 0}
    t0 = time.time()

    async def one(path: Path) -> None:
        async with sem:
            try:
                content = path.read_bytes()
                parsed = await parser.parse_document(content, path.name)
                doc_id = parsed["doc_id"]
                summaries = await summarizer.summarize_parsed_document(parsed)
                if not summaries:
                    return
                counts = await embedder.embed_and_store(summaries, doc_id)
                await retriever.store_raw_documents(
                    doc_id, summaries, path.name
                )
                for key in ("text", "table", "image"):
                    stats[key] += counts.get(key, 0)
                stats["docs"] += 1
            except Exception as e:  # noqa: BLE001 — keep the batch going
                stats["failed"] += 1
                print(f"  ! {path.name}: {e}", file=sys.stderr)

    await asyncio.gather(*(one(f) for f in files))

    wall = time.time() - t0
    chunks = stats["text"] + stats["table"] + stats["image"]
    result = {
        "metric": "bulk_ingest",
        "files": len(files),
        **stats,
        "chunks_total": chunks,
        "warmup_s": round(warmup_s, 2),
        "wall_s": round(wall, 2),
        "chunks_per_sec": round(chunks / wall, 1) if wall > 0 else 0.0,
        "store_count": embedder.store.count() if embedder.store else 0,
    }
    if persist and components is None:
        await embedder.cleanup()
        await retriever.cleanup()
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("roots", nargs="+", help="files or directories")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument(
        "--fallback-summaries", action="store_true", default=True,
        help="truncation summaries, no LLM calls (default)",
    )
    ap.add_argument(
        "--llm-summaries", dest="fallback_summaries", action="store_false",
        help="summarize through the configured LLM adapter",
    )
    ap.add_argument(
        "--persist", action="store_true",
        help="persist vector store / KV snapshots on completion",
    )
    args = ap.parse_args(argv)

    # Backfills are short-lived processes: without the persistent cache
    # each run re-pays every (batch, seq)-bucket compile before the
    # first doc lands (runtime/compile_cache.py).
    from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()

    files = find_files(args.roots)
    if not files:
        print("no ingestable files found", file=sys.stderr)
        return 1
    result = asyncio.run(
        ingest_corpus(
            files,
            concurrency=args.concurrency,
            fallback_summaries=args.fallback_summaries,
            persist=args.persist,
        )
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
