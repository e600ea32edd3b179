"""Bulk ingest tool: directory sweep through the full pipeline."""

import asyncio
import json

import jax
import jax.numpy as jnp
import pytest

from multimodal_rag_tpu.embedder import EmbeddingManager
from multimodal_rag_tpu.ingest.parser import DocumentParser
from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
from multimodal_rag_tpu.models.adapters import FakeLLMAdapter
from multimodal_rag_tpu.models.minilm import EncoderConfig, TextEncoder, init_params
from multimodal_rag_tpu.parallel.sharding import get_mesh
from multimodal_rag_tpu.storage.kv import MemoryKV
from multimodal_rag_tpu.storage.retriever import MultiVectorRetriever
from multimodal_rag_tpu.tools.bulk_ingest import find_files, ingest_corpus
from multimodal_rag_tpu.vectorstore import VectorStore

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=64, compute_dtype=jnp.float32,
)


def make_corpus(tmp_path, n=6):
    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(n):
        (d / f"doc_{i}.txt").write_text(
            f"Document {i}. " + f"Paragraph about topic {i}. " * 30
        )
    (d / "tabled.md").write_text(
        "# T\n\n| a | b |\n|---|---|\n| 1 | 2 |\n\nText after.\n"
    )
    (d / "ignored.xyz").write_text("not ingestable")
    return d


class TestBulkIngest:
    def test_find_files_filters_extensions(self, tmp_path):
        d = make_corpus(tmp_path)
        files = find_files([str(d)])
        names = {f.name for f in files}
        assert "ignored.xyz" not in names
        assert len(files) == 7

    def test_ingest_corpus_end_to_end(self, tmp_path):
        d = make_corpus(tmp_path)
        encoder = TextEncoder(
            params=init_params(jax.random.key(0), TINY), cfg=TINY,
            seq_buckets=(16, 32), batch_buckets=(4, 8),
        )
        store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                            initial_capacity=512, dtype=jnp.float32)
        comps = (
            DocumentParser(figures_dir=tmp_path / "figs", enable_ocr=False),
            ContentSummarizer(FakeLLMAdapter()),
            EmbeddingManager(encoder=encoder, store=store),
            MultiVectorRetriever(kv=MemoryKV(str(tmp_path / "kv"))),
        )

        async def run():
            await comps[2].initialize()
            await comps[3].initialize()
            return await ingest_corpus(
                find_files([str(d)]), concurrency=3, components=comps
            )

        result = asyncio.new_event_loop().run_until_complete(run())
        assert result["docs"] == 7
        assert result["failed"] == 0
        assert result["table"] == 1
        assert result["chunks_total"] >= 8
        assert result["store_count"] == result["chunks_total"]
        assert result["chunks_per_sec"] > 0
        json.dumps(result)  # one-line JSON serializable
