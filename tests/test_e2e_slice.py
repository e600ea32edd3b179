"""BASELINE.json config 1 — the minimum end-to-end slice:

MiniLM-class text embed + exact cosine top-5 over the chunks of
``data/sample_document.txt``, with top-5 ids/relevance parity against a
brute-force NumPy oracle (SURVEY.md §7).
"""

import asyncio
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.embedder import EmbeddingManager
from multimodal_rag_tpu.ingest.chunking import RecursiveTextSplitter
from multimodal_rag_tpu.ingest.parser import DocumentParser
from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
from multimodal_rag_tpu.models.adapters import FakeLLMAdapter
from multimodal_rag_tpu.models.minilm import (
    EncoderConfig,
    TextEncoder,
    init_params,
)
from multimodal_rag_tpu.ops.oracle import mips_topk_oracle
from multimodal_rag_tpu.parallel.sharding import get_mesh
from multimodal_rag_tpu.vectorstore import VectorStore

SAMPLE = Path(__file__).resolve().parent.parent / "data" / "sample_document.txt"

TINY = EncoderConfig(
    vocab_size=2048, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=128, compute_dtype=jnp.float32,
)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def slice_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("slice")
    encoder = TextEncoder(
        params=init_params(jax.random.key(0), TINY), cfg=TINY,
        seq_buckets=(32, 64, 128), batch_buckets=(4, 8, 32),
    )
    store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                        initial_capacity=512, dtype=jnp.float32)
    parser = DocumentParser(figures_dir=tmp / "figures", enable_ocr=False)
    summarizer = ContentSummarizer(FakeLLMAdapter(), max_concurrent=5)
    embedder = EmbeddingManager(encoder=encoder, store=store)

    async def ingest():
        parsed = await parser.parse_document(
            SAMPLE.read_bytes(), "sample_document.txt", doc_id="doc_sample01"
        )
        summaries = await summarizer.summarize_parsed_document(parsed)
        counts = await embedder.embed_and_store(summaries, "doc_sample01")
        return parsed, summaries, counts

    parsed, summaries, counts = run(ingest())
    return encoder, embedder, parsed, summaries, counts


class TestConfig1Slice:
    def test_chunking_semantics(self, slice_setup):
        _, _, parsed, _, _ = slice_setup
        text = SAMPLE.read_text()
        expected = RecursiveTextSplitter(1000, 200).split_text(text)
        got = [c["content"] for c in parsed["text_chunks"]]
        assert got == [c.strip() for c in expected]
        assert len(got) >= 2

    def test_counts(self, slice_setup):
        _, _, parsed, summaries, counts = slice_setup
        assert counts["text"] == len(parsed["text_chunks"])
        assert counts["table"] == 0 and counts["image"] == 0

    def test_top5_parity_with_oracle(self, slice_setup):
        """The kernel-backed query must equal brute-force cosine top-5 over
        the same embeddings (ids and relevance scores)."""
        encoder, embedder, parsed, summaries, _ = slice_setup
        # Oracle side: embed the summary texts directly.
        texts = [s["summary"] for s in summaries]
        emb = encoder.encode(texts)
        query = "tìm kiếm gần đúng trên TPU"
        q = encoder.encode([query])
        ovals, oidx = mips_topk_oracle(q, emb, min(5, len(texts)))

        res = run(embedder.query(query, n_results=5))
        want_ids = [f"doc_sample01_{summaries[i]['id']}" for i in oidx[0]]
        assert res["ids"] == want_ids
        np.testing.assert_allclose(
            np.asarray(res["distances"]), 1.0 - ovals[0], atol=1e-4
        )

    def test_relevance_score_contract(self, slice_setup):
        """api relevance = 1 - min(distance, 1) (reference api.py:390)."""
        _, embedder, _, _, _ = slice_setup
        res = run(embedder.query("học máy là gì", n_results=3))
        for dist in res["distances"]:
            rel = 1.0 - min(dist, 1.0)
            assert 0.0 <= rel <= 1.0
