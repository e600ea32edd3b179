"""Single-dispatch embed→search path (VectorStore.search_fused +
EmbeddingManager fused query): parity with the two-step path."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.embedder import EmbeddingManager
from multimodal_rag_tpu.models.minilm import (
    EncoderConfig,
    TextEncoder,
    init_params,
)
from multimodal_rag_tpu.parallel.sharding import get_mesh
from multimodal_rag_tpu.vectorstore import VectorStore

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=64, compute_dtype=jnp.float32,
)

DOCS = [
    "máy học là một nhánh của trí tuệ nhân tạo",
    "vector search on TPUs streams HBM through VMEM",
    "gzip compression of raw document chunks",
    "multimodal retrieval with CLIP towers",
    "continuous batching coalesces embed traffic",
]


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture()
def manager():
    encoder = TextEncoder(
        params=init_params(jax.random.key(0), TINY), cfg=TINY,
        seq_buckets=(16, 32), batch_buckets=(4, 8),
    )
    store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                        initial_capacity=512, dtype=jnp.float32)
    mgr = EmbeddingManager(encoder=encoder, store=store, use_batcher=False)
    summaries = [
        {"id": f"text_{i}", "summary": d, "raw": d, "type": "text"}
        for i, d in enumerate(DOCS)
    ]
    run(mgr.embed_and_store(summaries, "doc_f"))
    return mgr


class TestFusedQuery:
    def test_matches_two_step_path(self, manager):
        q = "tìm kiếm vector trên TPU"
        fused = run(manager.query(q, n_results=3))
        # Force the two-step path by clearing the fused entry points.
        manager.cache.clear() if hasattr(manager.cache, "clear") else None
        two_step_res = run(
            manager._with_retry(
                manager._store.query,
                manager._encoder.encode([q]),
                3,
                ("metadatas", "documents", "distances"),
                None,
            )
        )
        assert fused["ids"] == two_step_res["ids"][0]
        np.testing.assert_allclose(
            fused["distances"], two_step_res["distances"][0], atol=1e-5
        )

    def test_cache_populated_and_reused(self, manager):
        q = "nén dữ liệu gzip"
        r1 = run(manager.query(q, n_results=2))
        hit = manager.cache.get(manager._key(q))
        assert hit is not None
        # unit-norm embedding row cached
        np.testing.assert_allclose(np.linalg.norm(hit), 1.0, atol=1e-5)
        r2 = run(manager.query(q, n_results=2))  # cache-hit path
        assert r1["ids"] == r2["ids"]

    def test_filter_falls_back(self, manager):
        res = run(
            manager.query("CLIP", n_results=2, filter_dict={"type": "text"})
        )
        assert len(res["ids"]) > 0

    def test_search_fused_none_cases(self, manager):
        store = manager._store
        # k larger than live rows still works (k_eff = live).
        out = store.search_fused(
            manager._encoder.embed_fn,
            (manager._encoder.params, *manager._encoder.prepare(["x"])),
            99,
        )
        assert out is not None
        res, emb = out
        assert len(res["ids"][0]) == len(DOCS)

    def test_empty_store_returns_none(self):
        encoder = TextEncoder(
            params=init_params(jax.random.key(0), TINY), cfg=TINY,
            seq_buckets=(16,), batch_buckets=(4,),
        )
        store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                            initial_capacity=512, dtype=jnp.float32)
        assert store.search_fused(
            encoder.embed_fn,
            (encoder.params, *encoder.prepare(["x"])),
            3,
        ) is None
