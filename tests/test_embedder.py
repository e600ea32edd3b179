"""EmbeddingManager contract tests (reference embedder.py parity)."""

import asyncio

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rag_tpu.embedder import EmbeddingManager
from multimodal_rag_tpu.models.minilm import EncoderConfig, TextEncoder, init_params
from multimodal_rag_tpu.parallel.sharding import get_mesh
from multimodal_rag_tpu.vectorstore import VectorStore

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=64, compute_dtype=jnp.float32,
)


@pytest.fixture()
def manager():
    import jax

    encoder = TextEncoder(
        params=init_params(jax.random.key(0), TINY), cfg=TINY,
        seq_buckets=(16, 32), batch_buckets=(4, 8),
    )
    # f32 store: the random-init tiny encoder produces tightly clustered
    # embeddings, and bf16 rounding (~4e-3) could flip near-tied rankings.
    store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                        initial_capacity=512, dtype=jnp.float32)
    return EmbeddingManager(encoder=encoder, store=store)


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


SUMMARIES = [
    {"id": "text_0", "summary": "machine learning intro", "type": "text"},
    {"id": "text_1", "summary": "neural network layers", "type": "text"},
    {"id": "table_0", "summary": "table of accuracies", "type": "table"},
    {"id": "img_0", "summary": "diagram of a model", "type": "image"},
]


class TestInitializeArchRejection:
    def test_unsupported_model_type_fails_loudly(self, tmp_path,
                                                 monkeypatch):
        """A cached checkpoint whose config.json names a non-BERT
        architecture must FAIL initialize(), not silently fall back to
        random-init MiniLM weights (review finding r3: the ValueError
        from encoder_families.config_from_hf was being swallowed)."""
        import json

        from multimodal_rag_tpu.config import settings

        (tmp_path / "config.json").write_text(json.dumps({
            "model_type": "xlm-roberta", "vocab_size": 250002,
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
        }))
        (tmp_path / "model.safetensors").write_text("")
        monkeypatch.setattr(
            settings, "MMRAG_CHECKPOINT_PATH", str(tmp_path)
        )
        mgr = EmbeddingManager()
        with pytest.raises(ValueError, match="model_type"):
            run(mgr.initialize())


class TestEmbedStore:
    def test_counts_by_type(self, manager):
        counts = run(manager.embed_and_store(SUMMARIES, "doc_1"))
        assert counts == {"text": 2, "table": 1, "image": 1}
        assert manager.store.count() == 4

    def test_record_contract(self, manager):
        run(manager.embed_and_store(SUMMARIES, "doc_1"))
        rec = manager.store.get(ids=["doc_1_text_0"],
                                include=("documents", "metadatas"))
        assert rec["documents"] == ["machine learning intro"]
        assert rec["metadatas"] == [
            {"doc_id": "doc_1", "item_id": "text_0", "type": "text"}
        ]

    def test_empty(self, manager):
        assert run(manager.embed_and_store([], "d")) == {
            "text": 0, "table": 0, "image": 0,
        }


class TestQuery:
    def test_query_flattened_shape(self, manager):
        async def flow():
            await manager.embed_and_store(SUMMARIES, "doc_1")
            return await manager.query("machine learning intro", n_results=2)

        res = run(flow())
        assert set(res) == {"ids", "distances", "metadatas", "documents"}
        assert len(res["ids"]) == 2
        # identical text should be its own nearest neighbour
        assert res["ids"][0] == "doc_1_text_0"
        # store holds vectors in bf16 → self-distance is ~1e-4, not exactly 0
        assert res["distances"][0] == pytest.approx(0.0, abs=5e-3)

    def test_query_empty_raises(self, manager):
        with pytest.raises(ValueError):
            run(manager.query("   "))

    def test_batch_query(self, manager):
        async def flow():
            await manager.embed_and_store(SUMMARIES, "doc_1")
            return await manager.batch_query(
                ["machine learning intro", "table of accuracies"], n_results=1
            )

        res = run(flow())
        assert [r["ids"][0] for r in res] == ["doc_1_text_0", "doc_1_table_0"]

    def test_filter_dict(self, manager):
        async def flow():
            await manager.embed_and_store(SUMMARIES, "doc_1")
            return await manager.query(
                "anything at all", n_results=4, filter_dict={"type": "image"}
            )

        res = run(flow())
        assert res["ids"] == ["doc_1_img_0"]

    def test_cache_hits(self, manager):
        async def flow():
            await manager.embed_texts_batch(["alpha", "beta"])
            await manager.embed_texts_batch(["alpha", "gamma"])

        run(flow())
        assert manager.cache.hits == 1
        assert manager.stats["total_embeddings_created"] == 3

    def test_similar_documents_excludes_self(self, manager):
        async def flow():
            await manager.embed_and_store(SUMMARIES, "doc_1")
            return await manager.get_similar_documents("doc_1", "text_0", 2)

        res = run(flow())
        assert "doc_1_text_0" not in res["ids"]
        assert len(res["ids"]) == 2


class TestDelete:
    def test_delete_document(self, manager):
        async def flow():
            await manager.embed_and_store(SUMMARIES, "doc_1")
            await manager.embed_and_store(SUMMARIES, "doc_2")
            n = await manager.delete_document("doc_1")
            return n

        assert run(flow()) == 4
        assert manager.store.count() == 4

    def test_stats_shape(self, manager):
        run(manager.embed_and_store(SUMMARIES, "doc_1"))
        stats = run(manager.get_collection_stats())
        assert stats["count"] == 4
        assert stats["embedding_dim"] == 64
        assert "total_queries" in stats["stats"]
        assert "hit_rate" in stats["cache"]


class TestPersistence:
    def test_cleanup_saves_and_reload(self, tmp_path, manager):
        manager.persist_dir = str(tmp_path)

        async def flow():
            await manager.embed_and_store(SUMMARIES, "doc_1")
            await manager.cleanup()

        run(flow())
        m2 = EmbeddingManager(
            encoder=manager._encoder, persist_dir=str(tmp_path)
        )
        run(m2.initialize())
        assert m2.store.count() == 4


class TestAutosave:
    """Debounced crash-durability persist (VECTOR_AUTOSAVE_S): mutations
    hit disk shortly after the burst, not only at graceful shutdown."""

    def _manager(self, tmp_path):
        import jax

        encoder = TextEncoder(
            params=init_params(jax.random.key(0), TINY), cfg=TINY,
            seq_buckets=(16, 32), batch_buckets=(4, 8),
        )
        store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                            initial_capacity=512, dtype=jnp.float32)
        return EmbeddingManager(
            encoder=encoder, store=store, persist_dir=str(tmp_path)
        )

    def test_mutation_persists_without_cleanup(self, tmp_path, monkeypatch):
        from multimodal_rag_tpu.config import settings

        monkeypatch.setattr(settings, "VECTOR_AUTOSAVE_S", 0.05)
        mgr = self._manager(tmp_path)

        async def flow():
            await mgr.initialize()
            await mgr.embed_and_store(SUMMARIES, "doc_x")
            for _ in range(100):  # wait for the debounced save
                await asyncio.sleep(0.05)
                if list(tmp_path.glob("*.manifest.json")):
                    break
            # Simulate a crash: NO cleanup() — reload from disk.
            loaded = VectorStore.load(
                str(tmp_path), mesh=get_mesh(1), tile_n=256,
                initial_capacity=512, dtype=jnp.float32,
            )
            assert loaded.count() == len(SUMMARIES)

        run(flow())

    def test_autosave_disabled_means_shutdown_only(self, tmp_path,
                                                   monkeypatch):
        from multimodal_rag_tpu.config import settings

        monkeypatch.setattr(settings, "VECTOR_AUTOSAVE_S", 0.0)
        mgr = self._manager(tmp_path)

        async def flow():
            await mgr.initialize()
            await mgr.embed_and_store(SUMMARIES, "doc_y")
            await asyncio.sleep(0.3)
            assert not list(tmp_path.glob("*.manifest.json"))
            await mgr.cleanup()
            assert list(tmp_path.glob("*.manifest.json"))

        run(flow())

    def test_burst_coalesces(self, tmp_path, monkeypatch):
        """Mutations during the save window re-arm one follow-up save;
        the final state reaches disk."""
        from multimodal_rag_tpu.config import settings

        monkeypatch.setattr(settings, "VECTOR_AUTOSAVE_S", 0.05)
        mgr = self._manager(tmp_path)

        async def flow():
            await mgr.initialize()
            await mgr.embed_and_store(SUMMARIES, "doc_a")
            await mgr.embed_and_store(
                [{"id": "text_9", "summary": "late burst row",
                  "type": "text"}], "doc_b",
            )
            for _ in range(100):
                await asyncio.sleep(0.05)
                t = mgr._persist_task
                if t is not None and t.done() and not mgr._persist_again:
                    break
            loaded = VectorStore.load(
                str(tmp_path), mesh=get_mesh(1), tile_n=256,
                initial_capacity=512, dtype=jnp.float32,
            )
            assert loaded.count() == len(SUMMARIES) + 1

        run(flow())
