"""Encoder model-family support: BGE/E5/GTE conventions over the BERT
encoder (models/encoder_families.py).

Covers: family resolution from ``SENTENCE_TRANSFORMER_MODEL``, HF
config.json → EncoderConfig, sentence-transformers pooling-config
override, CLS-vs-mean pooling math (HF-golden for CLS, the BGE mode),
query/passage prefix wiring through EmbeddingManager (cache-key safety),
and the persisted-store dim-mismatch recovery.
"""

import asyncio
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rag_tpu.models import encoder_families as ef
from multimodal_rag_tpu.models.minilm import (
    EncoderConfig,
    TextEncoder,
    embed,
    init_params,
)

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=64, compute_dtype=jnp.float32,
)


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        coro
    )


class TestResolveFamily:
    def test_minilm_default(self):
        fam = ef.resolve_family("all-MiniLM-L6-v2")
        assert fam.name == "minilm"
        assert fam.pooling == "mean"
        assert fam.query_prefix == "" and fam.passage_prefix == ""
        assert fam.hint == "all-MiniLM-L6-v2"

    def test_bge(self):
        fam = ef.resolve_family("BAAI/bge-small-en-v1.5")
        assert fam.name == "bge-en"
        assert fam.pooling == "cls"
        assert fam.query_prefix == ef.BGE_QUERY_INSTRUCTION
        assert fam.passage_prefix == ""
        assert fam.hint == "bge-small-en-v1.5"  # org stripped for discovery

    def test_e5(self):
        fam = ef.resolve_family("intfloat/e5-base-v2")
        assert fam.name == "e5"
        assert fam.pooling == "mean"
        assert fam.query_prefix == "query: "
        assert fam.passage_prefix == "passage: "

    def test_gte(self):
        fam = ef.resolve_family("thenlper/gte-small")
        assert fam.name == "gte"
        assert fam.pooling == "mean"
        assert fam.query_prefix == ""

    def test_unknown_gets_default_conventions(self):
        fam = ef.resolve_family("sentence-transformers/paraphrase-mpnet")
        assert fam.name == "generic-bert"
        assert fam.pooling == "mean"
        assert fam.hint == "paraphrase-mpnet"

    def test_case_insensitive(self):
        assert ef.resolve_family("BGE-Large-EN").name == "bge-en"


class TestConfigFromHF:
    def _write(self, tmp_path, **over):
        cfg = {
            "model_type": "bert",
            "vocab_size": 30522,
            "hidden_size": 384,
            "num_hidden_layers": 12,
            "num_attention_heads": 12,
            "intermediate_size": 1536,
            "max_position_embeddings": 512,
            "type_vocab_size": 2,
            "layer_norm_eps": 1e-12,
        }
        cfg.update(over)
        (tmp_path / "config.json").write_text(json.dumps(cfg))
        return tmp_path

    def test_fields_mapped(self, tmp_path):
        self._write(tmp_path, hidden_size=768, num_hidden_layers=6)
        cfg = ef.config_from_hf(str(tmp_path))
        assert cfg.hidden_dim == 768
        assert cfg.num_layers == 6
        assert cfg.num_heads == 12
        assert cfg.ff_dim == 1536
        assert cfg.max_position == 512

    def test_overrides_win(self, tmp_path):
        self._write(tmp_path)
        cfg = ef.config_from_hf(
            str(tmp_path), pooling="cls", compute_dtype=jnp.float32
        )
        assert cfg.pooling == "cls"
        assert cfg.compute_dtype == jnp.float32

    def test_bare_file_path_uses_parent_dir(self, tmp_path):
        self._write(tmp_path, hidden_size=128)
        cfg = ef.config_from_hf(str(tmp_path / "model.safetensors"))
        assert cfg.hidden_dim == 128

    def test_non_bert_rejected(self, tmp_path):
        self._write(tmp_path, model_type="xlm-roberta")
        with pytest.raises(ValueError, match="model_type"):
            ef.config_from_hf(str(tmp_path))

    def test_missing_file_raises_oserror(self, tmp_path):
        with pytest.raises(OSError):
            ef.config_from_hf(str(tmp_path))


class TestPoolingFromSnapshot:
    def _write(self, tmp_path, body):
        d = tmp_path / "1_Pooling"
        d.mkdir()
        (d / "config.json").write_text(json.dumps(body))

    def test_cls(self, tmp_path):
        self._write(
            tmp_path,
            {"pooling_mode_cls_token": True, "pooling_mode_mean_tokens": False},
        )
        assert ef.pooling_from_snapshot(str(tmp_path)) == "cls"

    def test_mean(self, tmp_path):
        self._write(
            tmp_path,
            {"pooling_mode_cls_token": False, "pooling_mode_mean_tokens": True},
        )
        assert ef.pooling_from_snapshot(str(tmp_path)) == "mean"

    def test_absent(self, tmp_path):
        assert ef.pooling_from_snapshot(str(tmp_path)) is None

    def test_unrecognized_mode(self, tmp_path):
        self._write(tmp_path, {"pooling_mode_max_tokens": True})
        assert ef.pooling_from_snapshot(str(tmp_path)) is None


class TestPoolingMath:
    def test_cls_equals_normalized_position0(self):
        from multimodal_rag_tpu.models.minilm import encoder_forward

        import dataclasses

        params = init_params(jax.random.key(0), TINY)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 1000, (3, 12)), jnp.uint32)
        mask = jnp.ones((3, 12), jnp.int32)
        cls_cfg = dataclasses.replace(TINY, pooling="cls")

        hidden = np.asarray(encoder_forward(params, ids, mask, TINY))
        want = hidden[:, 0, :]
        want = want / np.linalg.norm(want, axis=-1, keepdims=True)
        got = np.asarray(embed(params, ids, mask, cls_cfg))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # And it differs from mean pooling on the same inputs.
        mean_out = np.asarray(embed(params, ids, mask, TINY))
        assert np.abs(got - mean_out).max() > 1e-3

    def test_cls_ignores_padding_tail(self):
        import dataclasses

        params = init_params(jax.random.key(0), TINY)
        cls_cfg = dataclasses.replace(TINY, pooling="cls")
        rng = np.random.default_rng(1)
        row = rng.integers(1, 1000, (1, 8))
        ids_a = jnp.asarray(
            np.pad(row, ((0, 0), (0, 8)), constant_values=0), jnp.uint32
        )
        ids_b = jnp.asarray(
            np.pad(row, ((0, 0), (0, 8)), constant_values=7), jnp.uint32
        )
        mask = jnp.asarray(
            np.pad(np.ones((1, 8), np.int32), ((0, 0), (0, 8))), jnp.int32
        )
        a = np.asarray(embed(params, ids_a, mask, cls_cfg))
        b = np.asarray(embed(params, ids_b, mask, cls_cfg))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestClsGoldenVsHF:
    """BGE-style CLS pooling against torch BERT (same pattern as
    tests/test_hf_loaders.py)."""

    def test_cls_embed_matches_hf(self, tmp_path):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from multimodal_rag_tpu.models.minilm import load_hf_bert_params

        torch.manual_seed(0)
        hf_cfg = transformers.BertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, hidden_act="gelu",
        )
        model = transformers.BertModel(hf_cfg)
        model.eval()
        path = str(tmp_path / "bert")
        model.save_pretrained(path, safe_serialization=True)

        cfg = ef.config_from_hf(
            path, compute_dtype=jnp.float32, fused_attention=False,
            gelu="exact", pooling="cls",
        )
        assert cfg.hidden_dim == 32 and cfg.num_layers == 2
        params = load_hf_bert_params(path, cfg)

        rng = np.random.default_rng(3)
        ids = rng.integers(1, 100, (2, 9)).astype(np.int64)
        mask = np.ones((2, 9), np.int64)
        with torch.no_grad():
            hid = model(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).last_hidden_state.numpy()
        want = hid[:, 0, :]
        want = want / np.linalg.norm(want, axis=-1, keepdims=True)
        got = np.asarray(
            embed(params, jnp.asarray(ids, jnp.uint32),
                  jnp.asarray(mask, jnp.int32), cfg)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class RecordingEncoder(TextEncoder):
    """Tiny real encoder that records every text it encodes/prepares."""

    def __init__(self):
        super().__init__(
            params=init_params(jax.random.key(0), TINY), cfg=TINY,
            seq_buckets=(16, 32), batch_buckets=(4, 8),
        )
        self.seen = []

    def encode(self, texts):
        self.seen.extend(texts)
        return super().encode(texts)

    def prepare(self, texts):
        self.seen.extend(texts)
        return super().prepare(texts)


@pytest.fixture()
def e5_manager():
    from multimodal_rag_tpu.embedder import EmbeddingManager
    from multimodal_rag_tpu.parallel.sharding import get_mesh
    from multimodal_rag_tpu.vectorstore import VectorStore

    encoder = RecordingEncoder()
    store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                        initial_capacity=512, dtype=jnp.float32)
    mgr = EmbeddingManager(encoder=encoder, store=store, use_batcher=False)
    mgr._query_prefix = "query: "
    mgr._passage_prefix = "passage: "
    return mgr


class TestPrefixWiring:
    def test_store_uses_passage_prefix_documents_stay_raw(self, e5_manager):
        run(e5_manager.embed_and_store(
            [{"id": "text_0", "summary": "hello world", "type": "text"}],
            "doc_1",
        ))
        assert "passage: hello world" in e5_manager._encoder.seen
        rec = e5_manager.store.get(
            ids=["doc_1_text_0"], include=("documents",)
        )
        assert rec["documents"] == ["hello world"]  # raw text stored

    def test_query_uses_query_prefix(self, e5_manager):
        run(e5_manager.embed_and_store(
            [{"id": "text_0", "summary": "hello world", "type": "text"}],
            "doc_1",
        ))
        e5_manager._encoder.seen.clear()
        res = run(e5_manager.query("hello", n_results=1))
        assert len(res["ids"]) == 1
        assert any(
            t.startswith("query: hello") for t in e5_manager._encoder.seen
        )

    def test_query_and_passage_cache_keys_disjoint(self, e5_manager):
        # Same literal text embedded as passage then queried: the query
        # must NOT reuse the passage's cached (differently-prefixed) row.
        texts = ["same text"]
        a = run(e5_manager.embed_texts_batch(texts, role="passage"))
        b = run(e5_manager.embed_texts_batch(texts, role="query"))
        assert np.abs(a - b).max() > 1e-4
        assert e5_manager.stats["total_embeddings_created"] == 2  # no hit

    def test_role_none_applies_no_prefix(self, e5_manager):
        run(e5_manager.embed_texts_batch(["plain"], role=None))
        # encode() delegates to prepare(), so texts are recorded twice —
        # what matters is that no recorded text carries a prefix.
        assert e5_manager._encoder.seen
        assert all(t == "plain" for t in e5_manager._encoder.seen)


class TestPrefixResolution:
    def test_family_default(self):
        from multimodal_rag_tpu.embedder import EmbeddingManager

        assert EmbeddingManager._resolve_prefix("", "query: ") == "query: "

    def test_override_wins(self):
        from multimodal_rag_tpu.embedder import EmbeddingManager

        assert EmbeddingManager._resolve_prefix("Q: ", "query: ") == "Q: "

    def test_none_literal_disables(self):
        from multimodal_rag_tpu.embedder import EmbeddingManager

        assert EmbeddingManager._resolve_prefix("none", "query: ") == ""


class TestDimMismatchRecovery:
    def test_loaded_store_with_wrong_dim_starts_fresh(self, tmp_path):
        from multimodal_rag_tpu.embedder import EmbeddingManager
        from multimodal_rag_tpu.parallel.sharding import get_mesh
        from multimodal_rag_tpu.vectorstore import VectorStore

        old = VectorStore(dim=32, mesh=get_mesh(1), tile_n=256,
                          initial_capacity=512, name="multimodal_rag")
        old.add(["a"], np.random.default_rng(0).normal(size=(1, 32)))
        old.save(str(tmp_path))

        encoder = TextEncoder(
            params=init_params(jax.random.key(0), TINY), cfg=TINY,
            seq_buckets=(16, 32), batch_buckets=(4, 8),
        )
        mgr = EmbeddingManager(encoder=encoder, persist_dir=str(tmp_path))
        run(mgr.initialize())
        assert mgr.store.dim == 64  # fresh store at the encoder's dim
        assert mgr.store.count() == 0
