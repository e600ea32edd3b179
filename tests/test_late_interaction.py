"""Late-interaction (MaxSim) reranker: operator oracle, ranking behavior,
untrained pass-through, RERANK_MODE wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.late_interaction import (
    LateInteractionReranker,
    maxsim,
    token_embeddings,
)
from multimodal_rag_tpu.models.minilm import (
    EncoderConfig,
    TextEncoder,
    init_params,
)
from multimodal_rag_tpu.models.tokenizer import HashingTokenizer

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=128, compute_dtype=jnp.float32,
)


def make_encoder(pretrained=True):
    enc = TextEncoder(
        params=init_params(jax.random.key(0), TINY), cfg=TINY,
        tokenizer=HashingTokenizer(vocab_size=1000),
        seq_buckets=(16, 32), batch_buckets=(4, 8),
    )
    enc.pretrained = pretrained
    return enc


class TestMaxSimOperator:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)

        def unit(v):
            return v / np.linalg.norm(v, axis=-1, keepdims=True)

        Sq, Sd, B, H = 5, 7, 3, 16
        q = unit(rng.standard_normal((Sq, H))).astype(np.float32)
        d = unit(rng.standard_normal((B, Sd, H))).astype(np.float32)
        q_mask = np.array([1, 1, 1, 0, 0], np.int32)
        d_mask = np.ones((B, Sd), np.int32)
        d_mask[1, 4:] = 0
        q_z = q * q_mask[:, None]
        d_z = d * d_mask[:, :, None]

        got = np.asarray(
            maxsim(jnp.asarray(q_z), jnp.asarray(q_mask),
                   jnp.asarray(d_z), jnp.asarray(d_mask))
        )
        want = np.zeros((B,), np.float32)
        for b in range(B):
            total = 0.0
            for i in range(Sq):
                if not q_mask[i]:
                    continue
                sims = [
                    float(q[i] @ d[b, j])
                    for j in range(Sd) if d_mask[b, j]
                ]
                total += max(sims)
            want[b] = total
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_token_embeddings_unit_norm_and_masked(self):
        params = init_params(jax.random.key(1), TINY)
        ids = jnp.asarray(np.arange(1, 13).reshape(2, 6), jnp.uint32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)
        tok = np.asarray(token_embeddings(params, ids, mask, TINY))
        norms = np.linalg.norm(tok, axis=-1)
        np.testing.assert_allclose(norms[0, :4], 1.0, atol=1e-5)
        np.testing.assert_allclose(norms[0, 4:], 0.0, atol=1e-6)
        np.testing.assert_allclose(norms[1], 1.0, atol=1e-5)


class TestReranker:
    def test_identical_passage_wins(self):
        rr = LateInteractionReranker(make_encoder())
        query = "neural network training"
        results = {
            "ids": ["a", "b", "c"],
            "documents": [
                "completely unrelated words here",
                "neural network training",  # exact match
                "partially neural related",
            ],
            "distances": [0.1, 0.5, 0.3],
            "metadatas": [None, None, None],
        }
        out = rr.rerank(query, results)
        assert out["ids"][0] == "b"
        assert "rerank_scores" in out
        assert out["rerank_scores"] == sorted(
            out["rerank_scores"], reverse=True
        )

    def test_top_k_slices(self):
        rr = LateInteractionReranker(make_encoder())
        results = {
            "ids": ["a", "b", "c"],
            "documents": ["one", "two", "three"],
            "distances": [0.1, 0.2, 0.3],
            "metadatas": [None, None, None],
        }
        out = rr.rerank("q", results, top_k=2)
        assert len(out["ids"]) == 2

    def test_oversized_batch_chunks(self):
        """More candidates than the largest batch bucket must chunk, not
        raise a broadcast error."""
        rr = LateInteractionReranker(make_encoder(), batch_buckets=(4, 8))
        passages = [f"passage number {i}" for i in range(11)]
        scores = rr.score("q words", passages)
        assert scores.shape == (11,)
        want = np.concatenate([
            rr.score("q words", passages[:8]),
            rr.score("q words", passages[8:]),
        ])
        np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)

    def test_untrained_is_passthrough(self):
        rr = LateInteractionReranker(make_encoder(pretrained=False))
        results = {
            "ids": ["a", "b"],
            "documents": ["one", "two"],
            "distances": [0.1, 0.2],
            "metadatas": [None, None],
        }
        assert rr.rerank("q", results) == results

    def test_empty_results_passthrough(self):
        rr = LateInteractionReranker(make_encoder())
        assert rr.rerank("q", {"documents": []}) == {"documents": []}


class TestEmbedderWiring:
    def test_rerank_mode_maxsim(self, monkeypatch):
        import asyncio

        from multimodal_rag_tpu import embedder as emb_mod
        from multimodal_rag_tpu.embedder import EmbeddingManager

        monkeypatch.setattr(emb_mod.settings, "RERANK_MODE", "maxsim")
        mgr = EmbeddingManager(encoder=make_encoder(), use_batcher=False)

        async def run():
            await mgr.initialize()
            results = {
                "ids": ["a", "b"],
                "documents": ["alpha beta", "gamma delta"],
                "distances": [0.1, 0.2],
                "metadatas": [None, None],
            }
            return await mgr.rerank_results("alpha beta", results)

        out = asyncio.new_event_loop().run_until_complete(run())
        assert isinstance(mgr._reranker, LateInteractionReranker)
        assert out["ids"][0] == "a"
