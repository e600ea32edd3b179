"""Cross-encoder reranker tests (tiny config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.cross_encoder import (
    CrossEncoderReranker,
    init_params,
    pack_pairs,
    score_pairs,
)
from multimodal_rag_tpu.models.minilm import EncoderConfig
from multimodal_rag_tpu.models.tokenizer import (
    CLS_ID,
    SEP_ID,
    HashingTokenizer,
)

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=128, compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def reranker():
    return CrossEncoderReranker(
        params=init_params(jax.random.key(0), TINY), cfg=TINY,
        tokenizer=HashingTokenizer(vocab_size=1000),
        seq_buckets=(32, 64), batch_buckets=(4, 8),
    )


class TestPacking:
    def test_pair_layout(self):
        tok = HashingTokenizer(vocab_size=1000)
        ids, mask = pack_pairs(tok, ["short query"], ["a passage here"], 32)
        row = ids[0]
        assert row[0] == CLS_ID
        seps = np.where(row == SEP_ID)[0]
        assert len(seps) == 2  # query sep + trailing sep
        n = int(mask[0].sum())
        assert row[n - 1] == SEP_ID

    def test_truncation_budget(self):
        tok = HashingTokenizer(vocab_size=1000)
        ids, mask = pack_pairs(tok, ["q " * 100], ["p " * 100], 32)
        assert mask[0].sum() <= 32


class TestScoring:
    def test_shapes(self, reranker):
        scores = reranker.score("what is ml", ["doc one", "doc two", "x"])
        assert scores.shape == (3,)
        assert np.isfinite(scores).all()

    def test_oversized_batch_chunks(self, reranker):
        """More passages than the largest batch bucket (8) must chunk,
        not crash or silently score only the first bucket's worth."""
        passages = [f"passage number {i}" for i in range(11)]
        scores = reranker.score("what is ml", passages)
        assert scores.shape == (11,)
        want = np.concatenate([
            reranker.score("what is ml", passages[:8]),
            reranker.score("what is ml", passages[8:]),
        ])
        np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)

    def test_deterministic(self, reranker):
        a = reranker.score("q", ["a", "b"])
        b = reranker.score("q", ["a", "b"])
        np.testing.assert_array_equal(a, b)

    def test_batch_independent_of_padding(self, reranker):
        solo = reranker.score("query text", ["only passage"])
        batch = reranker.score(
            "query text", ["only passage", "pad passage", "another"]
        )
        np.testing.assert_allclose(solo[0], batch[0], atol=1e-4)

    def test_empty(self, reranker):
        assert reranker.score("q", []).shape == (0,)


class TestRerank:
    def test_reorder_and_shape(self, reranker):
        results = {
            "ids": ["a", "b", "c"],
            "distances": [0.1, 0.2, 0.3],
            "metadatas": [{"i": 0}, {"i": 1}, {"i": 2}],
            "documents": ["alpha text", "beta text", "gamma text"],
        }
        out = reranker.rerank("some query", results)
        assert set(out["ids"]) == {"a", "b", "c"}
        assert len(out["rerank_scores"]) == 3
        # sorted descending by score
        assert out["rerank_scores"] == sorted(
            out["rerank_scores"], reverse=True
        )
        # rows stay aligned
        pos = out["ids"].index("b")
        assert out["metadatas"][pos] == {"i": 1}
        assert out["documents"][pos] == "beta text"

    def test_top_k_cut(self, reranker):
        results = {
            "ids": list("abcd"),
            "distances": [0.1] * 4,
            "metadatas": [{}] * 4,
            "documents": ["w", "x", "y", "z"],
        }
        out = reranker.rerank("q", results, top_k=2)
        assert len(out["ids"]) == 2

    def test_empty_results_passthrough(self, reranker):
        results = {"ids": [], "distances": [], "metadatas": [],
                   "documents": []}
        assert reranker.rerank("q", results) == results
