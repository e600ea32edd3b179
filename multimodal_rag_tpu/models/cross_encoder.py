"""Cross-encoder reranker (query, passage) → relevance score.

The reference shipped ``rerank_results`` as an inert placeholder
(``app/utils/embedder.py:834-859``: "for now, return results as-is"). Here
it's a real TPU model (BASELINE.json config 5): a MiniLM-class encoder run
over the *pair* ``[CLS] query [SEP] passage [SEP]`` with a scalar
regression head on the CLS position — the ms-marco-MiniLM cross-encoder
architecture, so real checkpoints load through the same stacked-BERT
loader with an extra classifier head.

Reuses ``models.minilm`` for the transformer body (same scan/bf16/bucket
design); only pair packing and the head live here.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rag_tpu.models.minilm import (
    MINILM_L6,
    EncoderConfig,
    encoder_forward,
    init_params as init_encoder_params,
    pad_to_buckets,
)
from multimodal_rag_tpu.models.tokenizer import (
    CLS_ID,
    SEP_ID,
    get_tokenizer,
)


def init_params(rng: jax.Array, cfg: EncoderConfig = MINILM_L6) -> Dict:
    k1, k2 = jax.random.split(rng)
    params = init_encoder_params(k1, cfg)
    params["head"] = {
        "w": (
            jax.random.truncated_normal(k2, -2.0, 2.0, (cfg.hidden_dim, 1))
            * 0.02
        ).astype(jnp.float32),
        "b": jnp.zeros((1,), jnp.float32),
    }
    return params


def load_hf_cross_encoder(path: str, cfg: EncoderConfig = MINILM_L6) -> Dict:
    """ms-marco-MiniLM-style checkpoint: BERT body + ``classifier`` head."""
    from safetensors import safe_open

    from multimodal_rag_tpu.models.minilm import load_hf_bert_params

    params = load_hf_bert_params(path, cfg)
    import os

    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.endswith(".safetensors"):
                path = os.path.join(path, name)
                break
    with safe_open(path, framework="np") as f:
        keys = set(f.keys())
        w = next(
            (k for k in ("classifier.weight",) if k in keys), None
        )
        if w:
            params["head"] = {
                "w": jnp.asarray(f.get_tensor("classifier.weight").T),
                "b": jnp.asarray(f.get_tensor("classifier.bias")),
            }
    return params


def score_pairs(
    params: Dict, ids: jax.Array, mask: jax.Array,
    cfg: EncoderConfig = MINILM_L6,
) -> jax.Array:
    """(B, S) packed pairs → (B,) relevance logits (CLS regression)."""
    hidden = encoder_forward(params, ids, mask, cfg)
    cls = hidden[:, 0, :]
    return (cls @ params["head"]["w"] + params["head"]["b"])[:, 0]


def pack_pairs(
    tokenizer, queries: Sequence[str], passages: Sequence[str], max_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """[CLS] query [SEP] passage [SEP] with truncation favoring the query."""
    assert len(queries) == len(passages)
    ids = np.zeros((len(queries), max_len), np.uint32)
    mask = np.zeros((len(queries), max_len), np.int32)
    for i, (q, p) in enumerate(zip(queries, passages)):
        q_ids = tokenizer.tokenize_ids(q)[: max_len // 2 - 2]
        p_budget = max_len - len(q_ids) - 3
        p_ids = tokenizer.tokenize_ids(p)[:p_budget]
        row = [CLS_ID] + q_ids + [SEP_ID] + p_ids + [SEP_ID]
        ids[i, : len(row)] = row
        mask[i, : len(row)] = 1
    return ids, mask


class CrossEncoderReranker:
    """Host-facing reranker with shape bucketing."""

    def __init__(
        self,
        params: Dict | None = None,
        tokenizer=None,
        cfg: EncoderConfig = MINILM_L6,
        seq_buckets: Sequence[int] = (64, 128, 256),
        batch_buckets: Sequence[int] = (8, 32, 128),
        seed: int = 0,
        checkpoint_path: str | None = None,
    ):
        import logging

        from multimodal_rag_tpu.models.minilm import find_local_checkpoint

        logger = logging.getLogger(__name__)
        self.cfg = cfg
        # `trained` gates rerank(): random-init pair scores would reorder
        # results by pure noise — strictly worse than the reference's
        # pass-through placeholder (embedder.py:834-859), so an untrained
        # reranker degrades to that placeholder instead.
        self.trained = params is not None
        if params is None:
            if not checkpoint_path and cfg.vocab_size == 30522:
                checkpoint_path = find_local_checkpoint(
                    "ms-marco", env_var="MMRAG_CROSS_ENCODER_PATH"
                )
            if checkpoint_path:
                try:
                    params = load_hf_cross_encoder(checkpoint_path, cfg)
                    self.trained = True
                    logger.info(
                        "Loaded cross-encoder checkpoint from %s",
                        checkpoint_path,
                    )
                except Exception as e:  # noqa: BLE001
                    logger.error(
                        "Failed to load cross-encoder %s (%s); rerank "
                        "degrades to pass-through", checkpoint_path, e,
                    )
        if params is None:
            if cfg.vocab_size == 30522:
                logger.warning(
                    "No cross-encoder checkpoint found: rerank=true is a "
                    "pass-through. Set MMRAG_CROSS_ENCODER_PATH to a local "
                    "ms-marco-MiniLM safetensors snapshot to enable it."
                )
            params = init_params(jax.random.key(seed), cfg)
        self.params = params
        self.tokenizer = tokenizer or get_tokenizer(
            vocab_size=cfg.vocab_size
        )
        self.seq_buckets = tuple(seq_buckets)
        self.batch_buckets = tuple(batch_buckets)
        self._jit_score = jax.jit(partial(score_pairs, cfg=cfg))

    def score(self, query: str, passages: Sequence[str]) -> np.ndarray:
        """→ (len(passages),) relevance logits."""
        if not passages:
            return np.zeros((0,), np.float32)
        max_bb = self.batch_buckets[-1]
        if len(passages) > max_bb:  # chunk oversized candidate sets
            return np.concatenate([
                self.score(query, list(passages[i:i + max_bb]))
                for i in range(0, len(passages), max_bb)
            ])
        ids, mask = pack_pairs(
            self.tokenizer, [query] * len(passages), list(passages),
            self.seq_buckets[-1],
        )
        ids_p, mask_p = pad_to_buckets(
            ids, mask, len(passages), self.seq_buckets, self.batch_buckets,
        )
        out = self._jit_score(
            self.params, jnp.asarray(ids_p), jnp.asarray(mask_p)
        )
        return np.asarray(out)[: len(passages)]

    def rerank(
        self, query: str, results: Dict[str, list], top_k: int | None = None
    ) -> Dict[str, list]:
        """Reorder a flattened query-result dict ({ids, distances,
        metadatas, documents}) by cross-encoder score. Keeps the result
        shape; adds ``rerank_scores``. Untrained (random-init) rerankers
        return the results unchanged — the reference's placeholder
        semantics — rather than reordering by noise."""
        docs = results.get("documents") or []
        if not docs or not self.trained:
            return results
        scores = self.score(query, docs)
        order = np.argsort(-scores, kind="stable")
        if top_k is not None:
            order = order[:top_k]
        out = {}
        for key in ("ids", "distances", "metadatas", "documents"):
            if key in results:
                out[key] = [results[key][i] for i in order]
        out["rerank_scores"] = [float(scores[i]) for i in order]
        return out
