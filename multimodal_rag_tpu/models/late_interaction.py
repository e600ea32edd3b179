"""Late-interaction (MaxSim) reranker — ColBERT-style scoring on TPU.

A second rerank mode beside the cross-encoder (``models.cross_encoder``):
score(query, doc) = Σ_{q tokens} max_{d tokens} ⟨q_i, d_j⟩ over unit-norm
per-token embeddings (the ColBERT MaxSim operator; see FLASH-MAXSIM,
PAPERS.md, for the IO-aware formulation this follows — here the candidate
set is the top-k page, so one fused einsum chain per rerank is already
bandwidth-trivial and XLA fuses sim→mask→max→sum into a single pass).

Two properties make it attractive over the cross-encoder stage:

* **No second model.** It reuses the bi-encoder's token states
  (``minilm.encoder_forward``), so a deployment with only
  ``MMRAG_CHECKPOINT_PATH`` set gets a real quality-lifting reranker —
  the cross-encoder path additionally needs an ms-marco checkpoint.
* **One forward per candidate page, not per (query, doc) pair** — the
  query tower runs once; candidate token states could even be cached.

Select with ``RERANK_MODE=maxsim`` (default remains ``cross``).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rag_tpu.models.minilm import (
    MINILM_L6,
    EncoderConfig,
    bucket_for,
    encoder_forward,
    pad_to_buckets,
)

logger = logging.getLogger(__name__)


def token_embeddings(
    params: Dict, ids: jax.Array, mask: jax.Array,
    cfg: EncoderConfig = MINILM_L6,
) -> jax.Array:
    """(B, S) ids/mask → (B, S, H) unit-norm per-token embeddings (masked
    positions zeroed)."""
    hidden = encoder_forward(params, ids, mask, cfg)
    norm = jnp.linalg.norm(hidden, axis=-1, keepdims=True)
    tok = hidden / jnp.maximum(norm, 1e-12)
    return tok * mask.astype(jnp.float32)[:, :, None]


def maxsim(
    q_tok: jax.Array,  # (Sq, H) unit-norm, zeroed pads
    q_mask: jax.Array,  # (Sq,)
    d_tok: jax.Array,  # (B, Sd, H) unit-norm, zeroed pads
    d_mask: jax.Array,  # (B, Sd)
) -> jax.Array:
    """→ (B,) MaxSim scores. Doc pads are excluded from the max via an
    additive bias; query pads contribute 0 to the sum (zeroed rows)."""
    sim = jnp.einsum(
        "qh,bkh->bqk", q_tok, d_tok, preferred_element_type=jnp.float32
    )
    bias = (1.0 - d_mask.astype(jnp.float32)) * -1e9
    sim = sim + bias[:, None, :]
    best = jnp.max(sim, axis=-1)  # (B, Sq)
    best = best * q_mask.astype(jnp.float32)[None, :]
    return jnp.sum(best, axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def _score_candidates(params, q_ids, q_mask, d_ids, d_mask, cfg):
    """One dispatch: encode query + candidates token-level, MaxSim."""
    q_tok = token_embeddings(params, q_ids, q_mask, cfg)[0]
    d_tok = token_embeddings(params, d_ids, d_mask, cfg)
    return maxsim(q_tok, q_mask[0], d_tok, d_mask)


class LateInteractionReranker:
    """Host-facing MaxSim reranker sharing the bi-encoder's weights and
    tokenizer. Same ``rerank`` contract as ``CrossEncoderReranker``."""

    def __init__(
        self,
        encoder,  # models.minilm.TextEncoder
        seq_buckets: Sequence[int] = (32, 64, 128),
        batch_buckets: Sequence[int] = (8, 32),
    ):
        self.encoder = encoder
        self.trained = getattr(encoder, "pretrained", False)
        self.seq_buckets = tuple(seq_buckets)
        self.batch_buckets = tuple(batch_buckets)
        if not self.trained:
            logger.warning(
                "MaxSim reranker is sharing RANDOM-INIT encoder weights: "
                "rerank degrades to pass-through (set MMRAG_CHECKPOINT_PATH)."
            )

    def score(self, query: str, passages: Sequence[str]) -> np.ndarray:
        if not passages:
            return np.zeros((0,), np.float32)
        max_bb = self.batch_buckets[-1]
        if len(passages) > max_bb:  # chunk oversized candidate sets
            return np.concatenate([
                self.score(query, list(passages[i:i + max_bb]))
                for i in range(0, len(passages), max_bb)
            ])
        tok = self.encoder.tokenizer
        max_s = self.seq_buckets[-1]
        q_ids, q_mask = tok.encode_batch([query], max_s)
        d_ids, d_mask = tok.encode_batch(list(passages), max_s)
        sq = bucket_for(int(q_mask.sum()), self.seq_buckets)
        d_ids_p, d_mask_p = pad_to_buckets(
            d_ids, d_mask, len(passages),
            self.seq_buckets, self.batch_buckets,
        )
        scores = _score_candidates(
            self.encoder.params,
            jnp.asarray(q_ids[:, :sq]), jnp.asarray(q_mask[:, :sq]),
            jnp.asarray(d_ids_p), jnp.asarray(d_mask_p),
            self.encoder.cfg,
        )
        return np.asarray(scores)[: len(passages)]

    def rerank(
        self, query: str, results: Dict[str, list], top_k: int | None = None
    ) -> Dict[str, list]:
        """Reorder a flattened query-result dict by MaxSim. Pass-through
        when the shared encoder is random-init (noise ordering would be
        worse than the bi-encoder order it replaces)."""
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
