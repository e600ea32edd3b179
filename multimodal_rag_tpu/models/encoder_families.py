"""Encoder model families: BGE / E5 / GTE / MiniLM-class BERT encoders.

The reference hardcodes one embedding model
(``SENTENCE_TRANSFORMER_MODEL=all-MiniLM-L6-v2``, reference
``config.py:102-105``) but reads the name from config — deployments point
it at other sentence-transformers models. This module makes that knob
real for the BERT-architecture retrieval families people actually deploy:

* **MiniLM / paraphrase-* / MPNet-style**: mean pooling, no prefixes.
* **BGE v1/v1.5 (English)**: CLS pooling; queries carry the retrieval
  instruction ``"Represent this sentence for searching relevant
  passages: "`` (the BAAI-documented s2p recipe), passages none.
* **E5 (v1/v2)**: mean pooling; ``"query: "`` / ``"passage: "`` prefixes
  on BOTH sides (required — E5 embeds unprefixed text poorly).
* **GTE (thenlper)**: mean pooling, no prefixes.

Family selection is by substring match on ``SENTENCE_TRANSFORMER_MODEL``.
Architecture hyperparameters come from the checkpoint's own
``config.json`` (:func:`config_from_hf`), and the pooling mode prefers
the sentence-transformers ``1_Pooling/config.json`` sitting next to the
weights when present — checkpoint truth beats name heuristics.

Non-BERT retrieval families (XLM-RoBERTa-based multilingual-e5 / bge-m3)
are out of scope for :func:`minilm.load_hf_bert_params`; config_from_hf
rejects their ``model_type`` loudly instead of producing garbage.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, replace
from typing import Any, Optional

logger = logging.getLogger(__name__)

BGE_QUERY_INSTRUCTION = (
    "Represent this sentence for searching relevant passages: "
)


@dataclass(frozen=True)
class EncoderFamily:
    """Retrieval conventions of one embedding-model family."""

    name: str  # label for logs/stats
    hint: str  # HF-cache path substring for checkpoint discovery
    pooling: str  # "mean" | "cls"
    query_prefix: str = ""
    passage_prefix: str = ""


# Ordered: first substring match on the configured model name wins.
FAMILIES = (
    EncoderFamily("minilm", "all-MiniLM", "mean"),
    EncoderFamily(
        "bge-en", "bge-", "cls", query_prefix=BGE_QUERY_INSTRUCTION
    ),
    EncoderFamily(
        "e5", "e5-", "mean",
        query_prefix="query: ", passage_prefix="passage: ",
    ),
    EncoderFamily("gte", "gte-", "mean"),
)

_DEFAULT = FAMILIES[0]


def resolve_family(model_name: str) -> EncoderFamily:
    """Map a ``SENTENCE_TRANSFORMER_MODEL`` value to its family.

    Matches the basename case-insensitively ("BAAI/bge-small-en-v1.5" →
    bge-en; "intfloat/e5-base-v2" → e5). Unknown names get MiniLM-style
    conventions (mean pooling, no prefixes) — the sentence-transformers
    default — with the full basename as the checkpoint-discovery hint.
    """
    base = model_name.rsplit("/", 1)[-1]
    lowered = base.lower()
    for fam in FAMILIES:
        if fam.hint.lower() in lowered:
            return replace(fam, hint=base)
    return replace(_DEFAULT, name="generic-bert", hint=base)


def _snapshot_dir(path: str) -> str:
    return path if os.path.isdir(path) else os.path.dirname(path)


def pooling_from_snapshot(path: str) -> Optional[str]:
    """Read the sentence-transformers ``1_Pooling/config.json`` next to a
    checkpoint, if shipped. Returns "cls" / "mean" / None (absent or
    unrecognized — e.g. max-token pooling, which no supported family
    uses)."""
    cand = os.path.join(_snapshot_dir(path), "1_Pooling", "config.json")
    try:
        with open(cand, encoding="utf-8") as f:
            cfg = json.load(f)
    except (OSError, ValueError):
        return None
    if cfg.get("pooling_mode_cls_token"):
        return "cls"
    if cfg.get("pooling_mode_mean_tokens"):
        return "mean"
    return None


def config_from_hf(path: str, **overrides: Any):
    """Build an :class:`minilm.EncoderConfig` from the ``config.json``
    sitting next to a checkpoint (dir or bare safetensors path).

    Only the BERT architecture is supported (what
    :func:`minilm.load_hf_bert_params` maps); other ``model_type`` values
    raise ``ValueError`` so an XLM-R-family checkpoint fails loudly
    instead of loading transposed garbage. ``overrides`` (e.g.
    ``compute_dtype``, ``pooling``) win over file values.
    """
    from multimodal_rag_tpu.models.minilm import EncoderConfig

    cand = os.path.join(_snapshot_dir(path), "config.json")
    with open(cand, encoding="utf-8") as f:
        hf = json.load(f)
    model_type = hf.get("model_type", "bert")
    if model_type != "bert":
        raise ValueError(
            f"unsupported encoder model_type={model_type!r} in {cand} "
            "(only BERT-architecture families load here; see "
            "models/encoder_families.py)"
        )
    kwargs = dict(
        vocab_size=int(hf["vocab_size"]),
        hidden_dim=int(hf["hidden_size"]),
        num_layers=int(hf["num_hidden_layers"]),
        num_heads=int(hf["num_attention_heads"]),
        ff_dim=int(hf["intermediate_size"]),
        max_position=int(hf.get("max_position_embeddings", 512)),
        type_vocab=int(hf.get("type_vocab_size", 2)),
        ln_eps=float(hf.get("layer_norm_eps", 1e-12)),
    )
    kwargs.update(overrides)
    return EncoderConfig(**kwargs)
