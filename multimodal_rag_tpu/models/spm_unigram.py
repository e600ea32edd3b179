"""First-party SentencePiece *unigram* inference for the SigLIP text tower.

``google/siglip-*`` snapshots ship their vocabulary as ``spiece.model`` —
a serialized ``sentencepiece.ModelProto``. The protobuf wire format is
hand-parseable with stdlib only (same offline posture as
``tokenizer.WordPieceTokenizer``), so this module provides:

* :func:`parse_model` — a minimal ModelProto reader: the repeated
  ``SentencePiece {piece, score, type}`` entries (field 1) plus the
  ``TrainerSpec`` special-token ids (field 2: unk/bos/eos/pad at field
  numbers 40-43).
* :class:`UnigramEncoder` — Viterbi segmentation over the piece
  lattice: the segmentation maximizing the sum of piece log-probs wins;
  characters no piece covers fall back to ``<unk>`` with the standard
  penalty (min_score − 10), and *consecutive* unknowns merge into one
  ``<unk>`` token exactly as the sentencepiece runtime does.
* :class:`SigLIPSPTokenizer` — the HF ``SiglipTokenizer`` text contract:
  big_vision canonicalization (ASCII punctuation removed, whitespace
  collapsed — note HF stores ``do_lower_case`` but never applies it, and
  this matches that observed behavior), ``▁`` word-boundary escaping
  with the dummy prefix disabled, then ``ids + EOS`` right-padded with
  the pad token (HF's pad == ``</s>``) to the context length. The text
  tower pools the LAST position, which is therefore always an
  EOS-family id — identical to HF ``SiglipTextModel``.

Golden-tested in ``tests/test_subword_tokenizers.py`` against
hand-encoded ModelProto fixtures and hand-derived segmentations.
"""

from __future__ import annotations

import string
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

SPIECE_UNDERLINE = "▁"  # ▁

# SentencePiece piece types (sentencepiece_model.proto enum Type).
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6

_UNK_PENALTY = 10.0


# ----------------------------------------------------------------------
# Minimal protobuf wire reader (stdlib-only)
# ----------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:  # varint
        _, pos = _read_varint(buf, pos)
    elif wire == 1:  # 64-bit
        pos += 8
    elif wire == 2:  # length-delimited
        n, pos = _read_varint(buf, pos)
        pos += n
    elif wire == 5:  # 32-bit
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


def _iter_fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 2:
            n, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + n]
            pos += n
        elif wire == 0:
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 5:
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        else:
            pos = _skip_field(buf, pos, wire)


def parse_model(data: bytes):
    """ModelProto → (pieces [(surface, score, type)], specials dict).

    ``specials`` carries the TrainerSpec ids when present:
    ``{"unk_id", "bos_id", "eos_id", "pad_id"}`` (absent keys = proto
    defaults 0 / 1 / 2 / −1)."""
    import struct

    pieces: List[Tuple[str, float, int]] = []
    specials: Dict[str, int] = {}
    for field, wire, val in _iter_fields(data):
        if field == 1 and wire == 2:  # repeated SentencePiece
            surface, score, ptype = "", 0.0, NORMAL
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == 2:
                    surface = v2.decode("utf-8")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3 and w2 == 0:
                    ptype = v2
            pieces.append((surface, score, ptype))
        elif field == 2 and wire == 2:  # TrainerSpec
            names = {40: "unk_id", 41: "bos_id", 42: "eos_id", 43: "pad_id"}
            for f2, w2, v2 in _iter_fields(val):
                if f2 in names and w2 == 0:
                    specials[names[f2]] = v2
    return pieces, specials


# ----------------------------------------------------------------------
# Unigram Viterbi
# ----------------------------------------------------------------------

class UnigramEncoder:
    """Viterbi max-log-prob segmentation over a unigram piece vocabulary."""

    def __init__(self, pieces: Sequence[Tuple[str, float, int]],
                 unk_id: int = 0):
        self.pieces = list(pieces)
        self.unk_id = unk_id
        # Surface-matchable pieces only: control/unknown/unused pieces are
        # special tokens, never produced by segmentation.
        self._trie: Dict[str, List[Tuple[int, float]]] = {}
        self._max_len = 1
        min_score = 0.0
        for pid, (surface, score, ptype) in enumerate(self.pieces):
            if ptype in (UNKNOWN, CONTROL, UNUSED):
                if ptype == UNKNOWN:
                    self.unk_id = pid
                continue
            self._trie.setdefault(surface, []).append((pid, score))
            self._max_len = max(self._max_len, len(surface))
            min_score = min(min_score, score)
        self._unk_score = min_score - _UNK_PENALTY

    def encode(self, text: str) -> List[int]:
        """Normalized text (▁-escaped, no raw spaces) → piece ids."""
        n = len(text)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: List[Tuple[int, int]] = [(0, 0)] * (n + 1)  # (start, pid)
        best[0] = 0.0
        trie = self._trie
        for i in range(n):
            base = best[i]
            if base == NEG:
                continue
            hi = min(n, i + self._max_len)
            for j in range(i + 1, hi + 1):
                entries = trie.get(text[i:j])
                if not entries:
                    continue
                for pid, score in entries:
                    cand = base + score
                    if cand > best[j]:
                        best[j] = cand
                        back[j] = (i, pid)
            # Unknown single-character fallback edge.
            cand = base + self._unk_score
            if cand > best[i + 1]:
                best[i + 1] = cand
                back[i + 1] = (i, self.unk_id)
        ids: List[int] = []
        pos = n
        while pos > 0:
            start, pid = back[pos]
            ids.append(pid)
            pos = start
        ids.reverse()
        # sentencepiece merges consecutive unknown pieces into ONE token.
        merged: List[int] = []
        for pid in ids:
            if pid == self.unk_id and merged and merged[-1] == self.unk_id:
                continue
            merged.append(pid)
        return merged


# ----------------------------------------------------------------------
# SigLIP text contract
# ----------------------------------------------------------------------

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def canonicalize_text(text: str) -> str:
    """big_vision prompt canonicalization (HF ``SiglipTokenizer``):
    strip ASCII punctuation, collapse whitespace."""
    text = text.translate(_PUNCT_TABLE)
    return " ".join(text.split())


class SigLIPSPTokenizer:
    """Checkpoint-exact SigLIP tokenizer over a local ``spiece.model``."""

    name = "siglip-spm"

    def __init__(self, model_path: str, context_length: int = 64):
        with open(model_path, "rb") as f:
            pieces, specials = parse_model(f.read())
        if not pieces:
            raise ValueError(f"{model_path}: no pieces parsed")
        self._enc = UnigramEncoder(pieces, unk_id=specials.get("unk_id", 0))
        surface_to_id = {s: i for i, (s, _, _) in enumerate(pieces)}
        self.eos_id = specials.get("eos_id", surface_to_id.get("</s>", 1))
        # HF SiglipTokenizer: pad_token == "</s>" — pad with EOS, not the
        # TrainerSpec pad_id (often -1 / undefined for these models).
        self.pad_id = self.eos_id
        self.context_length = context_length
        self.vocab_size = len(pieces)

    def encode(self, text: str) -> List[int]:
        """Body ids (no EOS). Mirrors HF ``SiglipTokenizer.tokenize``:
        prepend ▁, canonicalize, NFKC (the models' nmt_nfkc normalizer),
        escape spaces to ▁, Viterbi-segment with the dummy prefix off."""
        text = SPIECE_UNDERLINE + text.replace(SPIECE_UNDERLINE, " ")
        text = canonicalize_text(text)
        text = unicodedata.normalize("NFKC", text)
        return self._enc.encode(text.replace(" ", SPIECE_UNDERLINE))

    def encode_batch(
        self, texts: Sequence[str], max_len: Optional[int] = None
    ) -> np.ndarray:
        max_len = max_len or self.context_length
        ids = np.full((len(texts), max_len), self.pad_id, np.uint32)
        for i, text in enumerate(texts):
            row = self.encode(text)[: max_len - 1] + [self.eos_id]
            ids[i, : len(row)] = row
        return ids
