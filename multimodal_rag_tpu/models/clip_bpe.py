"""First-party byte-level BPE tokenizer for the CLIP text tower.

The reference declares ``CLIP_MODEL`` but never consumes it
(``/root/reference/config.py:106``); this build made the cross-modal axis
real, and with real checkpoint weights the text side must use the
checkpoint's own vocabulary — a hashing tokenizer produces arbitrary ids
and semantically meaningless text→image retrieval.

This module implements the exact encoding contract of HF's
``CLIPTokenizer`` *without ftfy* (the configuration this environment and
most servers run): BERT-style text cleanup (control-char strip,
CJK isolation, NFC, lowercase — no accent stripping, no punctuation
splitting), the CLIP word-scan regex
(``'s|'t|'re|'ve|'m|'ll|'d | letters+ | digit | punct-run``), GPT-2
byte→unicode remapping, and greedy lowest-rank pair merging with the
``</w>`` end-of-word marker. Pure stdlib — same offline posture as
``tokenizer.WordPieceTokenizer``.

Framing follows OpenAI's reference ``clip.tokenize``: ``SOT body EOT``
zero-padded to the context length. The text tower pools at
``argmax(ids)`` (= EOT, the highest id), so zero padding after EOT is
invisible to the pooled representation under the causal mask.

Golden-tested against ``transformers.CLIPTokenizer`` on fixture
vocab/merges in ``tests/test_subword_tokenizers.py``.
"""

from __future__ import annotations

import json
import unicodedata
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_SPECIALS = ("<|startoftext|>", "<|endoftext|>")


@lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte→printable-unicode map (the BPE alphabet)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _is_letter(ch: str) -> bool:
    return unicodedata.category(ch).startswith("L")


def _is_number(ch: str) -> bool:
    return unicodedata.category(ch).startswith("N")


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _basic_clean(text: str) -> str:
    """HF ``BasicTokenizer(strip_accents=False, do_split_on_punc=False)``:
    drop NUL/replacement/control chars, whitespace → single spaces, CJK
    chars isolated, NFC normalize, lowercase. Accents are preserved
    (Vietnamese diacritics survive)."""
    out: List[str] = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        if ch.isspace():
            out.append(" ")
        elif _is_cjk(cp):
            out.append(f" {ch} ")
        else:
            out.append(ch)
    text = unicodedata.normalize("NFC", "".join(out))
    return " ".join(t.lower() for t in text.split())


def _scan(text: str) -> List[str]:
    """CLIP's word-scan regex as an explicit left-to-right scanner:
    ``special | 's 't 're 've 'm 'll 'd | \\p{L}+ | \\p{N} |
    [^\\s\\p{L}\\p{N}]+`` — first alternative wins at each position,
    character classes consume greedily."""
    tokens: List[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        special = next(
            (s for s in _SPECIALS if text.startswith(s, i)), None
        )
        if special is not None:
            tokens.append(special)
            i += len(special)
            continue
        if ch == "'":
            pair = text[i + 1 : i + 3].lower()
            if pair[:1] in ("s", "t", "m", "d"):
                tokens.append(text[i : i + 2])
                i += 2
                continue
            if pair in ("re", "ve", "ll"):
                tokens.append(text[i : i + 3])
                i += 3
                continue
        if _is_letter(ch):
            j = i + 1
            while j < n and _is_letter(text[j]):
                j += 1
            tokens.append(text[i:j])
            i = j
            continue
        if _is_number(ch):
            tokens.append(ch)
            i += 1
            continue
        j = i + 1
        while j < n and not (
            text[j].isspace() or _is_letter(text[j]) or _is_number(text[j])
        ):
            j += 1
        tokens.append(text[i:j])
        i = j
    return tokens


class CLIPBPETokenizer:
    """Byte-level BPE over a checkpoint's ``vocab.json`` + ``merges.txt``
    (the files shipped alongside every openai/clip-vit snapshot)."""

    name = "clip-bpe"

    def __init__(
        self,
        vocab_path: str,
        merges_path: str,
        context_length: int = 77,
    ):
        with open(vocab_path, encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            # Skip the "#version" header; cap at CLIP's merge count
            # (matches HF's slice [1 : 49152-256-2+1]).
            lines = f.read().strip().split("\n")[1 : 49152 - 256 - 2 + 1]
        self.bpe_ranks: Dict[Tuple[str, str], int] = {
            tuple(line.split()): rank for rank, line in enumerate(lines)
        }
        self.byte_encoder = bytes_to_unicode()
        self.context_length = context_length
        self.vocab_size = len(self.encoder)
        self.sot_id = self.encoder["<|startoftext|>"]
        self.eot_id = self.encoder["<|endoftext|>"]
        self.unk_id = self.eot_id  # HF CLIP: unk_token == <|endoftext|>
        self._cache: Dict[str, List[str]] = {
            s: [s] for s in _SPECIALS
        }

    def _bpe(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            self._cache[token] = list(word)
            return list(word)
        while len(word) > 1:
            pairs = {
                (word[k], word[k + 1]) for k in range(len(word) - 1)
            }
            best = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            k = 0
            while k < len(word):
                if (
                    k < len(word) - 1
                    and word[k] == first
                    and word[k + 1] == second
                ):
                    merged.append(first + second)
                    k += 2
                else:
                    merged.append(word[k])
                    k += 1
            word = tuple(merged)
        out = list(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        """Body token ids (no SOT/EOT framing)."""
        ids: List[int] = []
        for token in _scan(_basic_clean(text)):
            if token in _SPECIALS:
                ids.append(self.encoder[token])
                continue
            mapped = "".join(
                self.byte_encoder[b] for b in token.encode("utf-8")
            )
            ids.extend(
                self.encoder.get(piece, self.unk_id)
                for piece in self._bpe(mapped)
            )
        return ids

    def encode_batch(
        self, texts: Sequence[str], max_len: Optional[int] = None
    ) -> np.ndarray:
        max_len = max_len or self.context_length
        ids = np.zeros((len(texts), max_len), np.uint32)
        for i, text in enumerate(texts):
            body = self.encode(text)[: max_len - 2]
            row = [self.sot_id] + body + [self.eot_id]
            ids[i, : len(row)] = row
        return ids
