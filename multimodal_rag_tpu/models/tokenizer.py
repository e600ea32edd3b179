"""Host-side tokenization for the text encoders.

The reference delegates tokenization to sentence-transformers/HF
(``app/utils/embedder.py:245-248``). Here tokenization is an explicit host
stage feeding fixed-shape ``(ids, mask)`` batches to the TPU encoder.

Two backends:

* ``HFTokenizer`` — wraps a ``tokenizers``-library tokenizer.json (exact
  WordPiece parity with all-MiniLM-L6-v2) when a local tokenizer file is
  available (``MMRAG_TOKENIZER_PATH`` env or an HF cache hit). No network.
* ``HashingTokenizer`` — fully deterministic offline fallback: BERT-style
  basic tokenization (lowercase, accent strip, punctuation split, CJK
  isolation) followed by FNV-1a hashing of whole words and word-suffix
  pieces into the WordPiece id space. Same special-token conventions as
  BERT/MiniLM (PAD=0, UNK=100, CLS=101, SEP=102, vocab 30522) so tensor
  shapes, masking, and downstream kernels behave identically to the real
  vocabulary.

Both produce ``uint32`` ids and ``int32`` masks padded to a caller-chosen
length, ready for bucketing (see ``models.minilm.bucket_for``).
"""

from __future__ import annotations

import os
import unicodedata
from typing import List, Optional, Sequence, Tuple

import numpy as np

VOCAB_SIZE = 30522
PAD_ID = 0
UNK_ID = 100
CLS_ID = 101
SEP_ID = 102
# Hashed ids live above the special/reserved band of the BERT vocab.
_HASH_LO = 999
_HASH_SPAN = VOCAB_SIZE - _HASH_LO


def _fnv1a(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (
        (33 <= cp <= 47)
        or (58 <= cp <= 64)
        or (91 <= cp <= 96)
        or (123 <= cp <= 126)
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0xF900 <= cp <= 0xFAFF
        or 0x20000 <= cp <= 0x2A6DF
    )


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    """BERT-style basic tokenizer: NFD accent stripping, lowercasing,
    punctuation splitting, CJK character isolation."""
    if lowercase:
        text = text.lower()
    text = unicodedata.normalize("NFD", text)
    out: List[str] = []
    word: List[str] = []

    def flush() -> None:
        if word:
            out.append("".join(word))
            word.clear()

    for ch in text:
        if unicodedata.category(ch) == "Mn":
            continue  # strip combining accents
        if ch.isspace():
            flush()
        elif _is_punct(ch) or _is_cjk(ch):
            flush()
            out.append(ch)
        else:
            word.append(ch)
    flush()
    return out


class HashingTokenizer:
    """Deterministic WordPiece-shaped hashing tokenizer (offline fallback).

    Each basic token maps to 1-3 ids: a whole-word hash, plus hashes of a
    leading 4-char piece and trailing suffix for words longer than 6 chars —
    a crude sub-word signal that keeps sequence-length statistics close to
    real WordPiece output.
    """

    name = "hashing-wordpiece"

    def __init__(self, vocab_size: int = VOCAB_SIZE, lowercase: bool = True):
        self.vocab_size = vocab_size
        self.lowercase = lowercase
        lo = _HASH_LO if vocab_size > 2 * _HASH_LO else SEP_ID + 1
        self._lo = lo
        self._span = vocab_size - lo

    def _hash(self, piece: str) -> int:
        return self._lo + _fnv1a(piece.encode("utf-8")) % self._span

    def tokenize_ids(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in basic_tokenize(text, self.lowercase):
            if len(word) > 6:
                ids.append(self._hash(word[:4]))
                ids.append(self._hash("##" + word[4:]))
            else:
                ids.append(self._hash(word))
        return ids

    def encode_batch(
        self, texts: Sequence[str], max_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (ids[B, max_len] uint32, mask[B, max_len] int32), CLS…SEP framed."""
        batch = len(texts)
        ids = np.full((batch, max_len), PAD_ID, dtype=np.uint32)
        mask = np.zeros((batch, max_len), dtype=np.int32)
        for i, text in enumerate(texts):
            body = self.tokenize_ids(text)[: max_len - 2]
            row = [CLS_ID] + body + [SEP_ID]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask


class WordPieceTokenizer:
    """First-party WordPiece: greedy longest-match against a ``vocab.txt``
    (BERT distribution format, one piece per line, ``##`` continuations).

    Matches HF ``BertTokenizer`` semantics for the MiniLM family: basic
    whitespace/punctuation/CJK pre-tokenization (``basic_tokenize``),
    longest-prefix matching with a 200-char word cap, and ``[UNK]`` for
    words with no decomposition. No torch / tokenizers dependency — the
    exact-vocab path when only a vocab.txt ships with a checkpoint
    (SURVEY.md §7 hard part 7)."""

    name = "wordpiece"
    MAX_WORD_CHARS = 200

    def __init__(self, vocab_path: str, lowercase: bool = True):
        self.lowercase = lowercase
        self.vocab: dict = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.vocab_size = len(self.vocab)
        self.unk_id = self.vocab.get("[UNK]", UNK_ID)
        self.cls_id = self.vocab.get("[CLS]", CLS_ID)
        self.sep_id = self.vocab.get("[SEP]", SEP_ID)
        self.pad_id = self.vocab.get("[PAD]", PAD_ID)

    def _word_pieces(self, word: str) -> List[int]:
        if len(word) > self.MAX_WORD_CHARS:
            return [self.unk_id]
        pieces: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]  # no decomposition: whole word is UNK
            pieces.append(cur)
            start = end
        return pieces

    def tokenize_ids(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in basic_tokenize(text, self.lowercase):
            ids.extend(self._word_pieces(word))
        return ids

    def encode_batch(
        self, texts: Sequence[str], max_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        batch = len(texts)
        ids = np.full((batch, max_len), self.pad_id, dtype=np.uint32)
        mask = np.zeros((batch, max_len), dtype=np.int32)
        for i, text in enumerate(texts):
            body = self.tokenize_ids(text)[: max_len - 2]
            row = [self.cls_id] + body + [self.sep_id]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask


class HFTokenizer:
    """Exact-vocabulary tokenizer via the ``tokenizers`` library.

    Used when a local ``tokenizer.json`` exists (no network fetch);
    produces the same (ids, mask) contract as ``HashingTokenizer``.
    """

    name = "hf-wordpiece"

    def __init__(self, tokenizer_file: str):
        from tokenizers import Tokenizer  # local import: optional path

        self._tok = Tokenizer.from_file(tokenizer_file)
        self.vocab_size = self._tok.get_vocab_size()

    def encode_batch(
        self, texts: Sequence[str], max_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        batch = len(texts)
        ids = np.full((batch, max_len), PAD_ID, dtype=np.uint32)
        mask = np.zeros((batch, max_len), dtype=np.int32)
        encodings = self._tok.encode_batch(list(texts))
        for i, enc in enumerate(encodings):
            row = enc.ids[: max_len - 1]
            if not row or row[0] != CLS_ID:
                row = [CLS_ID] + row[: max_len - 2]
            if row[-1] != SEP_ID:
                row = row[: max_len - 1] + [SEP_ID]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask


class ByteTokenizer:
    """Reversible UTF-8 byte tokenizer for the decoder's offline fallback.

    The encoder-side ``HashingTokenizer`` is deliberately one-way (ids only
    feed an embedding gather); generation needs to map ids *back* to text,
    so this vocabulary is the 256 byte values plus PAD/BOS/EOS. Real
    deployments load the checkpoint's own BPE via
    :func:`load_decoder_tokenizer`; this keeps tests and random-init perf
    runs hermetic and round-trippable.
    """

    name = "byte"
    pad_id, bos_id, eos_id = 0, 1, 2
    _OFFSET = 3

    def __init__(self) -> None:
        self.vocab_size = 256 + self._OFFSET

    def encode(self, text: str) -> List[int]:
        return [self.bos_id] + [
            b + self._OFFSET for b in text.encode("utf-8")
        ]

    def decode(self, ids: Sequence[int]) -> str:
        # Ids past the byte range (a random-init model padded to a larger
        # vocab can sample them) are dropped like specials.
        data = bytes(
            i - self._OFFSET
            for i in ids
            if self._OFFSET <= i < self._OFFSET + 256
        )
        return data.decode("utf-8", errors="replace")


class HFDecoderTokenizer:
    """Checkpoint-exact BPE for generation via the ``tokenizers`` library
    (present through the baked-in transformers install). Provides the
    ``encode``/``decode``/``eos_id`` surface :class:`TextDecoder` expects."""

    name = "hf-bpe"

    def __init__(self, tokenizer_file: str, bos_id=None, eos_id=None):
        from tokenizers import Tokenizer  # local import: optional path

        self._tok = Tokenizer.from_file(tokenizer_file)
        self.vocab_size = self._tok.get_vocab_size()
        vocab = self._tok.get_vocab()

        def find(*names):
            for n in names:
                if n in vocab:
                    return vocab[n]
            return None

        # BOS: only tokens that are actually beginnings-of-sequence — no
        # '<|endoftext|>' fallback (Qwen2 has it in-vocab but its HF
        # tokenizer adds no BOS; prepending it would skew every prompt).
        self.bos_id = bos_id if bos_id is not None else find(
            "<s>", "<bos>", "<|begin_of_text|>"
        )
        # EOS: chat-turn terminators FIRST — Qwen2-Instruct emits
        # '<|im_end|>' to stop, not '<|endoftext|>'; with the wrong pick
        # generation never matches EOS and always runs the full budget.
        self.eos_id = eos_id if eos_id is not None else find(
            "<|im_end|>", "</s>", "<eos>", "<|end_of_text|>", "<|endoftext|>"
        )
        if self.eos_id is None:
            self.eos_id = -1  # generation runs to the token budget

    def encode(self, text: str) -> List[int]:
        ids = self._tok.encode(text, add_special_tokens=False).ids
        if self.bos_id is not None and (not ids or ids[0] != self.bos_id):
            ids = [self.bos_id] + ids
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=True)


def load_decoder_tokenizer(checkpoint_path: str):
    """Find the tokenizer.json shipped with a decoder checkpoint (same
    directory, or its parent for a bare safetensors file). Returns an
    :class:`HFDecoderTokenizer`, or ``None`` when the snapshot has no
    tokenizer — the caller falls back to :class:`ByteTokenizer`."""
    base = (
        checkpoint_path
        if os.path.isdir(checkpoint_path)
        else os.path.dirname(checkpoint_path)
    )
    cand = os.path.join(base, "tokenizer.json")
    if not os.path.exists(cand):
        return None
    try:
        return HFDecoderTokenizer(cand)
    except Exception:  # noqa: BLE001 — malformed file → hermetic fallback
        return None


def tokenizer_from_dir(path: str):
    """Checkpoint-exact encoder tokenizer from the snapshot directory a
    safetensors file lives in (tokenizer.json preferred, vocab.txt
    fallback). Returns None when neither ships — the caller falls back to
    :func:`get_tokenizer`'s cache-scan/hashing chain. This is what makes
    non-MiniLM families (BGE/E5/GTE) tokenize with their own vocab: the
    global ``find_local_tokenizer`` scan is MiniLM-pinned by design."""
    base = path if os.path.isdir(path) else os.path.dirname(path)
    cand = os.path.join(base, "tokenizer.json")
    if os.path.exists(cand):
        try:
            return HFTokenizer(cand)
        except Exception:  # noqa: BLE001 — malformed file → next option
            pass
    cand = os.path.join(base, "vocab.txt")
    if os.path.exists(cand):
        try:
            return WordPieceTokenizer(cand)
        except Exception:  # noqa: BLE001
            pass
    return None


def find_local_tokenizer() -> Optional[str]:
    """Look for a tokenizer.json or vocab.txt without touching the network."""
    cand = os.environ.get("MMRAG_TOKENIZER_PATH")
    if cand and os.path.exists(cand):
        return cand
    hub = os.path.expanduser("~/.cache/huggingface/hub")
    if os.path.isdir(hub):
        for name in ("tokenizer.json", "vocab.txt"):
            for root, _dirs, files in os.walk(hub):
                if name in files and "MiniLM" in root:
                    return os.path.join(root, name)
    return None


def get_tokenizer(vocab_size: int = VOCAB_SIZE):
    """Best available tokenizer: exact vocab if local (tokenizer.json via
    the ``tokenizers`` lib, else the first-party WordPiece over vocab.txt),
    hashing otherwise.

    ``vocab_size`` must match the encoder's embedding table — hashed ids are
    generated in-range so gathers never clamp.
    """
    if vocab_size == VOCAB_SIZE:
        path = find_local_tokenizer()
        if path:
            try:
                if path.endswith("vocab.txt"):
                    return WordPieceTokenizer(path)
                return HFTokenizer(path)
            except Exception:  # fall through to the deterministic backend
                pass
    return HashingTokenizer(vocab_size=vocab_size)
