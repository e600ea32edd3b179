"""Golden tests for the first-party checkpoint-exact tokenizers.

CLIP byte-level BPE is verified token-for-token against
``transformers.CLIPTokenizer`` instantiated from the same tiny fixture
vocab/merges (the HF implementation is the behavioral spec the real
checkpoints were published with). SigLIP SentencePiece-unigram is
verified against hand-derived Viterbi segmentations over a hand-encoded
``spiece.model`` ModelProto (the sentencepiece library is not installed
in this image), plus HF ``SiglipTokenizer`` source semantics for the
canonicalization step."""

import json
import struct

import numpy as np
import pytest

from multimodal_rag_tpu.models.clip_bpe import (
    CLIPBPETokenizer,
    _basic_clean,
    _scan,
    bytes_to_unicode,
)
from multimodal_rag_tpu.models.spm_unigram import (
    SigLIPSPTokenizer,
    UnigramEncoder,
    canonicalize_text,
    parse_model,
)

# ----------------------------------------------------------------------
# CLIP fixtures
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def clip_files(tmp_path_factory):
    """Tiny but complete BPE: every byte symbol (plain and ``</w>``) so no
    text hits UNK — same closure property as the real 49k vocab — plus a
    few merges, with ``<|endoftext|>`` as the highest id (the argmax-EOT
    pooling convention)."""
    d = tmp_path_factory.mktemp("clipvocab")
    symbols = list(bytes_to_unicode().values())
    vocab = {}
    for s in symbols:
        vocab[s] = len(vocab)
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)
    for tok in ("lo", "low", "er</w>", "lower</w>"):
        vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\nl o\nlo w\ne r</w>\nlow er</w>\n", encoding="utf-8"
    )
    return str(d / "vocab.json"), str(d / "merges.txt")


GOLDEN_TEXTS = [
    "lower",
    "Lower LOWER's low!!",
    "a b   c\t\nd",
    "42 pigs",
    "đường phố Việt Nam",  # diacritics preserved (no accent strip)
    "Café au lait",
    "日本語 text",  # CJK isolation
    "semi;colon,comma...dots",
    "it's we're they'll I'd you've I'm don't",
    "",
    "   ",
]


class TestCLIPBPEGolden:
    def test_matches_hf_clip_tokenizer(self, clip_files):
        from transformers import CLIPTokenizer as HFCLIPTokenizer

        vocab, merges = clip_files
        hf = HFCLIPTokenizer(vocab_file=vocab, merges_file=merges)
        mine = CLIPBPETokenizer(vocab, merges)
        for text in GOLDEN_TEXTS:
            expected = hf(text)["input_ids"]
            got = [mine.sot_id] + mine.encode(text) + [mine.eot_id]
            assert got == expected, f"mismatch on {text!r}"

    def test_merges_apply_by_rank(self, clip_files):
        mine = CLIPBPETokenizer(*clip_files)
        assert mine.encode("lower") == [mine.encoder["lower</w>"]]
        assert mine.encode("low") == [
            mine.encoder["lo"],
            mine.encoder["w</w>"],
        ]

    def test_encode_batch_framing(self, clip_files):
        mine = CLIPBPETokenizer(*clip_files, context_length=16)
        ids = mine.encode_batch(["lower", ""])
        assert ids.shape == (2, 16)
        assert ids[0, 0] == mine.sot_id
        assert ids[0, 2] == mine.eot_id
        assert ids[0, 3:].max() == 0  # zero-padded after EOT
        assert ids[1, 0] == mine.sot_id and ids[1, 1] == mine.eot_id
        # EOT is the max id → argmax pooling lands on it.
        assert int(np.argmax(ids[0])) == 2

    def test_truncation(self, clip_files):
        mine = CLIPBPETokenizer(*clip_files, context_length=6)
        ids = mine.encode_batch(["lower lower lower lower lower"])
        assert ids.shape == (1, 6)
        assert ids[0, -1] == mine.eot_id  # EOT always survives

    def test_clean_and_scan_units(self):
        assert _basic_clean("A\x00B\ufffdC") == "abc"  # NUL/U+FFFD dropped
        assert _basic_clean("Hé  \t Lo") == "hé lo"  # accents preserved
        assert _scan("it's low!!") == ["it", "'s", "low", "!!"]
        assert _scan("42x") == ["4", "2", "x"]
        assert _scan("a<|endoftext|>b") == ["a", "<|endoftext|>", "b"]


# ----------------------------------------------------------------------
# SigLIP / SentencePiece fixtures
# ----------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _piece(surface: str, score: float, ptype: int = 1) -> bytes:
    raw = surface.encode("utf-8")
    body = _tag(1, 2) + _varint(len(raw)) + raw
    body += _tag(2, 5) + struct.pack("<f", score)
    if ptype != 1:
        body += _tag(3, 0) + _varint(ptype)
    return _tag(1, 2) + _varint(len(body)) + body


PIECES = [
    ("<unk>", 0.0, 2),       # 0 UNKNOWN
    ("</s>", 0.0, 3),        # 1 CONTROL
    ("▁", -3.0, 1),     # 2 ▁
    ("▁hello", -1.0, 1),
    ("▁world", -1.5, 1),
    ("▁he", -2.0, 1),
    ("llo", -2.5, 1),
    ("o", -3.5, 1),
    ("▁wor", -2.0, 1),
    ("ld", -2.5, 1),
]


@pytest.fixture(scope="module")
def spiece_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("spm")
    blob = b"".join(_piece(*p) for p in PIECES)
    trainer = _tag(40, 0) + _varint(0) + _tag(42, 0) + _varint(1)
    blob += _tag(2, 2) + _varint(len(trainer)) + trainer
    path = d / "spiece.model"
    path.write_bytes(blob)
    return str(path)


class TestSPMUnigram:
    def test_parse_model(self, spiece_file):
        with open(spiece_file, "rb") as f:
            pieces, specials = parse_model(f.read())
        assert len(pieces) == len(PIECES)
        assert pieces[3][0] == "▁hello"
        assert abs(pieces[3][1] - (-1.0)) < 1e-6
        assert pieces[0][2] == 2 and pieces[1][2] == 3
        assert specials == {"unk_id": 0, "eos_id": 1}

    def test_viterbi_picks_max_score_path(self, spiece_file):
        with open(spiece_file, "rb") as f:
            pieces, _ = parse_model(f.read())
        enc = UnigramEncoder(pieces)
        # "▁hello" (-1.0) beats "▁he"+"llo" (-4.5) and char paths.
        assert enc.encode("▁hello▁world") == [3, 4]

    def test_unknowns_merge(self, spiece_file):
        with open(spiece_file, "rb") as f:
            pieces, _ = parse_model(f.read())
        enc = UnigramEncoder(pieces)
        # ζζ has no pieces → two unk edges merged into ONE unk token,
        # exactly as the sentencepiece runtime emits.
        assert enc.encode("▁ζζ▁hello") == [2, 0, 3]

    def test_canonicalize_matches_hf_semantics(self):
        # HF SiglipTokenizer.canonicalize_text: ASCII punctuation removed,
        # whitespace collapsed, stripped — and NO lowercasing (HF stores
        # do_lower_case but never applies it).
        assert canonicalize_text("Hello, world!") == "Hello world"
        assert canonicalize_text("a  b\t\nc") == "a b c"
        assert canonicalize_text("don't-stop_now") == "dontstopnow"

    def test_tokenizer_end_to_end(self, spiece_file):
        tok = SigLIPSPTokenizer(spiece_file, context_length=8)
        assert tok.eos_id == 1 and tok.pad_id == 1
        assert tok.encode("hello, world!") == [3, 4]
        ids = tok.encode_batch(["hello world"])
        assert ids.shape == (1, 8)
        assert list(ids[0]) == [3, 4, 1, 1, 1, 1, 1, 1]
        # Last position is always an EOS-family id → last-pos pooling
        # matches HF SiglipTextModel.
        assert ids[0, -1] == tok.eos_id

    def test_spiece_underline_in_input_becomes_space(self, spiece_file):
        tok = SigLIPSPTokenizer(spiece_file)
        assert tok.encode("hello▁world") == tok.encode("hello world")

    def test_truncation_keeps_eos(self, spiece_file):
        tok = SigLIPSPTokenizer(spiece_file, context_length=2)
        ids = tok.encode_batch(["hello world hello world"])
        assert ids.shape == (1, 2)
        assert ids[0, -1] == tok.eos_id


# ----------------------------------------------------------------------
# Encoder wiring: checkpoint dir with tokenizer files → real tokenizer
# ----------------------------------------------------------------------


class TestEncoderWiring:
    def test_clip_encoder_picks_bpe(self, clip_files, tmp_path):
        import shutil

        from multimodal_rag_tpu.models.clip import CLIPEncoder

        vocab, merges = clip_files
        shutil.copy(vocab, tmp_path / "vocab.json")
        shutil.copy(merges, tmp_path / "merges.txt")
        enc = CLIPEncoder(checkpoint_path=str(tmp_path))
        assert enc.tokenizer.name == "clip-bpe"
        out = enc.encode_texts(["lower low"])
        assert out.shape == (1, enc.cfg.embed_dim)

    def test_siglip_encoder_picks_spm(self, spiece_file, tmp_path):
        import shutil

        from multimodal_rag_tpu.models.siglip import SigLIPEncoder

        shutil.copy(spiece_file, tmp_path / "spiece.model")
        enc = SigLIPEncoder(checkpoint_path=str(tmp_path))
        assert enc.tokenizer.name == "siglip-spm"
        out = enc.encode_texts(["hello world"])
        assert out.shape == (1, enc.cfg.embed_dim)

    def test_hashing_fallback_without_files(self, tmp_path):
        from multimodal_rag_tpu.models.clip import CLIPEncoder

        enc = CLIPEncoder(checkpoint_path=str(tmp_path))
        assert enc.tokenizer.name != "clip-bpe"
