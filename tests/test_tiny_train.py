"""Tiny-LM training recipe (tools/train_tiny.py, VERDICT r4 #5).

The recipe is the committed artifact (the ~45 MB checkpoint is not), so
these tests pin what consumers rely on: the loss actually falls, the
quote-row framing is a verbatim span from inside its own context, the
checkpoint round-trips bit-for-bit through the npz format, and
`train_or_load` trains-then-caches. Training here uses a micro config
(2 layers, d=64) for a few steps — the CI-speed twin of the real ~11M
recipe, same code path.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from multimodal_rag_tpu.models.decoder import DecoderConfig
from multimodal_rag_tpu.models.tokenizer import ByteTokenizer
from multimodal_rag_tpu.tools.train_tiny import (
    QUOTE_SEP,
    _quote_row,
    build_corpus,
    load_tiny_lm,
    save_tiny_lm,
    train_or_load,
    train_tiny_lm,
)

MICRO = DecoderConfig(
    vocab_size=384,
    hidden_dim=64,
    num_layers=2,
    num_heads=2,
    num_kv_heads=1,
    head_dim=32,
    ff_dim=192,
    max_position=512,
    tie_embeddings=True,
)


class TestCorpusAndFraming:
    def test_build_corpus_nonempty_bytes(self):
        corpus = build_corpus()
        assert isinstance(corpus, bytes)
        assert len(corpus) > 50_000  # repo docs are ~110 KB

    def test_quote_row_is_verbatim_span(self):
        tok = ByteTokenizer()
        data = np.frombuffer(build_corpus(), np.uint8).astype(np.int32)
        data = data + tok._OFFSET
        rng = np.random.default_rng(3)
        seq_len = 256
        row = _quote_row(data, rng, seq_len, tok)
        assert row.shape == (seq_len,)
        assert row[0] == tok.bos_id
        sep = np.asarray(tok.encode(QUOTE_SEP)[1:], np.int32)
        ctx_len = (seq_len * 5) // 8
        ctx = row[1:1 + ctx_len]
        quoted = row[1 + ctx_len + len(sep):]
        # The separator sits between context and quote...
        np.testing.assert_array_equal(
            row[1 + ctx_len:1 + ctx_len + len(sep)], sep
        )
        # ...and the quote is a verbatim span from INSIDE the context.
        q = quoted.tolist()
        c = ctx.tolist()
        assert any(
            c[i:i + len(q)] == q for i in range(len(c) - len(q) + 1)
        )


class TestTrainingAndCheckpoint:
    @pytest.fixture(scope="class")
    def trained(self):
        params, meta = train_tiny_lm(
            cfg=MICRO, steps=30, batch=4, seq_len=128, log_every=0
        )
        return params, meta

    def test_loss_falls(self, trained):
        _, meta = trained
        # ln(259) ≈ 5.56 at init; even 30 micro steps cut it well below.
        assert meta["first_loss"] > meta["final_loss"]
        assert meta["final_loss"] < meta["first_loss"] - 0.5

    def test_checkpoint_roundtrip_bitexact(self, trained, tmp_path):
        params, meta = trained
        path = save_tiny_lm(str(tmp_path / "ckpt"), params, MICRO, meta)
        params2, cfg2, meta2 = load_tiny_lm(path)
        assert cfg2 == MICRO
        assert meta2["final_loss"] == meta["final_loss"]
        flat1 = jax.tree.leaves(params)
        flat2 = jax.tree.leaves(params2)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_or_load_caches(self, trained, tmp_path):
        params, meta = trained
        path = str(tmp_path / "cache_ckpt")
        save_tiny_lm(path, params, MICRO, meta)
        # Existing checkpoint: loads without retraining (instant).
        p2, cfg2, meta2 = load_tiny_lm(path)
        p3, cfg3, meta3 = train_or_load(path)
        assert meta3 == meta2
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(p3)[0]),
            np.asarray(jax.tree.leaves(p2)[0]),
        )

    def test_trained_params_serve_in_decoder(self, trained):
        """The checkpoint drops into the serving forward unchanged."""
        from multimodal_rag_tpu.models.decoder import generate_tokens

        params, _ = trained
        tok = ByteTokenizer()
        ids = np.asarray([tok.encode("the framework ")], np.int32)
        mask = np.ones_like(ids)
        out, lengths = generate_tokens(
            params, jnp.asarray(ids), jnp.asarray(mask),
            jax.random.key(0), MICRO, 8, temperature=0.0,
        )
        out = np.asarray(out)
        assert out.shape == (1, 8)
        # Greedy ids must be in-vocab; the pad rows (>=259) train toward
        # -inf priors, but a 30-step micro model may not have buried them
        # yet — only require valid vocab range here.
        assert (out[0] >= -1).all() and (out[0] < MICRO.vocab_size).all()
