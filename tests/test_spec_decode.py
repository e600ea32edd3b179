"""Prompt-lookup speculative decoding tests (models/spec_decode.py).

The load-bearing properties:

* ``decode_verify`` must produce bit-identical logits to the sequential
  ``decode_step`` chain — a wrong chunk mask, RoPE position, or cache
  scatter silently corrupts generation and nothing else would catch it.
* greedy speculative generation must EQUAL the sequential greedy loop
  token-for-token (acceptance is exact equality; a mismatch emits the
  model's own argmax) — including EOS early exit and budget clamping.
* the sampled path with a deterministic nucleus (top_p → single
  survivor) must also equal greedy — this drives the rejection/accept
  arithmetic through a case with a known answer.
"""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    decode_step,
    decode_verify,
    generate_tokens,
    init_params,
    prefill,
)
from multimodal_rag_tpu.models.spec_decode import (
    _propose_ngram,
    generate_tokens_spec,
)

TINY = DecoderConfig(
    vocab_size=97,
    hidden_dim=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    ff_dim=64,
    max_position=64,
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(jax.random.key(0), TINY)


class TestDecodeVerify:
    def test_matches_sequential_decode(self, tiny_params):
        """One T-token verify chunk == T sequential decode steps."""
        rng = np.random.default_rng(0)
        B, P, T = 2, 8, 5
        S_max = P + T + 2
        prompt = rng.integers(3, TINY.vocab_size, (B, P)).astype(np.int32)
        chunk = rng.integers(3, TINY.vocab_size, (B, T)).astype(np.int32)
        mask = np.ones((B, P), np.int32)
        mask[1, :2] = 0  # row 1 left-padded
        prompt[1, :2] = 0
        prompt_len = mask.sum(axis=1).astype(np.int32)

        _, cache_seq = prefill(
            tiny_params, jnp.asarray(prompt), jnp.asarray(mask), TINY, S_max
        )
        key_mask = np.zeros((B, S_max), np.int32)
        key_mask[:, :P] = mask
        seq_logits = []
        km = jnp.asarray(key_mask)
        for t in range(T):
            pos = P + t
            km = km.at[:, pos].set(1)
            logits, cache_seq = decode_step(
                tiny_params, cache_seq, jnp.asarray(chunk[:, t]), pos, km,
                jnp.asarray(prompt_len + t), TINY,
            )
            seq_logits.append(np.asarray(logits))
        want = np.stack(seq_logits, axis=1)  # (B, T, V)

        _, cache_chunk = prefill(
            tiny_params, jnp.asarray(prompt), jnp.asarray(mask), TINY, S_max
        )
        got, cache_chunk = decode_verify(
            tiny_params, cache_chunk, jnp.asarray(chunk),
            jnp.full((B,), P, jnp.int32), jnp.asarray(key_mask),
            jnp.asarray(prompt_len), TINY,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-5)

    def test_per_row_positions(self, tiny_params):
        """Rows at different cache depths verify correctly (the
        continuous-batching-style per-row pos0)."""
        rng = np.random.default_rng(1)
        B, P, T = 2, 6, 3
        S_max = P + 8
        prompt = rng.integers(3, TINY.vocab_size, (B, P)).astype(np.int32)
        mask = np.ones((B, P), np.int32)
        chunk = rng.integers(3, TINY.vocab_size, (B, T)).astype(np.int32)
        extra = rng.integers(3, TINY.vocab_size, (1,)).astype(np.int32)

        # Row 0 advanced one step past prefill; row 1 fresh.
        _, cache = prefill(
            tiny_params, jnp.asarray(prompt), jnp.asarray(mask), TINY, S_max
        )
        km = np.zeros((B, S_max), np.int32)
        km[:, :P] = 1
        km0 = jnp.asarray(km).at[0, P].set(1)
        tok = jnp.asarray([int(extra[0]), 0], jnp.int32)
        # Advance only row 0 (row 1's write lands in an unmarked slot that
        # its own verify chunk will overwrite — same as serving).
        logits_r0, cache = decode_step(
            tiny_params, cache, tok, P, km0,
            jnp.asarray([P, 0], jnp.int32), TINY,
        )

        pos0 = jnp.asarray([P + 1, P], jnp.int32)
        positions0 = jnp.asarray([P + 1, P], jnp.int32)
        got, _ = decode_verify(
            tiny_params, cache, jnp.asarray(chunk), pos0, km0,
            positions0, TINY,
        )

        # Oracle for row 1: plain chunk right after prefill.
        _, cache1 = prefill(
            tiny_params, jnp.asarray(prompt), jnp.asarray(mask), TINY, S_max
        )
        want1, _ = decode_verify(
            tiny_params, cache1, jnp.asarray(chunk),
            jnp.full((B,), P, jnp.int32), jnp.asarray(km),
            jnp.full((B,), P, jnp.int32), TINY,
        )
        np.testing.assert_allclose(
            np.asarray(got)[1], np.asarray(want1)[1], rtol=2e-5, atol=2e-5
        )


def _greedy_plain(params, ids, mask, max_new, eos_id=-1):
    toks, lengths = generate_tokens(
        params, jnp.asarray(ids), jnp.asarray(mask), jax.random.key(0),
        TINY, max_new_tokens=max_new, temperature=0.0, eos_id=eos_id,
    )
    return np.asarray(toks), np.asarray(lengths)


def _greedy_spec(params, ids, mask, max_new, eos_id=-1, spec_k=4):
    toks, lengths, row_iters = generate_tokens_spec(
        params, jnp.asarray(ids), jnp.asarray(mask), jax.random.key(0),
        TINY, max_new_tokens=max_new, temperature=0.0, eos_id=eos_id,
        spec_k=spec_k,
    )
    # Batch device cost = passes the slowest row was live for.
    return np.asarray(toks), np.asarray(lengths), int(np.max(row_iters))


class TestGreedyEquivalence:
    def _prompts(self, seed=0, B=2, P=10):
        rng = np.random.default_rng(seed)
        ids = rng.integers(3, TINY.vocab_size, (B, P)).astype(np.int32)
        mask = np.ones((B, P), np.int32)
        mask[1, :3] = 0
        ids[1, :3] = 0
        return ids, mask

    def test_matches_sequential(self, tiny_params):
        ids, mask = self._prompts()
        want, want_len = _greedy_plain(tiny_params, ids, mask, 16)
        got, got_len, iters = _greedy_spec(tiny_params, ids, mask, 16)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got_len, want_len)
        assert 1 <= iters <= 16

    def test_eos_early_exit(self, tiny_params):
        """Pick the greedy run's own 5th token as EOS: both loops must
        stop at the same place."""
        ids, mask = self._prompts(seed=1)
        plain, _ = _greedy_plain(tiny_params, ids, mask, 16)
        eos = int(plain[0, 5])
        want, want_len = _greedy_plain(tiny_params, ids, mask, 16, eos_id=eos)
        got, got_len, _ = _greedy_spec(tiny_params, ids, mask, 16, eos_id=eos)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got_len, want_len)

    def test_budget_exact(self, tiny_params):
        """A budget that lands mid-chunk must clamp identically."""
        ids, mask = self._prompts(seed=2)
        for max_new in (3, 7, 9):
            want, _ = _greedy_plain(tiny_params, ids, mask, max_new)
            got, _, _ = _greedy_spec(
                tiny_params, ids, mask, max_new, spec_k=4
            )
            np.testing.assert_array_equal(got, want)

    def test_spec_k_variants(self, tiny_params):
        ids, mask = self._prompts(seed=3)
        want, _ = _greedy_plain(tiny_params, ids, mask, 12)
        for k in (1, 2, 7):
            got, _, _ = _greedy_spec(tiny_params, ids, mask, 12, spec_k=k)
            np.testing.assert_array_equal(got, want)


class TestSampledPath:
    def test_deterministic_nucleus_equals_greedy(self, tiny_params):
        """top_p below the top token's probability keeps exactly one
        survivor, so the sampled accept/reject path must reproduce the
        greedy sequence (drives the rejection arithmetic end-to-end)."""
        rng = np.random.default_rng(4)
        ids = rng.integers(3, TINY.vocab_size, (2, 8)).astype(np.int32)
        mask = np.ones((2, 8), np.int32)
        want, want_len = _greedy_plain(tiny_params, ids, mask, 12)
        got, got_len, _ = np.asarray(
            generate_tokens_spec(
                tiny_params, jnp.asarray(ids), jnp.asarray(mask),
                jax.random.key(7), TINY, max_new_tokens=12,
                temperature=1.0, top_p=1e-6, spec_k=4,
            )[0]
        ), None, None
        np.testing.assert_array_equal(got, want)

    def test_sampled_reproducible_and_in_vocab(self, tiny_params):
        rng = np.random.default_rng(5)
        ids = rng.integers(3, TINY.vocab_size, (2, 8)).astype(np.int32)
        mask = np.ones((2, 8), np.int32)
        a = np.asarray(generate_tokens_spec(
            tiny_params, jnp.asarray(ids), jnp.asarray(mask),
            jax.random.key(3), TINY, max_new_tokens=10,
            temperature=0.7, spec_k=4,
        )[0])
        b = np.asarray(generate_tokens_spec(
            tiny_params, jnp.asarray(ids), jnp.asarray(mask),
            jax.random.key(3), TINY, max_new_tokens=10,
            temperature=0.7, spec_k=4,
        )[0])
        np.testing.assert_array_equal(a, b)
        assert (a >= -1).all() and (a < TINY.vocab_size).all()


class TestTextDecoderWiring:
    def _decoders(self):
        from multimodal_rag_tpu.models.decoder import TextDecoder

        params = init_params(jax.random.key(0), TINY)
        mk = lambda spec: TextDecoder(  # noqa: E731
            params=params, cfg=TINY, prompt_buckets=(16, 32),
            batch_buckets=(1, 4), speculative=spec, spec_k=4,
        )
        return mk(False), mk(True)

    def test_generate_greedy_identical_and_stats_counted(self):
        plain, spec = self._decoders()
        prompts = ["hello world machine learning", "a b"]
        want = plain.generate(prompts, max_new_tokens=12, temperature=0.0)
        got = spec.generate(prompts, max_new_tokens=12, temperature=0.0)
        assert got == want
        assert spec.spec_iters >= 1
        assert spec.spec_emitted >= 1
        assert plain.spec_iters == 0

    def test_adapter_spec_stats(self):
        from multimodal_rag_tpu.models.adapters.tpu_llm import TPULLMAdapter

        _, spec = self._decoders()
        adapter = TPULLMAdapter(decoder=spec)

        async def drive():
            await adapter.initialize()
            out = await adapter.generate_text(
                "hi", max_tokens=8, temperature=0.0
            )
            stats = adapter.spec_stats
            await adapter.cleanup()
            return out, stats

        out, stats = asyncio.get_event_loop_policy().new_event_loop(
        ).run_until_complete(drive())
        assert isinstance(out, str)
        assert stats["enabled"] is True
        assert stats["verify_steps"] >= 1
        assert stats["tokens_per_step"] >= 1.0

    def test_adapter_stats_none_when_disabled(self):
        from multimodal_rag_tpu.models.adapters.tpu_llm import TPULLMAdapter

        plain, _ = self._decoders()
        adapter = TPULLMAdapter(decoder=plain)
        assert adapter.spec_stats is None


class TestProposal:
    def test_finds_last_bigram_continuation(self):
        # seq: ... [5 6] 7 8 ... [5 6] 9 1 ...  with (prev, cur) = (5, 6)
        seq = jnp.asarray(
            [[5, 6, 7, 8, 2, 5, 6, 9, 1, 3, 0, 0]], jnp.int32
        )
        valid = jnp.asarray([[1] * 10 + [0, 0]], jnp.int32)
        draft = _propose_ngram(
            seq, valid, jnp.asarray([5], jnp.int32),
            jnp.asarray([6], jnp.int32), 3,
        )
        # Last match at t=6 → continuation 9, 1, 3.
        np.testing.assert_array_equal(np.asarray(draft), [[9, 1, 3]])

    def test_no_match_is_harmless_shape(self):
        seq = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        valid = jnp.ones((1, 4), jnp.int32)
        draft = _propose_ngram(
            seq, valid, jnp.asarray([9], jnp.int32),
            jnp.asarray([9], jnp.int32), 2,
        )
        assert draft.shape == (1, 2)

    def test_wraparound_slot0_excluded(self):
        # cur at slot 0 must not match "prev at slot -1" (roll wraps).
        seq = jnp.asarray([[6, 1, 2, 5]], jnp.int32)  # prev=5 wraps to t=0
        valid = jnp.ones((1, 4), jnp.int32)
        draft = _propose_ngram(
            seq, valid, jnp.asarray([5], jnp.int32),
            jnp.asarray([6], jnp.int32), 2,
        )
        # No legitimate match → the junk draft must NOT be t=0's
        # continuation [1, 2]; that would mean the wrap matched. (The
        # exact junk value is unspecified — verification rejects it.)
        assert np.asarray(draft).tolist() != [[1, 2]]

    def _quote_state(self, decoy=False):
        """RAG-quoting shape: a passage, separator junk, then the quote's
        leading edge; cur at the quote head's last slot."""
        S = 64
        seq = np.zeros((1, S), np.int32)
        seq[0, :31] = np.arange(10, 41)  # passage tokens 10..40
        seq[0, 31:40] = 90  # separator junk
        seq[0, 40:45] = np.arange(15, 20)  # quote head = passage[5:10]
        if decoy:
            # Same bigram (18, 19) late in the junk with a WRONG
            # continuation — a byte-level-realistic collision.
            seq[0, 33:36] = (18, 19, 77)
        valid = np.zeros((1, S), np.int32)
        valid[0, :44] = 1  # history only; cur's slot (44) excluded
        return (
            jnp.asarray(seq), jnp.asarray(valid),
            jnp.asarray([18], jnp.int32), jnp.asarray([19], jnp.int32),
            jnp.asarray([44], jnp.int32),
        )

    def test_self_match_exclusion_contract(self):
        """Regression (r5): the pre-r5 position-only ranking let the
        trailing SELF-match (the query bigram trivially occurs at cur's
        own slot when callers mark it valid) win the argmax, so every
        draft was the unwritten zero region and acceptance collapsed to
        ~0 on perfectly predictable text. Callers now pass history-only
        masks, AND the completeness ranking independently demotes the
        self-match (its continuation is unwritten) — both layers are
        asserted here."""
        seq, valid, prev, cur, cur_slot = self._quote_state()
        good = np.asarray(_propose_ngram(seq, valid, prev, cur, 8,
                                         cur_slot=cur_slot))
        np.testing.assert_array_equal(good[0], np.arange(20, 28))
        # Even the broken pre-r5 call (cur's slot marked valid) must
        # recover now: the self-match is incomplete, the passage match
        # complete, and completeness outranks position.
        bad_valid = valid.at[0, 44].set(1)
        bad = np.asarray(_propose_ngram(seq, bad_valid, prev, cur, 8,
                                        cur_slot=cur_slot))
        np.testing.assert_array_equal(bad[0], np.arange(20, 28))

    def test_deep_suffix_disambiguates_decoy(self):
        """A later bigram collision with a wrong continuation must lose
        to the true passage match once 3rd/4th query tokens rank."""
        seq, valid, prev, cur, cur_slot = self._quote_state(decoy=True)
        # Plain bigram: latest position wins → the decoy.
        d_bi = np.asarray(_propose_ngram(seq, valid, prev, cur, 8))
        assert d_bi[0, 0] == 77
        # Deep query (…, 17, 18, 19) only matches the real passage.
        d_deep = np.asarray(_propose_ngram(seq, valid, prev, cur, 8,
                                           cur_slot=cur_slot))
        np.testing.assert_array_equal(d_deep[0], np.arange(20, 28))
