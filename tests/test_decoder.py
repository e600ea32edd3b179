"""Decoder LM tests: KV-cache consistency, generation loop semantics,
tokenizer round-trip, HF golden loads (Llama + Gemma), and the TPU
adapter contract.

The cache-consistency test is the load-bearing one: a wrong RoPE
position, mask slot, or dynamic-update index produces logits that
silently diverge from the full forward — nothing else would catch it.
"""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    decode_step,
    generate_tokens,
    init_cache,
    init_params,
    prefill,
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


class TestCacheConsistency:
    def test_decode_matches_prefill(self, tiny_params):
        """Prefilling [t0..tn] must give the same next-token logits as
        prefilling [t0..tk] and decoding tk+1..tn one at a time."""
        rng = np.random.default_rng(0)
        B, P, EXTRA = 2, 8, 5
        full = rng.integers(3, TINY.vocab_size, (B, P + EXTRA)).astype(np.int32)
        S_max = P + EXTRA + 1

        # Oracle: full prefill over the whole sequence (right-aligned
        # left-pad of zero → mask all ones here).
        ones = jnp.ones((B, P + EXTRA), jnp.int32)
        logits_full, _ = prefill(
            tiny_params, jnp.asarray(full), ones, TINY, S_max
        )

        # Incremental: prefill the first P, then decode the rest.
        mask = jnp.ones((B, P), jnp.int32)
        logits, cache = prefill(
            tiny_params,
            jnp.asarray(full[:, :P]),
            mask,
            TINY,
            S_max,
        )
        key_mask = jnp.concatenate(
            [mask, jnp.zeros((B, S_max - P), jnp.int32)], axis=1
        )
        for t in range(EXTRA):
            pos = P + t
            key_mask = key_mask.at[:, pos].set(1)
            positions = jnp.full((B,), pos, jnp.int32)
            logits, cache = decode_step(
                tiny_params,
                cache,
                jnp.asarray(full[:, pos]),
                pos,
                key_mask,
                positions,
                TINY,
            )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_full), rtol=2e-4, atol=2e-4
        )

    def test_left_padding_is_inert(self, tiny_params):
        """A left-padded prompt must produce the same last-position logits
        as the unpadded prompt (pad slots masked, semantic positions)."""
        rng = np.random.default_rng(1)
        toks = rng.integers(3, TINY.vocab_size, (1, 6)).astype(np.int32)
        logits_a, _ = prefill(
            tiny_params, jnp.asarray(toks), jnp.ones((1, 6), jnp.int32),
            TINY, 16,
        )
        PAD = 4
        padded = np.concatenate(
            [np.zeros((1, PAD), np.int32), toks], axis=1
        )
        mask = np.concatenate(
            [np.zeros((1, PAD), np.int32), np.ones((1, 6), np.int32)], axis=1
        )
        logits_b, _ = prefill(
            tiny_params, jnp.asarray(padded), jnp.asarray(mask), TINY, 16
        )
        np.testing.assert_allclose(
            np.asarray(logits_a), np.asarray(logits_b), rtol=2e-4, atol=2e-4
        )


class TestGenerate:
    def test_greedy_deterministic(self, tiny_params):
        ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        mask = jnp.ones((1, 4), jnp.int32)
        out1, len1 = generate_tokens(
            tiny_params, ids, mask, jax.random.key(0), TINY,
            max_new_tokens=8, temperature=0.0, eos_id=1,
        )
        out2, len2 = generate_tokens(
            tiny_params, ids, mask, jax.random.key(9), TINY,
            max_new_tokens=8, temperature=0.0, eos_id=1,
        )
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert int(len1[0]) == int(len2[0])

    def test_greedy_matches_stepwise_argmax(self, tiny_params):
        """The fused while_loop generation must equal naive re-prefill
        argmax decoding."""
        prompt = [5, 6, 7]
        N = 4
        seq = list(prompt)
        for _ in range(N):
            logits, _ = prefill(
                tiny_params,
                jnp.asarray([seq], jnp.int32),
                jnp.ones((1, len(seq)), jnp.int32),
                TINY,
                len(seq) + 1,
            )
            seq.append(int(jnp.argmax(logits[0])))
        out, _ = generate_tokens(
            tiny_params,
            jnp.asarray([prompt], jnp.int32),
            jnp.ones((1, 3), jnp.int32),
            jax.random.key(0),
            TINY,
            max_new_tokens=N,
            temperature=0.0,
            eos_id=-7,  # never sampled
        )
        assert np.asarray(out)[0, :N].tolist() == seq[len(prompt):]

    def test_eos_stops_row(self, tiny_params):
        """Find the greedy first token, declare it EOS: length must be 0
        tokens of output after it and the tail filled with eos."""
        ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        mask = jnp.ones((1, 4), jnp.int32)
        out, _ = generate_tokens(
            tiny_params, ids, mask, jax.random.key(0), TINY,
            max_new_tokens=4, temperature=0.0, eos_id=-7,
        )
        first = int(np.asarray(out)[0, 0])
        out2, lengths = generate_tokens(
            tiny_params, ids, mask, jax.random.key(0), TINY,
            max_new_tokens=4, temperature=0.0, eos_id=first,
        )
        assert int(lengths[0]) == 0
        assert np.asarray(out2)[0].tolist() == [first] * 4


class TestQuantized:
    def test_quantized_logits_close(self, tiny_params):
        """w8a8 logits must track the float path closely (per-channel
        weight scales + per-token activation scales bound the error)."""
        from multimodal_rag_tpu.models.decoder import quantize_decoder_params

        qparams = quantize_decoder_params(tiny_params)
        assert qparams["layers"]["wq_q"].dtype == jnp.int8
        assert "wq" not in qparams["layers"]
        ids = jnp.asarray([[5, 6, 7, 8, 9, 10]], jnp.int32)
        mask = jnp.ones((1, 6), jnp.int32)
        ref, _ = prefill(tiny_params, ids, mask, TINY, 8)
        q, _ = prefill(qparams, ids, mask, TINY, 8)
        ref, q = np.asarray(ref)[0], np.asarray(q)[0]
        cos = (ref @ q) / (np.linalg.norm(ref) * np.linalg.norm(q))
        assert cos > 0.999, cos

    def test_quantized_generate(self, tiny_params):
        from multimodal_rag_tpu.models.decoder import quantize_decoder_params

        dec = TextDecoder(
            params=quantize_decoder_params(
                init_params(jax.random.key(0), TINY_BYTE)
            ),
            cfg=TINY_BYTE,
        )
        outs = dec.generate(["hi"], max_new_tokens=8, temperature=0.0)
        assert isinstance(outs[0], str)

    def test_quantize_flag(self):
        dec = TextDecoder(
            params=init_params(jax.random.key(0), TINY_BYTE),
            cfg=TINY_BYTE,
            quantize=True,
        )
        assert "wq_q" in dec.params["layers"]


class TestByteTokenizer:
    def test_roundtrip(self):
        from multimodal_rag_tpu.models.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        text = "Hello, xin chào thế giới! 123"
        ids = tok.encode(text)
        assert ids[0] == tok.bos_id
        assert tok.decode(ids) == text

    def test_specials_dropped(self):
        from multimodal_rag_tpu.models.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        ids = [tok.bos_id, *tok.encode("ab")[1:], tok.eos_id, tok.pad_id]
        assert tok.decode(ids) == "ab"


class TestTextDecoder:
    def test_generate_batch(self):
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        outs = dec.generate(
            ["hello", "a longer prompt here"],
            max_new_tokens=8, temperature=0.0,
        )
        assert len(outs) == 2
        assert all(isinstance(o, str) for o in outs)

    def test_finish_reasons(self):
        """A random-weight tiny decoder essentially never emits EOS, so a
        small budget reports "length"; a row whose first sampled token is
        EOS (forced via eos_id remap is not possible here, so only the
        length side is asserted strictly) never reports "length" without
        using its budget."""
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        outs, fins = dec.generate(["hello"], max_new_tokens=4,
                                  temperature=0.0, return_finish=True)
        assert len(outs) == 1 and len(fins) == 1
        assert fins[0] in ("stop", "length")
        # Greedy random-init decode virtually always runs to the cap.
        if fins[0] == "length":
            assert len(outs[0]) > 0

    def test_config_from_hf_sparse_llama(self):
        """Nested llava text_configs ship sparse, relying on HF
        LlamaConfig defaults — config_from_hf must fill them, not
        KeyError (which would silently reject a real llava-1.5 snapshot
        into random init)."""
        from multimodal_rag_tpu.models.decoder import config_from_hf

        cfg = config_from_hf({
            "model_type": "llama",
            "vocab_size": 32064,
            "max_position_embeddings": 4096,
            "rms_norm_eps": 1e-5,
        })
        assert cfg.vocab_size == 32064
        assert cfg.hidden_dim == 4096
        assert cfg.num_layers == 32
        assert cfg.num_heads == 32
        assert cfg.ff_dim == 11008
        assert cfg.head_dim == 128

    def test_temperature_snapped_to_grid(self):
        """Arbitrary client temperatures must not mint new executables:
        generate() snaps to TEMP_GRID, so two nearby floats produce the
        same greedy/sampled program (here: identical greedy output for
        0.0 vs 0.05, both snapping to 0.0)."""
        from multimodal_rag_tpu.models.decoder import snap_temperature

        assert snap_temperature(0.0) == 0.0
        assert snap_temperature(0.05) == 0.0
        assert snap_temperature(0.69) == 0.7
        assert snap_temperature(0.71) == 0.7
        assert snap_temperature(5.0) == 2.0
        assert snap_temperature(-1.0) == 0.0
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        a = dec.generate(["same prompt"], max_new_tokens=4, temperature=0.0)
        b = dec.generate(["same prompt"], max_new_tokens=4, temperature=0.05)
        assert a == b

    def test_batch_row_isolation(self):
        """Row content must not leak across the batch: the same prompt
        generates the same greedy text alone and next to another row."""
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        solo = dec.generate(["same prompt"], max_new_tokens=8,
                            temperature=0.0)[0]
        pair = dec.generate(["same prompt", "other words entirely"],
                            max_new_tokens=8, temperature=0.0)[0]
        assert solo == pair

    def test_top_p_tiny_equals_greedy(self):
        """A vanishing nucleus keeps only the argmax candidate, so
        temperature>0 + top_p→0 must reproduce the greedy sequence —
        the cleanest distribution-level check of the nucleus mask."""
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        greedy = dec.generate(["same prompt"], max_new_tokens=8,
                              temperature=0.0)[0]
        nucleus = dec.generate(["same prompt"], max_new_tokens=8,
                               temperature=1.0, top_p=1e-6, seed=3)[0]
        assert nucleus == greedy

    def test_top_p_changes_samples(self):
        """Under a fixed seed and hot temperature, top_p=1.0 and a tight
        nucleus must (with overwhelming probability on random-init
        logits) produce different continuations."""
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        outs_wide = [
            dec.generate(["sample text"], max_new_tokens=16,
                         temperature=2.0, top_p=1.0, seed=s)[0]
            for s in range(3)
        ]
        outs_tight = [
            dec.generate(["sample text"], max_new_tokens=16,
                         temperature=2.0, top_p=1e-6, seed=s)[0]
            for s in range(3)
        ]
        # Tight nucleus is deterministic across seeds; wide is not.
        assert len(set(outs_tight)) == 1
        assert len(set(outs_wide)) > 1

    def test_top_p_applies_without_top_k_cap(self):
        """top_k=0 ("no candidate cap") must still honor top_p: a
        vanishing nucleus over the FULL vocab keeps only the argmax.
        The old fast path sampled the raw distribution and silently
        dropped top_p (review finding r3)."""
        from multimodal_rag_tpu.models.decoder import _sample

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(0, 3, (4, 97)), jnp.float32)
        keys = jax.random.split(jax.random.key(5), 4)
        out = _sample(logits, keys, temperature=1.0, top_k=0, top_p=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(jnp.argmax(logits, axis=-1))
        )

    def test_seed_per_row_reproducible_across_batches(self):
        """OpenAI ``seed``: a (prompt, seed) pair must reproduce the same
        sampled completion regardless of what else shares the batch —
        per-row key streams, not a batch-level PRNG."""
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        solo = dec.generate(["sample text"], max_new_tokens=12,
                            temperature=1.5, seed_per_row=[77], seed=0)[0]
        batched = dec.generate(
            ["other words entirely", "sample text"], max_new_tokens=12,
            temperature=1.5, seed_per_row=[None, 77], seed=5,
        )[1]
        assert solo == batched
        other_seed = dec.generate(["sample text"], max_new_tokens=12,
                                  temperature=1.5, seed_per_row=[78])[0]
        assert other_seed != solo  # the seed actually selects the stream

    def test_unseeded_rows_differ_within_batch(self):
        """Two identical unseeded prompts in one batch must NOT sample
        identical completions (per-row fold_in, not one shared key)."""
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        outs = dec.generate(["sample text", "sample text"],
                            max_new_tokens=16, temperature=2.0, seed=1)
        assert outs[0] != outs[1]

    def test_prompt_truncation_counted(self):
        """Prompts past the top bucket keep only their tail AND increment
        the truncation counter (VERDICT r2: context loss must be
        observable); a raised ceiling keeps the full prompt."""
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE, prompt_buckets=(8, 16))
        assert dec.truncated_prompts == 0
        dec.generate(["x" * 200], max_new_tokens=4, temperature=0.0)
        assert dec.truncated_prompts == 1
        dec.generate(["short"], max_new_tokens=4, temperature=0.0)
        assert dec.truncated_prompts == 1  # short prompts don't count
        roomy = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                            cfg=TINY_BYTE, prompt_buckets=(8, 1024))
        roomy.generate(["x" * 200], max_new_tokens=4, temperature=0.0)
        assert roomy.truncated_prompts == 0

    def test_prompt_buckets_from_config(self, monkeypatch):
        """TPU_LLM_PROMPT_BUCKETS is the operator knob for the prompt
        ceiling; TextDecoder(prompt_buckets=None) must honor it."""
        from multimodal_rag_tpu.config import settings

        monkeypatch.setattr(settings, "TPU_LLM_PROMPT_BUCKETS", "16,32,64")
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        assert dec.prompt_buckets == (16, 32, 64)

    def test_default_ceiling_fits_default_rag_prompt(self):
        """The DEFAULT bucket ceiling must hold the framework's OWN
        default /query prompt — top-5 x 1000-char chunks + question
        (SURVEY §3.5), ~1300 tokens with a ~4-chars/token BPE — so the
        default config never silently drops the earliest retrieved chunk
        (VERDICT r3 §6). Uses a 4-chars/token mock tokenizer standing in
        for real BPE rates."""
        from multimodal_rag_tpu.config import Settings

        default_buckets = tuple(
            int(x)
            for x in Settings.TPU_LLM_PROMPT_BUCKETS.split(",")
        )
        assert default_buckets[-1] >= 2048

        class FourCharToken:
            pad_id, bos_id, eos_id = 0, 1, 2
            vocab_size = 512

            def encode(self, text):
                return [3 + (i % 32) for i in range(len(text) // 4 + 1)]

            def decode(self, ids):
                return "x" * len(ids)

        dec = TextDecoder(
            params=init_params(jax.random.key(0), TINY_BYTE),
            cfg=TINY_BYTE, tokenizer=FourCharToken(),
            prompt_buckets=default_buckets,
        )
        context = "\n\n".join("c" * 1000 for _ in range(5))
        prompt = (
            f"Context:\n{context}\n\nQuestion: what does it say?\n"
            "Answer:"
        )
        dec.prepare([prompt])
        assert dec.truncated_prompts == 0


TINY_BYTE = DecoderConfig(
    vocab_size=512,
    hidden_dim=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    ff_dim=64,
    max_position=2048,
    compute_dtype=jnp.float32,
)


class TestTPUAdapter:
    def _adapter(self):
        from multimodal_rag_tpu.models.adapters import TPULLMAdapter

        dec = TextDecoder(
            params=init_params(jax.random.key(0), TINY_BYTE), cfg=TINY_BYTE
        )
        return TPULLMAdapter(decoder=dec)

    def test_generate_and_summarize(self):
        async def run():
            a = self._adapter()
            await a.initialize()
            text = await a.generate_text("What is RAG?", max_tokens=8)
            assert isinstance(text, str)
            s = await a.summarize("Some content " * 20, max_length=64)
            assert isinstance(s, str) and len(s) <= 64
            batch = await a.summarize_batch(
                ["first doc", "second doc"], max_length=64
            )
            assert len(batch) == 2
            h = await a.health_check()
            assert h["backend"] == "tpu" and h["connection"] == "ok"
            caps = a.get_capabilities()
            from multimodal_rag_tpu.models.adapters import ModelCapability

            assert ModelCapability.TEXT_GENERATION in caps

        asyncio.run(run())

    def test_concurrent_calls_coalesce(self):
        """Five concurrent summarize() calls with the same preset must run
        in fewer device batches than requests (the coalescer groups them
        while the first batch is in flight)."""

        class CountingDecoder:
            pretrained = False
            cfg = TINY_BYTE

            def __init__(self):
                self.calls = []

            def generate(self, prompts, max_new_tokens, temperature, top_k,
                         return_finish=False, seed=0, max_new_per_row=None,
                         top_p=1.0, seed_per_row=None, **kw):
                import time

                self.calls.append(len(prompts))
                time.sleep(0.05)  # hold the worker so the queue backs up
                outs = [f"summary {p[:8]}" for p in prompts]
                if return_finish:
                    return outs, ["stop"] * len(outs)
                return outs

        from multimodal_rag_tpu.models.adapters import TPULLMAdapter

        dec = CountingDecoder()
        a = TPULLMAdapter(decoder=dec)

        async def run():
            await a.initialize()
            outs = await asyncio.gather(
                *(a.summarize(f"content {i} " * 5, max_length=64)
                  for i in range(5))
            )
            assert len(outs) == 5
            assert all(o.startswith("summary") for o in outs)

        asyncio.run(run())
        assert sum(dec.calls) == 5
        # First call runs solo; the remaining four coalesce (typically 1-2
        # batches depending on scheduling).
        assert len(dec.calls) < 5
        assert max(dec.calls) > 1

    def test_multimodal_degrades_to_text(self):
        async def run():
            a = self._adapter()
            await a.initialize()
            out = await a.generate_multimodal(
                "question", images=["b64"], tables=["|a|b|"], max_tokens=8
            )
            assert isinstance(out, str)

        asyncio.run(run())


# ---------------------------------------------------------------------------
# HF golden tests (torch cpu): transpose/stacking/convention proofs
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module", autouse=True)
def _offline():
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    torch.manual_seed(0)


def _golden(model, path, rtol=2e-4, atol=2e-4):
    from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

    model.eval()
    params, cfg = load_hf_causal_lm(path)
    cfg = DecoderConfig(**{
        **cfg.__dict__, "compute_dtype": jnp.float32,
    })
    ids = np.array([[3, 14, 15, 9, 2, 6]], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    logits, _ = prefill(
        params, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)), cfg,
        ids.shape[1] + 1,
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref[:, -1, :], rtol=rtol, atol=atol
    )


class TestHFGolden:
    def test_llama(self, tmp_path):
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, tie_word_embeddings=False,
        )
        model = LlamaForCausalLM(cfg)
        path = str(tmp_path / "llama")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path)

    def test_gemma(self, tmp_path):
        from transformers import GemmaConfig, GemmaForCausalLM

        cfg = GemmaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64, hidden_act="gelu_pytorch_tanh",
        )
        model = GemmaForCausalLM(cfg)
        path = str(tmp_path / "gemma")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path, rtol=5e-4, atol=5e-4)

    def test_mistral(self, tmp_path):
        """Mistral = llama-shaped (silu GQA, no biases); sliding window
        never binds at our context caps."""
        from transformers import MistralConfig, MistralForCausalLM

        cfg = MistralConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, tie_word_embeddings=False,
            sliding_window=4096,
        )
        model = MistralForCausalLM(cfg)
        path = str(tmp_path / "mistral")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path)

    def test_qwen2(self, tmp_path):
        """Qwen2 carries q/k/v projection BIASES — dropping them silently
        degrades every Qwen checkpoint (review finding r2)."""
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, tie_word_embeddings=False,
        )
        model = Qwen2ForCausalLM(cfg)
        path = str(tmp_path / "qwen2")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path)

    def test_qwen3(self, tmp_path):
        """Qwen3 drops the qkv biases and instead RMS-normalizes q and k
        PER HEAD (over head_dim) before RoPE — skipping q_norm/k_norm
        computes a different attention for every Qwen3 checkpoint."""
        try:
            from transformers import Qwen3Config, Qwen3ForCausalLM
        except ImportError:
            pytest.skip("transformers too old for Qwen3")

        cfg = Qwen3Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64,
            rope_theta=10000.0, tie_word_embeddings=False,
        )
        model = Qwen3ForCausalLM(cfg)
        path = str(tmp_path / "qwen3")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path)

    def test_qwen3_qk_norm_weights_load_and_matter(self, tmp_path):
        from transformers import Qwen3Config, Qwen3ForCausalLM

        from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

        cfg = Qwen3Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64, tie_word_embeddings=False,
        )
        model = Qwen3ForCausalLM(cfg)
        path = str(tmp_path / "qwen3")
        model.save_pretrained(path, safe_serialization=True)
        params, dcfg = load_hf_causal_lm(path)
        assert dcfg.qk_norm and not dcfg.qkv_bias
        assert params["layers"]["ln_q"].shape == (2, 8)
        # Perturbing the q-norm weight must move the logits (proves the
        # weight actually participates in attention).
        dcfg = DecoderConfig(**{**dcfg.__dict__, "compute_dtype": jnp.float32})
        ids = jnp.asarray([[3, 14, 15, 9]], jnp.int32)
        mask = jnp.ones_like(ids)
        base, _ = prefill(params, ids, mask, dcfg, 5)
        mutated = {
            **params,
            "layers": {
                **params["layers"],
                "ln_q": params["layers"]["ln_q"] * 3.0,
            },
        }
        moved, _ = prefill(mutated, ids, mask, dcfg, 5)
        assert np.abs(np.asarray(moved) - np.asarray(base)).max() > 1e-4

    def test_gemma2(self, tmp_path):
        """Gemma2: four norms per block (post-attention/post-feedforward
        applied to the block OUTPUT before the residual) + softcaps."""
        from transformers import Gemma2Config, Gemma2ForCausalLM

        cfg = Gemma2Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64,
            hidden_act="gelu_pytorch_tanh",
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            query_pre_attn_scalar=8,
            sliding_window=4096,
        )
        model = Gemma2ForCausalLM(cfg)
        path = str(tmp_path / "gemma2")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path, rtol=5e-4, atol=5e-4)

    def test_gemma3(self, tmp_path):
        """Gemma3 text: interleaved sliding/global attention (per-layer
        windows ENFORCED in the mask), per-layer rope theta (local 10k
        unscaled vs global 1M linear-scaled), (1+w) q/k norms, sandwich
        norms. The window (4) binds inside the 6-token probe prompt, so
        a decoder that ignores layer_types diverges here."""
        try:
            from transformers import Gemma3ForCausalLM, Gemma3TextConfig
        except ImportError:
            pytest.skip("transformers too old for Gemma3")

        cfg = Gemma3TextConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64,
            query_pre_attn_scalar=8,
            sliding_window=4,
            layer_types=[
                "sliding_attention", "sliding_attention",
                "full_attention", "sliding_attention",
            ],
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
            rope_scaling={"rope_type": "linear", "factor": 8.0},
        )
        model = Gemma3ForCausalLM(cfg)
        path = str(tmp_path / "gemma3")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path, rtol=5e-4, atol=5e-4)

    def test_gemma3_window_binds(self, tmp_path):
        """Zeroing layer_windows (all-global) must CHANGE the logits on
        a prompt longer than the window — proves the sliding mask is
        actually applied, not just carried as config."""
        from transformers import Gemma3ForCausalLM, Gemma3TextConfig

        from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

        cfg = Gemma3TextConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64, query_pre_attn_scalar=8,
            sliding_window=3,
            layer_types=["sliding_attention", "sliding_attention"],
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
        )
        model = Gemma3ForCausalLM(cfg)
        path = str(tmp_path / "gemma3w")
        model.save_pretrained(path, safe_serialization=True)
        params, dcfg = load_hf_causal_lm(path)
        assert dcfg.layer_windows == (3, 3)
        dcfg = DecoderConfig(**{**dcfg.__dict__, "compute_dtype": jnp.float32})
        ids = jnp.asarray([[3, 14, 15, 9, 2, 6, 11, 4]], jnp.int32)
        mask = jnp.ones_like(ids)
        windowed, _ = prefill(params, ids, mask, dcfg, 9)

        # Zero ONLY the window leaf (rope_inv stays put) so the delta is
        # attributable to the mask alone.
        nowin_params = {
            **params,
            "layers": {
                **params["layers"],
                "attn_window": jnp.zeros_like(
                    params["layers"]["attn_window"]
                ),
            },
        }
        unwindowed, _ = prefill(nowin_params, ids, mask, dcfg, 9)
        assert np.abs(
            np.asarray(windowed) - np.asarray(unwindowed)
        ).max() > 1e-4

    def test_gemma3_greedy_decode_matches_hf_generate(self, tmp_path):
        """Multi-token greedy generation vs HF: the decode steps must
        apply the per-layer window against the growing cache (the
        prefill golden alone cannot catch a decode-path mask bug)."""
        from transformers import Gemma3ForCausalLM, Gemma3TextConfig

        from multimodal_rag_tpu.models.decoder import (
            generate_tokens,
            load_hf_causal_lm,
        )

        torch.manual_seed(4)
        cfg = Gemma3TextConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64, query_pre_attn_scalar=8,
            sliding_window=3,
            layer_types=["sliding_attention", "full_attention"],
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
        )
        model = Gemma3ForCausalLM(cfg)
        model.eval()
        path = str(tmp_path / "gemma3g")
        model.save_pretrained(path, safe_serialization=True)
        params, dcfg = load_hf_causal_lm(path)
        dcfg = DecoderConfig(**{**dcfg.__dict__, "compute_dtype": jnp.float32})

        ids = np.array([[3, 14, 15, 9, 2, 6]], np.int32)
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor(ids, dtype=torch.long),
                max_new_tokens=5, do_sample=False,
            ).numpy()[:, ids.shape[1]:]
        toks, _ = generate_tokens(
            params, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            jax.random.key(0), dcfg, max_new_tokens=5, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(toks), hf_out)

    def test_phi3(self, tmp_path):
        """Phi-3 stores FUSED projections (qkv_proj = [q;k;v] rows,
        gate_up_proj = [gate;up] rows) — the loader must split them at
        the cfg-derived offsets; otherwise llama-shaped."""
        from transformers import Phi3Config, Phi3ForCausalLM

        cfg = Phi3Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, tie_word_embeddings=False,
            pad_token_id=0,  # default 32000 exceeds the tiny vocab
        )
        model = Phi3ForCausalLM(cfg)
        path = str(tmp_path / "phi3")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path)

    def test_llama3_rope_scaling(self, tmp_path):
        """Llama-3.1-style rope_scaling (band-scaled frequencies) must
        match the HF forward — plain RoPE on these checkpoints silently
        rotates with the wrong geometry."""
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            rope_theta=10000.0, tie_word_embeddings=False,
            rope_scaling={
                "rope_type": "llama3", "factor": 8.0,
                "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                "original_max_position_embeddings": 32,
            },
        )
        model = LlamaForCausalLM(cfg)
        path = str(tmp_path / "llama31")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path)

    def test_llama3_rope_divisors_match_hf_at_real_scale(self):
        """The tiny golden above leaves the MEDIUM band empty (its dims
        are all high/low frequency), so it cannot catch an inverted
        interpolation (review finding r3). Compare every divisor against
        transformers' _compute_llama3_parameters at the real
        Llama-3.1-8B geometry: head_dim=128, theta=500000, factor=8."""
        import torch as _torch
        from transformers import LlamaConfig
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

        from multimodal_rag_tpu.models.decoder import _rope_scaling_from_hf

        hf = {
            "rope_theta": 500000.0,
            "rope_scaling": {
                "rope_type": "llama3", "factor": 8.0,
                "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192,
            },
        }
        head_dim = 128
        divisors, attn = _rope_scaling_from_hf(hf, head_dim)
        assert attn == 1.0

        cfg = LlamaConfig(
            hidden_size=4096, num_attention_heads=32,
            rope_theta=500000.0, max_position_embeddings=131072,
            rope_scaling=dict(hf["rope_scaling"]),
        )
        hf_inv, _ = ROPE_INIT_FUNCTIONS["llama3"](cfg, device="cpu")
        hf_inv = np.asarray(hf_inv if not _torch.is_tensor(hf_inv)
                            else hf_inv.numpy(), np.float64)
        half = head_dim // 2
        base = 500000.0 ** (-np.arange(0, half, dtype=np.float64) / half)
        ours = base / np.asarray(divisors, np.float64)
        # HF computes in f32; an inverted interpolation is off by 2-4x
        # in the medium band, far outside this tolerance.
        np.testing.assert_allclose(ours, hf_inv, rtol=1e-5)
        # The medium band must actually be populated and monotone:
        # divisors go 1 → 8 through the interpolation region.
        mid = [d for d in divisors if 1.0 + 1e-9 < d < 8.0 - 1e-9]
        assert len(mid) >= 3
        assert mid == sorted(mid)

    def test_phi3_longrope_scaling(self, tmp_path):
        """Phi-3 128k-style longrope: short factors divide the inverse
        frequencies and the trained attention factor scales cos/sin."""
        from transformers import Phi3Config, Phi3ForCausalLM

        cfg = Phi3Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            original_max_position_embeddings=32,
            rope_theta=10000.0, tie_word_embeddings=False,
            pad_token_id=0,
            rope_scaling={
                "type": "longrope",
                "short_factor": [1.0, 1.5, 2.0, 2.5],
                "long_factor": [2.0, 3.0, 4.0, 5.0],
            },
        )
        model = Phi3ForCausalLM(cfg)
        path = str(tmp_path / "phi3long")
        model.save_pretrained(path, safe_serialization=True)
        _golden(model, path)

    def test_unsupported_rope_scaling_rejected(self):
        """Length-dynamic schemes must raise, not load with plain RoPE.
        (Yarn used to be here; it is static-from-config and supported
        since the DeepSeek family landed — tests/test_deepseek.py.)"""
        from multimodal_rag_tpu.models.decoder import config_from_hf

        with pytest.raises(ValueError, match="rope_scaling"):
            config_from_hf({
                "model_type": "llama", "vocab_size": 64,
                "rope_scaling": {"rope_type": "dynamic", "factor": 4.0},
            })
        # Yarn on a llama-family config loads with divisors populated.
        cfg = config_from_hf({
            "model_type": "llama", "vocab_size": 64,
            "max_position_embeddings": 16384,
            "rope_scaling": {
                "rope_type": "yarn", "factor": 4.0,
                "original_max_position_embeddings": 4096,
            },
        })
        assert cfg.rope_factors is not None
        assert max(cfg.rope_factors) > 3.5  # long dims fully interpolate

    def test_oversized_batch_chunks(self):
        """generate() with more prompts than the largest batch bucket must
        chunk, not crash (review finding r2)."""
        dec = TextDecoder(
            params=init_params(jax.random.key(0), TINY_BYTE), cfg=TINY_BYTE,
        )
        outs = dec.generate(
            [f"prompt {i}" for i in range(11)],
            max_new_tokens=4, temperature=0.0,
        )
        assert len(outs) == 11
        # Chunking must not change per-row greedy results.
        solo = dec.generate(["prompt 3"], max_new_tokens=4, temperature=0.0)
        assert outs[3] == solo[0]

    def test_hf_decoder_tokenizer_roundtrip(self, tmp_path):
        """A real tokenizer.json (BPE) loads and round-trips text."""
        tokenizers = pytest.importorskip("tokenizers")
        from tokenizers import Tokenizer, models, pre_tokenizers, trainers

        tok = Tokenizer(models.BPE(unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        trainer = trainers.BpeTrainer(
            vocab_size=200, special_tokens=["<unk>", "<s>", "</s>"]
        )
        tok.train_from_iterator(
            ["hello world", "the quick brown fox", "xin chao"], trainer
        )
        f = str(tmp_path / "tokenizer.json")
        tok.save(f)

        from multimodal_rag_tpu.models.tokenizer import load_decoder_tokenizer

        dt = load_decoder_tokenizer(str(tmp_path / "model.safetensors"))
        assert dt is not None
        ids = dt.encode("hello world")
        assert ids[0] == dt.bos_id
        assert "hello world" in dt.decode(ids)


class TestPerRowBudgets:
    def test_rows_sliced_to_own_budget(self):
        """Coalescing mixes client budgets under one bucketed executable;
        each row must be truncated (and finish-judged) against ITS raw
        budget, not the shared bucket."""
        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        outs, fins = dec.generate(
            ["hello", "another prompt"],
            max_new_tokens=8,  # the shared bucket
            max_new_per_row=[2, 8],
            temperature=0.0,
            return_finish=True,
        )
        # Byte tokenizer: 1 token = 1 char, so the 2-budget row can't
        # exceed 2 chars even though the device decoded toward 8.
        assert len(outs[0]) <= 2
        assert fins[0] == "length"  # random-init greedy never hits EOS

    def test_adapter_honors_raw_max_tokens(self):
        """End-to-end through the coalescing adapter: max_tokens=2 must
        cap the completion at 2 tokens despite the 64-token bucket."""
        from multimodal_rag_tpu.models.adapters import TPULLMAdapter

        dec = TextDecoder(params=init_params(jax.random.key(0), TINY_BYTE),
                          cfg=TINY_BYTE)
        adapter = TPULLMAdapter(decoder=dec, continuous=False)

        async def flow():
            await adapter.initialize()
            text, fin = await adapter.generate_text_with_finish(
                "hi", max_tokens=2, temperature=0.0
            )
            await adapter.cleanup()
            return text, fin

        text, fin = asyncio.new_event_loop().run_until_complete(flow())
        assert len(text) <= 2
        assert fin == "length"


class TestAdapterShutdown:
    def test_cleanup_fails_queued_waiters(self):
        """cleanup() must fail queued/in-flight futures — hanging the
        HTTP requests that enqueued them is the worst failure mode."""
        import time as _time

        class SlowDecoder:
            pretrained = False
            cfg = TINY_BYTE

            def generate(self, prompts, max_new_tokens, temperature,
                         top_k, return_finish=False, seed=0,
                         max_new_per_row=None, top_p=1.0,
                         seed_per_row=None, **kw):
                _time.sleep(0.2)  # hold the worker; queue backs up
                outs = ["x" for _ in prompts]
                return (outs, ["stop"] * len(outs)) if return_finish else outs

        from multimodal_rag_tpu.models.adapters import TPULLMAdapter

        adapter = TPULLMAdapter(decoder=SlowDecoder(), continuous=False)

        async def flow():
            await adapter.initialize()
            tasks = [
                asyncio.ensure_future(adapter.summarize(f"content {i}"))
                for i in range(4)
            ]
            await asyncio.sleep(0.05)  # first batch in flight, rest queued
            await adapter.cleanup()
            results = await asyncio.gather(*tasks, return_exceptions=True)
            return results

        results = asyncio.new_event_loop().run_until_complete(flow())
        # Every waiter resolved: either a real result (batch finished
        # before cancel landed) or the shutdown error — never a hang.
        assert len(results) == 4
        assert all(
            isinstance(r, (str, RuntimeError)) for r in results
        ), results
