"""OpenAI presence/frequency penalties in the compiled samplers.

Reference behavior spec: the reference forwards OpenAI chat params to
its backends (`/root/reference/app/models/llm_adapter.py`); this
framework *implements* the penalty contract on-TPU — a per-row logit
bias over each row's output-token counts (decoder._penalty_bias),
carried through the batch generate loop and all three continuous-
batching paths (classic / chunked / speculative).

Contracts tested:
* zero penalties are an exact no-op (bit-equal outputs), so penalized
  requests can batch with unpenalized neighbors;
* a large frequency penalty forbids repeats (every emitted token
  distinct) where unpenalized greedy repeats;
* all three server paths agree exactly under greedy + penalties
  (chunked is sequential by construction; the spec path forces
  penalized rows to single-token emission);
* parse_sampling_params validates the OpenAI [-2, 2] range.
"""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    _penalty_bias,
    generate_tokens,
    init_params,
)
from multimodal_rag_tpu.serving_decode import DecodeServer

CFG = DecoderConfig(
    vocab_size=256,
    hidden_dim=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    ff_dim=128,
    max_position=2048,
    compute_dtype=jnp.float32,
)
PARAMS = init_params(jax.random.key(0), CFG)


def _gen(pres=None, freq=None, max_new=16, temperature=0.0, seed=0):
    ids = np.array([[5, 9, 5, 9, 7, 3], [1, 2, 3, 4, 5, 6]], np.int32)
    mask = np.ones_like(ids)
    toks, lengths = generate_tokens(
        PARAMS, jnp.asarray(ids), jnp.asarray(mask), jax.random.key(seed),
        CFG, max_new_tokens=max_new, temperature=temperature, top_k=64,
        eos_id=-1,
        pres=None if pres is None else jnp.asarray(pres, jnp.float32),
        freq=None if freq is None else jnp.asarray(freq, jnp.float32),
    )
    return np.asarray(toks), np.asarray(lengths)


class TestPenaltyBias:
    def test_zero_penalties_exact_zero(self):
        counts = jnp.asarray([[3, 0, 1], [0, 0, 7]], jnp.int32)
        zero = jnp.zeros((2,), jnp.float32)
        bias = _penalty_bias(counts, zero, zero)
        assert np.all(np.asarray(bias) == 0.0)

    def test_math(self):
        counts = jnp.asarray([[2, 0, 1]], jnp.int32)
        bias = _penalty_bias(
            counts, jnp.asarray([0.5], jnp.float32),
            jnp.asarray([0.25], jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(bias), [[0.5 + 0.5, 0.0, 0.5 + 0.25]]
        )


class TestGenerateLoop:
    def test_zero_penalty_vectors_match_no_penalty(self):
        base, _ = _gen()
        z = np.zeros((2,), np.float32)
        with_zeros, _ = _gen(pres=z, freq=z)
        np.testing.assert_array_equal(base, with_zeros)

    def test_frequency_penalty_forbids_repeats(self):
        base, _ = _gen(max_new=24)
        # Random-init greedy settles into a loop: repeats exist.
        assert any(
            len(set(row.tolist())) < len(row) for row in base
        ), "baseline greedy unexpectedly repeat-free; pick a new seed"
        big = np.full((2,), 100.0, np.float32)
        toks, _ = _gen(freq=big, max_new=24)
        for row in toks:
            assert len(set(row.tolist())) == len(row)

    def test_mixed_batch_leaves_unpenalized_row_bit_equal(self):
        base, _ = _gen(max_new=16, temperature=0.7, seed=3)
        pres = np.asarray([2.0, 0.0], np.float32)
        freq = np.asarray([1.0, 0.0], np.float32)
        mixed, _ = _gen(pres=pres, freq=freq, max_new=16,
                        temperature=0.7, seed=3)
        np.testing.assert_array_equal(base[1], mixed[1])
        assert not np.array_equal(base[0], mixed[0])


class TestDecoderGenerate:
    def test_per_row_penalties(self):
        dec = TextDecoder(params=PARAMS, cfg=CFG, prompt_buckets=(16,))
        base = dec.generate(
            ["ab ab ab", "xyz"], max_new_tokens=16, temperature=0.0,
        )
        out = dec.generate(
            ["ab ab ab", "xyz"], max_new_tokens=16, temperature=0.0,
            presence_per_row=[0.0, 0.0], frequency_per_row=[100.0, 0.0],
        )
        # Row 1 carried zero penalties: identical to the plain call.
        assert out[1] == base[1]


def _serve(prompts, *, penalties, max_new=12, **srv_kw):
    dec = TextDecoder(params=PARAMS, cfg=CFG, prompt_buckets=(16, 32))

    async def go():
        srv = DecodeServer(dec, slots=4, max_new_cap=max_new, **srv_kw)
        outs = await asyncio.gather(*[
            srv.submit(p, max_new_tokens=max_new, temperature=0.0,
                       frequency_penalty=f)
            for p, f in zip(prompts, penalties)
        ])
        await srv.stop()
        return outs

    return asyncio.run(go())


PROMPTS = ["ab ab ab ab", "a different prompt", "x"]


class TestServerPaths:
    def test_all_paths_agree(self):
        # Greedy + penalties is exactly sequential in every mode: chunked
        # is sequential by construction, the spec path forces penalized
        # rows to single-token emission. (Token-level no-repeat behavior
        # is asserted in TestGenerateLoop, where raw ids are visible.)
        pen = [100.0, 100.0, 0.0]
        classic = _serve(PROMPTS, penalties=pen)
        chunked = _serve(PROMPTS, penalties=pen, chunk_tokens=8)
        spec = _serve(PROMPTS, penalties=pen, chunk_tokens=8, spec_k=4)
        assert classic == chunked == spec

    def test_unpenalized_rows_unchanged_by_neighbors(self):
        plain = _serve(PROMPTS, penalties=[0.0, 0.0, 0.0])
        mixed = _serve(PROMPTS, penalties=[100.0, 0.0, 0.0])
        assert mixed[1:] == plain[1:]
        assert mixed[0] != plain[0]


class TestAPIValidation:
    def test_parse_sampling_params(self):
        from multimodal_rag_tpu.server.api import parse_sampling_params

        ok, err = parse_sampling_params(
            {"presence_penalty": 1.5, "frequency_penalty": -0.5}
        )
        assert err is None
        assert ok["gen_kw"]["presence_penalty"] == 1.5
        assert ok["gen_kw"]["frequency_penalty"] == -0.5

        ok, err = parse_sampling_params({"presence_penalty": 0.0})
        assert err is None and "presence_penalty" not in ok["gen_kw"]

        for bad in (2.5, -3, "x", True):
            _, err = parse_sampling_params({"frequency_penalty": bad})
            assert err is not None
