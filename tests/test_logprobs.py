"""OpenAI logprobs in the compiled samplers.

Reference behavior spec: the reference forwarded client params to OpenAI
(`/root/reference/app/models/llm_adapter.py:183-191`), whose chat dialect
defines `logprobs` + `top_logprobs` and whose legacy completions dialect
defines integer `logprobs`. This framework *serves* the contract: the
generate loop and all three continuous-batching paths capture the
chosen-token logprob and top-LOGPROBS_K alternatives of the sampling
distribution (penalty-biased, un-temperature-scaled — decoder._lp_top)
inside the compiled step.

Contracts tested:
* greedy: the chosen token IS the top-1 alternative and lp == top-1 lp;
* the captured distribution normalizes (sum of top-K probs <= 1) and the
  plain (logprobs off) executable is bit-unchanged;
* TextDecoder.generate returns one record per kept token, aligned with
  the decoded text;
* the continuous server's classic / chunked / speculative paths all
  produce identical records under greedy (spec forces lp rows to
  single-token emission);
* lp requests coexist with non-lp neighbors without changing them.
"""

import asyncio

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    LOGPROBS_K,
    DecoderConfig,
    TextDecoder,
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

IDS = np.array([[5, 9, 5, 9, 7, 3], [1, 2, 3, 4, 5, 6]], np.int32)


def _gen(logprobs, max_new=8, temperature=0.0, seed=0):
    mask = np.ones_like(IDS)
    return [np.asarray(x) for x in generate_tokens(
        PARAMS, jnp.asarray(IDS), jnp.asarray(mask), jax.random.key(seed),
        CFG, max_new_tokens=max_new, temperature=temperature, top_k=64,
        eos_id=-1, logprobs=logprobs,
    )]


class TestGenerateLoop:
    def test_greedy_chosen_is_top1(self):
        toks, _lens, lp, tv, ti = _gen(True)
        assert lp.shape == toks.shape
        assert tv.shape == toks.shape + (LOGPROBS_K,)
        np.testing.assert_allclose(lp, tv[:, :, 0], rtol=1e-6)
        np.testing.assert_array_equal(ti[:, :, 0], toks)

    def test_distribution_normalized(self):
        _toks, _lens, lp, tv, _ti = _gen(True)
        assert np.all(lp <= 0.0)
        assert np.all(np.exp(tv).sum(-1) <= 1.0 + 1e-5)

    def test_plain_loop_unchanged(self):
        toks, lens, *_ = _gen(True, temperature=0.7, seed=3)
        t2, l2 = _gen(False, temperature=0.7, seed=3)
        np.testing.assert_array_equal(toks, t2)
        np.testing.assert_array_equal(lens, l2)

    def test_sampled_token_lp_matches_alternatives(self):
        # Sampled (non-greedy) rows: whenever the chosen token appears in
        # the top-K id list, its lp must equal that alternative's lp.
        toks, lens, lp, tv, ti = _gen(True, temperature=0.9, seed=5)
        hits = 0
        for i in range(toks.shape[0]):
            for t in range(int(lens[i])):
                where = np.nonzero(ti[i, t] == toks[i, t])[0]
                if where.size:
                    np.testing.assert_allclose(
                        lp[i, t], tv[i, t, where[0]], rtol=1e-5
                    )
                    hits += 1
        assert hits > 0


class TestTextDecoder:
    def test_records_align_with_text(self):
        dec = TextDecoder(params=PARAMS, cfg=CFG, prompt_buckets=(16,))
        out, fins, lps = dec.generate(
            ["ab ab ab", "xyz"], max_new_tokens=8, temperature=0.0,
            return_finish=True, logprobs=True,
        )
        assert len(lps) == 2
        for text, row in zip(out, lps):
            assert "".join(e["token"] for e in row) == text
            for e in row:
                assert e["logprob"] <= 0.0
                assert len(e["top"]) == LOGPROBS_K
                # greedy: chosen is the argmax alternative
                assert e["top"][0][0] == e["id"]

    def test_matches_plain_generate(self):
        dec = TextDecoder(params=PARAMS, cfg=CFG, prompt_buckets=(16,))
        plain = dec.generate(["ab ab ab"], max_new_tokens=8,
                             temperature=0.0)
        out, _f, _l = dec.generate(
            ["ab ab ab"], max_new_tokens=8, temperature=0.0,
            return_finish=True, logprobs=True,
        )
        assert out == plain


def _serve(prompts, lp_flags, max_new=8, **srv_kw):
    dec = TextDecoder(params=PARAMS, cfg=CFG, prompt_buckets=(16, 32))

    async def go():
        srv = DecodeServer(dec, slots=4, max_new_cap=max_new, **srv_kw)
        outs = await asyncio.gather(*[
            srv.submit(p, max_new_tokens=max_new, temperature=0.0,
                       logprobs=lp, return_finish=True)
            for p, lp in zip(prompts, lp_flags)
        ])
        await srv.stop()
        return outs

    return asyncio.run(go())


PROMPTS = ["ab ab ab ab", "a different prompt", "x"]


class TestServerPaths:
    def test_all_paths_agree(self):
        flags = [True, True, False]
        classic = _serve(PROMPTS, flags)
        chunked = _serve(PROMPTS, flags, chunk_tokens=8)
        spec = _serve(PROMPTS, flags, chunk_tokens=8, spec_k=4)

        def norm(outs):
            # (text, finish, lps) for lp rows; (text, finish) otherwise.
            return [
                (o[0], o[1],
                 [(e["id"], round(e["logprob"], 4)) for e in o[2]]
                 if len(o) > 2 else None)
                for o in outs
            ]

        assert norm(classic) == norm(chunked) == norm(spec)

    def test_records_align_and_neighbors_unchanged(self):
        flags = [True, False, False]
        outs = _serve(PROMPTS, flags)
        text, _fin, lps = outs[0]
        assert "".join(e["token"] for e in lps) == text
        assert all(len(e["top"]) == LOGPROBS_K for e in lps)
        plain = _serve(PROMPTS, [False, False, False])
        assert [o[0] for o in outs[1:]] == [p[0] for p in plain[1:]]

    def test_spec_forced_single_still_correct_tokens(self):
        # An lp row under speculation decodes one token per pass but must
        # produce the SAME greedy tokens (ids AND logprobs) as the
        # classic path.
        classic = _serve(["ab ab ab ab"], [True])[0]
        spec = _serve(["ab ab ab ab"], [True], chunk_tokens=8,
                      spec_k=4)[0]
        assert spec[0] == classic[0]
        assert [e["id"] for e in spec[2]] == \
            [e["id"] for e in classic[2]]
        np.testing.assert_allclose(
            [e["logprob"] for e in spec[2]],
            [e["logprob"] for e in classic[2]], rtol=1e-5,
        )
