"""Grammar-constrained generation end-to-end: the host-stepped coalesced
path (TextDecoder.generate_constrained), all three DecodeServer step
paths (classic / chunked / speculative), and the OpenAI
``response_format`` contract on /v1/chat/completions.

The decoder is RANDOM-INIT — precisely the hard case: an unconstrained
random model emits byte soup, so any output that parses as JSON (and
validates against the schema) proves the mask actually gated the
sampler on every step."""

import asyncio
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    init_params,
)
from multimodal_rag_tpu.models.grammar import masker_for
from multimodal_rag_tpu.serving_decode import DecodeServer

TINY = DecoderConfig(
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

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "count": {"type": "integer"},
    },
    "required": ["name", "count"],
}
SCHEMA_SPEC = ("schema", json.dumps(SCHEMA, sort_keys=True))


def _decoder():
    return TextDecoder(
        params=init_params(jax.random.key(0), TINY),
        cfg=TINY,
        prompt_buckets=(16, 32),
    )


def _masker(dec, spec=("json", None)):
    return masker_for(
        dec.tokenizer, spec, int(dec.eos_id),
        vocab_size=int(dec.cfg.vocab_size),
    )


class TestGenerateConstrained:
    def test_json_object(self):
        dec = _decoder()
        text, finish, lps = dec.generate_constrained(
            "emit json", _masker(dec), max_new_tokens=64,
            temperature=0.9, seed=0,
        )
        assert finish in ("stop", "length")
        if finish == "stop":
            assert isinstance(json.loads(text), dict)
        else:  # budget ran out mid-object: still a valid JSON prefix
            assert text.lstrip().startswith("{")

    def test_schema_and_logprobs(self):
        dec = _decoder()
        text, finish, lps = dec.generate_constrained(
            "x", _masker(dec, SCHEMA_SPEC), max_new_tokens=128,
            temperature=0.8, seed=3, logprobs=True,
        )
        assert lps is not None and len(lps) == len(
            dec.tokenizer.encode(text)
        ) - (1 if dec.tokenizer.bos_id is not None else 0) or lps
        if finish == "stop":
            obj = json.loads(text)
            assert set(obj) >= {"name", "count"}
            assert isinstance(obj["count"], int)
        # Per-token records carry the masked distribution.
        for e in lps:
            assert e["logprob"] <= 0.0
            assert len(e["top"]) == 20

    def test_greedy_deterministic(self):
        dec = _decoder()
        m = _masker(dec)
        a = dec.generate_constrained(
            "j", m, max_new_tokens=48, temperature=0.0
        )
        b = dec.generate_constrained(
            "j", m, max_new_tokens=48, temperature=0.0
        )
        assert a[0] == b[0]

    def test_penalties_change_output(self):
        dec = _decoder()
        m = _masker(dec)
        base = dec.generate_constrained(
            "p", m, max_new_tokens=48, temperature=0.0
        )[0]
        pen = dec.generate_constrained(
            "p", m, max_new_tokens=48, temperature=0.0,
            frequency_penalty=1.5,
        )[0]
        # Greedy + strong frequency penalty must diverge from plain
        # greedy once any token repeats (random-init output loops hard).
        assert base != pen


def _run_server_case(dec, server_kwargs, spec=("json", None), n_req=2):
    m = _masker(dec, spec)

    async def run():
        srv = DecodeServer(dec, **server_kwargs)
        outs = await asyncio.gather(*[
            srv.submit(
                f"request {i}", max_new_tokens=96, temperature=0.9,
                seed=i, return_finish=True, grammar=m,
            )
            for i in range(n_req)
        ])
        # An unconstrained neighbor shares the batch (mask row all-True).
        plain = await srv.submit(
            "free text", max_new_tokens=8, temperature=0.0,
            return_finish=True,
        )
        await srv.stop()
        return outs, plain

    return asyncio.new_event_loop().run_until_complete(run())


class TestServerGrammar:
    @pytest.mark.parametrize("kwargs", [
        {"slots": 2, "max_new_cap": 96},
        {"slots": 2, "max_new_cap": 96, "chunk_tokens": 8},
        {"slots": 2, "max_new_cap": 96, "chunk_tokens": 8, "spec_k": 3},
    ], ids=["classic", "chunked", "spec"])
    def test_constrained_rows_parse(self, kwargs):
        dec = _decoder()
        outs, plain = _run_server_case(dec, kwargs)
        for text, fin in outs:
            if fin == "stop":
                json.loads(text)
            else:
                assert text.lstrip().startswith("{")
        assert isinstance(plain[0], str)

    def test_schema_constrained(self):
        dec = _decoder()
        outs, _ = _run_server_case(
            dec, {"slots": 2, "max_new_cap": 128}, spec=SCHEMA_SPEC,
            n_req=1,
        )
        text, fin = outs[0]
        if fin == "stop":
            obj = json.loads(text)
            assert set(obj) >= {"name", "count"}

    def test_streaming_constrained(self):
        dec = _decoder()
        m = _masker(dec)

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=64)
            chunks = []
            fin = None
            async for delta, f in srv.submit_stream(
                "s", max_new_tokens=64, temperature=0.9, seed=1,
                grammar=m,
            ):
                chunks.append(delta)
                fin = f
            await srv.stop()
            return "".join(chunks), fin

        text, fin = asyncio.new_event_loop().run_until_complete(run())
        if fin == "stop":
            json.loads(text)
        else:
            assert text.lstrip().startswith("{")

    def test_admission_logprob_reports_constrained_distribution(self):
        """The first token of a grammar-constrained row is sampled from
        MASKED logits; its logprob record must report the same
        distribution (r3 advisor: admission used the unmasked logits).
        On a random-init model the unmasked top-20 would almost surely
        contain grammar-forbidden tokens with ordinary logprobs."""
        dec = _decoder()
        m = _masker(dec)

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=8)
            out = await srv.submit(
                "x", max_new_tokens=8, temperature=0.9, seed=3,
                logprobs=True, grammar=m,
            )
            await srv.stop()
            return out

        _, _, lps = asyncio.new_event_loop().run_until_complete(run())
        allowed = m.mask_bool(m.start)
        first = lps[0]
        for tid, _tok, lp in first["top"]:
            if lp > -1e8:  # masked entries carry the -1e9 sentinel
                assert allowed[tid], (tid, lp)

    def test_greedy_server_matches_coalesced(self):
        """Greedy constrained output must be identical between the
        host-stepped loop and the continuous-batching server."""
        dec = _decoder()
        m = _masker(dec)
        solo = dec.generate_constrained(
            "same prompt", m, max_new_tokens=32, temperature=0.0
        )[0]

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=32)
            out = await srv.submit(
                "same prompt", max_new_tokens=32, temperature=0.0,
                grammar=m,
            )
            await srv.stop()
            return out

        served = asyncio.new_event_loop().run_until_complete(run())
        assert served == solo
