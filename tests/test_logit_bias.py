"""OpenAI ``logit_bias``: densified per-row logit addend on the TPU
backends — the fused generation loop, every DecodeServer step path
(classic / chunked / speculative, where it stays exact across draft
positions), and the /v1 validation contract."""

import asyncio

import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    init_params,
)
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


def _decoder():
    return TextDecoder(
        params=init_params(jax.random.key(0), TINY),
        cfg=TINY,
        prompt_buckets=(16, 32),
    )


def _tok_id(dec, ch: str) -> int:
    return dec.tokenizer.encode(ch)[-1]


class TestCoalescedBias:
    def test_plus_100_forces_token(self):
        dec = _decoder()
        a = _tok_id(dec, "a")
        out, fins = dec.generate(
            ["hello"], max_new_tokens=6, temperature=0.0,
            return_finish=True, bias_per_row=[{a: 100.0}],
        )
        assert out[0] == "aaaaaa"
        assert fins[0] == "length"

    def test_minus_100_bans_token(self):
        dec = _decoder()
        base = dec.generate(["hello"], max_new_tokens=1, temperature=0.0)
        first_id = dec.tokenizer.encode(base[0])[-1]
        banned = dec.generate(
            ["hello"], max_new_tokens=1, temperature=0.0,
            bias_per_row=[{first_id: -100.0}],
        )
        assert banned[0] != base[0]

    def test_mixed_rows_leave_neighbors_unchanged(self):
        dec = _decoder()
        a = _tok_id(dec, "z")
        solo = dec.generate(["plain row"], max_new_tokens=5,
                            temperature=0.0)
        outs = dec.generate(
            ["plain row", "biased row"], max_new_tokens=5,
            temperature=0.0, bias_per_row=[None, {a: 100.0}],
        )
        assert outs[0] == solo[0]
        assert outs[1] == "zzzzz"

    def test_out_of_vocab_ids_ignored(self):
        dec = _decoder()
        out = dec.generate(
            ["x"], max_new_tokens=3, temperature=0.0,
            bias_per_row=[{999999: 100.0}],
        )
        base = dec.generate(["x"], max_new_tokens=3, temperature=0.0)
        assert out[0] == base[0]


class TestServerBias:
    @pytest.mark.parametrize("kwargs", [
        {"slots": 2, "max_new_cap": 8},
        {"slots": 2, "max_new_cap": 8, "chunk_tokens": 8},
        {"slots": 2, "max_new_cap": 8, "chunk_tokens": 8, "spec_k": 3},
    ], ids=["classic", "chunked", "spec"])
    def test_bias_forces_token_all_paths(self, kwargs):
        dec = _decoder()
        a = _tok_id(dec, "q")

        async def run():
            srv = DecodeServer(dec, **kwargs)
            biased, plain = await asyncio.gather(
                srv.submit("one", max_new_tokens=4, temperature=0.0,
                           logit_bias={a: 100.0}),
                srv.submit("two", max_new_tokens=4, temperature=0.0),
            )
            await srv.stop()
            return biased, plain

        biased, plain = asyncio.new_event_loop().run_until_complete(run())
        assert biased == "qqqq"
        assert plain != "qqqq"  # neighbor row not contaminated

    def test_bias_row_cleared_on_retire(self):
        """A slot reused after a biased request must not inherit the
        bias."""
        dec = _decoder()
        a = _tok_id(dec, "w")

        async def run():
            srv = DecodeServer(dec, slots=1, max_new_cap=6)
            first = await srv.submit(
                "alpha", max_new_tokens=4, temperature=0.0,
                logit_bias={a: 100.0},
            )
            second = await srv.submit(
                "alpha", max_new_tokens=4, temperature=0.0,
            )
            solo = dec.generate(["alpha"], max_new_tokens=4,
                                temperature=0.0)[0]
            await srv.stop()
            return first, second, solo

        first, second, solo = (
            asyncio.new_event_loop().run_until_complete(run())
        )
        assert first == "wwww"
        assert second == solo


class TestConstrainedPlusBias:
    def test_bias_steers_inside_grammar(self):
        """logit_bias composes with the grammar mask: bias steers among
        ALLOWED tokens but can never un-mask a forbidden one."""
        import json

        from multimodal_rag_tpu.models.grammar import masker_for

        dec = _decoder()
        m = masker_for(dec.tokenizer, ("json", None), int(dec.eos_id),
                       vocab_size=int(dec.cfg.vocab_size))
        # +100 on 'x' (legal inside strings, illegal as JSON structure):
        # output must still parse as JSON.
        x = _tok_id(dec, "x")
        text, fin, _ = dec.generate_constrained(
            "j", m, max_new_tokens=64, temperature=0.0,
            logit_bias={x: 100.0},
        )
        if fin == "stop":
            json.loads(text)
        else:
            assert text.lstrip().startswith("{")


class TestHTTPContract:
    def test_validation_errors(self, tmp_path):
        import jax.numpy as jnp  # noqa: F401
        from aiohttp.test_utils import TestClient, TestServer

        from multimodal_rag_tpu.server.api import create_app
        from tests.test_api import make_components

        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)
        loop.run_until_complete(comps.initialize())
        app = create_app(components=comps)
        c = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(c.start_server())
        try:
            for lb in (
                "notadict",
                {"abc": 1},           # non-numeric token id
                {"5": 500},           # out of [-100, 100]
                {"-3": 1},            # negative id
                {str(i): 1 for i in range(301)},  # too many entries
            ):
                resp = loop.run_until_complete(
                    c.post("/v1/chat/completions", json={
                        "messages": [{"role": "user", "content": "x"}],
                        "logit_bias": lb,
                    })
                )
                assert resp.status == 400, lb
            # Valid bias accepted (FakeLLMAdapter ignores it, like the
            # HTTP adapters — documented posture).
            resp = loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "x"}],
                    "logit_bias": {"10": 5, "11": -5},
                    "max_tokens": 8,
                })
            )
            assert resp.status == 200
        finally:
            loop.run_until_complete(c.close())
            loop.close()

    def test_tpu_backend_honors_bias(self, tmp_path):
        from aiohttp.test_utils import TestClient, TestServer

        from multimodal_rag_tpu.models.adapters import TPULLMAdapter
        from multimodal_rag_tpu.server.api import create_app
        from tests.test_api import make_components

        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)
        dec = _decoder()
        comps.llm_adapter = TPULLMAdapter(decoder=dec, continuous=True)
        loop.run_until_complete(comps.initialize())
        app = create_app(components=comps)
        c = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(c.start_server())
        try:
            a = _tok_id(dec, "k")
            resp = loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 4,
                    "temperature": 0,
                    "logit_bias": {str(a): 100},
                })
            )
            assert resp.status == 200
            body = loop.run_until_complete(resp.json())
            assert body["choices"][0]["message"]["content"] == "kkkk"
        finally:
            loop.run_until_complete(c.close())
            loop.close()
