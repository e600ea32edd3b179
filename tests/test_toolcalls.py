"""OpenAI tool calling on /v1/chat/completions: spec validation, the
grammar-forced call envelope, call extraction, and the HTTP contract
(message.tool_calls, finish_reason "tool_calls", streamed tool_calls
deltas, tool-result round trips)."""

import asyncio
import json

import pytest

import jax
import jax.numpy as jnp
from aiohttp.test_utils import TestClient, TestServer

from multimodal_rag_tpu.models.grammar import GrammarMachine, masker_for
from multimodal_rag_tpu.server.api import Components, create_app  # noqa: F401
from multimodal_rag_tpu.server.toolcalls import (
    extract_tool_call,
    fold_tool_message,
    normalize_tool_messages,
    toolcall_grammar_spec,
    tools_preamble,
    validate_tools,
)

from tests.test_api import make_components

WEATHER = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get weather for a city",
        "parameters": {
            "type": "object",
            "properties": {
                "city": {"type": "string"},
                "unit": {"enum": ["c", "f"]},
            },
            "required": ["city"],
        },
    },
}
SEARCH = {
    "type": "function",
    "function": {
        "name": "search",
        "parameters": {
            "type": "object",
            "properties": {"q": {"type": "string"}},
            "required": ["q"],
        },
    },
}


class TestValidateTools:
    def test_normalizes(self):
        tools, choice, err = validate_tools({
            "tools": [WEATHER], "tool_choice": "auto",
        })
        assert err is None and choice == "auto"
        assert tools[0]["function"]["name"] == "get_weather"

    def test_named_choice(self):
        tools, choice, err = validate_tools({
            "tools": [WEATHER, SEARCH],
            "tool_choice": {"type": "function",
                            "function": {"name": "search"}},
        })
        assert err is None and choice == ("name", "search")

    @pytest.mark.parametrize("body", [
        {"tools": []},
        {"tools": "x"},
        {"tools": [{"type": "retrieval"}]},
        {"tools": [{"type": "function", "function": {"name": ""}}]},
        {"tools": [WEATHER, WEATHER]},  # duplicate name
        {"tools": [WEATHER],
         "tool_choice": {"type": "function",
                         "function": {"name": "nope"}}},
        {"tool_choice": "required"},  # tool_choice without tools
    ])
    def test_rejects(self, body):
        _t, _c, err = validate_tools(body)
        assert err

    def test_absent_ok(self):
        assert validate_tools({}) == (None, None, None)


class TestToolGrammar:
    def _accepts(self, spec, text):
        from multimodal_rag_tpu.models.grammar import grammar_for_spec

        m = GrammarMachine(grammar_for_spec(spec))
        sid = m.step_bytes(m.start, text.encode())
        return sid != m.DEAD and m.accepts_end(sid)

    def test_forced_envelope(self):
        tools, _c, _e = validate_tools({"tools": [WEATHER, SEARCH]})
        spec = toolcall_grammar_spec(tools)
        ok = '{"name": "get_weather", "arguments": {"city": "Paris"}}'
        assert self._accepts(spec, ok)
        ok2 = '{"name": "search", "arguments": {"q": "x"}}'
        assert self._accepts(spec, ok2)
        assert not self._accepts(
            spec, '{"name": "other", "arguments": {}}'
        )
        # Arguments must satisfy the tool's parameters schema.
        assert not self._accepts(
            spec, '{"name": "get_weather", "arguments": {"city": 5}}'
        )
        assert not self._accepts(
            spec,
            '{"name": "get_weather", "arguments": {"unit": "c"}}',
        )  # missing required city

    def test_named_restriction(self):
        tools, _c, _e = validate_tools({"tools": [WEATHER, SEARCH]})
        spec = toolcall_grammar_spec(tools, "search")
        assert self._accepts(spec, '{"name": "search", "arguments": {"q": "y"}}')
        assert not self._accepts(
            spec,
            '{"name": "get_weather", "arguments": {"city": "P"}}',
        )

    def test_unsupported_params_fall_back_to_object(self):
        bad = {
            "type": "function",
            "function": {
                "name": "odd",
                "parameters": {"type": "object",
                               "properties": {"a": {"type": "integer"}},
                               "additionalProperties": True},
            },
        }
        tools, _c, _e = validate_tools({"tools": [bad]})
        spec = toolcall_grammar_spec(tools)
        # Free-form arguments object accepted instead of a hard error.
        assert self._accepts(
            spec, '{"name": "odd", "arguments": {"anything": [1]}}'
        )


class TestExtractToolCall:
    def test_plain(self):
        hit = extract_tool_call(
            '{"name": "search", "arguments": {"q": "x"}}', {"search"},
        )
        assert hit == ("search", '{"q": "x"}')

    def test_wrapped_in_prose_and_tags(self):
        text = (
            'Sure — calling it now.\n<tool_call>\n'
            '{"name": "search", "arguments": {"q": "rag"}}\n</tool_call>'
        )
        assert extract_tool_call(text, {"search"}) == (
            "search", '{"q": "rag"}'
        )

    def test_double_encoded_arguments(self):
        text = '{"name": "search", "arguments": "{\\"q\\": \\"z\\"}"}'
        assert extract_tool_call(text, {"search"}) == (
            "search", '{"q": "z"}'
        )

    def test_unknown_name_and_plain_text(self):
        assert extract_tool_call('{"name": "nope", "arguments": {}}',
                                 {"search"}) is None
        assert extract_tool_call("just an answer", {"search"}) is None

    def test_missing_arguments_defaults_empty(self):
        assert extract_tool_call('{"name": "search"}', {"search"}) == (
            "search", "{}"
        )


class TestMessageShaping:
    def test_normalize_decodes_arguments(self):
        msgs = [
            {"role": "assistant", "content": None,
             "tool_calls": [{"id": "call_1", "type": "function",
                             "function": {"name": "search",
                                          "arguments": '{"q": "x"}'}}]},
            {"role": "tool", "tool_call_id": "call_1",
             "content": "result text"},
        ]
        out = normalize_tool_messages(msgs, {0: "", 1: "result text"})
        assert out[0]["tool_calls"][0]["function"]["arguments"] == {
            "q": "x"
        }
        assert out[1]["tool_call_id"] == "call_1"

    def test_fold_renders_calls_and_results(self):
        m = {"role": "assistant",
             "tool_calls": [{"function": {"name": "f",
                                          "arguments": '{"a":1}'}}]}
        assert 'f({"a":1})' in fold_tool_message(m, "")
        t = {"role": "tool", "tool_call_id": "call_9"}
        assert "call_9" in fold_tool_message(t, "out")

    def test_preamble_mentions_tools(self):
        tools, _c, _e = validate_tools({"tools": [WEATHER]})
        pre = tools_preamble(tools)
        assert "get_weather" in pre and '"name"' in pre


def _tpu_client(tmp_path):
    from multimodal_rag_tpu.models.adapters import TPULLMAdapter
    from multimodal_rag_tpu.models.decoder import (
        DecoderConfig,
        TextDecoder,
        init_params as init_dec,
    )

    loop = asyncio.new_event_loop()
    comps = make_components(tmp_path)
    dcfg = DecoderConfig(
        vocab_size=512, hidden_dim=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, ff_dim=64, max_position=2048,
        compute_dtype=jnp.float32,
    )
    dec = TextDecoder(
        params=init_dec(jax.random.key(0), dcfg), cfg=dcfg,
        prompt_buckets=(64, 128),
    )
    comps.llm_adapter = TPULLMAdapter(decoder=dec, continuous=True)
    loop.run_until_complete(comps.initialize())
    app = create_app(components=comps)
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    return client, loop


class TestToolCallsHTTP:
    def test_forced_call_returns_tool_calls(self, tmp_path):
        c, loop = _tpu_client(tmp_path)
        try:
            resp = loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [
                        {"role": "user",
                         "content": "weather in Paris please"},
                    ],
                    "tools": [WEATHER],
                    "tool_choice": {"type": "function",
                                    "function": {"name": "get_weather"}},
                    "max_tokens": 96,
                    "temperature": 0.9,
                    "seed": 11,
                })
            )
            assert resp.status == 200
            body = loop.run_until_complete(resp.json())
            choice = body["choices"][0]
            if choice["finish_reason"] == "tool_calls":
                call = choice["message"]["tool_calls"][0]
                assert call["function"]["name"] == "get_weather"
                args = json.loads(call["function"]["arguments"])
                assert "city" in args and isinstance(args["city"], str)
                assert choice["message"]["content"] is None
                assert call["id"].startswith("call_")
            else:
                # Budget ran out mid-envelope on the random model.
                assert choice["finish_reason"] == "length"
        finally:
            loop.run_until_complete(c.close())
            loop.close()

    def test_tool_round_trip_messages_accepted(self, tmp_path):
        c, loop = _tpu_client(tmp_path)
        try:
            resp = loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [
                        {"role": "user", "content": "weather?"},
                        {"role": "assistant", "content": None,
                         "tool_calls": [{
                             "id": "call_abc", "type": "function",
                             "function": {
                                 "name": "get_weather",
                                 "arguments": '{"city": "Paris"}',
                             }}]},
                        {"role": "tool", "tool_call_id": "call_abc",
                         "content": "12 degrees, cloudy"},
                    ],
                    "tools": [WEATHER],
                    "max_tokens": 24,
                })
            )
            assert resp.status == 200
            body = loop.run_until_complete(resp.json())
            assert body["choices"][0]["finish_reason"] in (
                "stop", "length", "tool_calls",
            )
        finally:
            loop.run_until_complete(c.close())
            loop.close()

    def test_streamed_forced_call_emits_tool_deltas(self, tmp_path):
        c, loop = _tpu_client(tmp_path)
        try:
            resp = loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "go"}],
                    "tools": [SEARCH],
                    "tool_choice": "required",
                    "max_tokens": 96,
                    "temperature": 0.9,
                    "seed": 2,
                    "stream": True,
                })
            )
            assert resp.status == 200
            raw = loop.run_until_complete(resp.text())
            events = [
                json.loads(line[len("data: "):])
                for line in raw.splitlines()
                if line.startswith("data: ") and line != "data: [DONE]"
            ]
            deltas = [e["choices"][0]["delta"] for e in events
                      if "choices" in e]
            calls = [d for d in deltas if "tool_calls" in d]
            fins = [e["choices"][0]["finish_reason"] for e in events
                    if "choices" in e]
            if "tool_calls" in fins:
                assert calls
                assert calls[0]["tool_calls"][0]["function"]["name"] \
                    == "search"
                args = "".join(
                    d["tool_calls"][0]["function"].get("arguments", "")
                    for d in calls
                )
                json.loads(args)
            else:
                assert "length" in fins  # random model ran out of budget
        finally:
            loop.run_until_complete(c.close())
            loop.close()

    def test_forced_choice_rejected_on_http_backend(self, tmp_path):
        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)
        loop.run_until_complete(comps.initialize())
        app = create_app(components=comps)
        c = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(c.start_server())
        try:
            resp = loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "x"}],
                    "tools": [SEARCH],
                    "tool_choice": "required",
                })
            )
            assert resp.status == 400
            body = loop.run_until_complete(resp.json())
            assert "USE_TPU_LLM" in body["error"]["message"]
            # auto mode on an HTTP-style backend stays a plain answer.
            resp = loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "x"}],
                    "tools": [SEARCH],
                    "max_tokens": 16,
                })
            )
            assert resp.status == 200
            body = loop.run_until_complete(resp.json())
            assert body["choices"][0]["finish_reason"] in (
                "stop", "length",
            )
            assert body["choices"][0]["message"]["content"]
        finally:
            loop.run_until_complete(c.close())
            loop.close()

    def test_tool_choice_none_disables(self, tmp_path):
        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)
        loop.run_until_complete(comps.initialize())
        app = create_app(components=comps)
        c = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(c.start_server())
        try:
            resp = loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "x"}],
                    "tools": [SEARCH],
                    "tool_choice": "none",
                    "max_tokens": 8,
                })
            )
            assert resp.status == 200
            body = loop.run_until_complete(resp.json())
            assert "tool_calls" not in body["choices"][0]["message"]
        finally:
            loop.run_until_complete(c.close())
            loop.close()


class TestOpenAICounters:
    def test_stats_surface_feature_usage(self, tmp_path):
        c, loop = _tpu_client(tmp_path)
        try:
            loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "go"}],
                    "tools": [SEARCH],
                    "tool_choice": "required",
                    "max_tokens": 64,
                    "temperature": 0.9,
                })
            )
            loop.run_until_complete(
                c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "j"}],
                    "response_format": {"type": "json_object"},
                    "max_tokens": 24,
                })
            )

            async def stats():
                resp = await c.get("/stats")
                return await resp.json()

            body = loop.run_until_complete(stats())
            oc = body["openai"]
            assert oc["tool_requests"] == 1
            assert oc["response_format_requests"] == 1
            async def metrics():
                resp = await c.get("/metrics")
                return await resp.text()

            text = loop.run_until_complete(metrics())
            assert 'mmrag_openai_feature_requests_total{feature="tool_requests"} 1' in text
        finally:
            loop.run_until_complete(c.close())
            loop.close()
