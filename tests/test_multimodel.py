"""Multi-model serving: the OpenAI ``model`` parameter routes to named
registry adapters (MMRAG_LLM_MODELS); without a registry the field stays
display-only (single-model contract preserved)."""

import asyncio

import pytest

import jax
import jax.numpy as jnp
from aiohttp.test_utils import TestClient, TestServer

from multimodal_rag_tpu.models.adapters import TPULLMAdapter
from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    init_params,
)
from multimodal_rag_tpu.server.api import Components, create_app
from tests.test_api import make_components

TINY = DecoderConfig(
    vocab_size=512, hidden_dim=32, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=8, ff_dim=64, max_position=2048,
    compute_dtype=jnp.float32,
)


def _adapter(seed: int, name: str) -> TPULLMAdapter:
    dec = TextDecoder(
        params=init_params(jax.random.key(seed), TINY), cfg=TINY,
        prompt_buckets=(16, 32),
    )
    return TPULLMAdapter(model_name=name, decoder=dec, continuous=True)


def _registry_client(tmp_path):
    loop = asyncio.new_event_loop()
    comps = make_components(tmp_path)
    comps.llm_adapter = _adapter(0, "base")
    comps.llm_models = {"alt": _adapter(1, "alt")}
    loop.run_until_complete(comps.initialize())
    app = create_app(components=comps)
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    return client, loop, comps


def _chat(client, loop, **extra):
    body = {
        "messages": [{"role": "user", "content": "same prompt"}],
        "max_tokens": 8,
        "temperature": 0,
        **extra,
    }

    async def do():
        resp = await client.post("/v1/chat/completions", json=body)
        return resp.status, await resp.json()

    return loop.run_until_complete(do())


class TestResolution:
    def test_empty_registry_is_display_only(self):
        comps = Components(llm_adapter="THE_DEFAULT")
        for name in (None, "mmrag", "anything-goes", "gpt-4o"):
            adapter, err = comps.resolve_llm(name)
            assert adapter == "THE_DEFAULT" and err is None

    def test_registry_routes_and_404s(self):
        comps = Components(llm_adapter="DEFAULT",
                           llm_models={"alt": "ALT"})
        assert comps.resolve_llm("alt") == ("ALT", None)
        for name in (None, "", "default", "mmrag", "mmrag-tpu"):
            adapter, err = comps.resolve_llm(name)
            assert adapter == "DEFAULT" and err is None
        adapter, err = comps.resolve_llm("missing")
        assert adapter is None and "missing" in err and "alt" in err

    def test_registry_name_wins_over_prefix_and_aliases(self):
        """A registry entry whose name collides with the 'mmrag-' prefix
        or a default alias must serve ITS adapter — never silently the
        base model under the finetune's name (r3 advisor, medium)."""
        comps = Components(
            llm_adapter="DEFAULT",
            llm_models={"mmrag-finetune": "TUNED", "default": "ODD"},
        )
        assert comps.resolve_llm("mmrag-finetune") == ("TUNED", None)
        assert comps.resolve_llm("default") == ("ODD", None)
        # Non-colliding prefix names still fall back to the default.
        assert comps.resolve_llm("mmrag-tpu") == ("DEFAULT", None)


class TestHTTPRouting:
    def test_models_route_to_different_weights(self, tmp_path):
        c, loop, comps = _registry_client(tmp_path)
        try:
            alt = comps.llm_models["alt"]
            s1, b1 = _chat(c, loop)  # default (no model field)
            assert s1 == 200
            assert comps.llm_adapter.requests_served == 1
            assert alt.requests_served == 0
            s2, b2 = _chat(c, loop, model="alt")
            assert s2 == 200
            assert alt.requests_served == 1
            assert comps.llm_adapter.requests_served == 1
            s3, b3 = _chat(c, loop, model="mmrag")  # alias → default
            assert s3 == 200
            assert comps.llm_adapter.requests_served == 2
            assert alt.requests_served == 1

            s4, b4 = _chat(c, loop, model="nope")
            assert s4 == 404
            assert b4["error"]["code"] == "model_not_found"
        finally:
            loop.run_until_complete(c.close())
            loop.close()

    def test_completions_surface_routes_too(self, tmp_path):
        c, loop, comps = _registry_client(tmp_path)
        try:
            async def do(model):
                resp = await c.post("/v1/completions", json={
                    "model": model, "prompt": "same prompt",
                    "max_tokens": 8, "temperature": 0,
                })
                return resp.status, await resp.json()

            alt = comps.llm_models["alt"]
            s1, b1 = loop.run_until_complete(do("alt"))
            assert s1 == 200
            assert alt.requests_served == 1
            # "base" is the default adapter's model_name — alias rule.
            s2, b2 = loop.run_until_complete(do("base"))
            assert s2 == 200
            assert comps.llm_adapter.requests_served == 1
            assert alt.requests_served == 1
            s3, _b3 = loop.run_until_complete(do("ghost"))
            assert s3 == 404
        finally:
            loop.run_until_complete(c.close())
            loop.close()

    def test_v1_models_lists_registry(self, tmp_path):
        c, loop, comps = _registry_client(tmp_path)
        try:
            async def do():
                resp = await c.get("/v1/models")
                return await resp.json()

            body = loop.run_until_complete(do())
            ids = [m["id"] for m in body["data"]]
            assert "alt" in ids
        finally:
            loop.run_until_complete(c.close())
            loop.close()

    def test_cleanup_stops_registry_adapters(self, tmp_path):
        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)
        comps.llm_adapter = _adapter(0, "base")
        alt = _adapter(1, "alt")
        comps.llm_models = {"alt": alt}
        loop.run_until_complete(comps.initialize())
        # Touch the alt model so it spins up its decode server.
        loop.run_until_complete(alt.generate_text("x", max_tokens=4,
                                                  temperature=0.0))
        assert alt.is_initialized
        loop.run_until_complete(comps.cleanup())
        assert not alt.is_initialized
        loop.close()


class TestRegistryParsing:
    def test_build_default_parses_entries(self, tmp_path, monkeypatch):
        from multimodal_rag_tpu.config import settings

        monkeypatch.setattr(settings, "USE_TPU_LLM", True)
        monkeypatch.setattr(settings, "USE_TPU_MLLM", False)
        monkeypatch.setattr(settings, "CROSS_MODAL_ENABLED", False)
        monkeypatch.setattr(
            settings, "MMRAG_LLM_MODELS",
            "fast=/ckpt/a,tuned=/ckpt/b+/lora/x+/lora/y,broken",
        )
        comps = Components.build_default()
        assert set(comps.llm_models) == {"fast", "tuned"}
        assert comps.llm_models["fast"]._checkpoint_path == "/ckpt/a"
        assert comps.llm_models["fast"]._lora_paths == []
        assert comps.llm_models["tuned"]._lora_paths == [
            "/lora/x", "/lora/y",
        ]
