"""OpenAI-SDK-driven conformance for the /v1 surfaces (VERDICT r3 §9):
the official ``openai`` Python client parses every response shape with
its own pydantic models, catching field/shape drift the hand-rolled
contract tests (test_api.py) cannot. Skips when the SDK is not
installed (it is not baked into the bench image); the hand-rolled tier
remains the always-on floor."""

import asyncio
import threading

import pytest

openai = pytest.importorskip("openai")

from aiohttp import web  # noqa: E402

from tests.test_api import make_components  # noqa: E402
from multimodal_rag_tpu.server.api import create_app  # noqa: E402


@pytest.fixture(scope="module")
def sdk_client(tmp_path_factory):
    """A real TCP server (the SDK speaks httpx, not aiohttp test
    plumbing) + an ``openai.OpenAI`` client pointed at it."""
    tmp_path = tmp_path_factory.mktemp("sdk")
    loop = asyncio.new_event_loop()
    comps = make_components(tmp_path)
    loop.run_until_complete(comps.initialize())
    app = create_app(components=comps)
    runner = web.AppRunner(app)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", 0)
    loop.run_until_complete(site.start())
    port = site._server.sockets[0].getsockname()[1]

    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    client = openai.OpenAI(
        base_url=f"http://127.0.0.1:{port}/v1", api_key="unused",
    )
    yield client
    loop.call_soon_threadsafe(loop.stop)
    thread.join(5)


class TestChatSDK:
    def test_non_streaming(self, sdk_client):
        r = sdk_client.chat.completions.create(
            model="mmrag",
            messages=[{"role": "user", "content": "hello"}],
            max_tokens=16,
        )
        assert r.choices[0].message.role == "assistant"
        assert r.choices[0].message.content
        assert r.usage.total_tokens == (
            r.usage.prompt_tokens + r.usage.completion_tokens
        )

    def test_streaming_with_usage(self, sdk_client):
        stream = sdk_client.chat.completions.create(
            model="mmrag",
            messages=[{"role": "user", "content": "hello"}],
            max_tokens=16,
            stream=True,
            stream_options={"include_usage": True},
        )
        text, usage = "", None
        for chunk in stream:
            if chunk.usage is not None:
                usage = chunk.usage
            for ch in chunk.choices:
                text += ch.delta.content or ""
        assert text
        assert usage is not None and usage.completion_tokens >= 1

    def test_n_choices_and_seed(self, sdk_client):
        r = sdk_client.chat.completions.create(
            model="mmrag",
            messages=[{"role": "user", "content": "hi"}],
            max_tokens=8, n=2, seed=7,
        )
        assert sorted(c.index for c in r.choices) == [0, 1]

    def test_logprobs_shape(self, sdk_client):
        r = sdk_client.chat.completions.create(
            model="mmrag",
            messages=[{"role": "user", "content": "hi"}],
            max_tokens=4, logprobs=True, top_logprobs=2,
        )
        lp = r.choices[0].logprobs
        # HTTP adapters 400 logprobs; the SDK surfaces that as an error,
        # so reaching here means the backend filled the records.
        if lp is not None and lp.content:
            assert lp.content[0].top_logprobs is not None


class TestCompletionsSDK:
    def test_non_streaming(self, sdk_client):
        r = sdk_client.completions.create(
            model="mmrag", prompt="hello", max_tokens=8,
        )
        assert r.choices[0].text
        assert r.object == "text_completion"

    def test_echo(self, sdk_client):
        r = sdk_client.completions.create(
            model="mmrag", prompt="lead-in", max_tokens=8, echo=True,
        )
        assert r.choices[0].text.startswith("lead-in")


class TestEmbeddingsSDK:
    def test_embeddings(self, sdk_client):
        r = sdk_client.embeddings.create(
            model="mmrag-minilm", input=["a", "b"],
        )
        assert len(r.data) == 2
        assert len(r.data[0].embedding) > 0


class TestModelsSDK:
    def test_models_list(self, sdk_client):
        models = list(sdk_client.models.list())
        assert models
