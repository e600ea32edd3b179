"""Summarizer + adapter tests using the FakeLLMAdapter seam."""

import asyncio

import pytest

from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
from multimodal_rag_tpu.models.adapters import (
    FakeLLMAdapter,
    ModelCapability,
)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def make(fake=None, **kwargs):
    fake = fake or FakeLLMAdapter()
    kwargs.setdefault("max_retries", 3)
    kwargs.setdefault("max_concurrent", 5)
    return ContentSummarizer(fake, **kwargs), fake


class TestAdapterContract:
    def test_capabilities(self):
        fake = FakeLLMAdapter(supports_vision=True)
        assert fake.supports_capability(ModelCapability.VISION)
        assert fake.supports_capability(ModelCapability.TEXT_GENERATION)

    def test_validate_input(self):
        fake = FakeLLMAdapter()
        with pytest.raises(ValueError):
            fake._validate_input("")
        with pytest.raises(ValueError):
            fake._validate_input("x" * 10001)
        assert fake._validate_input("ok")

    def test_health_check(self):
        fake = FakeLLMAdapter()
        health = run(fake.health_check())
        assert health["status"] == "not_initialized"
        run(fake.initialize())
        assert run(fake.health_check())["status"] == "healthy"


class TestSummarize:
    def test_basic(self):
        s, fake = make()
        out = run(s.summarize("Machine learning is great. " * 10))
        assert out.startswith("Summary:")
        assert s.stats["total_summaries"] == 1

    def test_empty_returns_empty(self):
        s, _ = make()
        assert run(s.summarize("  ")) == ""

    def test_cache_hit(self):
        s, fake = make()

        async def flow():
            a = await s.summarize("repeat content here please")
            b = await s.summarize("repeat content here please")
            return a, b

        a, b = run(flow())
        assert a == b
        assert s.stats["cache_hits"] == 1
        assert len([c for c in fake.calls if c["kind"] == "summarize"]) == 1

    def test_retry_then_success(self):
        s, fake = make(FakeLLMAdapter(fail_times=2))
        out = run(s.summarize("some content to summarize properly"))
        assert out  # succeeded on 3rd attempt
        assert s.stats["total_retries"] == 2
        assert s.stats["total_failures"] == 0

    def test_fallback_after_exhausted_retries(self):
        s, fake = make(FakeLLMAdapter(fail_times=99))
        text = "First sentence here. Second sentence follows. " * 20
        out = run(s.summarize(text, max_length=100))
        assert out
        assert len(out) <= 103
        assert s.stats["total_failures"] == 1
        assert s.stats["total_fallbacks"] == 1

    def test_long_content_truncated(self):
        s, fake = make()
        run(s.summarize("y" * 20000))
        call = [c for c in fake.calls if c["kind"] == "summarize"][0]
        # adapter received truncated content (10k cap)
        assert len(call["content"]) <= 100  # recorded prefix only

    def test_invalid_summary_falls_back(self):
        class ShortAdapter(FakeLLMAdapter):
            async def summarize(self, content, content_type="text",
                                max_length=300, **kw):
                return "tiny"  # < min_summary_length

        s = ContentSummarizer(ShortAdapter(), max_retries=1)
        out = run(s.summarize("Real content that is long enough to matter."))
        assert out == "Real content that is long enough to matter."


class TestBatch:
    def test_summarize_all_contract(self):
        s, _ = make()
        out = run(
            s.summarize_all(
                text_chunks=["chunk one text", "chunk two text"],
                tables=[{"id": "table_0", "content": "| a |", "summary": "x"}],
                images=[{"id": "embedded_0", "base64": "QUJD", "path": "/x.png"}],
            )
        )
        assert [i["id"] for i in out] == [
            "text_0", "text_1", "table_0", "embedded_0",
        ]
        assert out[0]["type"] == "text"
        assert out[0]["raw"] == "chunk one text"
        assert out[2]["type"] == "table"
        assert out[3]["type"] == "image"
        assert out[3]["path"] == "/x.png"

    def test_parsed_document_metadata_attach(self):
        s, _ = make()
        parsed = {
            "text_chunks": [
                {"content": "alpha text", "metadata": {"page": 3}},
            ],
            "tables": [],
            "images": [],
        }
        out = run(s.summarize_parsed_document(parsed))
        assert out[0]["metadata"] == {"page": 3}

    def test_concurrency_bounded(self):
        peak = 0
        active = 0

        class TrackingAdapter(FakeLLMAdapter):
            async def summarize(self, *a, **kw):
                nonlocal peak, active
                active += 1
                peak = max(peak, active)
                await asyncio.sleep(0.01)
                active -= 1
                return "a reasonable summary result"

        s = ContentSummarizer(TrackingAdapter(), max_concurrent=3,
                              enable_cache=False)
        run(s.summarize_text_chunks([f"text number {i}" for i in range(12)]))
        assert peak <= 3

    def test_stats_shape(self):
        s, _ = make()
        run(s.summarize("content for the stats test here"))
        stats = run(s.get_stats())
        for key in ("total_summaries", "total_failures", "total_fallbacks",
                    "total_retries", "avg_summary_time", "failure_rate"):
            assert key in stats
        assert "cache" in stats
