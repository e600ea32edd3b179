"""Deterministic in-process adapter for tests and offline operation.

The ABC at ``base.py`` is the natural mock seam (SURVEY.md §4). The fake
produces deterministic summaries/answers, records calls, and can be
configured to fail N times (for retry/fallback tests).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from multimodal_rag_tpu.models.adapters.base import (
    BaseLLMAdapter,
    ModelCapability,
)


class FakeLLMAdapter(BaseLLMAdapter):
    def __init__(
        self,
        model_name: str = "fake-model",
        fail_times: int = 0,
        supports_vision: bool = True,
        latency: float = 0.0,
        **kwargs,
    ):
        super().__init__(model_name, **kwargs)
        self.fail_times = fail_times
        self._supports_vision = supports_vision
        self.latency = latency
        self.calls: List[Dict[str, Any]] = []

    async def initialize(self):
        self.is_initialized = True

    async def cleanup(self):
        self.is_initialized = False

    async def _maybe_fail(self):
        import asyncio

        if self.latency:
            await asyncio.sleep(self.latency)
        if self.fail_times > 0:
            self.fail_times -= 1
            raise RuntimeError("FakeLLMAdapter simulated failure")

    async def generate_text(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        self._validate_input(prompt)
        await self._maybe_fail()
        self.calls.append(
            {"kind": "text", "prompt": prompt, "max_tokens": max_tokens,
             "temperature": temperature}
        )
        return f"Answer to: {prompt[:80]}"

    async def generate_text_with_logprobs(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> "tuple[str, str, list]":
        """Same record shape as TPULLMAdapter.generate_text_with_logprobs
        (id/token/logprob/top tuples), with deterministic synthetic
        numbers so API-layer formatting is testable without a decoder."""
        text = await self.generate_text(
            prompt, max_tokens=max_tokens, temperature=temperature,
            **{k: v for k, v in kwargs.items()
               if k not in ("presence_penalty", "frequency_penalty",
                            "seed", "top_p")},
        )
        lps = [
            {
                "id": i,
                "token": w if i == 0 else f" {w}",
                "logprob": -0.1 * (i + 1),
                "top": [
                    (100 + j, f"alt{j}", -0.1 * (i + 1) - 0.01 * j)
                    for j in range(20)
                ],
            }
            for i, w in enumerate(text.split())
        ]
        return text, "stop", lps

    async def generate_multimodal(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        await self._maybe_fail()
        self.calls.append(
            {"kind": "multimodal", "text": text,
             "n_images": len(images or []), "n_tables": len(tables or []),
             "images": list(images or [])}
        )
        return f"Multimodal answer to: {text[:80]}"

    async def summarize(
        self,
        content: str,
        content_type: str = "text",
        max_length: int = 300,
        image_base64: Optional[str] = None,
        **kwargs,
    ) -> str:
        await self._maybe_fail()
        self.calls.append(
            {"kind": "summarize", "content_type": content_type,
             "content": content[:100]}
        )
        if content_type == "image":
            return f"[image summary] {content[:120]}"
        body = " ".join(content.split())
        return f"Summary: {body[:max_length - 9]}"

    def get_capabilities(self) -> List[ModelCapability]:
        caps = [ModelCapability.TEXT_GENERATION, ModelCapability.MULTIMODAL]
        if self._supports_vision:
            caps.append(ModelCapability.VISION)
        return caps
