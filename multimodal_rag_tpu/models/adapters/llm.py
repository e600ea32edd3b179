"""Text-only LLM adapter over Ollama or OpenAI HTTP.

Behavioral counterpart of ``app/models/llm_adapter.py``: backend selected
from ``USE_LOCAL_LLM`` at construction, Ollama ``/api/tags`` availability
check on init, ``/api/generate`` with ``{temperature, num_predict, top_p,
top_k}`` options, OpenAI chat.completions with system+user messages, and
the same summarize prompt templates / truncation (``llm_adapter.py:225-290``).

The ``openai`` SDK is not in this environment; the OpenAI path speaks the
chat-completions HTTP contract directly through httpx.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import httpx

from multimodal_rag_tpu.config import settings
from multimodal_rag_tpu.models.adapters.base import (
    BaseLLMAdapter,
    ModelCapability,
)

logger = logging.getLogger(__name__)

OPENAI_API_BASE = "https://api.openai.com/v1"


async def openai_chat(
    api_key: str,
    model: str,
    messages: List[dict],
    max_tokens: int,
    temperature: float,
    **kwargs,
) -> str:
    async with httpx.AsyncClient(timeout=120.0) as client:
        resp = await client.post(
            f"{OPENAI_API_BASE}/chat/completions",
            headers={"Authorization": f"Bearer {api_key}"},
            json={
                "model": model,
                "messages": messages,
                "max_tokens": max_tokens,
                "temperature": temperature,
                **{
                    k: v
                    for k, v in kwargs.items()
                    if k in ("top_p", "frequency_penalty", "presence_penalty")
                },
            },
        )
        if resp.status_code != 200:
            raise RuntimeError(
                f"OpenAI API error: {resp.status_code} - {resp.text[:300]}"
            )
        return resp.json()["choices"][0]["message"]["content"].strip()


class LLMAdapter(BaseLLMAdapter):
    """Auto-switches between Ollama (local) and OpenAI (cloud)."""

    def __init__(self, model_name: str = None, **kwargs):
        if settings.USE_LOCAL_LLM:
            self.backend = "ollama"
            model_name = model_name or settings.OLLAMA_MODEL
            self.ollama_base_url = settings.OLLAMA_BASE_URL
        else:
            self.backend = "openai"
            model_name = model_name or settings.OPENAI_MODEL
            self.ollama_base_url = None
        super().__init__(model_name, **kwargs)

    async def initialize(self):
        if self.is_initialized:
            return
        if self.backend == "openai":
            if not settings.OPENAI_API_KEY:
                raise ValueError("OPENAI_API_KEY not set in environment")
        else:
            async with httpx.AsyncClient(timeout=10.0) as client:
                resp = await client.get(f"{self.ollama_base_url}/api/tags")
                if resp.status_code != 200:
                    raise ConnectionError(
                        f"Ollama returned status {resp.status_code}"
                    )
                names = [m.get("name") for m in resp.json().get("models", [])]
                if self.model_name not in names:
                    logger.warning(
                        "Model '%s' not found in Ollama; available: %s",
                        self.model_name, names,
                    )
        self.is_initialized = True
        logger.info("LLMAdapter initialized (%s)", self.backend)

    async def cleanup(self):
        self.is_initialized = False

    async def generate_text(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        # Validate before initialize: a client error (empty / oversized
        # prompt) is determinable without a backend, and must not surface
        # as a retryable backend-connection failure when the LLM is down.
        self._validate_input(prompt)
        if not self.is_initialized:
            await self.initialize()
        if self.backend == "ollama":
            return await self._generate_ollama(
                prompt, max_tokens, temperature, **kwargs
            )
        return await openai_chat(
            settings.OPENAI_API_KEY,
            self.model_name,
            [
                {"role": "system", "content": self.system_prompt},
                {"role": "user", "content": prompt},
            ],
            max_tokens,
            temperature,
            **kwargs,
        )

    async def _generate_ollama(
        self, prompt: str, max_tokens: int, temperature: float, **kwargs
    ) -> str:
        full_prompt = f"{self.system_prompt}\n\nUser: {prompt}\n\nAssistant:"
        async with httpx.AsyncClient(timeout=120.0) as client:
            resp = await client.post(
                f"{self.ollama_base_url}/api/generate",
                json={
                    "model": self.model_name,
                    "prompt": full_prompt,
                    "stream": False,
                    "options": {
                        "temperature": temperature,
                        "num_predict": max_tokens,
                        "top_p": kwargs.get("top_p", 0.9),
                        "top_k": kwargs.get("top_k", 40),
                    },
                },
            )
            if resp.status_code != 200:
                raise RuntimeError(
                    f"Ollama API error: {resp.status_code} - {resp.text[:300]}"
                )
            return resp.json().get("response", "").strip()

    async def generate_multimodal(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        """Text-only fallback: folds tables in, drops images (reference
        ``llm_adapter.py:196-223``)."""
        combined = text
        if tables:
            combined += "\n\nTables:\n" + "\n\n".join(tables)
        if images:
            logger.warning(
                "Images provided but LLMAdapter cannot process them."
            )
        return await self.generate_text(
            combined, max_tokens, temperature, **kwargs
        )

    async def summarize(
        self,
        content: str,
        content_type: str = "text",
        max_length: int = 300,
        **kwargs,
    ) -> str:
        if not self.is_initialized:
            await self.initialize()
        self._validate_input(content)
        if content_type == "table":
            prompt = (
                "Summarize the key information and trends in this table "
                f"concisely (max {max_length} characters):\n\n{content}\n\n"
                "Summary:"
            )
        else:
            prompt = (
                "Summarize the following text concisely, focusing on key "
                f"concepts and information (max {max_length} characters):\n\n"
                f"{content}\n\nSummary:"
            )
        summary = await self.generate_text(
            prompt, max_tokens=int(max_length / 2), temperature=0.3, **kwargs
        )
        if len(summary) > max_length:
            summary = summary[: max_length - 3] + "..."
        return summary

    def get_capabilities(self) -> List[ModelCapability]:
        return [ModelCapability.TEXT_GENERATION]

    async def health_check(self) -> Dict[str, Any]:
        health = await super().health_check()
        health.update({"backend": self.backend, "model": self.model_name})
        try:
            if self.backend == "ollama":
                async with httpx.AsyncClient(timeout=5.0) as client:
                    resp = await client.get(f"{self.ollama_base_url}/api/tags")
                    health["connection"] = (
                        "ok" if resp.status_code == 200 else "failed"
                    )
            elif self.backend == "openai" and self.is_initialized:
                health["connection"] = "ok"
            else:
                health["connection"] = "not_initialized"
        except Exception as e:  # noqa: BLE001
            health["connection"] = f"error: {e}"
        return health
