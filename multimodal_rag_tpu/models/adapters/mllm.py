"""Multimodal (vision) LLM adapter over Ollama LLaVA-class or OpenAI GPT-4o.

Behavioral counterpart of ``app/models/mllm_adapter.py``: llava/vision model
auto-discovery in Ollama with graceful degradation to text-only
(``:63-87``), base64 ``images`` array on ``/api/generate`` (``:211-241``),
OpenAI multimodal content parts with data: URLs (``:265-297``), and the
image/table/text summarize prompts (``:300-364``).
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
from multimodal_rag_tpu.models.adapters.llm import openai_chat

logger = logging.getLogger(__name__)


class MLLMAdapter(BaseLLMAdapter):
    def __init__(self, model_name: str = None, **kwargs):
        if settings.USE_LOCAL_LLM:
            self.backend = "ollama"
            model_name = model_name or "llava"
            self.ollama_base_url = settings.OLLAMA_BASE_URL
        else:
            self.backend = "openai"
            model_name = model_name or "gpt-4o"
            self.ollama_base_url = None
        super().__init__(model_name, **kwargs)
        self._supports_vision = True

    async def initialize(self):
        if self.is_initialized:
            return
        if self.backend == "openai":
            if not settings.OPENAI_API_KEY:
                raise ValueError("OPENAI_API_KEY not set")
        else:
            async with httpx.AsyncClient(timeout=10.0) as client:
                resp = await client.get(f"{self.ollama_base_url}/api/tags")
                if resp.status_code == 200:
                    names = [
                        m.get("name") for m in resp.json().get("models", [])
                    ]
                    vision = [
                        m for m in names
                        if "llava" in m.lower() or "vision" in m.lower()
                    ]
                    if not vision:
                        logger.warning(
                            "No multimodal models found in Ollama; "
                            "vision disabled"
                        )
                        self._supports_vision = False
                    elif self.model_name not in names:
                        self.model_name = vision[0]
                        logger.info("Using vision model: %s", self.model_name)
        self.is_initialized = True
        logger.info("MLLMAdapter initialized (%s)", self.backend)

    async def cleanup(self):
        self.is_initialized = False

    async def generate_text(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        # Client-input validation precedes backend init (see llm.py).
        self._validate_input(prompt)
        if not self.is_initialized:
            await self.initialize()
        if self.backend == "ollama":
            full_prompt = (
                f"{self.system_prompt}\n\nUser: {prompt}\n\nAssistant:"
            )
            return await self._ollama_generate(
                full_prompt, None, max_tokens, temperature
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
        )

    async def _ollama_generate(
        self,
        prompt: str,
        images: Optional[List[str]],
        max_tokens: int,
        temperature: float,
    ) -> str:
        payload: Dict[str, Any] = {
            "model": self.model_name,
            "prompt": prompt,
            "stream": False,
            "options": {
                "temperature": temperature,
                "num_predict": max_tokens,
            },
        }
        if images:
            payload["images"] = images
        async with httpx.AsyncClient(timeout=120.0) as client:
            resp = await client.post(
                f"{self.ollama_base_url}/api/generate", json=payload
            )
            if resp.status_code != 200:
                raise RuntimeError(f"Ollama error: {resp.status_code}")
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
        if not self.is_initialized:
            await self.initialize()
        if not self._supports_vision and images:
            logger.warning("Vision not supported, falling back to text-only")
            images = None
        context = text
        if tables:
            context += "\n\nTables:\n" + "\n\n".join(tables)
        if images and self._supports_vision:
            if self.backend == "ollama":
                return await self._ollama_generate(
                    f"{self.system_prompt}\n\n{context}",
                    images, max_tokens, temperature,
                )
            content: List[dict] = [{"type": "text", "text": context}]
            for img in images:
                content.append(
                    {
                        "type": "image_url",
                        "image_url": {
                            "url": f"data:image/jpeg;base64,{img}"
                        },
                    }
                )
            return await openai_chat(
                settings.OPENAI_API_KEY,
                self.model_name,
                [
                    {"role": "system", "content": self.system_prompt},
                    {"role": "user", "content": content},
                ],
                max_tokens,
                temperature,
            )
        return await self.generate_text(
            context, max_tokens, temperature, **kwargs
        )

    async def summarize(
        self,
        content: str,
        content_type: str = "text",
        max_length: int = 300,
        image_base64: Optional[str] = None,
        **kwargs,
    ) -> str:
        if not self.is_initialized:
            await self.initialize()
        if content_type == "image" and image_base64:
            prompt = (
                "Describe the key information and visual elements in this "
                f"image concisely (max {max_length} characters):"
            )
            if self._supports_vision:
                return await self.generate_multimodal(
                    text=prompt,
                    images=[image_base64],
                    max_tokens=int(max_length / 2),
                    temperature=0.3,
                )
            return "Image summarization not supported by current model"
        if content_type == "table":
            prompt = (
                f"Summarize the key information in this table (max "
                f"{max_length} characters):\n\n{content}\n\nSummary:"
            )
        else:
            prompt = (
                f"Summarize concisely (max {max_length} characters):\n\n"
                f"{content}\n\nSummary:"
            )
        summary = await self.generate_text(
            prompt, max_tokens=int(max_length / 2), temperature=0.3
        )
        if len(summary) > max_length:
            summary = summary[: max_length - 3] + "..."
        return summary

    def get_capabilities(self) -> List[ModelCapability]:
        caps = [ModelCapability.TEXT_GENERATION, ModelCapability.MULTIMODAL]
        if self._supports_vision:
            caps.append(ModelCapability.VISION)
        return caps

    async def health_check(self) -> Dict[str, Any]:
        health = await super().health_check()
        health.update(
            {
                "backend": self.backend,
                "model": self.model_name,
                "supports_vision": self._supports_vision,
            }
        )
        return health
