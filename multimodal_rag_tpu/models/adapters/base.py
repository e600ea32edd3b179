"""Adapter interface contract.

Same surface as the reference's ``BaseLLMAdapter``
(``app/models/base_adapter.py:15-188``): capability enum, async lifecycle,
``generate_text`` / ``generate_multimodal`` / ``summarize``, health check,
and the 10k-char input validation cap.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from enum import Enum
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

DEFAULT_SYSTEM_PROMPT = (
    "You are a helpful AI assistant that provides accurate, "
    "detailed answers based on the given context."
)


class ModelCapability(Enum):
    TEXT_GENERATION = "text_generation"
    MULTIMODAL = "multimodal"
    VISION = "vision"
    EMBEDDING = "embedding"


class BaseLLMAdapter(ABC):
    def __init__(self, model_name: str = None, **kwargs):
        self.model_name = model_name
        self.system_prompt = kwargs.get("system_prompt", DEFAULT_SYSTEM_PROMPT)
        self.is_initialized = False

    @abstractmethod
    async def initialize(self):
        ...

    @abstractmethod
    async def cleanup(self):
        ...

    @abstractmethod
    async def generate_text(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        ...

    @abstractmethod
    async def generate_multimodal(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        ...

    @abstractmethod
    async def summarize(
        self,
        content: str,
        content_type: str = "text",
        max_length: int = 300,
        **kwargs,
    ) -> str:
        ...

    async def health_check(self) -> Dict[str, Any]:
        return {
            "status": "healthy" if self.is_initialized else "not_initialized",
            "model": self.model_name,
            "adapter": self.__class__.__name__,
        }

    def get_capabilities(self) -> List[ModelCapability]:
        return [ModelCapability.TEXT_GENERATION]

    def supports_capability(self, capability: ModelCapability) -> bool:
        return capability in self.get_capabilities()

    def _validate_input(self, text: str, max_length: int = 10000) -> bool:
        """Empty/over-long input guard (reference base_adapter.py:168-188)."""
        if not text or not text.strip():
            raise ValueError("Input text cannot be empty")
        if len(text) > max_length:
            raise ValueError(f"Input text too long (max {max_length} characters)")
        return True

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(model={self.model_name})"
