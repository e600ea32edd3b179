"""LLM adapters: Ollama / OpenAI HTTP backends + fake for tests."""

from multimodal_rag_tpu.models.adapters.base import (
    BaseLLMAdapter,
    ModelCapability,
)
from multimodal_rag_tpu.models.adapters.fake import FakeLLMAdapter
from multimodal_rag_tpu.models.adapters.llm import LLMAdapter
from multimodal_rag_tpu.models.adapters.mllm import MLLMAdapter

__all__ = [
    "BaseLLMAdapter",
    "ModelCapability",
    "LLMAdapter",
    "MLLMAdapter",
    "FakeLLMAdapter",
]
