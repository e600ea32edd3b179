"""LLM adapters: Ollama / OpenAI HTTP backends, on-TPU decoder, fake."""

from multimodal_rag_tpu.models.adapters.base import (
    BaseLLMAdapter,
    ModelCapability,
)
from multimodal_rag_tpu.models.adapters.fake import FakeLLMAdapter
from multimodal_rag_tpu.models.adapters.llm import LLMAdapter
from multimodal_rag_tpu.models.adapters.mllm import MLLMAdapter
from multimodal_rag_tpu.models.adapters.tpu_llm import TPULLMAdapter
from multimodal_rag_tpu.models.adapters.tpu_mllm import TPUMLLMAdapter

__all__ = [
    "BaseLLMAdapter",
    "ModelCapability",
    "LLMAdapter",
    "MLLMAdapter",
    "TPULLMAdapter",
    "TPUMLLMAdapter",
    "FakeLLMAdapter",
]
