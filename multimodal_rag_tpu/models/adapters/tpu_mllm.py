"""On-TPU multimodal adapter (vision + text generation).

Vision counterpart of :mod:`tpu_llm`: same ``BaseLLMAdapter`` contract as
the HTTP MLLM adapter (reference ``app/models/mllm_adapter.py`` — base64
``images`` on the request, image/table/text summarize prompts), but the
llava-architecture forward runs on the chip (models/llava.py: CLIP tower
→ MLP projector → decoder) instead of an Ollama-hosted llava.

Enable with ``USE_TPU_MLLM=true``; weights from a local HF llava
safetensors snapshot (``MMRAG_MLLM_CHECKPOINT_PATH``). Without one the
adapter still serves (random init + loud warning) so the pipeline stays
drivable offline. Generation calls serialize through an asyncio lock and
run in a worker thread — multimodal traffic is low-rate (image summaries
at ingest, occasional vision queries), so the coalescing machinery of the
text adapter is not replicated here.
"""

from __future__ import annotations

import asyncio
import base64
import logging
from typing import Any, Dict, List, Optional

from multimodal_rag_tpu.models.adapters.base import (
    BaseLLMAdapter,
    ModelCapability,
)

logger = logging.getLogger(__name__)


class TPUMLLMAdapter(BaseLLMAdapter):
    """Serves multimodal generation from an on-device llava stack."""

    def __init__(self, model_name: str = None, generator=None, **kwargs):
        super().__init__(model_name or "tpu-llava", **kwargs)
        self.backend = "tpu"
        self._gen = generator  # tests inject a tiny LlavaGenerator
        # Created once here (never rebound): it both serializes device
        # generation AND guards lazy init — two concurrent first calls
        # must not each build a LlavaGenerator (double checkpoint load,
        # ~2x HBM) or end up holding different lock objects.
        self._lock = asyncio.Lock()
        self._supports_vision = True

    async def initialize(self):
        if self.is_initialized:
            return
        async with self._lock:
            if self.is_initialized:  # lost the race to another caller
                return
            if self._gen is None:
                from multimodal_rag_tpu.config import settings

                ckpt = settings.MMRAG_MLLM_CHECKPOINT_PATH or None
                gen_cls = self._generator_class(ckpt)
                self._gen = await asyncio.to_thread(
                    gen_cls, checkpoint_path=ckpt,
                )
            if self._gen.pretrained:
                kind = type(self._gen).__name__.replace(
                    "Generator", ""
                ).lower()
                self.model_name = f"tpu-{kind} (pretrained)"
            self.is_initialized = True
        logger.info(
            "TPUMLLMAdapter initialized (pretrained=%s)", self._gen.pretrained
        )

    @staticmethod
    def _generator_class(checkpoint_path):
        """Pick the vision family from the checkpoint's config.json:
        ``gemma3`` → the SigLIP-tower Gemma3 VLM (models/gemma3_vlm.py),
        anything else (incl. no checkpoint) → the CLIP-tower llava."""
        if checkpoint_path:
            import json
            import os

            try:
                with open(
                    os.path.join(checkpoint_path, "config.json")
                ) as f:
                    if json.load(f).get("model_type") == "gemma3":
                        from multimodal_rag_tpu.models.gemma3_vlm import (
                            Gemma3VLMGenerator,
                        )

                        return Gemma3VLMGenerator
            except (OSError, ValueError) as e:
                logger.warning(
                    "Could not read %s/config.json (%s); defaulting to "
                    "the llava generator", checkpoint_path, e,
                )
        from multimodal_rag_tpu.models.llava import LlavaGenerator

        return LlavaGenerator

    async def cleanup(self):
        self.is_initialized = False

    @staticmethod
    def _decode_images(images: Optional[List[str]]) -> list:
        """base64 strings (the reference's wire format) → PIL images;
        undecodable entries are dropped with a warning."""
        from io import BytesIO

        from PIL import Image

        out = []
        for b64 in images or []:
            try:
                if b64.startswith("data:"):
                    b64 = b64.split(",", 1)[1]
                img = Image.open(BytesIO(base64.b64decode(b64)))
                # Image.open is lazy — force the full decode here so a
                # truncated payload is dropped now instead of failing
                # the whole generation later inside preprocess.
                img.load()
                out.append(img)
            except Exception as e:  # noqa: BLE001 — skip bad payloads
                logger.warning("Dropping undecodable image: %s", e)
        return out

    async def _generate(
        self, prompt: str, images: list, max_tokens: int, temperature: float,
        **kw,
    ) -> str:
        if not self.is_initialized:
            await self.initialize()
        async with self._lock:
            out = await asyncio.to_thread(
                self._gen.generate,
                prompt,
                images=images,
                max_new_tokens=max_tokens,
                temperature=temperature,
                top_k=int(kw.get("top_k", 64)),
            )
        return out.strip()

    async def generate_text(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        self._validate_input(prompt)
        return await self._generate(prompt, [], max_tokens, temperature,
                                    **kwargs)

    async def generate_multimodal(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        """Same composition as the reference MLLM adapter: tables fold
        into the prompt text; images ride as pixels."""
        self._validate_input(text)
        combined = text
        if tables:
            combined += "\n\nTables:\n" + "\n\n".join(tables)
        pil = self._decode_images(images)
        if images and not pil:
            # Every payload failed to decode: generating anyway would
            # answer an image prompt with NO image — a confidently
            # hallucinated description that gets cached and indexed.
            raise ValueError(
                f"none of the {len(images)} image payload(s) could be "
                "decoded"
            )
        return await self._generate(
            combined, pil, max_tokens, temperature, **kwargs
        )

    async def summarize(
        self,
        content: str,
        content_type: str = "text",
        max_length: int = 300,
        image_base64: Optional[str] = None,
        **kwargs,
    ) -> str:
        # These two are set explicitly below; a caller passing them too
        # would otherwise TypeError with "multiple values for argument".
        kwargs.pop("max_tokens", None)
        kwargs.pop("temperature", None)
        if content_type == "image" and image_base64:
            prompt = (
                "Describe the key information and visual elements in this "
                f"image concisely (max {max_length} characters):"
            )
            try:
                out = await self.generate_multimodal(
                    text=prompt,
                    images=[image_base64],
                    max_tokens=max(32, int(max_length / 2)),
                    temperature=0.3,
                    **kwargs,
                )
            except ValueError:
                # Undecodable payload: same degraded marker the HTTP MLLM
                # adapter uses, NOT a fabricated description.
                return "Image content (description unavailable)"
        else:
            self._validate_input(content)
            if content_type == "table":
                prompt = (
                    f"Summarize the key information in this table (max "
                    f"{max_length} characters):\n\n{content}\n\nSummary:"
                )
            else:
                prompt = (
                    "Summarize the following text concisely (max "
                    f"{max_length} characters):\n\n{content}\n\nSummary:"
                )
            out = await self._generate(
                prompt, [], max(32, int(max_length / 2)), 0.3, **kwargs
            )
        if len(out) > max_length:
            out = out[: max_length - 3] + "..."
        return out

    def get_capabilities(self) -> List[ModelCapability]:
        return [
            ModelCapability.TEXT_GENERATION,
            ModelCapability.MULTIMODAL,
            ModelCapability.VISION,
        ]

    async def health_check(self) -> Dict[str, Any]:
        health = await super().health_check()
        health.update(
            {
                "backend": "tpu",
                "supports_vision": True,
                "pretrained": bool(
                    self._gen is not None and self._gen.pretrained
                ),
            }
        )
        health["connection"] = "ok" if self.is_initialized else "not_initialized"
        return health
