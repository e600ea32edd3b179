"""On-TPU multimodal adapter (vision + text generation).

Vision counterpart of :mod:`tpu_llm`: same ``BaseLLMAdapter`` contract as
the HTTP MLLM adapter (reference ``app/models/mllm_adapter.py`` — base64
``images`` on the request, image/table/text summarize prompts), but the
llava-architecture forward runs on the chip (models/llava.py: CLIP tower
→ MLP projector → decoder) instead of an Ollama-hosted llava.

Enable with ``USE_TPU_MLLM=true``; weights from a local HF llava
safetensors snapshot (``MMRAG_MLLM_CHECKPOINT_PATH``). Without one the
adapter still serves (random init + loud warning) so the pipeline stays
drivable offline.

Serving modes (r5, VERDICT r4 #4 — vision as a first-class citizen):

* ``TPU_LLM_CONTINUOUS=true`` (the production posture): requests join a
  :class:`~...serving_decode.DecodeServer` over the generator's language
  model. The vision tower encodes the images, ``prompt_rows`` splices
  soft tokens between token embeddings, and the row is admitted via one
  B=1 ``prefill_embeds`` pass — from then on it is an ordinary decode
  row in the shared continuous batch, which unlocks per-token SSE
  streaming, OpenAI logprobs, grammar-constrained output (tools /
  response_format) and concurrent vision+text decoding. This replaces
  the reference's serialized multimodal hot loop
  (``app/models/mllm_adapter.py:211-241``).
* otherwise: generation calls serialize through an asyncio lock and run
  in a worker thread (the pre-r5 posture, fine for low-rate ingest
  summaries).
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


class _LMView:
    """DecodeServer-shaped facade over a vision generator's language
    model: the server reads cfg/params/tokenizer/prompt_buckets/eos_id
    (+ the truncation counter and cache-posture attrs); the vision tower
    stays outside — image requests enter as pre-computed soft tokens
    (``prompt_rows`` → ``submit(prompt_embeds=...)``)."""

    windowed_cache = False  # full-length caches; windows stay mask-enforced
    cache_sharding = None

    def __init__(self, gen) -> None:
        from multimodal_rag_tpu.config import settings

        self.cfg = gen.cfg.text
        self.params = gen.params["lm"]
        self.tokenizer = gen.tokenizer
        self.prompt_buckets = tuple(gen.prompt_buckets)
        self.eos_id = gen.eos_id
        self.kv_quant = bool(
            getattr(settings, "TPU_LLM_KV_QUANT", False)
            and not getattr(self.cfg, "kv_lora_rank", 0)
        )
        self.truncated_prompts = 0


class TPUMLLMAdapter(BaseLLMAdapter):
    """Serves multimodal generation from an on-device llava stack."""

    def __init__(self, model_name: str = None, generator=None,
                 continuous: Optional[bool] = None, **kwargs):
        super().__init__(model_name or "tpu-llava", **kwargs)
        self.backend = "tpu"
        self._gen = generator  # tests inject a tiny LlavaGenerator
        # Created once here (never rebound): it both serializes device
        # generation AND guards lazy init — two concurrent first calls
        # must not each build a LlavaGenerator (double checkpoint load,
        # ~2x HBM) or end up holding different lock objects.
        self._lock = asyncio.Lock()
        self._supports_vision = True
        # Continuous batching over the LM (module docstring); None ⇒
        # follow the process serving posture (TPU_LLM_CONTINUOUS).
        self._continuous = continuous
        self._server = None
        self.requests_served = 0

    async def initialize(self):
        if self.is_initialized:
            return
        async with self._lock:
            if self.is_initialized:  # lost the race to another caller
                return
            from multimodal_rag_tpu.config import settings

            if self._gen is None:
                ckpt = settings.MMRAG_MLLM_CHECKPOINT_PATH or None
                gen_cls = self._generator_class(ckpt)
                self._gen = await asyncio.to_thread(
                    gen_cls, checkpoint_path=ckpt,
                )
            if self._continuous is None:
                self._continuous = settings.TPU_LLM_CONTINUOUS
            if self._continuous:
                from multimodal_rag_tpu.serving_decode import DecodeServer

                # Mirror the text adapter's serving knobs: chunked
                # passes + prefix cache serve the TEXT traffic (ingest
                # summaries re-use their instruction preamble); vision
                # rows take the one-shot embed admission either way.
                # Speculative decode stays off: vision traffic is
                # prefill-heavy and the extra compiled paths don't pay.
                self._server = DecodeServer(
                    _LMView(self._gen),
                    chunk_tokens=(
                        settings.TPU_LLM_PREFILL_CHUNK
                        if settings.TPU_LLM_CHUNKED_PREFILL else None
                    ),
                    prefix_entries=(
                        settings.TPU_LLM_PREFIX_CACHE
                        if settings.TPU_LLM_CHUNKED_PREFILL else 0
                    ),
                )
            if self._gen.pretrained:
                kind = type(self._gen).__name__.replace(
                    "Generator", ""
                ).lower()
                self.model_name = f"tpu-{kind} (pretrained)"
            self.is_initialized = True
        logger.info(
            "TPUMLLMAdapter initialized (pretrained=%s, continuous=%s)",
            self._gen.pretrained, bool(self._server),
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
        if self._server is not None:
            await self._server.stop()
            self._server = None

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

    #: The API layer checks this before accepting ``response_format`` /
    #: forced tool_choice for vision requests — grammar masking needs
    #: the continuous decode server (per-step masks ride the dispatch).
    @property
    def supports_grammar(self) -> bool:
        if self.is_initialized:
            return self._server is not None
        if self._continuous is not None:
            return bool(self._continuous)
        from multimodal_rag_tpu.config import settings

        return bool(settings.TPU_LLM_CONTINUOUS)

    #: Per-token logprob capture also needs the decode server — same
    #: availability condition as grammar masking.
    @property
    def supports_logprobs(self) -> bool:
        return self.supports_grammar

    def _compile_grammar(self, spec):
        from multimodal_rag_tpu.models.grammar import masker_for

        return masker_for(
            self._gen.tokenizer, spec, int(self._gen.eos_id),
            vocab_size=int(self._gen.cfg.text.vocab_size),
        )

    async def _submit_kwargs(self, images: list, **kw) -> Dict[str, Any]:
        """Shared continuous-path plumbing: tower-encode + splice on a
        worker thread (device work, off the event loop), plus the
        sampling kwargs the DecodeServer understands. The PROMPT rides
        pre-framed inside ``kw['_prompt']``."""
        prompt = kw.pop("_prompt")
        ids, embeds, overlay = await asyncio.to_thread(
            self._gen.prompt_rows, prompt, images
        )
        grammar = kw.pop("grammar", None)
        return dict(
            prompt_embeds=embeds,
            prompt_ids=ids,
            overlay=overlay,
            top_p=float(kw.get("top_p", 1.0)),
            seed=kw.get("seed"),
            presence_penalty=float(kw.get("presence_penalty", 0.0)),
            frequency_penalty=float(kw.get("frequency_penalty", 0.0)),
            grammar=self._compile_grammar(grammar) if grammar else None,
            logit_bias=kw.get("logit_bias"),
        )

    async def _generate(
        self, prompt: str, images: list, max_tokens: int, temperature: float,
        **kw,
    ) -> str:
        if not self.is_initialized:
            await self.initialize()
        if self._server is not None:
            sub = await self._submit_kwargs(images, _prompt=prompt, **kw)
            text = await self._server.submit(
                "", max_new_tokens=max_tokens, temperature=temperature,
                **sub,
            )
            self.requests_served += 1
            return text.strip()
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

    @staticmethod
    def _fold_tables(text: str, tables: Optional[List[str]]) -> str:
        """Same composition as the reference MLLM adapter: tables fold
        into the prompt text; images ride as pixels."""
        if tables:
            return text + "\n\nTables:\n" + "\n\n".join(tables)
        return text

    def _pil_or_raise(self, images: Optional[List[str]]) -> list:
        pil = self._decode_images(images)
        if images and not pil:
            # Every payload failed to decode: generating anyway would
            # answer an image prompt with NO image — a confidently
            # hallucinated description that gets cached and indexed.
            raise ValueError(
                f"none of the {len(images)} image payload(s) could be "
                "decoded"
            )
        return pil

    async def generate_multimodal(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        out, _fin = await self.generate_multimodal_with_finish(
            text, images=images, tables=tables, max_tokens=max_tokens,
            temperature=temperature, **kwargs,
        )
        return out

    async def generate_multimodal_with_finish(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> "tuple[str, str]":
        """``generate_multimodal`` + the OpenAI finish reason ("stop" |
        "length") for /v1/chat/completions vision requests. In
        continuous mode the row decodes in the shared batch (grammar /
        penalties / logit_bias honored); the worker-thread fallback
        reports "stop" (its budget semantics don't distinguish)."""
        self._validate_input(text)
        combined = self._fold_tables(text, tables)
        pil = self._pil_or_raise(images)
        if not self.is_initialized:
            await self.initialize()
        if self._server is None:
            out = await self._generate(
                combined, pil, max_tokens, temperature, **kwargs
            )
            return out, "stop"
        sub = await self._submit_kwargs(pil, _prompt=combined, **kwargs)
        out, fin = await self._server.submit(
            "", max_new_tokens=max_tokens, temperature=temperature,
            return_finish=True, **sub,
        )
        self.requests_served += 1
        return out.strip(), fin

    async def generate_multimodal_with_logprobs(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> "tuple[str, str, list]":
        """Vision generation + OpenAI logprobs (one record per emitted
        token — decoder._lp_top contract). Continuous mode only: the
        per-step capture rides the decode dispatch. The text is NOT
        whitespace-stripped (stripping would desynchronize it from the
        records)."""
        if not self.is_initialized:
            await self.initialize()
        if self._server is None:
            raise RuntimeError(
                "vision logprobs require continuous serving "
                "(TPU_LLM_CONTINUOUS=true)"
            )
        self._validate_input(text)
        combined = self._fold_tables(text, tables)
        pil = self._pil_or_raise(images)
        sub = await self._submit_kwargs(pil, _prompt=combined, **kwargs)
        out, fin, lps = await self._server.submit(
            "", max_new_tokens=max_tokens, temperature=temperature,
            logprobs=True, **sub,
        )
        self.requests_served += 1
        return out, fin, lps

    async def generate_multimodal_stream(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ):
        """Async generator of ``(text_delta, finish)`` pairs for SSE
        vision streaming: per-token in continuous mode (the decode
        server flushes deltas every step while other rows — text or
        vision — keep decoding); one coarse delta in worker-thread
        mode."""
        self._validate_input(text)
        combined = self._fold_tables(text, tables)
        pil = self._pil_or_raise(images)
        if not self.is_initialized:
            await self.initialize()
        if self._server is None:
            out = await self._generate(
                combined, pil, max_tokens, temperature, **kwargs
            )
            yield out, "stop"
            return
        sub = await self._submit_kwargs(pil, _prompt=combined, **kwargs)
        started = False
        async for delta, fin in self._server.submit_stream(
            "", max_new_tokens=max_tokens, temperature=temperature, **sub,
        ):
            if not started and delta:
                delta = delta.lstrip()
                started = bool(delta)
            if delta or fin is not None:
                yield delta, fin
        self.requests_served += 1

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
