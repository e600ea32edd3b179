"""On-TPU text-generation adapter.

Same ``BaseLLMAdapter`` contract as the HTTP adapters (reference
``app/models/llm_adapter.py``), but generation runs on the chip this
framework already owns instead of round-tripping to Ollama/OpenAI —
removing the reference's dominant latency term (SURVEY.md §3.2: one HTTP
LLM call per chunk/table/image is THE ingest hot loop, and answer
generation dominates ``/query``).

Enable with ``USE_TPU_LLM=true``. Weights come from a local Llama/Qwen2/
Gemma safetensors snapshot (``MMRAG_LLM_CHECKPOINT_PATH``); without one
the adapter still serves — with seeded random weights and a loud warning —
so the full pipeline stays drivable offline.

Concurrency: generation is synchronous device work. Calls enqueue into a
coalescing worker — requests that arrive while a batch is in flight are
grouped by generation preset (max-token bucket, temperature, top_k) and
run as ONE left-padded device batch, so the summarizer's semaphore-5
fan-out (reference ``summarizer.py:125``) becomes batched decode instead
of five serialized single-row generations. Decode is weight-streaming
bound, so rows are nearly free: batching N requests costs ~1x latency,
not Nx.
"""

from __future__ import annotations

import asyncio
import functools
import logging
from typing import Any, Dict, List, Optional

from multimodal_rag_tpu.models.adapters.base import (
    BaseLLMAdapter,
    ModelCapability,
)

logger = logging.getLogger(__name__)

SUMMARY_PROMPTS = {
    # Mirrors LLMAdapter.summarize's templates (reference
    # llm_adapter.py:225-290) so summaries are backend-independent.
    "table": (
        "Summarize the key information and trends in this table "
        "concisely (max {max_length} characters):\n\n{content}\n\nSummary:"
    ),
    "text": (
        "Summarize the following text concisely, focusing on key "
        "concepts and information (max {max_length} characters):\n\n"
        "{content}\n\nSummary:"
    ),
}


def parse_lora_adapters(raw: str) -> "List[tuple]":
    """``MMRAG_LORA_ADAPTERS`` — comma-separated ``name=/peft/dir``
    entries → [(name, path)] for S-LoRA stacking. Malformed entries and
    missing paths raise (same posture as find_lora_paths: silently
    serving the base under a finetune's name is a correctness lie)."""
    import os

    pairs: List[tuple] = []
    for entry in (raw or "").split(","):
        entry = entry.strip()
        if not entry:
            continue
        name, sep, path = entry.partition("=")
        name, path = name.strip(), path.strip()
        if not sep or not name or not path:
            raise ValueError(
                f"MMRAG_LORA_ADAPTERS entry {entry!r} is not name=/path"
            )
        if not os.path.exists(path):
            raise ValueError(
                f"MMRAG_LORA_ADAPTERS adapter path does not exist: {path}"
            )
        pairs.append((name, path))
    return pairs


class LoRAView:
    """One named S-LoRA adapter served over a SHARED :class:`TPULLMAdapter`
    — the multi-model registry entry for a finetune that costs no extra
    weight copy. Generation calls inject ``adapter=<name>`` (routed to
    the stacked side-path by the decoder); everything else proxies to the
    base adapter. VERDICT r3 §3: N adapters, one base weight set."""

    def __init__(self, base: "TPULLMAdapter", name: str) -> None:
        self._base = base
        self._adapter_name = name
        self.model_name = name

    def __getattr__(self, item):
        return getattr(self._base, item)

    async def generate_text(self, *a, **kw):
        kw.setdefault("adapter", self._adapter_name)
        return await self._base.generate_text(*a, **kw)

    async def generate_text_with_finish(self, *a, **kw):
        kw.setdefault("adapter", self._adapter_name)
        return await self._base.generate_text_with_finish(*a, **kw)

    async def generate_text_with_logprobs(self, *a, **kw):
        kw.setdefault("adapter", self._adapter_name)
        return await self._base.generate_text_with_logprobs(*a, **kw)

    def generate_text_stream(self, *a, **kw):
        kw.setdefault("adapter", self._adapter_name)
        return self._base.generate_text_stream(*a, **kw)

    async def generate_multimodal(self, *a, **kw):
        kw.setdefault("adapter", self._adapter_name)
        return await self._base.generate_multimodal(*a, **kw)

    async def summarize(self, *a, **kw):
        kw.setdefault("adapter", self._adapter_name)
        return await self._base.summarize(*a, **kw)

    async def summarize_batch(self, *a, **kw):
        kw.setdefault("adapter", self._adapter_name)
        return await self._base.summarize_batch(*a, **kw)


class TPULLMAdapter(BaseLLMAdapter):
    """Serves ``generate_text``/``summarize`` from an on-device decoder."""

    # Batch ceiling for coalesced decode; matches TextDecoder's largest
    # batch bucket so a full batch still hits a compiled shape.
    MAX_COALESCE = 8

    def __init__(self, model_name: str = None, decoder=None,
                 continuous: Optional[bool] = None,
                 checkpoint_path: Optional[str] = None,
                 lora_paths: Optional[List[str]] = None,
                 lora_stack: "Optional[List[tuple]]" = None, **kwargs):
        super().__init__(model_name or "tpu-local", **kwargs)
        self.backend = "tpu"
        self._decoder = decoder  # tests inject a tiny TextDecoder
        # Multi-model serving: a registry entry pins its OWN checkpoint
        # (and optional LoRA adapters) instead of the global settings
        # default; weights load lazily on first use.
        self._checkpoint_path = checkpoint_path
        self._lora_paths = lora_paths
        # S-LoRA multi-adapter serving: (name, path) pairs stacked as
        # runtime side-paths over ONE base copy (lora.stack_lora_adapters);
        # requests route by name via the ``adapter`` kwarg / the OpenAI
        # ``model`` param (server.api builds a LoRAView per name). None ⇒
        # parse MMRAG_LORA_ADAPTERS at initialize.
        self._lora_stack = lora_stack
        self._queue: Optional[asyncio.Queue] = None
        # Requests deferred by _drain for a different generation preset:
        # considered BEFORE fresh queue arrivals next round, so a
        # minority-preset request cannot be starved by a steady
        # majority-preset stream re-queuing it behind newer work.
        self._carry: List = []
        self._worker: Optional[asyncio.Task] = None
        self._server = None  # DecodeServer when continuous batching is on
        self._continuous = continuous
        self._init_lock = asyncio.Lock()
        self._batches_run = 0
        self._seed = 0  # evolves per batch so temperature>0 really samples
        self.requests_served = 0

    @property
    def truncated_prompts(self) -> int:
        """Prompts that exceeded the top prompt bucket and kept only
        their tail (earlier RAG context dropped) — surfaced in /stats so
        silent context loss is observable (raise TPU_LLM_PROMPT_BUCKETS
        when this grows)."""
        if self._decoder is None:
            return 0
        return getattr(self._decoder, "truncated_prompts", 0)

    @property
    def spec_stats(self) -> Optional[Dict[str, Any]]:
        """Speculative-decoding acceptance stats (None when disabled or
        in continuous mode, where spec does not apply). tokens_per_step
        is the realized speedup over one-token-per-pass decoding."""
        d = self._decoder
        if (
            d is None
            or not getattr(d, "spec_enabled", False)
            or self._server is not None
        ):
            return None
        return {
            "enabled": True,
            "spec_k": d.spec_k,
            "verify_steps": d.spec_iters,
            "tokens_emitted": d.spec_emitted,
            "tokens_per_step": round(
                d.spec_emitted / max(1, d.spec_iters), 2
            ),
            # Per-row acceptance: emitted / passes-while-live, summed
            # over rows. The batch-shared tokens_per_step above is the
            # realized device speedup (a batch dispatch costs
            # max-over-rows passes); this one is draft quality.
            "tokens_per_row_pass": round(
                d.spec_emitted / max(1, getattr(d, "spec_row_passes", 0)),
                2,
            ),
        }

    @property
    def batches_run(self) -> int:
        """Device dispatches that carried batched work: coalesced batches
        in queue mode; decode steps (each one advances every joined row)
        in continuous mode — so the counter is live in BOTH modes."""
        if self._server is not None:
            return self._server.steps_run
        return self._batches_run

    async def initialize(self):
        # Serialized: lazy first-use can race (a gather of summarize()
        # calls), and two interleaved inits would load the multi-GB
        # params twice and orphan a worker on a replaced queue.
        async with self._init_lock:
            await self._initialize_locked()

    async def _initialize_locked(self):
        if self.is_initialized:
            return
        if self._decoder is None:
            from multimodal_rag_tpu.config import settings
            from multimodal_rag_tpu.models.decoder import TextDecoder

            lora_stack = self._lora_stack
            if lora_stack is None:
                lora_stack = parse_lora_adapters(
                    settings.MMRAG_LORA_ADAPTERS
                )
            self._decoder = await asyncio.to_thread(
                TextDecoder,
                checkpoint_path=(
                    self._checkpoint_path
                    or settings.MMRAG_LLM_CHECKPOINT_PATH or None
                ),
                quantize=(
                    "int4"
                    if settings.TPU_LLM_QUANTIZE
                    and settings.TPU_LLM_QUANTIZE_BITS == 4
                    else settings.TPU_LLM_QUANTIZE
                ),
                lora_paths=self._lora_paths,
                lora_stack=lora_stack or None,
            )
        if self._continuous is None:
            from multimodal_rag_tpu.config import settings

            self._continuous = settings.TPU_LLM_CONTINUOUS
        if self._continuous:
            from multimodal_rag_tpu.config import settings
            from multimodal_rag_tpu.serving_decode import DecodeServer

            spec_k = 0
            if getattr(self._decoder, "spec_enabled", False):
                if settings.TPU_LLM_CHUNKED_PREFILL:
                    # Decode-only passes draft+verify K+1 tokens per
                    # dispatch (serving_decode._step_spec) — rows still
                    # join at token boundaries.
                    spec_k = settings.TPU_LLM_SPEC_K
                else:
                    logger.warning(
                        "TPU_LLM_SPECULATIVE in continuous-batching mode "
                        "requires TPU_LLM_CHUNKED_PREFILL=true (the "
                        "speculative scheduler rides the chunked unpadded "
                        "layout); running plain one-token steps."
                    )
            self._server = DecodeServer(
                self._decoder,
                chunk_tokens=(
                    settings.TPU_LLM_PREFILL_CHUNK
                    if settings.TPU_LLM_CHUNKED_PREFILL else None
                ),
                prefix_entries=(
                    settings.TPU_LLM_PREFIX_CACHE
                    if settings.TPU_LLM_CHUNKED_PREFILL else 0
                ),
                spec_k=spec_k,
            )
        else:
            self._queue = asyncio.Queue()
            self._worker = asyncio.create_task(self._drain())
        if self._decoder.pretrained:
            self.model_name = "tpu-local (pretrained)"
        self.is_initialized = True
        logger.info(
            "TPULLMAdapter initialized (pretrained=%s, vocab=%d, layers=%d)",
            self._decoder.pretrained,
            self._decoder.cfg.vocab_size,
            self._decoder.cfg.num_layers,
        )

    async def cleanup(self):
        self.is_initialized = False
        if self._worker is not None:
            worker, self._worker = self._worker, None
            worker.cancel()
            try:
                await worker
            except (asyncio.CancelledError, Exception):  # noqa: BLE001
                pass
            # Queued/deferred waiters would otherwise hang forever.
            err = RuntimeError("TPULLMAdapter shut down")
            leftovers = list(self._carry)
            self._carry = []
            while self._queue is not None and not self._queue.empty():
                leftovers.append(self._queue.get_nowait())
            for item in leftovers:
                fut = item[-1]
                if not fut.done():
                    fut.set_exception(err)
        if self._server is not None:
            await self._server.stop()
            self._server = None

    async def _drain(self) -> None:
        """Coalescing worker: take the oldest pending request (deferred
        carryover first — FIFO across rounds), opportunistically absorb
        requests with the same generation preset, run one batched
        generate, fan results back out. Queue items are
        ``(prompts, preset_key, raw_max_tokens, seed, (pres, freq,
        logit_bias), future)`` — penalties and logit_bias ride per-row
        (like seed/budget), so they never fragment coalescing."""
        while True:
            if self._carry:
                first = self._carry.pop(0)
            else:
                first = await self._queue.get()
            batch = [first]
            room = self.MAX_COALESCE - len(first[0])
            # Oldest-first candidate order: previously deferred requests,
            # then whatever has arrived on the queue since.
            candidates = self._carry
            self._carry = []
            while not self._queue.empty():
                candidates.append(self._queue.get_nowait())
            deferred = []
            for req in candidates:
                if room > 0 and req[1] == first[1] and len(req[0]) <= room:
                    batch.append(req)
                    room -= len(req[0])
                else:
                    deferred.append(req)
            self._carry = deferred  # served at the FRONT next round
            prompts = [p for req in batch for p in req[0]]
            bucket, temperature, top_k, top_p, want_lp = first[1]
            budgets = [req[2] for req in batch for _ in req[0]]
            # Per-request OpenAI seed: rows with one sample from their own
            # key stream (reproducible regardless of batch neighbors);
            # unseeded rows fold the evolving batch seed.
            row_seeds = [req[3] for req in batch for _ in req[0]]
            row_pres = [req[4][0] for req in batch for _ in req[0]]
            row_freq = [req[4][1] for req in batch for _ in req[0]]
            row_bias = [req[4][2] for req in batch for _ in req[0]]
            row_adapters = [req[4][3] for req in batch for _ in req[0]]
            seed = self._seed
            self._seed += 1
            try:
                res = await asyncio.to_thread(
                    functools.partial(
                        self._decoder.generate,
                        prompts,
                        # The bucket picks the executable; each row is
                        # sliced against its own raw client budget.
                        max_new_tokens=bucket,
                        max_new_per_row=budgets,
                        temperature=temperature,
                        top_k=top_k,
                        top_p=top_p,
                        seed=seed,
                        seed_per_row=row_seeds,
                        presence_per_row=row_pres,
                        frequency_per_row=row_freq,
                        return_finish=True,
                        logprobs=want_lp,
                        bias_per_row=(
                            row_bias if any(row_bias) else None
                        ),
                        adapter_per_row=(
                            row_adapters if any(row_adapters) else None
                        ),
                    )
                )
                outs, fins = res[0], res[1]
                lps = res[2] if want_lp else None
                i = 0
                for req_prompts, _key, _raw, _seed, _pen, fut in batch:
                    n = len(req_prompts)
                    if not fut.done():
                        fut.set_result((
                            outs[i:i + n], fins[i:i + n],
                            lps[i:i + n] if want_lp else None,
                        ))
                    i += n
                self._batches_run += 1
                self.requests_served += len(batch)
            except asyncio.CancelledError:
                # cleanup(): CancelledError is a BaseException — without
                # this clause the in-flight batch's futures never resolve
                # and their HTTP requests hang forever.
                err = RuntimeError("TPULLMAdapter shut down")
                for *_rest, fut in batch:
                    if not fut.done():
                        fut.set_exception(err)
                raise
            except Exception as e:  # noqa: BLE001 — fail the waiters, not the loop
                for *_rest, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    #: The API layer checks this before accepting ``response_format``
    #: (grammar-constrained JSON) — HTTP adapters can't enforce it.
    supports_grammar = True

    def _compile_grammar(self, spec):
        """Grammar spec tuple (from ``grammar.compile_response_format``)
        → cached TokenMasker over THIS decoder's tokenizer."""
        from multimodal_rag_tpu.models.grammar import masker_for

        return masker_for(
            self._decoder.tokenizer, spec, int(self._decoder.eos_id),
            vocab_size=int(self._decoder.cfg.vocab_size),
        )

    async def _generate_batch(
        self, prompts: List[str], max_tokens: int, temperature: float,
        logprobs: bool = False, **kw
    ) -> "tuple[List[str], List[str], Optional[list]]":
        """Returns (texts, finish_reasons, lps) — finish is "stop" (EOS)
        / "length"; lps is None unless ``logprobs`` (then one per-token
        record list per prompt — decoder.TextDecoder.generate docs).
        ``grammar`` in ``kw`` (a spec tuple) constrains sampling to the
        grammar's language: in continuous mode the decode server masks
        in-batch; in coalesced mode the request takes a host-driven
        stepped loop (generate_constrained) instead of the queue."""
        if not self.is_initialized:
            await self.initialize()
        grammar = kw.pop("grammar", None)
        # S-LoRA routing: named adapter → stack slot (0 = base). Unknown
        # names raise (KeyError) — the API layer validates names against
        # the registry before calls reach here.
        adapter = kw.pop("adapter", None)
        aid = self._decoder.adapter_index(adapter) if adapter else 0
        masker = self._compile_grammar(grammar) if grammar else None
        if self._server is None and masker is not None:
            results = []
            for p in prompts:
                results.append(await asyncio.to_thread(
                    functools.partial(
                        self._decoder.generate_constrained,
                        p, masker,
                        max_new_tokens=max_tokens,
                        temperature=temperature,
                        top_k=int(kw.get("top_k", 64)),
                        top_p=float(kw.get("top_p", 1.0)),
                        seed=kw.get("seed"),
                        presence_penalty=float(
                            kw.get("presence_penalty", 0.0)
                        ),
                        frequency_penalty=float(
                            kw.get("frequency_penalty", 0.0)
                        ),
                        logprobs=logprobs,
                        logit_bias=kw.get("logit_bias"),
                        adapter_id=aid,
                    )
                ))
            self._batches_run += len(results)
            self.requests_served += len(results)
            return (
                [r[0] for r in results],
                [r[1] for r in results],
                [r[2] for r in results] if logprobs else None,
            )
        if self._server is not None:
            tuples = await asyncio.gather(
                *(
                    self._server.submit(
                        p, max_new_tokens=max_tokens,
                        temperature=temperature, return_finish=True,
                        top_p=float(kw.get("top_p", 1.0)),
                        seed=kw.get("seed"),
                        presence_penalty=float(
                            kw.get("presence_penalty", 0.0)
                        ),
                        frequency_penalty=float(
                            kw.get("frequency_penalty", 0.0)
                        ),
                        logprobs=logprobs,
                        grammar=masker,
                        logit_bias=kw.get("logit_bias"),
                        adapter_id=aid,
                    )
                    for p in prompts
                )
            )
            self.requests_served += len(prompts)
            return (
                [t[0] for t in tuples],
                [t[1] for t in tuples],
                [t[2] for t in tuples] if logprobs else None,
            )
        # Key on the BUCKETED token budget and the SNAPPED temperature —
        # the executable-selecting statics — so e.g. max_tokens 140 and
        # 150 (both bucket 256) coalesce into one batch, and client-swept
        # temperatures cannot fragment batching (or force recompiles).
        from multimodal_rag_tpu.models.decoder import (
            GEN_BUCKETS,
            bucket_for,
            snap_temperature,
            snap_top_p,
        )

        # top_p is traced (never a recompile) but joins the coalescing
        # key so one batch shares a nucleus threshold; snapping keeps
        # client-swept floats from fragmenting batches.
        # logprobs joins the key: it selects a different executable
        # (static capture branch), so lp and non-lp requests never share
        # a dispatch.
        key = (
            bucket_for(int(max_tokens), GEN_BUCKETS),
            snap_temperature(temperature),
            int(kw.get("top_k", 64)),
            snap_top_p(kw.get("top_p", 1.0)),
            bool(logprobs),
        )
        fut = asyncio.get_running_loop().create_future()
        # The raw budget (and per-request seed/penalties/adapter) ride
        # alongside the bucketed key: batching is by bucket, but each row
        # is truncated to its client budget, sampled from its own seed
        # stream, biased by its own penalties, and routed to its own
        # S-LoRA adapter slot.
        await self._queue.put(
            (
                list(prompts), key, int(max_tokens), kw.get("seed"),
                (
                    float(kw.get("presence_penalty", 0.0)),
                    float(kw.get("frequency_penalty", 0.0)),
                    kw.get("logit_bias"),
                    aid,
                ),
                fut,
            )
        )
        return await fut

    async def generate_text(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        text, _fin = await self.generate_text_with_finish(
            prompt, max_tokens=max_tokens, temperature=temperature, **kwargs
        )
        return text

    def format_chat(self, messages, tools=None) -> "Optional[str]":
        """Render OpenAI messages through the CHECKPOINT's chat template
        (models/chat_template.py) — the prompt format the weights were
        trained on. None when no template ships with the snapshot (base
        models / random-init); the API layer then folds the chat into
        the plain completion framing. Callers pass the result back with
        ``raw=True`` so the adapter's own framing is skipped. ``tools``
        are rendered by templates that consume them (see
        :attr:`template_accepts_tools`)."""
        if self._decoder is None:
            return None
        fmt = getattr(self._decoder, "format_chat", None)
        if fmt is None:
            return None
        return fmt(messages, tools=tools)

    @property
    def template_accepts_tools(self) -> bool:
        return bool(
            self._decoder is not None
            and getattr(self._decoder, "template_accepts_tools", False)
        )

    def _frame(self, prompt: str, raw: bool) -> str:
        if raw:
            return prompt
        return f"{self.system_prompt}\n\nUser: {prompt}\n\nAssistant:"

    async def generate_text_with_finish(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        raw: bool = False,
        **kwargs,
    ) -> "tuple[str, str]":
        """Like ``generate_text`` but also returns the OpenAI-style finish
        reason ("stop" | "length") for /v1/chat/completions. ``raw=True``
        sends the prompt verbatim (a chat-template render — see
        :meth:`format_chat`) instead of the system/user framing."""
        self._validate_input(prompt)
        full = self._frame(prompt, raw)
        outs, fins, _ = await self._generate_batch(
            [full], max_tokens, temperature, **kwargs
        )
        return outs[0].strip(), fins[0]

    async def generate_text_with_logprobs(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> "tuple[str, str, list]":
        """``generate_text_with_finish`` + OpenAI logprobs: also returns
        one record per emitted token — ``{"id", "token", "logprob",
        "top": [(id, token, logprob)] * LOGPROBS_K}``. The text is NOT
        whitespace-stripped here (stripping would desynchronize it from
        the per-token records); the API layer renders both verbatim."""
        self._validate_input(prompt)
        full = self._frame(prompt, kwargs.pop("raw", False))
        outs, fins, lps = await self._generate_batch(
            [full], max_tokens, temperature, logprobs=True, **kwargs
        )
        return outs[0], fins[0], lps[0]

    async def generate_text_stream(
        self,
        prompt: str,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ):
        """Async generator of ``(text_delta, finish)`` pairs for SSE
        streaming. Per-token in continuous mode (the decode server
        flushes deltas each step while other rows keep decoding); in
        coalesced mode the full completion arrives as one delta — still
        valid streaming semantics, just coarse."""
        self._validate_input(prompt)
        if not self.is_initialized:
            await self.initialize()
        full = self._frame(prompt, kwargs.pop("raw", False))
        if self._server is not None:
            # Suppress leading whitespace so streamed content matches the
            # stripped non-streaming result ('Assistant:' prompts often
            # open with newlines); trailing space can't be trimmed without
            # withholding the final delta, which is an acceptable delta.
            started = False
            gram = kwargs.get("grammar")
            adapter = kwargs.pop("adapter", None)
            async for delta, fin in self._server.submit_stream(
                full, max_new_tokens=max_tokens, temperature=temperature,
                top_p=float(kwargs.get("top_p", 1.0)),
                seed=kwargs.get("seed"),
                presence_penalty=float(
                    kwargs.get("presence_penalty", 0.0)
                ),
                frequency_penalty=float(
                    kwargs.get("frequency_penalty", 0.0)
                ),
                grammar=self._compile_grammar(gram) if gram else None,
                logit_bias=kwargs.get("logit_bias"),
                adapter_id=(
                    self._decoder.adapter_index(adapter) if adapter else 0
                ),
            ):
                if not started and delta:
                    delta = delta.lstrip()
                    started = bool(delta)
                if delta or fin is not None:
                    yield delta, fin
            self.requests_served += 1
            return
        outs, fins, _ = await self._generate_batch(
            [full], max_tokens, temperature, **kwargs
        )
        yield outs[0].strip(), fins[0]

    async def generate_multimodal(
        self,
        text: str,
        images: Optional[List[str]] = None,
        tables: Optional[List[str]] = None,
        max_tokens: int = 1000,
        temperature: float = 0.7,
        **kwargs,
    ) -> str:
        """Text-only degradation, same shape as LLMAdapter's (reference
        ``llm_adapter.py:196-223``): tables fold into the prompt, images
        are dropped with a warning."""
        combined = text
        if tables:
            combined += "\n\nTables:\n" + "\n\n".join(tables)
        if images:
            logger.warning(
                "Images provided but TPULLMAdapter is text-only; "
                "enable the MLLM adapter for vision."
            )
        return await self.generate_text(
            combined, max_tokens, temperature, **kwargs
        )

    def _summary_prompt(
        self, content: str, content_type: str, max_length: int
    ) -> str:
        tmpl = SUMMARY_PROMPTS.get(content_type, SUMMARY_PROMPTS["text"])
        return tmpl.format(max_length=max_length, content=content)

    async def summarize(
        self,
        content: str,
        content_type: str = "text",
        max_length: int = 300,
        **kwargs,
    ) -> str:
        self._validate_input(content)
        out, _fins, _ = await self._generate_batch(
            [self._summary_prompt(content, content_type, max_length)],
            max_tokens=max(32, int(max_length / 2)),
            temperature=0.3,
            **kwargs,
        )
        summary = out[0].strip()
        if len(summary) > max_length:
            summary = summary[: max_length - 3] + "..."
        return summary

    async def summarize_batch(
        self,
        contents: List[str],
        content_type: str = "text",
        max_length: int = 300,
        **kwargs,
    ) -> List[str]:
        """Batched variant: N prompts in one left-padded device batch —
        the decode loop amortizes weight streaming across rows, which is
        the whole point of owning the generation path."""
        prompts = [
            self._summary_prompt(c, content_type, max_length)
            for c in contents
        ]
        outs, _fins, _ = await self._generate_batch(
            prompts,
            max_tokens=max(32, int(max_length / 2)),
            temperature=0.3,
            **kwargs,
        )
        return [
            (s.strip()[: max_length - 3] + "...")
            if len(s.strip()) > max_length
            else s.strip()
            for s in outs
        ]

    def get_capabilities(self) -> List[ModelCapability]:
        return [ModelCapability.TEXT_GENERATION]

    async def health_check(self) -> Dict[str, Any]:
        health = await super().health_check()
        health.update(
            {
                "backend": "tpu",
                "pretrained": bool(
                    self._decoder is not None and self._decoder.pretrained
                ),
                "batches_run": self.batches_run,
                "requests_served": self.requests_served,
            }
        )
        health["connection"] = "ok" if self.is_initialized else "not_initialized"
        return health
