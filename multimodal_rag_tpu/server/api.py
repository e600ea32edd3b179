"""HTTP API — bit-compatible with the reference's FastAPI surface.

Routes (reference ``app/server/api.py:186-508``): ``GET /``, ``GET /admin``,
``GET /health``, ``POST /upload``, ``POST /query``, ``GET /documents``,
``DELETE /documents/{doc_id}``, ``DELETE /documents``, ``GET /stats``,
``/static`` mount, plus ``GET /docs`` + ``GET /openapi.json``. The singular
``DELETE /document/{doc_id}`` is also served — the reference's admin UI
called that route and 404'd (SURVEY.md §2.3.4); serving both fixes it while
staying compatible.

FastAPI/uvicorn are not in this environment; aiohttp.web provides the
server. Request validation uses the same pydantic models and returns
422-style errors; response JSON shapes match the reference exactly
(no-auth localhost posture preserved, ``api.py:66-69``).
"""

from __future__ import annotations

import asyncio
import base64
import json
import logging
import time
import uuid
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
from aiohttp import web
from pydantic import ValidationError

from multimodal_rag_tpu.config import settings
from multimodal_rag_tpu.runtime.profiling import (
    StageTimer,
    aggregator,
    start_trace,
    stop_trace,
)
from multimodal_rag_tpu.server.schemas import QueryRequest

logger = logging.getLogger(__name__)

ROOT = Path(__file__).resolve().parent.parent.parent
STATIC_DIR = ROOT / "static"
TEMPLATES_DIR = ROOT / "templates"

NOT_FOUND_ANSWER = (
    "Không tìm thấy tài liệu liên quan. "
    "Vui lòng upload tài liệu hoặc thử câu hỏi khác."
)


class Components:
    """The six pipeline singletons (reference lifespan, api.py:65-128)."""

    #: ``model`` values that always mean "the default text backend" —
    #: what single-model clients send (or omit).
    DEFAULT_MODEL_ALIASES = {"", "default", "mmrag"}

    def __init__(
        self,
        parser=None,
        llm_adapter=None,
        mllm_adapter=None,
        summarizer=None,
        embedder=None,
        retriever=None,
        crossmodal=None,
        llm_models=None,
    ):
        self.parser = parser
        self.llm_adapter = llm_adapter
        self.mllm_adapter = mllm_adapter
        self.summarizer = summarizer
        self.embedder = embedder
        self.retriever = retriever
        self.crossmodal = crossmodal
        # Multi-model serving registry: name -> adapter, routed by the
        # OpenAI ``model`` parameter (settings.MMRAG_LLM_MODELS). Empty
        # keeps the single-model contract: any name serves the default
        # and the field stays display-only.
        self.llm_models: Dict[str, Any] = dict(llm_models or {})

    def resolve_llm(self, name) -> "tuple[Any, Optional[str]]":
        """OpenAI ``model`` → the serving adapter. Returns
        ``(adapter, None)`` or ``(None, error)`` for an unknown name
        when a registry is configured."""
        if not self.llm_models:
            return self.llm_adapter, None
        # Registry names win over alias/prefix fallbacks: an entry named
        # e.g. "mmrag-finetune" must serve ITS adapter, never silently
        # the base model under the finetune's name.
        if isinstance(name, str) and name in self.llm_models:
            return self.llm_models[name], None
        if name is None or (
            isinstance(name, str)
            and (name in self.DEFAULT_MODEL_ALIASES
                 or name.startswith("mmrag-")
                 or name == getattr(self.llm_adapter, "model_name", None))
        ):
            return self.llm_adapter, None
        adapter = self.llm_models.get(name)
        if adapter is None:
            return None, (
                f"model {name!r} does not exist; available: "
                + ", ".join(sorted(self.llm_models))
            )
        return adapter, None

    @classmethod
    def build_default(cls) -> "Components":
        from multimodal_rag_tpu.embedder import EmbeddingManager
        from multimodal_rag_tpu.ingest.parser import DocumentParser
        from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
        from multimodal_rag_tpu.models.adapters import LLMAdapter, MLLMAdapter
        from multimodal_rag_tpu.storage.retriever import MultiVectorRetriever

        if settings.USE_TPU_LLM:
            from multimodal_rag_tpu.models.adapters import TPULLMAdapter

            llm = TPULLMAdapter()
        else:
            llm = LLMAdapter()
        if settings.USE_TPU_MLLM:
            from multimodal_rag_tpu.models.adapters import TPUMLLMAdapter

            mllm = TPUMLLMAdapter()
        else:
            mllm = MLLMAdapter()
        crossmodal = None
        if settings.CROSS_MODAL_ENABLED:
            from multimodal_rag_tpu.crossmodal import CrossModalIndex

            crossmodal = CrossModalIndex(
                persist_dir=settings.VECTOR_PERSIST_DIR
            )
        llm_models = {}
        if settings.USE_TPU_LLM and settings.MMRAG_LLM_MODELS:
            from multimodal_rag_tpu.models.adapters import TPULLMAdapter

            for entry in settings.MMRAG_LLM_MODELS.split(","):
                entry = entry.strip()
                if not entry:
                    continue
                name, sep, spec = entry.partition("=")
                name = name.strip()
                if not sep or not name or not spec.strip():
                    logger.error(
                        "MMRAG_LLM_MODELS entry %r is not "
                        "name=/path[+lora...]; skipped", entry,
                    )
                    continue
                ckpt, *loras = [p.strip() for p in spec.split("+")]
                # Explicit [] (not None) for lora-less entries: a named
                # model must NOT inherit the global MMRAG_LLM_LORA_PATH.
                llm_models[name] = TPULLMAdapter(
                    model_name=name, checkpoint_path=ckpt,
                    lora_paths=loras,
                )
        if settings.USE_TPU_LLM and settings.MMRAG_LORA_ADAPTERS:
            # S-LoRA: named finetunes served from the DEFAULT adapter's
            # one weight copy (stacked low-rank side-paths), routed by
            # the OpenAI ``model`` param like any registry entry. The
            # default adapter builds its stack from the same setting at
            # initialize (tpu_llm.parse_lora_adapters).
            from multimodal_rag_tpu.models.adapters.tpu_llm import (
                LoRAView,
                parse_lora_adapters,
            )

            for name, _path in parse_lora_adapters(
                settings.MMRAG_LORA_ADAPTERS
            ):
                if name in llm_models:
                    logger.error(
                        "MMRAG_LORA_ADAPTERS name %r collides with an "
                        "MMRAG_LLM_MODELS entry; the full-checkpoint "
                        "entry wins", name,
                    )
                    continue
                llm_models[name] = LoRAView(llm, name)
        return cls(
            parser=DocumentParser(llm_adapter=llm, mllm_adapter=mllm),
            llm_adapter=llm,
            mllm_adapter=mllm,
            summarizer=ContentSummarizer(mllm),
            embedder=EmbeddingManager(persist_dir=settings.VECTOR_PERSIST_DIR),
            retriever=MultiVectorRetriever(),
            crossmodal=crossmodal,
            llm_models=llm_models,
        )

    async def initialize(self) -> None:
        for component in (
            self.llm_adapter, self.mllm_adapter, self.embedder, self.retriever
        ):
            if component is not None:
                try:
                    await component.initialize()
                except Exception as e:  # adapters may be offline; degrade
                    logger.warning(
                        "init of %s failed: %s", type(component).__name__, e
                    )

    async def cleanup(self) -> None:
        for component in (
            self.llm_adapter, self.mllm_adapter, self.embedder,
            self.retriever, self.crossmodal,
            *self.llm_models.values(),
        ):
            if component is not None:
                try:
                    await component.cleanup()
                except Exception:  # noqa: BLE001
                    pass


def parse_sampling_params(body: dict):
    """Shared OpenAI sampling-parameter policy for /v1/chat/completions
    and /v1/completions. Parameters that would silently change the output
    contract are honored (max_tokens, temperature, top_p, stop,
    n ≤ 8 — n choices fan out as concurrent generations, which the TPU
    adapter coalesces into ONE batched dispatch; logit_bias as a
    per-row logit addend on the TPU backends, see below);
    logprobs is validated per dialect in each handler and
    honored by the on-TPU backends; ``presence_penalty``/
    ``frequency_penalty`` are validated to OpenAI's [-2, 2] range and
    honored by the on-TPU backends (per-row output-token-count logit
    bias in the compiled sampler — see decoder._penalty_bias), ignored
    by the HTTP backends; ``seed`` is honored by the on-TPU backends
    (per-request key streams — reproducible even when batched) and
    ignored by the HTTP backends.

    Returns (sampling dict, None) or (None, error message). temperature
    snaps to the decoder's TEMP_GRID (it selects a compiled executable on
    the TPU path — arbitrary client floats must not mint compilations);
    top_p is traced so it passes through exactly.
    """
    from multimodal_rag_tpu.models.decoder import snap_temperature

    # max_completion_tokens is the current-generation field name;
    # max_tokens the deprecated one. Explicit 0 is rejected (OpenAI
    # semantics), absence defaults to 256.
    mt_raw = body.get("max_completion_tokens", body.get("max_tokens"))
    if mt_raw is None:
        max_tokens = 256
    elif isinstance(mt_raw, int) and not isinstance(mt_raw, bool) \
            and mt_raw >= 1:
        max_tokens = min(mt_raw, 1024)
    else:
        return None, "max_tokens must be a positive integer"
    t_raw = body.get("temperature", 0.7)
    if not isinstance(t_raw, (int, float)) or isinstance(t_raw, bool) \
            or not (0.0 <= float(t_raw) <= 2.0):
        return None, "temperature must be a number in [0, 2]"
    temperature = snap_temperature(float(t_raw))
    p_raw = body.get("top_p", 1.0)
    if not isinstance(p_raw, (int, float)) or isinstance(p_raw, bool) \
            or not (0.0 < float(p_raw) <= 1.0):
        return None, "top_p must be a number in (0, 1]"
    top_p = float(p_raw)
    n_raw = body.get("n", 1)
    if n_raw is None:
        n_raw = 1
    if not isinstance(n_raw, int) or isinstance(n_raw, bool) \
            or not (1 <= n_raw <= 8):
        return None, "n must be an integer in [1, 8]"
    # logprobs is dialect-specific (chat: bool + top_logprobs; legacy
    # completions: int) — each handler validates its own form.
    # logit_bias: OpenAI's sparse token-id -> bias map, honored on the
    # TPU backends (densified to a per-row addend in the compiled
    # samplers; device-resident rows in the continuous server), ignored
    # by the HTTP backends like penalties/seed. Ids are tokenizer-
    # specific; out-of-vocab ids are ignored at the adapter.
    lb_raw = body.get("logit_bias")
    logit_bias = None
    if lb_raw:
        if not isinstance(lb_raw, dict) or len(lb_raw) > 300:
            return None, (
                "logit_bias must be an object with at most 300 entries"
            )
        logit_bias = {}
        for k, v in lb_raw.items():
            try:
                tid = int(k)
            except (TypeError, ValueError):
                return None, f"logit_bias key {k!r} is not a token id"
            if tid < 0:
                return None, "logit_bias token ids must be >= 0"
            if not isinstance(v, (int, float)) or isinstance(v, bool) \
                    or not (-100.0 <= float(v) <= 100.0):
                return None, (
                    "logit_bias values must be numbers in [-100, 100]"
                )
            logit_bias[tid] = float(v)
    stop_raw = body.get("stop")
    if stop_raw is None or stop_raw == []:  # clients serialize default []
        stops = []
    elif isinstance(stop_raw, str) and stop_raw:
        stops = [stop_raw]
    elif (
        isinstance(stop_raw, list)
        and len(stop_raw) <= 4
        and all(isinstance(s, str) and s for s in stop_raw)
    ):
        stops = list(stop_raw)
    else:
        return None, (
            "stop must be a non-empty string or a list of up to 4 "
            "non-empty strings"
        )
    seed_raw = body.get("seed")
    if seed_raw is not None and (
        not isinstance(seed_raw, int) or isinstance(seed_raw, bool)
    ):
        return None, "seed must be an integer"
    penalties = {}
    for name in ("presence_penalty", "frequency_penalty"):
        raw = body.get(name, 0.0)
        if raw is None:
            raw = 0.0
        if not isinstance(raw, (int, float)) or isinstance(raw, bool) \
                or not (-2.0 <= float(raw) <= 2.0):
            return None, f"{name} must be a number in [-2, 2]"
        penalties[name] = float(raw)
    gen_kw = {"max_tokens": max_tokens, "temperature": temperature}
    if top_p < 1.0:
        gen_kw["top_p"] = top_p
    if seed_raw is not None:
        gen_kw["seed"] = seed_raw
    for name, v in penalties.items():
        if v != 0.0:
            gen_kw[name] = v
    if logit_bias:
        gen_kw["logit_bias"] = logit_bias
    return {
        "max_tokens": max_tokens,
        "temperature": temperature,
        "top_p": top_p,
        "stops": stops,
        "n": n_raw,
        "gen_kw": gen_kw,
    }, None


def truncate_lps(lps: list, cut: int) -> list:
    """Drop per-token logprob records past a stop-sequence cut at char
    offset ``cut`` (token strings concatenate to the generated text, so
    cumulative length locates the cut)."""
    out, acc = [], 0
    for e in lps:
        if acc >= cut:
            break
        out.append(e)
        acc += len(e["token"])
    return out


def format_chat_logprobs(lps: list, top_n: int) -> dict:
    """Adapter per-token records → the OpenAI chat ``logprobs`` object
    (``content`` list with token/logprob/bytes and ``top_logprobs``
    sliced to the client's ``top_logprobs``)."""
    return {
        "content": [
            {
                "token": e["token"],
                "logprob": e["logprob"],
                "bytes": list(e["token"].encode("utf-8")),
                "top_logprobs": [
                    {
                        "token": s,
                        "logprob": v,
                        "bytes": list(s.encode("utf-8")),
                    }
                    for (_i, s, v) in e["top"][:top_n]
                ],
            }
            for e in lps
        ]
    }


def format_legacy_logprobs(lps: list, top_n: int) -> dict:
    """Adapter per-token records → the legacy ``/v1/completions``
    ``logprobs`` object (tokens / token_logprobs / top_logprobs /
    text_offset)."""
    tokens = [e["token"] for e in lps]
    offs, acc = [], 0
    for t in tokens:
        offs.append(acc)
        acc += len(t)
    return {
        "tokens": tokens,
        "token_logprobs": [e["logprob"] for e in lps],
        "top_logprobs": (
            [
                {s: v for (_i, s, v) in e["top"][:top_n]}
                for e in lps
            ]
            if top_n else None
        ),
        "text_offset": offs,
    }


def choice_kw(gen_kw: dict, i: int) -> dict:
    """Generation kwargs for the i-th of ``n`` choices. Seeded requests
    get per-choice derived seeds (seed+i) so choices differ but the whole
    response stays reproducible; unseeded requests pass through — the TPU
    backends give every coalesced/admitted row its own key stream anyway."""
    if i == 0 or "seed" not in gen_kw:
        return gen_kw
    kw = dict(gen_kw)
    kw["seed"] = gen_kw["seed"] + i
    return kw


def parse_stream_options(body: dict, stream: bool):
    """OpenAI ``stream_options`` validation (both /v1 surfaces). Returns
    ``(include_usage, error)``. Only ``include_usage`` is defined by the
    contract; unknown keys are rejected so clients discover typos instead
    of silently losing the usage frame."""
    opts = body.get("stream_options")
    if opts is None:
        return False, None
    if not isinstance(opts, dict):
        return False, "stream_options must be an object"
    if not stream:
        return False, "stream_options requires stream=true"
    unknown = set(opts) - {"include_usage"}
    if unknown:
        return False, (
            f"unsupported stream_options key(s): {sorted(unknown)}"
        )
    return bool(opts.get("include_usage")), None


def usage_chunk_frame(cid, created, model, obj, prompt_tokens,
                      completion_tokens) -> bytes:
    """The final pre-[DONE] SSE frame for ``stream_options.include_usage``:
    empty ``choices`` plus the aggregate usage block (OpenAI emits exactly
    one such frame after all choice chunks)."""
    return (
        "data: " + json.dumps({
            "id": cid,
            "object": obj,
            "created": created,
            "model": model,
            "choices": [],
            "usage": {
                "prompt_tokens": prompt_tokens,
                "completion_tokens": completion_tokens,
                "total_tokens": prompt_tokens + completion_tokens,
            },
        }) + "\n\n"
    ).encode()


def stop_cut_at(text: str, stops) -> int:
    """Earliest stop-sequence hit in ``text``, or -1. The ONE copy of
    the stop-scan used by the streaming hold-back pump and both
    non-streaming completion paths."""
    hits = [text.find(s) for s in stops]
    hits = [h for h in hits if h >= 0]
    return min(hits) if hits else -1


async def pump_stream_with_stops(gen_iter, stops, emit):
    """Drive a ``(delta, finish)`` async generator through the
    stop-sequence hold-back state machine, awaiting ``emit(text)`` for
    each safe span. A stop-sized tail is held back so a stop sequence
    split across deltas is never partially emitted; breaking out of the
    generator raises GeneratorExit in it, which retires the decode row.
    Returns the finish reason ("stop" on a stop hit). Shared by
    /v1/chat/completions and /v1/completions — one copy of the
    hold-back math to keep correct."""

    def stop_cut(text):
        return stop_cut_at(text, stops)

    finish_reason = "stop"
    hold = max((len(s) for s in stops), default=1) - 1
    buf, emitted = "", 0
    async for delta, fin in gen_iter:
        if delta and not stops:
            await emit(delta)
        elif delta:
            buf += delta
            cut = stop_cut(buf)
            if cut >= 0:
                if cut > emitted:
                    await emit(buf[emitted:cut])
                return "stop"  # GeneratorExit retires the decode row
            safe = max(emitted, len(buf) - hold)
            if safe > emitted:
                await emit(buf[emitted:safe])
                emitted = safe
        if fin is not None:
            finish_reason = fin
    if stops and len(buf) > emitted:  # flush the held-back tail
        await emit(buf[emitted:])
    return finish_reason


def json_error(status: int, detail: str) -> web.Response:
    return web.json_response({"detail": detail}, status=status)


@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        resp = await handler(request)
    if settings.ENABLE_CORS:
        resp.headers["Access-Control-Allow-Origin"] = "*"
        resp.headers["Access-Control-Allow-Methods"] = (
            "GET, POST, DELETE, OPTIONS"
        )
        resp.headers["Access-Control-Allow-Headers"] = (
            "Content-Type, Authorization"
        )
    return resp


def create_app(components: Optional[Components] = None) -> web.Application:
    app = web.Application(
        middlewares=[cors_middleware],
        client_max_size=settings.max_upload_bytes + (1 << 20),
    )
    comps = components or Components.build_default()
    app["components"] = comps
    app["start_time"] = time.time()
    # OpenAI-surface feature usage, surfaced via /stats["openai"] and
    # /metrics (per-app: test apps must not share counters).
    openai_counters = {
        "response_format_requests": 0,
        "tool_requests": 0,
        "tool_calls_emitted": 0,
        "logit_bias_requests": 0,
    }

    async def on_startup(app):
        await comps.initialize()
        logger.info("Multimodal RAG (TPU) ready — auth disabled, localhost only")
        if comps.embedder is not None:
            # Pre-compile hot shapes off the request path.
            async def _warm():
                try:
                    await comps.embedder.warmup()
                    logger.info("warmup complete")
                except Exception as e:  # noqa: BLE001
                    logger.warning("warmup failed: %s", e)

            asyncio.get_event_loop().create_task(_warm())

    async def on_cleanup(app):
        await comps.cleanup()

    if components is None:
        app.on_startup.append(on_startup)
        app.on_cleanup.append(on_cleanup)

    # --- HTML pages -----------------------------------------------------
    async def home(request):
        return _template_response("index.html")

    async def admin(request):
        return _template_response("admin.html")

    def _template_response(name: str) -> web.Response:
        path = TEMPLATES_DIR / name
        if not path.exists():
            return web.Response(
                text=f"<html><body><h1>multimodal_rag_tpu</h1>"
                f"<p>template {name} not installed</p></body></html>",
                content_type="text/html",
            )
        return web.Response(
            text=path.read_text(), content_type="text/html"
        )

    # --- Health (reference api.py:202-241) ------------------------------
    async def health(request):
        components_health: Dict[str, Any] = {}
        try:
            if comps.llm_adapter:
                components_health["llm_adapter"] = (
                    await comps.llm_adapter.health_check()
                )
            if comps.mllm_adapter:
                components_health["mllm_adapter"] = (
                    await comps.mllm_adapter.health_check()
                )
            if comps.embedder:
                stats = await comps.embedder.get_collection_stats()
                components_health["embedder"] = {
                    "status": "healthy",
                    "documents": stats.get("count", 0),
                }
            if comps.retriever:
                components_health["retriever"] = (
                    await comps.retriever.health_check()
                )
            all_healthy = all(
                c.get("status") == "healthy" or c.get("healthy") is True
                for c in components_health.values()
            )
            return web.json_response(
                {
                    "status": "healthy" if all_healthy else "degraded",
                    "components": components_health,
                    "timestamp": datetime.now(timezone.utc).isoformat(),
                    "auth": "disabled",
                }
            )
        except Exception as e:  # noqa: BLE001
            return web.json_response({"status": "unhealthy", "error": str(e)})

    # --- Upload (reference api.py:244-322) -------------------------------
    async def upload(request):
        start = time.time()
        reader = await request.multipart()
        field = None
        async for part in reader:
            if part.name == "file":
                field = part
                break
        if field is None or not field.filename:
            return json_error(400, "Filename is required")
        filename = field.filename
        content = await field.read(decode=False)
        if len(content) / (1024 * 1024) > settings.MAX_UPLOAD_SIZE:
            return json_error(
                413, f"File too large. Max: {settings.MAX_UPLOAD_SIZE}MB"
            )
        try:
            timer = StageTimer()
            doc_id = f"doc_{uuid.uuid4().hex[:12]}"
            with timer.stage("parse"):
                parsed = await comps.parser.parse_document(
                    content,
                    filename,
                    field.headers.get("Content-Type"),
                    doc_id=doc_id,
                )
            doc_type = parsed.get("doc_type", "unknown")
            with timer.stage("summarize"):
                summaries = await comps.summarizer.summarize_parsed_document(
                    parsed, max_length=300, show_progress=True
                )
            if not summaries:
                return json_error(400, "No content extracted")
            with timer.stage("embed_store"):
                counts = await comps.embedder.embed_and_store(
                    summaries, doc_id
                )
            with timer.stage("kv_store"):
                await comps.retriever.store_raw_documents(
                    doc_id, summaries, filename
                )
            if comps.crossmodal is not None and parsed.get("images"):
                with timer.stage("crossmodal"):
                    try:
                        n = await comps.crossmodal.index_document_images(
                            doc_id, parsed["images"]
                        )
                        logger.info("Indexed %d figures cross-modally", n)
                    except Exception as e:  # noqa: BLE001
                        logger.warning("cross-modal indexing failed: %s", e)
            aggregator.record_timer(timer, "upload.")
            aggregator.record("upload.total", timer.total)
            total = time.time() - start
            return web.json_response(
                {
                    "doc_id": doc_id,
                    "filename": filename,
                    "doc_type": doc_type,
                    "chunks_processed": counts,
                    "message": f"Processed in {total:.2f}s",
                    "processing_time": total,
                }
            )
        except Exception as e:  # noqa: BLE001
            logger.exception("Upload failed")
            return json_error(500, str(e))

    # --- Query (reference api.py:325-412) --------------------------------
    async def query(request):
        start = time.time()
        try:
            body = await request.json()
            req = QueryRequest(**body)
        except (ValidationError, ValueError) as e:
            return json_error(422, str(e))
        try:
            timer = StageTimer()
            with timer.stage("embed_search"):
                results = await comps.embedder.query(
                    req.query, n_results=req.top_k
                )
            if req.rerank and results["ids"]:
                with timer.stage("rerank"):
                    results = await comps.embedder.rerank_results(
                        req.query, results
                    )
            if not results["ids"]:
                return web.json_response(
                    {
                        "answer": NOT_FOUND_ANSWER,
                        "sources": [],
                        "processing_time": time.time() - start,
                    }
                )
            with timer.stage("retrieve"):
                raw = await comps.retriever.retrieve_raw_documents(
                    results["ids"]
                )
            text_context = "\n\n".join(raw["text_chunks"])
            tables = raw["table_chunks"]
            images = raw["image_chunks"]

            # Chat-attached image (data URL or raw base64) joins the
            # retrieved figures for multimodal generation, attached first.
            attached = None
            if req.image:
                attached = (
                    req.image.split(",", 1)[1]
                    if req.image.startswith("data:")
                    else req.image
                )

            try:
                if req.use_multimodal and (images or tables or attached):
                    answer = await comps.mllm_adapter.generate_multimodal(
                        text=text_context,
                        tables=tables,
                        images=([attached] if attached else []) + images,
                        max_tokens=1000,
                        temperature=0.7,
                    )
                else:
                    full_context = text_context
                    if tables:
                        full_context += "\n\nBảng:\n" + "\n\n".join(tables)
                    prompt = (
                        f"Context:\n{full_context}\n\n"
                        f"Câu hỏi: {req.query}\n\nTrả lời:"
                    )
                    answer = await comps.llm_adapter.generate_text(
                        prompt, max_tokens=1000, temperature=0.7
                    )
            except Exception as gen_err:  # noqa: BLE001
                # Degraded mode: retrieval succeeded but the LLM backend is
                # unreachable — return the retrieved context instead of 500
                # so search keeps working without a generation backend.
                logger.warning("answer generation failed: %s", gen_err)
                snippet = text_context[:1500]
                if tables:
                    snippet += "\n\n" + "\n\n".join(tables)[:500]
                answer = (
                    "(LLM backend unavailable — showing retrieved context)\n\n"
                    + snippet
                )

            # generation time = whatever the timed stages didn't cover
            timer.stages["generate"] = max(
                0.0, timer.total - sum(timer.stages.values())
            )
            aggregator.record_timer(timer, "query.")
            aggregator.record("query.total", timer.total)

            sources = []
            for i, (rid, dist, meta) in enumerate(
                zip(results["ids"], results["distances"], results["metadatas"])
            ):
                sources.append(
                    {
                        "rank": i + 1,
                        "doc_id": rid,
                        "relevance_score": round(
                            float(1.0 - min(dist, 1.0)), 3
                        ),
                        "type": (meta or {}).get("type", "unknown"),
                    }
                )
            return web.json_response(
                {
                    "answer": answer,
                    "sources": sources,
                    "processing_time": time.time() - start,
                }
            )
        except Exception as e:  # noqa: BLE001
            logger.exception("Query failed")
            return json_error(500, str(e))

    # --- Documents (reference api.py:416-465) ----------------------------
    async def list_documents(request):
        try:
            docs = await comps.retriever.list_all_documents()
            return web.json_response({"total": len(docs), "documents": docs})
        except Exception as e:  # noqa: BLE001
            return json_error(500, str(e))

    async def delete_document(request):
        doc_id = request.match_info["doc_id"]
        try:
            await comps.embedder.delete_document(doc_id)
            await comps.retriever.delete_document(doc_id)
            if comps.crossmodal is not None:
                await comps.crossmodal.delete_document(doc_id)
            return web.json_response({"message": f"Document {doc_id} deleted"})
        except Exception as e:  # noqa: BLE001
            return json_error(500, str(e))

    async def delete_all(request):
        try:
            docs = await comps.retriever.list_all_documents()
            count = len(docs)
            await comps.embedder.delete_all()
            await comps.retriever.delete_all()
            if comps.crossmodal is not None:
                await comps.crossmodal.delete_all()
            return web.json_response(
                {"message": f"Deleted {count} documents", "count": count}
            )
        except Exception as e:  # noqa: BLE001
            return json_error(500, str(e))

    # --- Cross-modal figure search (additive; BASELINE.json config 2) ----
    async def search_images(request):
        if comps.crossmodal is None:
            return json_error(
                503,
                "Cross-modal search disabled (set CROSS_MODAL_ENABLED=true)",
            )
        # Multipart = query-by-image (image → similar figures).
        if request.content_type.startswith("multipart/"):
            reader = await request.multipart()
            image_bytes = None
            top_k = 5
            async for part in reader:
                if part.name == "file":
                    image_bytes = await part.read(decode=False)
                elif part.name == "top_k":
                    try:
                        top_k = int((await part.read()).decode())
                    except ValueError:
                        return json_error(422, "top_k must be an int")
            if not image_bytes:
                return json_error(422, "file field required")
            if not 1 <= top_k <= 20:
                return json_error(422, "top_k must be in [1, 20]")
            start = time.time()
            try:
                hits = await comps.crossmodal.search_image(
                    image_bytes, k=top_k
                )
                return web.json_response(
                    {
                        "results": hits,
                        "processing_time": time.time() - start,
                    }
                )
            except Exception as e:  # noqa: BLE001
                logger.exception("image-to-image search failed")
                return json_error(500, str(e))
        try:
            body = await request.json()
        except ValueError:
            return json_error(422, "JSON body required")
        query_text = body.get("query", "")
        top_k = body.get("top_k", 5)
        if not isinstance(query_text, str) or not query_text.strip():
            return json_error(422, "query must be a non-empty string")
        if not isinstance(top_k, int) or not 1 <= top_k <= 20:
            return json_error(422, "top_k must be an int in [1, 20]")
        start = time.time()
        try:
            hits = await comps.crossmodal.search_text(query_text, k=top_k)
            return web.json_response(
                {
                    "results": hits,
                    "processing_time": time.time() - start,
                }
            )
        except Exception as e:  # noqa: BLE001
            logger.exception("cross-modal search failed")
            return json_error(500, str(e))

    # --- Stats (reference api.py:468-508) --------------------------------
    async def stats(request):
        try:
            embedder_stats = await comps.embedder.get_collection_stats()
            retriever_stats = await comps.retriever.get_stats()
            summarizer_stats = await comps.summarizer.get_stats()
            docs = await comps.retriever.list_all_documents()
            by_type = {
                kind: sum(
                    d.get("chunks", {}).get(kind, 0) for d in docs
                )
                for kind in ("text", "table", "image")
            }
            return web.json_response(
                {
                    "documents": {
                        "total": len(docs),
                        "total_chunks": embedder_stats.get("count", 0),
                        "by_type": by_type,
                    },
                    "embedder": {
                        "cache_hit_rate": embedder_stats.get("cache", {}).get(
                            "hit_rate", 0
                        ),
                    },
                    "retriever": {
                        "compression_enabled": retriever_stats.get(
                            "features", {}
                        ).get("compression", False),
                        "compression_savings": retriever_stats.get(
                            "compression", {}
                        ).get("savings_percent", 0),
                    },
                    "summarizer": {
                        "total_summaries": summarizer_stats.get(
                            "total_summaries", 0
                        ),
                        "cache_hit_rate": summarizer_stats.get(
                            "cache", {}
                        ).get("hit_rate", 0),
                    },
                    "auth": "disabled",
                    # Additive: rolling per-stage latency percentiles.
                    "latency": aggregator.snapshot(),
                    # Additive: on-TPU generation counters (absent when the
                    # text adapter is an HTTP backend).
                    **(
                        {
                            "generation": {
                                "backend": "tpu",
                                # Continuous mode counts decode steps (each
                                # advances every joined row); queue mode
                                # counts coalesced batches.
                                "mode": (
                                    "continuous"
                                    if getattr(
                                        comps.llm_adapter, "_server", None
                                    ) is not None
                                    else "coalesced"
                                ),
                                "batches_run": comps.llm_adapter.batches_run,
                                "requests_served":
                                    comps.llm_adapter.requests_served,
                                # Prompts that lost their head to the
                                # prompt-bucket ceiling (context loss is
                                # observable, not silent).
                                "truncated_prompts": getattr(
                                    comps.llm_adapter,
                                    "truncated_prompts", 0,
                                ),
                                # Prompt-lookup speculative decoding
                                # acceptance stats (absent when off).
                                **(
                                    {
                                        "speculative": comps.llm_adapter
                                        .spec_stats
                                    }
                                    if getattr(
                                        comps.llm_adapter, "spec_stats",
                                        None,
                                    )
                                    else {}
                                ),
                            }
                        }
                        if hasattr(comps.llm_adapter, "batches_run")
                        else {}
                    ),
                    **(
                        {"crossmodal": comps.crossmodal.get_stats()}
                        if comps.crossmodal is not None
                        else {}
                    ),
                    # OpenAI-surface feature usage (structured outputs /
                    # tool calling / logit_bias) — zero-cost counters so
                    # operators can see which contracts traffic exercises.
                    "openai": dict(openai_counters),
                }
            )
        except Exception as e:  # noqa: BLE001
            return json_error(500, str(e))

    # --- Prometheus metrics (the reference only sketched this in its
    # DEPLOYMENT.md:276-291; here it is a real text-format exporter) ------
    async def chat_completions(request):
        """OpenAI-compatible chat completions (non-streaming subset):
        with USE_TPU_LLM the framework doubles as a standalone LLM server
        — external tools speak the same contract the reference *consumed*
        (``app/models/llm_adapter.py:169-223``), now served on-chip."""
        try:
            body = await request.json()
        except Exception:  # noqa: BLE001
            return web.json_response(
                {"error": {"message": "invalid JSON body",
                           "type": "invalid_request_error"}}, status=400,
            )
        def bad_request(msg):
            return web.json_response(
                {"error": {"message": msg, "type": "invalid_request_error"}},
                status=400,
            )

        if not isinstance(body, dict):
            return bad_request("request body must be a JSON object")
        messages = body.get("messages")
        if not isinstance(messages, list) or not messages:
            return bad_request("messages must be a non-empty list")
        if not all(isinstance(m, dict) for m in messages):
            return bad_request("each message must be an object")
        # Multi-model routing: the OpenAI ``model`` field selects a
        # registry adapter (MMRAG_LLM_MODELS); without a registry it
        # stays display-only and the default backend serves.
        llm, merr = comps.resolve_llm(body.get("model"))
        if merr:
            return web.json_response(
                {"error": {"message": merr,
                           "type": "invalid_request_error",
                           "code": "model_not_found"}}, status=404,
            )
        stream = bool(body.get("stream"))
        include_usage, so_err = parse_stream_options(body, stream)
        if so_err:
            return bad_request(so_err)

        def parse_image_url(part):
            """OpenAI image part → bare base64 payload. Only ``data:``
            URLs are accepted (the reference's own multimodal wire format,
            ``app/models/mllm_adapter.py:275-284``; this server has no
            egress to fetch remote URLs). Returns (b64, error)."""
            url = part.get("image_url")
            if isinstance(url, dict):
                url = url.get("url")
            if not isinstance(url, str):
                return None, "image_url must be a string or {url: ...}"
            if not url.startswith("data:"):
                return None, (
                    "only data: image URLs are supported (inline base64); "
                    "remote URL fetching is not available"
                )
            head, sep, payload = url.partition(",")
            if not sep or "base64" not in head:
                return None, "image data: URL must be base64-encoded"
            # Charset/length check only — a full b64decode here would
            # decode multi-MB payloads twice (the adapter decodes them
            # again, and raises explicitly on corrupt payloads).
            import re as _re

            if len(payload) % 4 or not _re.fullmatch(
                r"[A-Za-z0-9+/]*={0,2}", payload
            ):
                return None, "image data: URL carries invalid base64"
            return payload, None

        def content_parts(content):
            """OpenAI content is a string OR a list of typed parts —
            returns (text, images, error) with images as bare-base64
            strings (the adapters' wire format)."""
            if isinstance(content, str):
                return content, [], None
            if isinstance(content, list):
                out, imgs = [], []
                for part in content:
                    if not isinstance(part, dict):
                        return None, None, "parts must be objects"
                    ptype = part.get("type")
                    if ptype == "text":
                        out.append(str(part.get("text", "")))
                    elif ptype == "image_url":
                        b64, err = parse_image_url(part)
                        if err:
                            return None, None, err
                        imgs.append(b64)
                    else:
                        return None, None, (
                            f"unsupported content part type {ptype!r}"
                        )
                return "\n".join(out), imgs, None
            return None, None, "must be a string or a list of typed parts"

        texts = {}
        images = []
        for i, m in enumerate(messages):
            # content may be null (assistant tool-call turns).
            t, imgs, err = content_parts(m.get("content") or "")
            if err:
                return bad_request(f"messages[{i}].content: {err}")
            texts[i] = t
            images.extend(imgs)
        # Vision routing (hoisted before the feature gates below, which
        # depend on the backend's capabilities): image parts need a
        # vision-capable backend — a text adapter would silently answer
        # without looking at the image (the round-2 behavior this
        # replaces was silently DROPPING the parts, server/api.py:634 in
        # that revision).
        mllm = getattr(comps, "mllm_adapter", None)
        if images:
            from multimodal_rag_tpu.models.adapters.base import (
                ModelCapability,
            )

            caps = mllm.get_capabilities() if mllm is not None else []
            if ModelCapability.VISION not in caps:
                return bad_request(
                    "image content requires a vision-capable backend "
                    "(enable USE_TPU_MLLM or an Ollama llava model)"
                )
        # Vision feature surface (r5, VERDICT r4 #4): with the on-TPU
        # MLLM in continuous mode, vision rows decode in the shared
        # batch, so streaming / tools / logprobs / response_format work
        # exactly as for text; the capability properties gate the
        # HTTP-backend and worker-thread modes, which can't.
        mllm_grammar_ok = bool(getattr(mllm, "supports_grammar", False))
        mllm_lp_ok = bool(getattr(mllm, "supports_logprobs", False))
        # OpenAI tool calling: validate tools/tool_choice up front —
        # they shape the prompt (preamble or template-native render),
        # the sampler (grammar-forced envelopes), and the response
        # (message.tool_calls) below.
        from multimodal_rag_tpu.server.toolcalls import (
            extract_tool_call,
            fold_tool_message,
            make_tool_call_id,
            normalize_tool_messages,
            toolcall_grammar_spec,
            tools_preamble,
        )
        from multimodal_rag_tpu.server.toolcalls import (
            validate_tools as _validate_tools,
        )

        tools, tool_choice, terr = _validate_tools(body)
        if terr:
            return bad_request(terr)
        if tool_choice == "none":
            tools = None  # declared but disabled: plain chat
        tools_active = bool(tools)
        if tools_active:
            openai_counters["tool_requests"] += 1
        tool_names = (
            {t["function"]["name"] for t in tools} if tools_active
            else set()
        )
        if tools_active and images and not hasattr(
            mllm, "generate_multimodal_with_finish"
        ):
            # Tool extraction needs finish-aware vision generation; the
            # HTTP MLLM adapter doesn't expose it.
            return bad_request(
                "tools with vision require the on-TPU multimodal "
                "backend (USE_TPU_MLLM)"
            )
        preamble = tools_preamble(tools) if tools_active else None
        # Fold the chat into the adapter's system/user framing.
        system = "\n".join(
            texts[i] for i, m in enumerate(messages)
            if m.get("role") == "system"
        )
        if preamble:
            system = (preamble + "\n\n" + system).strip()
        convo = "\n".join(
            fold_tool_message(m, texts[i])
            for i, m in enumerate(messages) if m.get("role") != "system"
        )
        prompt = (system + "\n\n" + convo).strip()
        # Instruct checkpoints: render through the model's OWN chat
        # template when the on-TPU backend ships one (the prompt format
        # the weights were trained on — models/chat_template.py), and
        # tell the adapter to skip its generic framing. Vision requests
        # keep the fold: the template's content contract is text, and
        # the MLLM adapters carry their own multimodal framing.
        fmt = getattr(llm, "format_chat", None)
        raw_prompt = False
        if fmt is not None and not images:
            tmpl_msgs = normalize_tool_messages(messages, texts)
            native_tools = tools_active and getattr(
                llm, "template_accepts_tools", False
            )
            if preamble and not native_tools:
                # Template without native tool rendering: carry the
                # generic convention in (or as) the system turn.
                if tmpl_msgs and tmpl_msgs[0]["role"] == "system":
                    tmpl_msgs[0]["content"] = (
                        preamble + "\n\n" + tmpl_msgs[0]["content"]
                    )
                else:
                    tmpl_msgs = [
                        {"role": "system", "content": preamble}
                    ] + tmpl_msgs
            try:
                rendered = fmt(
                    tmpl_msgs,
                    tools=tools if native_tools else None,
                )
            except ValueError as e:
                # The template's own raise_exception (e.g. unsupported
                # role ordering) is the client's fault.
                return bad_request(str(e))
            except TypeError:
                # Adapters predating the tools kwarg.
                try:
                    rendered = fmt(tmpl_msgs)
                except ValueError as e:
                    return bad_request(str(e))
            if rendered:
                prompt = rendered
                raw_prompt = True
        sampling, err = parse_sampling_params(body)
        if err:
            return bad_request(err)
        if "logit_bias" in sampling["gen_kw"]:
            openai_counters["logit_bias_requests"] += 1
        if raw_prompt:
            sampling["gen_kw"]["raw"] = True
        # OpenAI response_format: json_object / json_schema compile to a
        # byte-level grammar that masks the on-TPU sampler per step
        # (models/grammar.py). HTTP backends can't enforce it — explicit
        # 400 instead of silently returning unconstrained text.
        rf = body.get("response_format")
        if rf is not None:
            from multimodal_rag_tpu.models.grammar import (
                compile_response_format,
            )

            try:
                gspec = compile_response_format(rf)
            except ValueError as e:
                return bad_request(f"response_format: {e}")
            if gspec is not None:
                if images and not mllm_grammar_ok:
                    return bad_request(
                        "response_format json modes for vision requests "
                        "require the on-TPU multimodal backend in "
                        "continuous mode (USE_TPU_MLLM + "
                        "TPU_LLM_CONTINUOUS)"
                    )
                if not images and not getattr(
                    llm, "supports_grammar", False
                ):
                    return bad_request(
                        "response_format json modes require the on-TPU "
                        "text backend (USE_TPU_LLM)"
                    )
                if tools_active and tool_choice != "auto":
                    return bad_request(
                        "response_format cannot be combined with a "
                        "forced tool_choice (the two grammars conflict)"
                    )
                sampling["gen_kw"]["grammar"] = gspec
                openai_counters["response_format_requests"] += 1
        # Forced tool calls (tool_choice 'required' or a named function)
        # are grammar-enforced: the sampler can only emit a call
        # envelope whose arguments satisfy the tool's parameters schema.
        if tools_active and tool_choice != "auto":
            if not (
                mllm_grammar_ok if images
                else getattr(llm, "supports_grammar", False)
            ):
                return bad_request(
                    "tool_choice 'required' or a named function requires "
                    "the on-TPU backend (USE_TPU_LLM / USE_TPU_MLLM in "
                    "continuous mode for vision); use tool_choice 'auto' "
                    "with HTTP backends"
                )
            forced = (
                tool_choice[1]
                if isinstance(tool_choice, tuple) else None
            )
            sampling["gen_kw"]["grammar"] = toolcall_grammar_spec(
                tools, forced
            )
        max_tokens = sampling["max_tokens"]
        gen_kw = sampling["gen_kw"]
        stops = sampling["stops"]
        n = sampling["n"]
        # Chat-dialect logprobs: bool flag + top_logprobs count. Honored
        # by the on-TPU backends (compiled per-step capture of the
        # sampling distribution — decoder._lp_top); explicit 400 where
        # the distribution genuinely does not exist (HTTP backends) or
        # the transport can't carry it yet (stream, vision).
        lp_raw = body.get("logprobs", False)
        if lp_raw not in (True, False, None):
            return bad_request("logprobs must be a boolean")
        want_lp = bool(lp_raw)
        top_lp_raw = body.get("top_logprobs")
        if top_lp_raw is not None:
            if isinstance(top_lp_raw, bool) \
                    or not isinstance(top_lp_raw, int) \
                    or not (0 <= top_lp_raw <= 20):
                return bad_request(
                    "top_logprobs must be an integer in [0, 20]"
                )
            if not want_lp:
                return bad_request("top_logprobs requires logprobs: true")
        top_lp = int(top_lp_raw or 0)
        gen_lp = getattr(
            llm, "generate_text_with_logprobs", None
        )
        if want_lp:
            if stream:
                return bad_request("logprobs with stream is not supported")
            if images and not mllm_lp_ok:
                return bad_request(
                    "logprobs for vision requests require the on-TPU "
                    "multimodal backend in continuous mode "
                    "(USE_TPU_MLLM + TPU_LLM_CONTINUOUS)"
                )
            if tools_active:
                return bad_request(
                    "logprobs with tools is not supported"
                )
            if not images and gen_lp is None:
                return bad_request(
                    "logprobs requires the on-TPU text backend "
                    "(USE_TPU_LLM)"
                )

        def stop_cut(text):
            return stop_cut_at(text, stops)

        start = time.time()
        gen_meta = getattr(
            llm, "generate_text_with_finish", None
        )
        if stream:
            # Pre-validate what the adapter would reject, BEFORE the SSE
            # response is prepared — after that only in-band errors work.
            if not prompt or len(prompt) > 10_000:
                return bad_request(
                    "prompt must be 1..10000 characters after folding"
                )
            cid = f"chatcmpl-{uuid.uuid4().hex[:24]}"
            created = int(time.time())
            model = body.get("model") or "mmrag"
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                    "Connection": "keep-alive",
                }
            )
            await resp.prepare(request)
            # Per-choice emitted text, for the include_usage frame (same
            # whitespace accounting as the non-streaming usage block).
            stream_texts = [""] * n

            def chunk(delta, fin=None, idx=0):
                c = delta.get("content")
                if c:
                    stream_texts[idx] += c
                for tc in delta.get("tool_calls") or ():
                    stream_texts[idx] += (
                        tc.get("function", {}).get("arguments") or ""
                    )
                return (
                    "data: " + json.dumps({
                        "id": cid,
                        "object": "chat.completion.chunk",
                        "created": created,
                        "model": model,
                        "choices": [{
                            "index": idx,
                            "delta": delta,
                            "finish_reason": fin,
                        }],
                    }) + "\n\n"
                ).encode()

            # n > 1 choices stream CONCURRENTLY (interleaved chunks with
            # per-choice index, per OpenAI); a lock serializes writes so
            # SSE frames never interleave mid-frame.
            write_lock = asyncio.Lock()

            async def wchunk(buf):
                async with write_lock:
                    await resp.write(buf)

            for i in range(n):
                await resp.write(chunk({"role": "assistant"}, idx=i))
            gen_stream = getattr(
                llm, "generate_text_stream", None
            )

            async def run_choice(i):
                kw = choice_kw(gen_kw, i)
                if tools_active:
                    # Tool-capable requests buffer the full choice, then
                    # flush ONE delta — either content or a tool_calls
                    # pair (id+name, then arguments). Coarse but valid
                    # SSE; incremental argument streaming would need an
                    # envelope-aware splitter mid-generation.
                    if images:
                        text, fin = (
                            await mllm.generate_multimodal_with_finish(
                                prompt, images=images, **kw
                            )
                        )
                    elif gen_meta is not None:
                        text, fin = await gen_meta(prompt, **kw)
                    else:
                        text = await llm.generate_text(
                            prompt, **kw
                        )
                        fin = "stop"
                    cut = stop_cut(text)
                    if cut >= 0:
                        text, fin = text[:cut], "stop"
                    hit = extract_tool_call(text, tool_names)
                    if hit is not None:
                        openai_counters["tool_calls_emitted"] += 1
                        name, args = hit
                        await wchunk(chunk({"tool_calls": [{
                            "index": 0,
                            "id": make_tool_call_id(),
                            "type": "function",
                            "function": {"name": name, "arguments": ""},
                        }]}, idx=i))
                        await wchunk(chunk({"tool_calls": [{
                            "index": 0,
                            "function": {"arguments": args},
                        }]}, idx=i))
                        return "tool_calls"
                    await wchunk(chunk({"content": text}, idx=i))
                    return fin
                if images:
                    mm_stream = getattr(
                        mllm, "generate_multimodal_stream", None
                    )
                    if mm_stream is not None:
                        # Per-token vision streaming: the row decodes in
                        # the shared continuous batch (r5; one coarse
                        # delta in worker-thread mode — the generator
                        # contract is the same).
                        async def emit_v(text, _i=i):
                            await wchunk(chunk({"content": text}, idx=_i))

                        return await pump_stream_with_stops(
                            mm_stream(prompt, images=images, **kw),
                            stops, emit_v,
                        )
                    # HTTP MLLM adapter: ONE coarse delta — valid SSE,
                    # same posture as the HTTP-adapter fallback below.
                    text = await mllm.generate_multimodal(
                        prompt, images=images, **kw
                    )
                elif gen_stream is not None:
                    async def emit(text, _i=i):
                        await wchunk(chunk({"content": text}, idx=_i))

                    return await pump_stream_with_stops(
                        gen_stream(prompt, **kw), stops, emit
                    )
                else:
                    # HTTP adapters: one coarse delta (the full answer).
                    text = await llm.generate_text(
                        prompt, **kw
                    )
                fin = "stop"
                cut = stop_cut(text)
                if cut >= 0:
                    text = text[:cut]
                await wchunk(chunk({"content": text}, idx=i))
                return fin

            results = await asyncio.gather(
                *(run_choice(i) for i in range(n)), return_exceptions=True,
            )
            first_err = next(
                (r for r in results if isinstance(r, BaseException)), None
            )
            if first_err is not None:
                await resp.write(
                    ("data: " + json.dumps({
                        "error": {"message":
                                  f"generation failed: {first_err}",
                                  "type": "server_error"},
                    }) + "\n\n").encode()
                )
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
                return resp
            aggregator.record("chat.total", time.time() - start)
            for i, finish_reason in enumerate(results):
                await resp.write(chunk({}, finish_reason, idx=i))
            if include_usage:
                await resp.write(usage_chunk_frame(
                    cid, created, model, "chat.completion.chunk",
                    len(prompt.split()),
                    sum(len(t.split()) for t in stream_texts),
                ))
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        async def gen_choice(i):
            kw = choice_kw(gen_kw, i)
            if images:
                if want_lp:
                    return await mllm.generate_multimodal_with_logprobs(
                        prompt, images=images, **kw
                    )
                if hasattr(mllm, "generate_multimodal_with_finish"):
                    text, fin = await mllm.generate_multimodal_with_finish(
                        prompt, images=images, **kw
                    )
                    return text, fin, None
                return await mllm.generate_multimodal(
                    prompt, images=images, **kw
                ), "stop", None
            if want_lp:
                return await gen_lp(prompt, **kw)
            if gen_meta is not None:
                text, fin = await gen_meta(prompt, **kw)
                return text, fin, None
            return await llm.generate_text(prompt, **kw), \
                "stop", None

        # n choices fan out concurrently; the TPU adapter's batcher
        # coalesces them into one bucketed dispatch. return_exceptions:
        # one failing choice must not leave siblings detached.
        results = await asyncio.gather(
            *(gen_choice(i) for i in range(n)), return_exceptions=True,
        )
        first_err = next(
            (r for r in results if isinstance(r, BaseException)), None
        )
        if isinstance(first_err, ValueError):
            # Adapter input validation (empty / >10k-char prompt) is the
            # client's fault — a retryable 503 here would loop forever.
            return bad_request(str(first_err))
        if first_err is not None:
            return web.json_response(
                {"error": {"message": f"generation failed: {first_err}",
                           "type": "server_error"}}, status=503,
            )
        choices = []
        completion_tokens = 0
        for i, (text, finish_reason, lps) in enumerate(results):
            cut = stop_cut(text)
            if cut >= 0:
                text, finish_reason = text[:cut], "stop"
                if lps is not None:
                    lps = truncate_lps(lps, cut)
            completion_tokens += len(text.split())
            message = {"role": "assistant", "content": text}
            if tools_active:
                hit = extract_tool_call(text, tool_names)
                if hit is not None:
                    openai_counters["tool_calls_emitted"] += 1
                    name, args = hit
                    message = {
                        "role": "assistant",
                        "content": None,
                        "tool_calls": [{
                            "id": make_tool_call_id(),
                            "type": "function",
                            "function": {
                                "name": name, "arguments": args,
                            },
                        }],
                    }
                    finish_reason = "tool_calls"
            choices.append({
                "index": i,
                "message": message,
                "finish_reason": finish_reason,
                "logprobs": (
                    format_chat_logprobs(lps, top_lp)
                    if lps is not None else None
                ),
            })
        aggregator.record("chat.total", time.time() - start)
        backend = getattr(llm, "backend", "unknown")
        prompt_tokens = len(prompt.split())
        return web.json_response(
            {
                "id": f"chatcmpl-{uuid.uuid4().hex[:24]}",
                "object": "chat.completion",
                "created": int(time.time()),
                "model": body.get("model") or f"mmrag-{backend}",
                "choices": choices,
                "usage": {
                    # Approximate (whitespace) token accounting — the
                    # adapters own tokenization.
                    "prompt_tokens": prompt_tokens,
                    "completion_tokens": completion_tokens,
                    "total_tokens": prompt_tokens + completion_tokens,
                },
            }
        )

    async def completions(request):
        """OpenAI-compatible legacy ``/v1/completions`` (text in → text
        out, no chat framing): prompt may be a string or a list of
        strings (batched — the TPU adapter coalesces them into one
        bucketed executable). Same sampling-parameter policy as the chat
        surface; streaming supports a single prompt."""
        try:
            body = await request.json()
        except Exception:  # noqa: BLE001
            return web.json_response(
                {"error": {"message": "invalid JSON body",
                           "type": "invalid_request_error"}}, status=400,
            )

        def bad_request(msg):
            return web.json_response(
                {"error": {"message": msg, "type": "invalid_request_error"}},
                status=400,
            )

        if not isinstance(body, dict):
            return bad_request("request body must be a JSON object")
        prompt_raw = body.get("prompt")
        if isinstance(prompt_raw, str):
            prompts = [prompt_raw]
        elif (
            isinstance(prompt_raw, list)
            and 0 < len(prompt_raw) <= 16
            and all(isinstance(p, str) for p in prompt_raw)
        ):
            prompts = list(prompt_raw)
        else:
            return bad_request(
                "prompt must be a string or a list of 1-16 strings"
            )
        if any(not p or len(p) > 10_000 for p in prompts):
            return bad_request(
                "each prompt must be 1..10000 characters"
            )
        llm, merr = comps.resolve_llm(body.get("model"))
        if merr:
            return web.json_response(
                {"error": {"message": merr,
                           "type": "invalid_request_error",
                           "code": "model_not_found"}}, status=404,
            )
        sampling, err = parse_sampling_params(body)
        if err:
            return bad_request(err)
        if "logit_bias" in sampling["gen_kw"]:
            openai_counters["logit_bias_requests"] += 1
        gen_kw = sampling["gen_kw"]
        stops = sampling["stops"]
        n = sampling["n"]
        # echo (legacy): prefix each choice's text with its prompt.
        # echo + logprobs stays a 400 — OpenAI's form includes PROMPT
        # token logprobs, which the decode path doesn't capture;
        # returning completion-only records under that contract would be
        # silently wrong.
        echo = bool(body.get("echo"))
        stream = bool(body.get("stream"))
        if stream and len(prompts) > 1:
            return bad_request("stream supports a single prompt")
        include_usage, so_err = parse_stream_options(body, stream)
        if so_err:
            return bad_request(so_err)
        # Legacy-dialect logprobs: an integer top-alternative count.
        lp_n = body.get("logprobs")
        gen_lp = getattr(
            llm, "generate_text_with_logprobs", None
        )
        if lp_n is not None:
            if isinstance(lp_n, bool) or not isinstance(lp_n, int) \
                    or not (0 <= lp_n <= 5):
                return bad_request("logprobs must be an integer in [0, 5]")
            if stream:
                return bad_request("logprobs with stream is not supported")
            if echo:
                return bad_request(
                    "echo with logprobs is not supported (prompt token "
                    "logprobs are not captured)"
                )
            if gen_lp is None:
                return bad_request(
                    "logprobs requires the on-TPU text backend "
                    "(USE_TPU_LLM)"
                )
        want_lp = lp_n is not None

        def stop_cut(text):
            return stop_cut_at(text, stops)

        cid = f"cmpl-{uuid.uuid4().hex[:24]}"
        created = int(time.time())
        model = body.get("model") or "mmrag"
        start = time.time()
        gen_meta = getattr(
            llm, "generate_text_with_finish", None
        )

        async def generate_one(prompt, ci=0):
            kw = choice_kw(gen_kw, ci)
            if want_lp:
                return await gen_lp(prompt, **kw)
            if gen_meta is not None:
                text, fin = await gen_meta(prompt, **kw)
                return text, fin, None
            return (
                await llm.generate_text(prompt, **kw),
                "stop", None,
            )

        if stream:
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                    "Connection": "keep-alive",
                }
            )
            await resp.prepare(request)

            stream_texts = [""] * n

            def chunk(text, fin=None, idx=0):
                stream_texts[idx] += text
                return (
                    "data: " + json.dumps({
                        "id": cid,
                        "object": "text_completion",
                        "created": created,
                        "model": model,
                        "choices": [{
                            "index": idx,
                            "text": text,
                            "finish_reason": fin,
                            "logprobs": None,
                        }],
                    }) + "\n\n"
                ).encode()

            write_lock = asyncio.Lock()

            async def wchunk(buf):
                async with write_lock:
                    await resp.write(buf)

            gen_stream = getattr(
                llm, "generate_text_stream", None
            )

            async def run_choice(i):
                kw = choice_kw(gen_kw, i)
                if echo:  # the prompt leads the stream (OpenAI echo)
                    await wchunk(chunk(prompts[0], idx=i))
                if gen_stream is not None:
                    async def emit(text, _i=i):
                        await wchunk(chunk(text, idx=_i))

                    return await pump_stream_with_stops(
                        gen_stream(prompts[0], **kw), stops, emit
                    )
                text, fin, _ = await generate_one(prompts[0], i)
                cut = stop_cut(text)
                if cut >= 0:
                    text, fin = text[:cut], "stop"
                await wchunk(chunk(text, idx=i))
                return fin

            results = await asyncio.gather(
                *(run_choice(i) for i in range(n)), return_exceptions=True,
            )
            first_err = next(
                (r for r in results if isinstance(r, BaseException)), None
            )
            if first_err is not None:
                await resp.write(
                    ("data: " + json.dumps({
                        "error": {"message":
                                  f"generation failed: {first_err}",
                                  "type": "server_error"},
                    }) + "\n\n").encode()
                )
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
                return resp
            aggregator.record("completions.total", time.time() - start)
            for i, finish_reason in enumerate(results):
                await resp.write(chunk("", finish_reason, idx=i))
            if include_usage:
                # echo leads the stream with the prompt; usage still
                # counts it as prompt tokens only (OpenAI semantics).
                ct = sum(len(t.split()) for t in stream_texts)
                pt = len(prompts[0].split())
                if echo:
                    ct = max(0, ct - pt)
                await resp.write(usage_chunk_frame(
                    cid, created, model, "text_completion", pt, ct,
                ))
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        choices = []
        total_completion = 0
        # Choice index is prompt-major (OpenAI: len(prompts) * n choices,
        # prompt i's j-th sample at index i*n + j). return_exceptions: one
        # failing prompt must not leave the other generations running
        # detached with unretrieved exceptions.
        results = await asyncio.gather(
            *(generate_one(p, j) for p in prompts for j in range(n)),
            return_exceptions=True,
        )
        first_err = next(
            (r for r in results if isinstance(r, BaseException)), None
        )
        if isinstance(first_err, ValueError):
            return bad_request(str(first_err))
        if first_err is not None:
            return web.json_response(
                {"error": {"message": f"generation failed: {first_err}",
                           "type": "server_error"}}, status=503,
            )
        for i, (text, fin, lps) in enumerate(results):
            cut = stop_cut(text)
            if cut >= 0:
                text, fin = text[:cut], "stop"
                if lps is not None:
                    lps = truncate_lps(lps, cut)
            total_completion += len(text.split())
            if echo:  # choice index is prompt-major: prompt i // n
                text = prompts[i // n] + text
            choices.append({
                "index": i,
                "text": text,
                "finish_reason": fin,
                "logprobs": (
                    format_legacy_logprobs(lps, lp_n)
                    if lps is not None else None
                ),
            })
        aggregator.record("completions.total", time.time() - start)
        prompt_tokens = sum(len(p.split()) for p in prompts)
        return web.json_response({
            "id": cid,
            "object": "text_completion",
            "created": created,
            "model": model,
            "choices": choices,
            "usage": {
                "prompt_tokens": prompt_tokens,
                "completion_tokens": total_completion,
                "total_tokens": prompt_tokens + total_completion,
            },
        })

    async def openai_embeddings(request):
        """OpenAI-compatible ``/v1/embeddings`` over the on-TPU encoder:
        the reference *consumed* this contract when configured for cloud
        embeddings (``config.py:84`` OPENAI_EMBEDDING_MODEL); here the
        framework *serves* it, so any OpenAI-SDK client can use the chip
        as an embedding backend. Unit-norm float32, dim 384 (MiniLM)."""
        try:
            body = await request.json()
        except Exception:  # noqa: BLE001
            return web.json_response(
                {"error": {"message": "invalid JSON body",
                           "type": "invalid_request_error"}}, status=400,
            )

        def bad_request(msg):
            return web.json_response(
                {"error": {"message": msg, "type": "invalid_request_error"}},
                status=400,
            )

        if not isinstance(body, dict):
            return bad_request("request body must be a JSON object")
        raw = body.get("input")
        if isinstance(raw, str):
            texts = [raw]
        elif isinstance(raw, list) and raw and all(
            isinstance(t, str) for t in raw
        ):
            texts = raw
        else:
            return bad_request(
                "input must be a string or a non-empty list of strings"
            )
        if len(texts) > 2048:
            return bad_request("input exceeds the 2048-item cap")
        if any(not t.strip() for t in texts):
            return bad_request("input strings must be non-empty")
        if any(len(t) > 10_000 for t in texts):
            return bad_request("input strings are capped at 10000 chars")
        enc_format = body.get("encoding_format", "float")
        if enc_format not in ("float", "base64"):
            return bad_request("encoding_format must be 'float' or 'base64'")

        start = time.time()
        try:
            vecs = await comps.embedder.embed_texts_batch(texts)
        except Exception as e:  # noqa: BLE001
            return web.json_response(
                {"error": {"message": f"embedding failed: {e}",
                           "type": "server_error"}}, status=503,
            )
        aggregator.record("embeddings.total", time.time() - start)
        if enc_format == "base64":
            data = [
                {
                    "object": "embedding",
                    "index": i,
                    # Little-endian float32 bytes, per the OpenAI SDK's
                    # decode contract (np.frombuffer(..., '<f4')).
                    "embedding": base64.b64encode(
                        np.ascontiguousarray(v, "<f4").tobytes()
                    ).decode("ascii"),
                }
                for i, v in enumerate(vecs)
            ]
        else:
            data = [
                {
                    "object": "embedding",
                    "index": i,
                    "embedding": [float(x) for x in v],
                }
                for i, v in enumerate(vecs)
            ]
        n_tok = sum(len(t.split()) for t in texts)  # approximate accounting
        return web.json_response(
            {
                "object": "list",
                "data": data,
                "model": body.get("model")
                or settings.SENTENCE_TRANSFORMER_MODEL,
                "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
            }
        )

    async def openai_models(request):
        """OpenAI-compatible model listing: the embedding encoder plus
        the active generation backend, so SDK clients can discover ids."""
        created = int(app["start_time"])
        backend = getattr(comps.llm_adapter, "backend", "unknown")
        gen_model = getattr(
            comps.llm_adapter, "model_name", None
        ) or f"mmrag-{backend}"
        models = [
            {
                "id": settings.SENTENCE_TRANSFORMER_MODEL,
                "object": "model",
                "created": created,
                "owned_by": "multimodal_rag_tpu",
            },
            {
                "id": gen_model,
                "object": "model",
                "created": created,
                "owned_by": "multimodal_rag_tpu",
            },
        ]
        # Multi-model registry entries (MMRAG_LLM_MODELS) are selectable
        # via the ``model`` parameter on both /v1 completion surfaces.
        for name in sorted(comps.llm_models):
            models.append({
                "id": name,
                "object": "model",
                "created": created,
                "owned_by": "multimodal_rag_tpu",
            })
        return web.json_response({"object": "list", "data": models})

    async def rerank_http(request):
        """Standalone rerank endpoint (Cohere/Jina ``/v1/rerank`` contract):
        ``{query, documents[], top_n?, return_documents?}`` → results ranked
        by the on-TPU reranker (cross-encoder or MaxSim per ``RERANK_MODE``).
        The reference shipped rerank only as an unreachable placeholder
        (``embedder.py:834-859``); here it is both a ``/query`` flag and a
        first-class service any retrieval stack can call. Documents may be
        strings or ``{"text": ...}`` objects (both client conventions)."""
        try:
            body = await request.json()
        except Exception:  # noqa: BLE001
            return web.json_response(
                {"error": {"message": "invalid JSON body",
                           "type": "invalid_request_error"}}, status=400,
            )

        def bad_request(msg):
            return web.json_response(
                {"error": {"message": msg, "type": "invalid_request_error"}},
                status=400,
            )

        if not isinstance(body, dict):
            return bad_request("request body must be a JSON object")
        query_text = body.get("query")
        if not isinstance(query_text, str) or not query_text.strip():
            return bad_request("query must be a non-empty string")
        if len(query_text) > 10_000:
            return bad_request("query is capped at 10000 chars")
        raw_docs = body.get("documents")
        if not isinstance(raw_docs, list) or not raw_docs:
            return bad_request("documents must be a non-empty list")
        if len(raw_docs) > 1024:
            return bad_request("documents exceed the 1024-item cap")
        texts = []
        for i, d in enumerate(raw_docs):
            if isinstance(d, str):
                text = d
            elif isinstance(d, dict) and isinstance(d.get("text"), str):
                text = d["text"]
            else:
                return bad_request(
                    f"documents[{i}] must be a string or {{'text': ...}}"
                )
            if not text.strip():
                return bad_request(f"documents[{i}] must be non-empty")
            if len(text) > 10_000:
                return bad_request(
                    f"documents[{i}] exceeds the 10000-char cap"
                )
            texts.append(text)
        top_n = body.get("top_n", len(texts))
        if not isinstance(top_n, int) or isinstance(top_n, bool) or top_n < 1:
            return bad_request("top_n must be a positive integer")
        return_documents = body.get("return_documents", True)
        if not isinstance(return_documents, bool):
            return bad_request("return_documents must be a boolean")

        start = time.time()
        # Ride the same lazily-built reranker the /query rerank flag uses;
        # ids carry the original positions so the response can report them.
        flat = {
            "ids": list(range(len(texts))),
            "documents": texts,
            "distances": [0.0] * len(texts),
            "metadatas": [None] * len(texts),
        }
        try:
            out = await comps.embedder.rerank_results(
                query_text, flat, top_k=top_n
            )
        except Exception as e:  # noqa: BLE001
            return web.json_response(
                {"error": {"message": f"rerank failed: {e}",
                           "type": "server_error"}}, status=503,
            )
        if "rerank_scores" not in out:
            # Untrained rerankers deliberately pass results through on the
            # /query path; an explicit rerank API must not echo input order
            # as if it were a ranking — fail loudly with the fix.
            return web.json_response(
                {"error": {
                    "message": (
                        "no trained reranker available: set "
                        "MMRAG_CROSS_ENCODER_PATH (RERANK_MODE=cross) or "
                        "MMRAG_CHECKPOINT_PATH (RERANK_MODE=maxsim)"
                    ),
                    "type": "server_error",
                }}, status=503,
            )
        aggregator.record("rerank.total", time.time() - start)
        results = []
        for idx, score in zip(out["ids"], out["rerank_scores"]):
            item = {"index": int(idx), "relevance_score": float(score)}
            if return_documents:
                item["document"] = {"text": texts[int(idx)]}
            results.append(item)
        n_tok = len(query_text.split()) + sum(
            len(t.split()) for t in texts
        )  # approximate accounting, same convention as /v1/embeddings
        return web.json_response({
            "model": body.get("model") or settings.RERANK_MODE,
            "results": results,
            "usage": {"total_tokens": n_tok},
        })

    async def metrics(request):
        lines = [
            "# HELP mmrag_stage_latency_seconds per-stage latency",
            "# TYPE mmrag_stage_latency_seconds summary",
        ]
        for stage, q in aggregator.snapshot().items():
            name = stage.replace(".", "_").replace("-", "_")
            for quantile, key in (("0.5", "p50_ms"), ("0.95", "p95_ms")):
                if key in q:
                    lines.append(
                        f'mmrag_stage_latency_seconds{{stage="{name}",'
                        f'quantile="{quantile}"}} {q[key] / 1e3:.6f}'
                    )
            if "count" in q:
                lines.append(
                    f'mmrag_stage_latency_seconds_count{{stage="{name}"}}'
                    f' {q["count"]}'
                )
        try:
            emb = comps.embedder.get_stats() if comps.embedder else {}
            lines.append(
                "# TYPE mmrag_embeddings_created_total counter"
            )
            lines.append(
                f"mmrag_embeddings_created_total "
                f"{emb.get('total_embeddings_created', 0)}"
            )
            lines.append("# TYPE mmrag_queries_total counter")
            lines.append(
                f"mmrag_queries_total {emb.get('total_queries', 0)}"
            )
            if comps.embedder and comps.embedder.store is not None:
                lines.append("# TYPE mmrag_vectors gauge")
                lines.append(
                    f"mmrag_vectors {comps.embedder.store.count()}"
                )
        except Exception:  # noqa: BLE001
            pass
        if hasattr(comps.llm_adapter, "batches_run"):
            lines.append("# TYPE mmrag_generation_batches_total counter")
            lines.append(
                f"mmrag_generation_batches_total "
                f"{comps.llm_adapter.batches_run}"
            )
            lines.append("# TYPE mmrag_generation_requests_total counter")
            lines.append(
                f"mmrag_generation_requests_total "
                f"{comps.llm_adapter.requests_served}"
            )
        lines.append("# TYPE mmrag_openai_feature_requests_total counter")
        for feat, count in openai_counters.items():
            lines.append(
                "mmrag_openai_feature_requests_total"
                f'{{feature="{feat}"}} {count}'
            )
        lines.append("# TYPE mmrag_uptime_seconds gauge")
        lines.append(
            f"mmrag_uptime_seconds {time.time() - app['start_time']:.1f}"
        )
        return web.Response(
            text="\n".join(lines) + "\n",
            content_type="text/plain",
        )

    # --- Profiling (additive; jax.profiler device traces) ----------------
    async def profile(request):
        try:
            body = await request.json()
        except ValueError:
            return json_error(422, "JSON body required")
        action = body.get("action")
        if action == "start":
            log_dir = body.get("log_dir", "/tmp/mmrag_profile")
            ok = start_trace(log_dir)
            return web.json_response(
                {"profiling": "started" if ok else "already_running",
                 "log_dir": log_dir}
            )
        if action == "stop":
            log_dir = stop_trace()
            return web.json_response(
                {"profiling": "stopped" if log_dir else "not_running",
                 "log_dir": log_dir}
            )
        return json_error(422, "action must be 'start' or 'stop'")

    # --- Docs (FastAPI auto-docs counterpart) ----------------------------
    async def openapi(request):
        return web.json_response(_openapi_spec())

    async def docs(request):
        routes_html = "".join(
            f"<li><code>{m} {p}</code> — {d}</li>"
            for m, p, d in _route_docs()
        )
        return web.Response(
            text=f"<html><body><h1>multimodal_rag_tpu API</h1>"
            f"<ul>{routes_html}</ul></body></html>",
            content_type="text/html",
        )

    app.router.add_get("/", home)
    app.router.add_get("/admin", admin)
    app.router.add_get("/health", health)
    app.router.add_post("/upload", upload)
    app.router.add_post("/query", query)
    app.router.add_get("/documents", list_documents)
    app.router.add_delete("/documents/{doc_id}", delete_document)
    app.router.add_delete("/documents", delete_all)
    # Fix for the reference admin UI's singular route (SURVEY.md §2.3.4).
    app.router.add_delete("/document/{doc_id}", delete_document)
    app.router.add_get("/stats", stats)
    app.router.add_post("/search/images", search_images)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/embeddings", openai_embeddings)
    app.router.add_post("/v1/rerank", rerank_http)
    app.router.add_get("/v1/models", openai_models)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/profile", profile)
    app.router.add_get("/docs", docs)
    app.router.add_get("/openapi.json", openapi)
    if STATIC_DIR.is_dir():
        app.router.add_static("/static", STATIC_DIR)
    # Extracted figures (thumbnails for cross-modal results in the chat UI).
    if settings.FIGURES_DIR.is_dir():
        app.router.add_static("/figures", settings.FIGURES_DIR)
    return app


def _route_docs():
    return [
        ("GET", "/", "chat UI"),
        ("GET", "/admin", "admin UI"),
        ("GET", "/health", "component health"),
        ("POST", "/upload", "multipart file upload → parse/summarize/embed"),
        ("POST", "/query", "RAG query {query, top_k, use_multimodal}"),
        ("GET", "/documents", "list stored documents"),
        ("DELETE", "/documents/{doc_id}", "delete one document"),
        ("DELETE", "/document/{doc_id}", "delete one document (alias)"),
        ("DELETE", "/documents", "delete all documents"),
        ("GET", "/stats", "system statistics"),
        ("POST", "/search/images", "cross-modal figure search {query, top_k}"),
        ("GET", "/metrics", "Prometheus text-format metrics"),
        ("POST", "/v1/chat/completions",
         "OpenAI-compatible chat completions (SSE streaming, vision "
         "parts, top_p/stop)"),
        ("POST", "/v1/completions",
         "OpenAI-compatible legacy text completions (string or batched "
         "list prompt)"),
        ("POST", "/v1/embeddings",
         "OpenAI-compatible embeddings over the on-TPU encoder"),
        ("POST", "/v1/rerank",
         "Cohere/Jina-style rerank over the on-TPU cross-encoder/MaxSim "
         "reranker {query, documents[], top_n?, return_documents?}"),
        ("GET", "/v1/models", "OpenAI-compatible model listing"),
    ]


def _openapi_spec() -> Dict[str, Any]:
    paths: Dict[str, Any] = {}
    for method, path, desc in _route_docs():
        spec_path = path.replace("{doc_id}", "{doc_id}")
        paths.setdefault(spec_path, {})[method.lower()] = {
            "summary": desc,
            "responses": {"200": {"description": "OK"}},
        }
    return {
        "openapi": "3.0.0",
        "info": {"title": "multimodal_rag_tpu", "version": "0.1.0"},
        "paths": paths,
    }


def run():
    logging.basicConfig(level=getattr(logging, settings.LOG_LEVEL, 20))
    # Direct `python -m multimodal_rag_tpu.server.api` launches get the
    # persistent compile cache too (run_server.py enables it earlier,
    # before its preflight jits; the call is idempotent).
    from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    app = create_app()
    web.run_app(app, host=settings.API_HOST, port=settings.API_PORT)


if __name__ == "__main__":
    run()
