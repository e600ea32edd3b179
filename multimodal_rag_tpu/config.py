"""Application settings.

Environment-variable compatible with the reference's ``config.py``
(reference ``config.py:18-132``): every knob the reference reads keeps its
name and default so existing ``.env`` deployments port over unchanged
(SURVEY.md §5.6). TPU-specific knobs (mesh, dtype, bucketing, vector-store
layout) are additive.

No external deps: ``.env`` loading and type coercion are implemented with
the stdlib (the reference used pydantic-settings + python-dotenv).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Optional

BASE_DIR = Path(os.environ.get("MMRAG_BASE_DIR", os.getcwd()))


def _load_dotenv(path: Path) -> dict:
    """Minimal .env parser: KEY=VALUE lines, '#' comments, optional quotes."""
    env: dict = {}
    try:
        text = path.read_text()
    except OSError:
        return env
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        key, value = key.strip(), value.strip()
        if value[:1] in "\"'" and value[-1:] == value[:1] and len(value) >= 2:
            value = value[1:-1]
        env.setdefault(key, value)
    return env


def _to_bool(raw: str) -> bool:
    return raw.strip().lower() == "true"


@dataclass
class Settings:
    """All runtime configuration, resolved once at construction.

    Field names / defaults mirror reference ``config.py:24-122``.
    """

    # --- LLM configuration (reference config.py:24-33) ---
    USE_LOCAL_LLM: bool = True
    # On-TPU generation (models/decoder.py): overrides USE_LOCAL_LLM's
    # backend pick for the text adapter; answers/summaries are generated
    # on the chip instead of over HTTP. Needs MMRAG_LLM_CHECKPOINT_PATH
    # (a local Llama/Qwen2/Gemma safetensors snapshot) for meaningful
    # text; runs random-init with a loud warning otherwise.
    USE_TPU_LLM: bool = False
    MMRAG_LLM_CHECKPOINT_PATH: str = ""
    # LoRA finetune adapters (PEFT layout: adapter_config.json +
    # adapter_model.safetensors), merged into the base weights at load —
    # decode then serves the finetune at exactly base-model cost
    # (models/lora.py). Colon-separated; applied in order.
    MMRAG_LLM_LORA_PATH: str = ""
    # S-LoRA multi-adapter serving: NAMED LoRA finetunes served
    # concurrently from the ONE default-model weight copy, routed by the
    # OpenAI ``model`` parameter. Comma-separated ``name=/peft/dir``
    # entries; each adapter costs only its own low-rank pairs in HBM
    # (models/lora.py stack_lora_adapters), unlike MMRAG_LLM_MODELS
    # entries which load a full checkpoint each. Composes with
    # TPU_LLM_QUANTIZE (int8 base + f32 side-path) and the
    # continuous-batching server (per-slot routing).
    MMRAG_LORA_ADAPTERS: str = ""
    # Multi-model serving: additional NAMED on-TPU models routed by the
    # OpenAI ``model`` parameter. Comma-separated
    # ``name=/path/to/snapshot`` entries; append ``+/path/to/lora`` (one
    # or more) to serve a merged finetune under its own name. Weights
    # load lazily on a model's first request. Empty = single-model
    # behavior (the ``model`` field stays display-only).
    MMRAG_LLM_MODELS: str = ""
    # On-TPU multimodal generation (models/llava.py): llava-architecture
    # vision+text on the chip instead of an Ollama-hosted llava. Needs
    # MMRAG_MLLM_CHECKPOINT_PATH (a local HF llava safetensors snapshot).
    USE_TPU_MLLM: bool = False
    MMRAG_MLLM_CHECKPOINT_PATH: str = ""
    # int8 weight quantization for the on-TPU decoder: decode is weight-
    # streaming bound, so halving the HBM bytes is ~1.6x faster decode
    # (measured 2.45 -> 1.53 ms/step at B=8 on v5e) at a small (w8a8
    # per-channel) quality cost.
    TPU_LLM_QUANTIZE: bool = False
    # Weight-quantization width when TPU_LLM_QUANTIZE=true: 8 (w8a8
    # int8 MXU path) or 4 (packed-nibble int4 weights with in-kernel
    # unpack, ops/qmatmul_int4.py — halves the int8 stream again; bf16
    # activations). Validate output quality per checkpoint at 4 bits.
    TPU_LLM_QUANTIZE_BITS: int = 8
    # Continuous batching (serving_decode.DecodeServer): requests join the
    # running decode batch at token boundaries instead of waiting for the
    # current batch to finish. Best under sustained concurrent query load
    # on a directly-attached TPU. Trade-off vs the default coalescer: the
    # decode loop is host-driven (one dispatch per token, ~0.1-0.3 ms on a
    # local host — but dominant over a relay/tunnel), while the coalescer
    # runs the whole generation as one fused device loop.
    TPU_LLM_CONTINUOUS: bool = False
    # Chunked prefill for the continuous-batching server (Sarathi-style):
    # prompts are consumed TPU_LLM_PREFILL_CHUNK tokens per fused pass
    # while decoding rows piggyback one token each, so a long prompt
    # never stalls in-flight generations (the classic admission prefill
    # blocks the loop for a full prompt-bucket pass). Also switches rows
    # to an unpadded cache layout, which is what enables the prefix
    # cache below. Only meaningful with TPU_LLM_CONTINUOUS=true.
    # Default ON (r4 ablation, tools/serving_ablation.py on v5e:
    # unqueued TTFT p50 347 ms vs 476 ms classic at equal throughput —
    # DEPLOYMENT.md "Serving configuration").
    TPU_LLM_CHUNKED_PREFILL: bool = True
    TPU_LLM_PREFILL_CHUNK: int = 128
    # Device-resident prompt-prefix KV cache (requires chunked prefill):
    # N cache entries of up to the largest prompt bucket, LRU-evicted.
    # RAG traffic shares the system preamble and often the retrieved
    # context across turns; a hit skips recomputing the matched
    # chunk-aligned prefix entirely (device-to-device block copy). HBM
    # cost per entry: L*Lp*n_kv*head_dim*4 bytes (k+v, bf16). 0 = off.
    # Default 8 (r4 ablation: every later-wave request reused the full
    # 384-token shared preamble; the hit replaces ~3 prefill passes with
    # one device-to-device block copy. NOTE: over the dev relay tunnel
    # the extra admission dispatches make raw TTFT look WORSE — the win
    # is real only on a locally-attached chip; see DEPLOYMENT.md).
    TPU_LLM_PREFIX_CACHE: int = 8
    # Prompt-length buckets (tokens) for the on-TPU decoder; the LAST
    # entry is the hard prompt ceiling — longer prompts keep only their
    # tail (counted in /stats as generation.truncated_prompts). The
    # default top ceiling is 2048 because the framework's OWN default
    # /query prompt (top-5 x 1000-char chunks, SURVEY §3.5) is ~1300+
    # tokens — a 1024 ceiling silently dropped the earliest retrieved
    # chunk (VERDICT r3 §6). Each extra bucket costs one more compiled
    # executable per generation preset; lower it for short-prompt
    # deployments.
    TPU_LLM_PROMPT_BUCKETS: str = "128,256,512,1024,2048"
    # Prompt-lookup speculative decoding for the coalesced on-TPU decode
    # path: drafts come from n-gram matches against the prompt (RAG
    # answers quote their context), verified K+1-at-a-time in one weight
    # pass. Greedy output is bit-identical to plain decode; sampled
    # output is distribution-identical (rejection sampling) but uses a
    # different pseudo-random stream than spec-off. In continuous-
    # batching mode it additionally requires TPU_LLM_CHUNKED_PREFILL
    # (decode-only passes then draft+verify K+1 tokens per dispatch with
    # per-row accept/reject — fewer host round trips per token).
    TPU_LLM_SPECULATIVE: bool = False
    TPU_LLM_SPEC_K: int = 7
    # Ring-buffer KV caches for sliding-window layers (Gemma3, GPT-OSS):
    # a layer with window W stores min(W, context) cache slots instead
    # of the full context — exact (the attention mask already hid
    # out-of-window keys; HF-golden tested) and ~2.3x smaller for a
    # Gemma3-shaped 2.5k context. Applies to the batch/coalesced decode
    # path and classic continuous batching; chunked-prefill / prefix-
    # cache / speculative serving fall back to full-length caches (ring
    # overwrites cannot rewind rejected drafts). False = always full.
    TPU_LLM_WINDOWED_CACHE: bool = True
    # Fused Pallas flash-decode attention (ops/flash_decode.py): the
    # decode step reads each layer's KV straight from the stacked cache
    # via a scalar-prefetch index_map instead of materializing a row
    # slice before the attention dot. TPU decode at T=1, including
    # TP-sharded serving (the kernel is GSPMD-partitionable on the
    # batch/kv-head axes, r5) and MLA models (absorbed-latent variant);
    # CPU and chunked T>1 paths keep the XLA einsum. Numerics are
    # flash-style online softmax — equal to the XLA path within
    # bf16/f32 rounding. False = always XLA attention.
    TPU_LLM_FLASH_DECODE: bool = True
    # int8 KV cache (r5): store decode k/v as int8 with per-(token,
    # head) f32 scales — HALF the cache HBM stream per decode step
    # (the long-context bound) and half the cache memory, at a small
    # measured logit perturbation (tests/test_kv_quant.py gates; the
    # flash kernel dequantizes in VMEM, ops/flash_decode.py). Composes
    # with windowed rings, continuous batching, chunked prefill, prefix
    # cache, and TP. MLA models keep their bf16 latent cache (already
    # 9-57x smaller). Off by default: exactness-first posture — flip on
    # for long-context serving where the cache dominates step time.
    TPU_LLM_KV_QUANT: bool = False
    # TEST-ONLY: take the flash-decode kernel path on non-TPU backends
    # (Pallas interpret mode) so CPU-mesh tests can assert kernel-path
    # greedy equality under TP. Never enable in production — interpret
    # mode is orders of magnitude slower than the XLA fallback.
    TPU_LLM_FLASH_INTERPRET: bool = False
    OLLAMA_MODEL: str = "gemma2:4b"
    OLLAMA_BASE_URL: str = "http://localhost:11434"
    OPENAI_API_KEY: Optional[str] = None
    OPENAI_MODEL: str = "gpt-4o"
    # Declared-but-unconsumed in the reference too (config.py:33 — no
    # code reads it); kept for .env compatibility. Embeddings here are
    # always computed on-TPU (and *served* via /v1/embeddings).
    OPENAI_EMBEDDING_MODEL: str = "text-embedding-3-small"

    # --- Server (reference config.py:45-46; no-auth localhost posture) ---
    API_HOST: str = "127.0.0.1"
    API_PORT: int = 8000

    # --- Raw-content KV store (reference config.py:52-55 used Redis; we
    # default to the built-in native store and optionally speak to Redis) ---
    REDIS_HOST: str = "localhost"
    REDIS_PORT: int = 6379
    REDIS_DB: int = 0
    REDIS_PASSWORD: Optional[str] = None
    KV_BACKEND: str = "native"  # native | memory | redis
    KV_PERSIST_DIR: str = "./kv_store"

    # --- Vector store (reference config.py:58-59 pointed at ChromaDB; the
    # names are kept so deployments keep working, pointing at our store) ---
    CHROMA_PERSIST_DIR: str = "./chroma_db"
    CHROMA_COLLECTION_NAME: str = "multimodal_rag"
    VECTOR_PERSIST_DIR: str = "./vector_store"
    VECTOR_SHARD_CAPACITY: int = 1 << 17  # rows per device shard segment
    # Debounced crash-durability save after mutations (seconds of quiet
    # before the incremental shard write; 0 disables — shutdown-only).
    VECTOR_AUTOSAVE_S: float = 5.0

    # --- Document processing (reference config.py:64-66) ---
    CHUNK_SIZE: int = 1000
    CHUNK_OVERLAP: int = 200
    TOP_K_RESULTS: int = 5

    # --- Parser (reference config.py:71-74) ---
    EXTRACT_PDF_EMBEDDED_IMAGES: bool = True
    CONVERT_PDF_PAGES_TO_IMAGES: bool = True
    MAX_PDF_PAGES_AS_IMAGES: int = 50
    ENABLE_OCR: bool = True

    # --- Embedder (reference config.py:79-81) ---
    EMBEDDER_BATCH_SIZE: int = 32
    EMBEDDER_CACHE_SIZE: int = 1000
    EMBEDDER_ENABLE_CACHE: bool = True

    # --- Retriever (reference config.py:86-89) ---
    RETRIEVER_ENABLE_COMPRESSION: bool = True
    RETRIEVER_ENABLE_CACHE: bool = True
    RETRIEVER_CACHE_SIZE: int = 100
    RETRIEVER_CONNECTION_POOL_SIZE: int = 10

    # --- Summarizer (reference config.py:94-97) ---
    SUMMARIZER_ENABLE_CACHE: bool = True
    SUMMARIZER_CACHE_SIZE: int = 500
    SUMMARIZER_MAX_CONCURRENT: int = 5
    SUMMARIZER_MAX_RETRIES: int = 3

    # --- Models (reference config.py:102-106; CLIP_MODEL is real here) ---
    # BERT-architecture retrieval families are supported by name: MiniLM,
    # BGE v1/v1.5 (CLS pooling + query instruction), E5 ("query: "/
    # "passage: " prefixes), GTE. The family sets pooling + prefixes
    # (models/encoder_families.py); the checkpoint's own config.json /
    # 1_Pooling/config.json refine them.
    SENTENCE_TRANSFORMER_MODEL: str = "all-MiniLM-L6-v2"
    # Override the family's retrieval prefixes: empty = family default,
    # literal "none" = force no prefix.
    EMBED_QUERY_PREFIX: str = ""
    EMBED_PASSAGE_PREFIX: str = ""
    CLIP_MODEL: str = "ViT-B/32"  # "siglip-base-patch16-224" → SigLIP towers
    # Cross-modal figure index (text↔image retrieval over extracted
    # figures). Off by default: the dual towers are ~87M params and their
    # first compile stalls the first image-bearing upload; flip on for
    # deployments that use /search/images.
    CROSS_MODAL_ENABLED: bool = False
    # rerank=true implementation: "cross" = cross-encoder pair scoring
    # (needs MMRAG_CROSS_ENCODER_PATH); "maxsim" = ColBERT-style late
    # interaction sharing the bi-encoder weights (needs only
    # MMRAG_CHECKPOINT_PATH).
    RERANK_MODE: str = "cross"

    # --- Storage (reference config.py:111-112) ---
    DATA_DIR: Path = field(default_factory=lambda: BASE_DIR / "data")
    FIGURES_DIR: Path = field(default_factory=lambda: BASE_DIR / "figures")

    # --- Misc (reference config.py:117-119) ---
    LOG_LEVEL: str = "INFO"
    ENABLE_CORS: bool = True
    MAX_UPLOAD_SIZE: int = 50  # MB

    # --- Checkpoints (new; same discovery posture as MMRAG_TOKENIZER_PATH:
    # explicit path wins, else the HF cache is scanned, else random init
    # with a prominent serving warning) ---
    MMRAG_CHECKPOINT_PATH: str = ""  # MiniLM encoder safetensors (file/dir)
    MMRAG_CROSS_ENCODER_PATH: str = ""  # reranker safetensors (file/dir)
    MMRAG_CLIP_CHECKPOINT_PATH: str = ""  # CLIP/SigLIP towers (file/dir)

    # --- TPU-specific (new) ---
    MESH_SHAPE: str = ""  # e.g. "data:4,model:2"; empty = 1-D over all devices
    COMPUTE_DTYPE: str = "bfloat16"
    SEQ_BUCKETS: str = "32,64,128,256"  # token-length buckets for XLA shapes
    BATCH_BUCKETS: str = "8,32,128,256"  # batch-size buckets (256 = v5e throughput knee)
    # Vector-store device dtype: bfloat16 | float32 | int8. int8 streams
    # per-row-quantized rows (half the bf16 HBM bytes → ~2x exact-search
    # speed) and exactly rescores candidates against the f32 host mirror.
    VECTOR_DTYPE: str = "bfloat16"
    IVF_THRESHOLD: int = 1_000_000  # rows above which the planner picks IVF
    IVF_NLIST: int = 0  # 0 = auto (~sqrt(N))
    IVF_NPROBE: int = 32
    IVF_ENGINE: str = "pallas"  # pallas | xla (xla gathers probed blocks)

    def __post_init__(self) -> None:
        dotenv = _load_dotenv(BASE_DIR / ".env")

        def raw(name: str) -> Optional[str]:
            if name in os.environ:
                return os.environ[name]
            return dotenv.get(name)

        for f in fields(self):
            value = raw(f.name)
            if value is None:
                continue
            current = getattr(self, f.name)
            if isinstance(current, bool):
                setattr(self, f.name, _to_bool(value))
            elif isinstance(current, int):
                setattr(self, f.name, int(value))
            elif isinstance(current, float):
                setattr(self, f.name, float(value))
            elif isinstance(current, Path):
                setattr(self, f.name, BASE_DIR / value)
            else:
                setattr(self, f.name, value)

        # Side effect kept from reference config.py:124-128.
        self.DATA_DIR.mkdir(parents=True, exist_ok=True)
        self.FIGURES_DIR.mkdir(parents=True, exist_ok=True)

    @property
    def seq_buckets(self) -> tuple:
        return tuple(int(x) for x in self.SEQ_BUCKETS.split(",") if x)

    @property
    def batch_buckets(self) -> tuple:
        return tuple(int(x) for x in self.BATCH_BUCKETS.split(",") if x)

    @property
    def max_upload_bytes(self) -> int:
        return self.MAX_UPLOAD_SIZE * 1024 * 1024


def validate_settings(s: Settings) -> bool:
    """Same checks as reference ``config.py:143-169``."""
    errors = []
    if not s.USE_LOCAL_LLM and not s.OPENAI_API_KEY:
        errors.append("OPENAI_API_KEY is required when USE_LOCAL_LLM=false")
    if s.CHUNK_OVERLAP >= s.CHUNK_SIZE:
        errors.append("CHUNK_OVERLAP must be less than CHUNK_SIZE")
    if s.VECTOR_DTYPE not in ("bfloat16", "float32", "int8"):
        errors.append(
            f"VECTOR_DTYPE must be bfloat16, float32, or int8 "
            f"(got {s.VECTOR_DTYPE!r})"
        )
    if s.API_HOST not in ("127.0.0.1", "localhost"):
        print("\n" + "!" * 70)
        print(f"!! WARNING: API_HOST is set to {s.API_HOST}")
        print("!! NO AUTHENTICATION ENABLED — only safe for localhost use!")
        print("!" * 70 + "\n")
    if errors:
        raise ValueError(
            "Configuration errors:\n" + "\n".join(f"  - {e}" for e in errors)
        )
    return True


settings = Settings()
validate_settings(settings)
