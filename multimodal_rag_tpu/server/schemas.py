"""Request/response models (reference ``app/server/api.py:161-179``)."""

from __future__ import annotations

from typing import List, Optional

from pydantic import BaseModel, Field

from multimodal_rag_tpu.config import settings


class QueryRequest(BaseModel):
    query: str = Field(..., min_length=1, max_length=2000)
    # Default from TOP_K_RESULTS (reference config.py:66); clients
    # override per request within the reference's 1..20 bounds.
    top_k: int = Field(
        default_factory=lambda: min(max(settings.TOP_K_RESULTS, 1), 20),
        ge=1, le=20,
    )
    use_multimodal: bool = Field(False)
    # Attached image (data URL or raw base64) — the reference chat UI
    # sends this with the query body (reference static/app.js:375) and
    # the MLLM sees it during multimodal generation. ~14 MB base64 cap
    # mirrors the 10 MB UI image limit.
    image: Optional[str] = Field(None, max_length=15_000_000)
    # Additive over the reference schema: enable the TPU cross-encoder
    # rerank stage (the reference's placeholder made real).
    rerank: bool = Field(False)


class QueryResponse(BaseModel):
    answer: str
    sources: List[dict]
    processing_time: float


class UploadResponse(BaseModel):
    doc_id: str
    filename: str
    doc_type: str
    chunks_processed: dict
    message: str
    processing_time: float
