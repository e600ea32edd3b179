"""Ingest pipeline: chunking, document parsing, summarization."""

from multimodal_rag_tpu.ingest.chunking import (
    RecursiveTextSplitter,
    basic_chunk_text,
    chunk_simple,
    chunk_structured,
    chunk_with_pages,
)

__all__ = [
    "RecursiveTextSplitter",
    "basic_chunk_text",
    "chunk_simple",
    "chunk_structured",
    "chunk_with_pages",
]
