"""HBM-resident sharded vector store (replaces ChromaDB + hnswlib)."""

from multimodal_rag_tpu.vectorstore.store import VectorStore

__all__ = ["VectorStore"]
