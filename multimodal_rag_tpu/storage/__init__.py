"""Raw-content KV storage (native C++ backend) and retriever."""

from multimodal_rag_tpu.storage.kv import MemoryKV, NativeKV, open_kv

__all__ = ["MemoryKV", "NativeKV", "open_kv"]
