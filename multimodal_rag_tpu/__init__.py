"""TPU-native multimodal RAG framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of the
``multimodal_rag`` reference (see SURVEY.md): document ingest (PDF / DOCX /
PPTX / HTML / TXT / MD / images), LLM summarization, text+image embedding with
MiniLM/CLIP-class encoders, HBM-resident sharded vector search with fused
Pallas MIPS + top-k kernels, a raw-content KV store, and an HTTP serving
surface bit-compatible with the reference's `/upload`, `/query`, `/documents`,
`/health`, `/stats` routes.

Layering (bottom-up, SURVEY.md §7):
  runtime/     mesh + topology bootstrap, profiling
  ops/         Pallas kernels (exact MIPS top-k, IVF, fused stages)
  models/      encoders (MiniLM, CLIP) + LLM adapters
  parallel/    sharding + collectives-based distributed search
  vectorstore/ shard manager + query planner (replaces ChromaDB/hnswlib)
  ingest/      parser, chunking, summarizer
  storage/     raw-content KV (replaces Redis; native C++ backend)
  server/      HTTP API + launcher
"""

__version__ = "0.1.0"
