"""Server launcher: banner, preflight checks, serve.

Counterpart of the reference ``run_server.py``: startup banner (``:88-129``),
KV-store and Ollama preflights (``:26-85``), then the web app. The KV
preflight checks the in-process native store instead of an external
redis-server; Ollama remains an optional external dependency (the app
degrades to fallback summaries without it, like the reference warns).
"""

from __future__ import annotations

import asyncio
import logging
import sys

from multimodal_rag_tpu.config import settings, validate_settings

logging.basicConfig(
    level=getattr(logging, settings.LOG_LEVEL, logging.INFO),
    format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
)
logger = logging.getLogger("run_server")


def check_kv() -> bool:
    try:
        from multimodal_rag_tpu.storage.kv import open_kv

        kv = open_kv(settings.KV_BACKEND, settings.KV_PERSIST_DIR)
        ok = kv.ping()
        logger.info(
            "KV store OK (%s, %d keys)", type(kv).__name__, kv.count()
        )
        kv.close()
        return ok
    except Exception as e:  # noqa: BLE001
        logger.error("KV store check failed: %s", e)
        return False


async def check_ollama() -> bool:
    if not settings.USE_LOCAL_LLM:
        logger.info("Cloud LLM configured (OpenAI) — skipping Ollama check")
        return True
    try:
        import httpx

        async with httpx.AsyncClient(timeout=5.0) as client:
            resp = await client.get(f"{settings.OLLAMA_BASE_URL}/api/tags")
            if resp.status_code == 200:
                names = [m.get("name") for m in resp.json().get("models", [])]
                logger.info("Ollama OK — models: %s", names)
                if settings.OLLAMA_MODEL not in names:
                    logger.warning(
                        "Model %s not pulled (ollama pull %s)",
                        settings.OLLAMA_MODEL, settings.OLLAMA_MODEL,
                    )
                return True
    except Exception as e:  # noqa: BLE001
        logger.warning(
            "Ollama unreachable at %s (%s) — summaries will use fallbacks",
            settings.OLLAMA_BASE_URL, e,
        )
    return False


def print_startup_info() -> None:
    import jax

    print("=" * 70)
    print("  Multimodal RAG — TPU-native build")
    print(f"  Backend: {jax.default_backend()} "
          f"({len(jax.devices())} device(s))")
    print(f"  Server:  http://{settings.API_HOST}:{settings.API_PORT}")
    print(f"  Docs:    http://{settings.API_HOST}:{settings.API_PORT}/docs")
    print(f"  LLM:     {'Ollama ' + settings.OLLAMA_MODEL if settings.USE_LOCAL_LLM else 'OpenAI ' + settings.OPENAI_MODEL}")
    print("  Auth:    DISABLED — localhost only")
    print("=" * 70)


def check_chroma_migration() -> None:
    """If a legacy ChromaDB directory exists (CHROMA_PERSIST_DIR,
    reference config.py:58) but our vector store has never been
    persisted, point the operator at the offline importer — the knob
    keeps existing deployments' .env files meaningful."""
    from pathlib import Path

    chroma = Path(settings.CHROMA_PERSIST_DIR)
    ours = Path(settings.VECTOR_PERSIST_DIR)
    if (chroma / "chroma.sqlite3").exists() and not any(
        ours.glob("*.json")
    ):
        logger.info(
            "Found ChromaDB corpus at %s but no native vector store at "
            "%s — migrate it with: python -m "
            "multimodal_rag_tpu.tools.import_chroma %s %s",
            chroma, ours, chroma, ours,
        )


async def run_startup_checks() -> bool:
    kv_ok = check_kv()
    await check_ollama()
    check_chroma_migration()
    return kv_ok


def main() -> None:
    validate_settings(settings)
    # Before any jit: restarts deserialize yesterday's executables
    # instead of re-paying the per-bucket compile fleet (the dominant
    # cold-start cost — see runtime/compile_cache.py).
    from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    print_startup_info()
    if not asyncio.run(run_startup_checks()):
        logger.error("Preflight failed")
        sys.exit(1)
    from multimodal_rag_tpu.server.api import run

    run()


if __name__ == "__main__":
    main()
