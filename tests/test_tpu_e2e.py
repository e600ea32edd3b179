"""Real-TPU end-to-end smoke (VERDICT r2 weak #6): one compiled pass over
the full serving slice — ingest → store save/load → fused /query →
on-TPU generation — on tiny shapes, so integration regressions (not just
kernels) are caught compiled on the chip.

Run on a TPU host with:

    MMRAG_TPU_TESTS=1 python -m pytest tests/test_tpu_e2e.py -v

Budget: a handful of small-executable compiles; well under 2 minutes on
an idle chip."""

import asyncio
import io

import aiohttp
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

if jax.default_backend() != "tpu":
    pytest.skip("e2e smoke tier needs a TPU backend",
                allow_module_level=True)

from multimodal_rag_tpu.embedder import EmbeddingManager  # noqa: E402
from multimodal_rag_tpu.ingest.parser import DocumentParser  # noqa: E402
from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer  # noqa: E402
from multimodal_rag_tpu.models.adapters import TPULLMAdapter  # noqa: E402
from multimodal_rag_tpu.models.decoder import (  # noqa: E402
    DecoderConfig,
    TextDecoder,
    init_params as init_dec_params,
)
from multimodal_rag_tpu.models.minilm import (  # noqa: E402
    EncoderConfig,
    TextEncoder,
    init_params,
)
from multimodal_rag_tpu.parallel.sharding import get_mesh  # noqa: E402
from multimodal_rag_tpu.server.api import Components, create_app  # noqa: E402
from multimodal_rag_tpu.storage.kv import MemoryKV  # noqa: E402
from multimodal_rag_tpu.storage.retriever import (  # noqa: E402
    MultiVectorRetriever,
)
from multimodal_rag_tpu.vectorstore import VectorStore  # noqa: E402

TINY_ENC = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=64,
)
TINY_DEC = DecoderConfig(
    vocab_size=512, hidden_dim=32, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=8, ff_dim=64, max_position=2048,
)


@pytest.fixture(scope="module")
def slice_env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("tpu_e2e")
    loop = asyncio.new_event_loop()
    encoder = TextEncoder(
        params=init_params(jax.random.key(0), TINY_ENC), cfg=TINY_ENC,
        seq_buckets=(16, 32), batch_buckets=(4, 8),
    )
    store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                        initial_capacity=512)
    llm = TPULLMAdapter(decoder=TextDecoder(
        params=init_dec_params(jax.random.key(1), TINY_DEC), cfg=TINY_DEC,
        prompt_buckets=(64, 128), batch_buckets=(1, 4),
    ))
    comps = Components(
        parser=DocumentParser(figures_dir=tmp_path / "figures",
                              enable_ocr=False),
        llm_adapter=llm,
        mllm_adapter=llm,  # text-degrading multimodal is fine for smoke
        summarizer=ContentSummarizer(llm, max_concurrent=4, max_retries=1),
        embedder=EmbeddingManager(encoder=encoder, store=store),
        retriever=MultiVectorRetriever(kv=MemoryKV(str(tmp_path / "kv"))),
    )
    loop.run_until_complete(comps.initialize())
    client = TestClient(TestServer(create_app(components=comps), loop=loop),
                        loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop, comps, tmp_path
    loop.run_until_complete(client.close())
    loop.close()


def _post_file(client, loop, name, content):
    form = aiohttp.FormData()
    form.add_field("file", io.BytesIO(content), filename=name,
                   content_type="text/plain")

    async def do():
        resp = await client.post("/upload", data=form)
        return resp.status, await resp.json()

    return loop.run_until_complete(do())


class TestEndToEndOnTPU:
    def test_ingest_query_generate_roundtrip(self, slice_env):
        client, loop, comps, tmp_path = slice_env
        # 1) Ingest: parse → on-TPU summarize → on-TPU embed → store.
        status, body = _post_file(
            client, loop, "ml.txt",
            b"Machine learning extracts patterns from data. "
            b"Neural networks are trained with gradient descent. "
            b"Retrieval augmented generation grounds answers in context.",
        )
        assert status == 200, body
        assert body["chunks_processed"]["text"] >= 1
        doc_id = body["doc_id"]

        # 2) Query through the FUSED path (single chip, small corpus):
        # embed forward + MIPS top-k in one compiled dispatch.
        async def do_query():
            resp = await client.post(
                "/query", json={"query": "what is machine learning?",
                                "top_k": 3},
            )
            return resp.status, await resp.json()

        status, q = loop.run_until_complete(do_query())
        assert status == 200
        assert q["sources"], q
        assert q["answer"]  # on-TPU decoder answered (random-init text)
        fused = comps.embedder.get_stats().get("fused_queries", None)
        if fused is not None:
            assert fused >= 1

        # 3) On-TPU generation through the OpenAI surface.
        async def do_chat():
            resp = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "hi"}],
                      "max_tokens": 8},
            )
            return resp.status, await resp.json()

        status, chat = loop.run_until_complete(do_chat())
        assert status == 200
        assert chat["choices"][0]["message"]["role"] == "assistant"

        # 4) Persistence: save → load → parity of count and top-1 on a
        # compiled-on-TPU query against the loaded store.
        store = comps.embedder.store
        save_dir = str(tmp_path / "persist")
        store.save(save_dir)
        loaded = VectorStore.load(save_dir, mesh=get_mesh(1), tile_n=256,
                                  initial_capacity=512)
        assert loaded.count() == store.count() > 0
        emb = comps.embedder.encoder.encode(
            ["what is machine learning?"]
        )
        a = store.query(np.asarray(emb), n_results=1)
        b = loaded.query(np.asarray(emb), n_results=1)
        assert a["ids"] == b["ids"]

        # 5) Delete document end-to-end.
        async def do_delete():
            resp = await client.delete(f"/documents/{doc_id}")
            return resp.status

        assert loop.run_until_complete(do_delete()) == 200


class TestFlashDecodeOnChip:
    def test_flash_matches_xla_attention_compiled(self):
        """Compiled-on-chip numerics gate for ops/flash_decode.py: the
        kernel's single-step decode logits must track the XLA
        slice+einsum path within flash-softmax reassociation noise
        (interpret-mode oracle tests run on CPU; this is the real-MXU
        contract)."""
        from multimodal_rag_tpu.config import settings
        from multimodal_rag_tpu.models.decoder import (
            decode_step,
            prefill,
        )

        cfg = DecoderConfig(
            vocab_size=512, hidden_dim=256, num_layers=3, num_heads=4,
            num_kv_heads=2, head_dim=64, ff_dim=512, max_position=512,
        )
        params = init_dec_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(0)
        B, P, S = 4, 128, 256
        ids = jnp.asarray(
            rng.integers(3, cfg.vocab_size, (B, P)), jnp.int32
        )
        mask = jnp.ones((B, P), jnp.int32)
        km = jnp.zeros((B, S), jnp.int32).at[:, : P + 1].set(1)
        tok = jnp.asarray([5, 9, 11, 20], jnp.int32)
        out = {}
        prev = settings.TPU_LLM_FLASH_DECODE
        try:
            for flag in (True, False):
                jax.clear_caches()
                settings.TPU_LLM_FLASH_DECODE = flag
                _, cache = prefill(params, ids, mask, cfg, S)
                lg, _ = decode_step(
                    params, cache, tok, jnp.int32(P), km,
                    jnp.full((B,), P, jnp.int32), cfg,
                )
                out[flag] = np.asarray(lg)
        finally:
            settings.TPU_LLM_FLASH_DECODE = prev
            jax.clear_caches()
        scale = max(1e-3, float(np.abs(out[False]).max()))
        rel = float(np.abs(out[True] - out[False]).max()) / scale
        assert rel < 0.05, rel
