"""Serving the first-party tiny-LM checkpoint (VERDICT r4 #5's e2e leg).

`tools/train_tiny.py` produces a small REAL checkpoint (params.npz + a
DecoderConfig config.json); `TextDecoder` now loads that format directly
via ``checkpoint_path`` — the byte vocabulary means the default
ByteTokenizer IS the matching tokenizer — so the full server can answer
`/query` with trained weights instead of random-init gibberish.

Two tiers here:

* loader tests (any backend): format detection, config round-trip,
  pretrained flag, and that HF snapshot dirs are NOT mistaken for the
  tiny format;
* an end-to-end `/upload` → `/query` answer-sanity smoke (TPU tier,
  ``MMRAG_TPU_TESTS=1`` + checkpoint present): the answer produced by
  the trained model over real retrieved context must read as text —
  mostly printable ASCII sharing vocabulary with the corpus — which a
  random-init byte LM fails at (its output is uniform bytes).
"""

import asyncio
import io
import os
from pathlib import Path

import aiohttp
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    _is_tiny_lm_dir,
    init_params,
)
from multimodal_rag_tpu.models.tokenizer import ByteTokenizer
from multimodal_rag_tpu.tools.train_tiny import (
    load_tiny_lm,
    save_tiny_lm,
)

REPO = Path(__file__).resolve().parent.parent
TINY_CKPT = REPO / "runtime" / "tiny_lm"

MICRO = DecoderConfig(
    vocab_size=384, hidden_dim=32, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=8, ff_dim=64, max_position=128,
    compute_dtype=jnp.float32,
)


class TestTinyLoader:
    def test_decoder_loads_tiny_dir(self, tmp_path):
        params = init_params(jax.random.key(0), MICRO)
        path = save_tiny_lm(str(tmp_path / "ck"), params, MICRO,
                            meta={"steps": 1})
        dec = TextDecoder(checkpoint_path=path, prompt_buckets=(32,),
                          batch_buckets=(1,))
        assert dec.pretrained
        assert isinstance(dec.tokenizer, ByteTokenizer)
        assert dec.cfg == MICRO
        # Weights really came from the file, not a fresh init.
        got = np.asarray(dec.params["layers"]["wq"])
        want = np.asarray(params["layers"]["wq"])
        np.testing.assert_array_equal(got, want)

    def test_roundtrip_preserves_config_tuples(self, tmp_path):
        cfg = DecoderConfig(
            vocab_size=384, hidden_dim=32, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=8, ff_dim=64, max_position=128,
            layer_windows=(16, 0), compute_dtype=jnp.bfloat16,
        )
        params = init_params(jax.random.key(1), cfg)
        path = save_tiny_lm(str(tmp_path / "ck"), params, cfg)
        _p, cfg2, _m = load_tiny_lm(path)
        assert cfg2 == cfg

    def test_hf_dir_is_not_tiny(self, tmp_path):
        (tmp_path / "config.json").write_text('{"model_type": "llama"}')
        (tmp_path / "model.safetensors").write_bytes(b"")
        assert not _is_tiny_lm_dir(str(tmp_path))
        assert _is_tiny_lm_dir(str(TINY_CKPT)) == (
            (TINY_CKPT / "params.npz").exists()
        )

    def test_corrupt_tiny_dir_degrades_to_random_init(self, tmp_path):
        (tmp_path / "params.npz").write_bytes(b"not a zipfile")
        dec = TextDecoder(checkpoint_path=str(tmp_path),
                          prompt_buckets=(32,), batch_buckets=(1,))
        assert not dec.pretrained  # loud log + fallback, no crash


# --------------------------------------------------------------------------
# TPU tier: the answer-sanity smoke on the real trained checkpoint.
# --------------------------------------------------------------------------

_tpu = (
    jax.default_backend() == "tpu"
    and os.environ.get("MMRAG_TPU_TESTS") == "1"
    and (TINY_CKPT / "params.npz").exists()
)


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu, reason="needs TPU + trained tiny_lm ckpt")
class TestAnswerSanity:
    def test_upload_query_answer_reads_as_text(self, tmp_path):
        from multimodal_rag_tpu.embedder import EmbeddingManager
        from multimodal_rag_tpu.ingest.parser import DocumentParser
        from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
        from multimodal_rag_tpu.models.adapters import TPULLMAdapter
        from multimodal_rag_tpu.models.minilm import (
            EncoderConfig,
            TextEncoder,
            init_params as init_enc_params,
        )
        from multimodal_rag_tpu.parallel.sharding import get_mesh
        from multimodal_rag_tpu.server.api import Components, create_app
        from multimodal_rag_tpu.storage.kv import MemoryKV
        from multimodal_rag_tpu.storage.retriever import MultiVectorRetriever
        from multimodal_rag_tpu.vectorstore import VectorStore

        enc_cfg = EncoderConfig(
            vocab_size=2048, hidden_dim=64, num_layers=2, num_heads=4,
            ff_dim=128, max_position=64, compute_dtype=jnp.float32,
        )
        encoder = TextEncoder(
            params=init_enc_params(jax.random.key(0), enc_cfg), cfg=enc_cfg,
            seq_buckets=(32, 64), batch_buckets=(4, 8),
        )
        decoder = TextDecoder(
            checkpoint_path=str(TINY_CKPT),
            prompt_buckets=(512, 1024), batch_buckets=(1, 4),
        )
        llm = TPULLMAdapter(decoder=decoder, continuous=False)
        comps = Components(
            parser=DocumentParser(figures_dir=tmp_path / "figures",
                                  enable_ocr=False),
            llm_adapter=llm,
            mllm_adapter=llm,
            summarizer=ContentSummarizer(llm, max_concurrent=2),
            embedder=EmbeddingManager(
                encoder=encoder,
                store=VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                                  initial_capacity=512, dtype=jnp.float32),
            ),
            retriever=MultiVectorRetriever(kv=MemoryKV(str(tmp_path / "kv"))),
        )
        doc = (REPO / "data" / "sample_document.txt").read_bytes()

        loop = asyncio.new_event_loop()
        try:
            loop.run_until_complete(comps.initialize())
            app = create_app(components=comps)
            client = TestClient(TestServer(app, loop=loop), loop=loop)
            loop.run_until_complete(client.start_server())

            async def drive():
                form = aiohttp.FormData()
                form.add_field("file", io.BytesIO(doc),
                               filename="sample_document.txt",
                               content_type="text/plain")
                r = await client.post("/upload", data=form)
                assert r.status == 200, await r.text()
                r = await client.post("/query", json={
                    "query": "học máy là gì?", "top_k": 3,
                })
                assert r.status == 200, await r.text()
                return await r.json()

            out = loop.run_until_complete(drive())
        finally:
            loop.run_until_complete(client.close())
            loop.close()

        answer = out["answer"]
        assert out["sources"], out
        assert len(answer) >= 20, repr(answer)
        # Trained-model sanity: byte LMs with random weights emit uniform
        # bytes (~35% printable-ASCII by chance); the trained model's
        # answer must read as text. UTF-8 Vietnamese continuations decode
        # to non-ASCII pairs, so measure on the decoded string.
        printable = sum(c.isprintable() or c.isspace() for c in answer)
        assert printable / len(answer) >= 0.8, repr(answer)
        # And it must share real vocabulary with the corpus it memorized:
        # at least one 6+-char token in common with the uploaded doc.
        doc_words = set(
            w for w in doc.decode("utf-8", "ignore").split() if len(w) >= 6
        )
        ans_words = set(w for w in answer.split() if len(w) >= 6)
        assert doc_words & ans_words or len(ans_words) >= 3, repr(answer)
