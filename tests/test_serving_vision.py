"""First-class vision serving (VERDICT r4 #4): image requests join the
continuous-batching DecodeServer as soft-token rows — the vision tower
encodes, ``prompt_rows`` splices, ``_admit_embeds`` prefills, and from
then on the row is an ordinary decode row (streaming / logprobs /
grammar / penalties). Replaces the reference's serialized multimodal hot
loop (``app/models/mllm_adapter.py:211-241``)."""

import asyncio
import base64
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.clip import CLIPConfig
from multimodal_rag_tpu.models.decoder import DecoderConfig
from multimodal_rag_tpu.models.llava import (
    LlavaConfig,
    LlavaGenerator,
    init_llava_params,
)
from multimodal_rag_tpu.models.adapters.tpu_mllm import (
    TPUMLLMAdapter,
    _LMView,
)
from multimodal_rag_tpu.serving_decode import DecodeServer

TINY = LlavaConfig(
    text=DecoderConfig(
        vocab_size=513, hidden_dim=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, ff_dim=64, max_position=2048,
        compute_dtype=jnp.float32,
    ),
    vision=CLIPConfig(
        image_size=32, patch_size=16, vision_width=32, vision_layers=2,
        vision_heads=4, compute_dtype=jnp.float32, fused_attention=False,
    ),
    image_token_id=512,
)


def _gen(buckets=(32, 64)):
    return LlavaGenerator(
        params=init_llava_params(jax.random.key(0), TINY),
        cfg=TINY,
        prompt_buckets=buckets,
    )


def _pil():
    from PIL import Image

    rng = np.random.default_rng(3)
    return Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8))


def _b64_png():
    import io

    buf = io.BytesIO()
    _pil().save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestEmbedAdmission:
    """DecodeServer-level: soft-token rows must reproduce the fused
    generator path and compose with the serving modes."""

    @pytest.mark.parametrize("chunk", [None, 8])
    def test_greedy_matches_generator(self, chunk):
        gen = _gen()
        solo = gen.generate(
            "describe this", images=[_pil()], max_new_tokens=8,
            temperature=0.0,
        )
        srv = DecodeServer(
            _LMView(gen), slots=4, max_new_cap=16, chunk_tokens=chunk,
        )
        ids, embeds, overlay = gen.prompt_rows("describe this", [_pil()])

        async def run():
            out = await srv.submit(
                "", max_new_tokens=8, temperature=0.0,
                prompt_embeds=embeds, prompt_ids=ids, overlay=overlay,
            )
            await srv.stop()
            return out

        out = asyncio.new_event_loop().run_until_complete(run())
        assert out == solo, (chunk, out, solo)

    def test_mixed_text_and_vision_rows(self):
        """A vision row and plain text rows decode in the SAME batch;
        each must match its solo output (slots stay independent)."""
        gen = _gen()
        srv = DecodeServer(_LMView(gen), slots=4, max_new_cap=16)
        ids, embeds, _ = gen.prompt_rows("what is here", [_pil()])
        solo_v = gen.generate(
            "what is here", images=[_pil()], max_new_tokens=6,
            temperature=0.0,
        )
        tids = srv._encode_prompt("plain text prompt")

        async def run():
            loop = asyncio.get_running_loop()
            vis = loop.create_task(srv.submit(
                "", max_new_tokens=6, temperature=0.0,
                prompt_embeds=embeds, prompt_ids=ids,
            ))
            txt = loop.create_task(srv.submit(
                "plain text prompt", max_new_tokens=6, temperature=0.0,
            ))
            r = await asyncio.gather(vis, txt)
            await srv.stop()
            return r

        vis_out, txt_out = asyncio.new_event_loop().run_until_complete(run())
        assert vis_out == solo_v
        # Solo text through a fresh server (same greedy contract).
        srv2 = DecodeServer(_LMView(gen), slots=4, max_new_cap=16)

        async def run2():
            out = await srv2.submit(
                "plain text prompt", max_new_tokens=6, temperature=0.0,
            )
            await srv2.stop()
            return out

        assert txt_out == asyncio.new_event_loop().run_until_complete(run2())

    def test_embed_prompt_validation(self):
        gen = _gen()
        srv = DecodeServer(_LMView(gen), slots=2, max_new_cap=8)
        emb = np.zeros((4, 32), np.float32)

        async def run(**kw):
            try:
                await srv.submit("", max_new_tokens=2, **kw)
            finally:
                await srv.stop()

        loop = asyncio.new_event_loop()
        with pytest.raises(ValueError, match="prompt_ids"):
            loop.run_until_complete(run(prompt_embeds=emb))
        with pytest.raises(ValueError, match="!= prompt_embeds rows"):
            loop.run_until_complete(
                run(prompt_embeds=emb, prompt_ids=[1, 2, 3])
            )
        with pytest.raises(ValueError, match="ceiling"):
            loop.run_until_complete(run(
                prompt_embeds=np.zeros((100, 32), np.float32),
                prompt_ids=list(range(100)),
            ))


class TestGemma3Overlay:
    def test_prompt_rows_overlay_shape_and_serving(self):
        """Gemma3's bidirectional image-block overlay rides admission:
        rows of the same image block see each other; output matches the
        generator, which applies the same overlay."""
        from multimodal_rag_tpu.models.gemma3_vlm import (
            Gemma3VLMConfig,
            Gemma3VLMGenerator,
            init_gemma3_vlm_params,
        )
        from multimodal_rag_tpu.models.siglip import SigLIPConfig

        cfg = Gemma3VLMConfig(
            text=DecoderConfig(
                vocab_size=513, hidden_dim=32, num_layers=2, num_heads=4,
                num_kv_heads=2, head_dim=8, ff_dim=64, max_position=2048,
                compute_dtype=jnp.float32,
            ),
            vision=SigLIPConfig(
                image_size=32, patch_size=16, vision_width=32,
                vision_layers=2, vision_heads=4, embed_dim=32,
                compute_dtype=jnp.float32, fused_attention=False,
            ),
            image_token_id=512,
            mm_tokens_per_image=4,
        )
        # Byte tokenizer: the Gemma3 chat framing alone is ~60 ids, so
        # the bucket must clear framing + 4 image rows + text.
        gen = Gemma3VLMGenerator(
            params=init_gemma3_vlm_params(jax.random.key(0), cfg),
            cfg=cfg, prompt_buckets=(128,),
        )
        ids, embeds, overlay = gen.prompt_rows("hello", [_pil()])
        T = len(ids)
        assert embeds.shape[0] == T
        assert overlay is not None and overlay.shape == (T, T)
        # The image block is mutually visible, text rows are not.
        img_rows = [i for i, t in enumerate(ids) if t == cfg.image_token_id]
        assert overlay[img_rows[0], img_rows[-1]]
        assert not overlay[0, 1]
        solo = gen.generate(
            "hello", images=[_pil()], max_new_tokens=6, temperature=0.0,
        )
        srv = DecodeServer(_LMView(gen), slots=2, max_new_cap=8)

        async def run():
            out = await srv.submit(
                "", max_new_tokens=6, temperature=0.0,
                prompt_embeds=embeds, prompt_ids=ids, overlay=overlay,
            )
            await srv.stop()
            return out

        out = asyncio.new_event_loop().run_until_complete(run())
        assert out == solo, (out, solo)


class TestAdapterContinuous:
    """TPUMLLMAdapter in continuous mode: the DecodeServer path."""

    def _adapter(self):
        return TPUMLLMAdapter(generator=_gen(), continuous=True)

    def test_finish_and_stream_assemble(self):
        ad = self._adapter()

        async def run():
            text, fin = await ad.generate_multimodal_with_finish(
                "describe", images=[_b64_png()], max_tokens=6,
                temperature=0.0,
            )
            assert fin in ("stop", "length")
            out = ""
            last_fin = None
            async for delta, f in ad.generate_multimodal_stream(
                "describe", images=[_b64_png()], max_tokens=6,
                temperature=0.0,
            ):
                out += delta
                last_fin = f
            await ad.cleanup()
            return text, out, last_fin

        text, out, last_fin = asyncio.new_event_loop().run_until_complete(
            run()
        )
        assert out.strip() == text.strip()
        assert last_fin in ("stop", "length")

    def test_logprobs_records(self):
        ad = self._adapter()

        async def run():
            text, fin, lps = await ad.generate_multimodal_with_logprobs(
                "describe", images=[_b64_png()], max_tokens=5,
                temperature=0.0,
            )
            await ad.cleanup()
            return text, fin, lps

        text, fin, lps = asyncio.new_event_loop().run_until_complete(run())
        assert lps and all(
            {"id", "token", "logprob", "top"} <= set(r) for r in lps
        )

    def test_worker_mode_logprobs_rejected(self):
        ad = TPUMLLMAdapter(generator=_gen(), continuous=False)

        async def run():
            with pytest.raises(RuntimeError, match="continuous"):
                await ad.generate_multimodal_with_logprobs(
                    "x", images=[_b64_png()], max_tokens=2,
                )
            await ad.cleanup()

        asyncio.new_event_loop().run_until_complete(run())
        assert not ad.supports_grammar

    def test_grammar_constrained_vision_json(self):
        """response_format json via the vision path: the grammar masker
        rides the embed row — output must be (a prefix of) valid JSON
        even on random weights."""
        from multimodal_rag_tpu.models.grammar import (
            compile_response_format,
        )

        ad = self._adapter()
        spec = compile_response_format({"type": "json_object"})

        async def run():
            text, fin = await ad.generate_multimodal_with_finish(
                "emit json", images=[_b64_png()], max_tokens=24,
                temperature=0.0, grammar=spec,
            )
            await ad.cleanup()
            return text, fin

        text, fin = asyncio.new_event_loop().run_until_complete(run())
        if fin == "stop":
            json.loads(text)  # complete → must parse
        else:
            assert text.lstrip().startswith("{")


DATA_URL = "data:image/png;base64,"


def _img_payload(**extra):
    return {
        "messages": [{
            "role": "user",
            "content": [
                {"type": "text", "text": "what is in this image?"},
                {"type": "image_url",
                 "image_url": {"url": DATA_URL + _b64_png()}},
            ],
        }],
        "max_tokens": 8,
        **extra,
    }


@pytest.fixture()
def vision_client(tmp_path):
    """App wired with the on-TPU MLLM in continuous mode (the r5
    first-class vision posture) and a fake text LLM."""
    from aiohttp.test_utils import TestClient, TestServer

    from multimodal_rag_tpu.embedder import EmbeddingManager
    from multimodal_rag_tpu.ingest.parser import DocumentParser
    from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
    from multimodal_rag_tpu.models.adapters import FakeLLMAdapter
    from multimodal_rag_tpu.models.minilm import (
        EncoderConfig,
        TextEncoder,
    )
    from multimodal_rag_tpu.models.minilm import (
        init_params as init_enc,
    )
    from multimodal_rag_tpu.parallel.sharding import get_mesh
    from multimodal_rag_tpu.server.api import Components, create_app
    from multimodal_rag_tpu.storage.kv import MemoryKV
    from multimodal_rag_tpu.storage.retriever import MultiVectorRetriever
    from multimodal_rag_tpu.vectorstore import VectorStore

    enc_cfg = EncoderConfig(
        vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4,
        ff_dim=128, max_position=64, compute_dtype=jnp.float32,
    )
    encoder = TextEncoder(
        params=init_enc(jax.random.key(0), enc_cfg), cfg=enc_cfg,
        seq_buckets=(16, 32), batch_buckets=(4, 8),
    )
    store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                        initial_capacity=512, dtype=jnp.float32)
    mllm = TPUMLLMAdapter(generator=_gen(), continuous=True)
    comps = Components(
        parser=DocumentParser(figures_dir=tmp_path / "figures",
                              enable_ocr=False),
        llm_adapter=FakeLLMAdapter(),
        mllm_adapter=mllm,
        summarizer=ContentSummarizer(mllm, max_concurrent=5,
                                     max_retries=2),
        embedder=EmbeddingManager(encoder=encoder, store=store),
        retriever=MultiVectorRetriever(kv=MemoryKV(str(tmp_path / "kv"))),
    )
    loop = asyncio.new_event_loop()
    loop.run_until_complete(comps.initialize())
    app = create_app(components=comps)
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop
    loop.run_until_complete(client.close())
    loop.close()


class TestVisionAPI:
    """The three r4 vision 400s are gone when the on-TPU MLLM serves in
    continuous mode (server/api.py capability gates)."""

    def test_streamed_vision_chat(self, vision_client):
        c, loop = vision_client

        async def do():
            resp = await c.post(
                "/v1/chat/completions", json=_img_payload(stream=True),
            )
            assert resp.status == 200
            raw = (await resp.read()).decode()
            return raw

        raw = loop.run_until_complete(do())
        frames = [
            json.loads(line[len("data: "):])
            for line in raw.splitlines()
            if line.startswith("data: ") and line != "data: [DONE]"
        ]
        assert raw.rstrip().endswith("data: [DONE]")
        deltas = [
            f["choices"][0]["delta"].get("content", "")
            for f in frames if f["choices"][0]["delta"]
        ]
        # Per-token streaming: more than one content frame.
        assert sum(1 for d in deltas if d) >= 2, deltas
        assert frames[-1]["choices"][0]["finish_reason"] in (
            "stop", "length",
        )

    def test_vision_logprobs(self, vision_client):
        c, loop = vision_client

        async def do():
            resp = await c.post(
                "/v1/chat/completions",
                json=_img_payload(logprobs=True, top_logprobs=2),
            )
            return resp.status, await resp.json()

        status, body = loop.run_until_complete(do())
        assert status == 200, body
        content = body["choices"][0]["logprobs"]["content"]
        assert content and all(
            "logprob" in r and len(r["top_logprobs"]) == 2
            for r in content
        )

    def test_vision_response_format_json(self, vision_client):
        c, loop = vision_client

        async def do():
            resp = await c.post(
                "/v1/chat/completions",
                json=_img_payload(
                    response_format={"type": "json_object"},
                    max_tokens=24,
                ),
            )
            return resp.status, await resp.json()

        status, body = loop.run_until_complete(do())
        assert status == 200, body
        msg = body["choices"][0]["message"]["content"]
        assert msg.lstrip().startswith("{")

    def test_vision_tools_auto(self, vision_client):
        c, loop = vision_client

        async def do():
            resp = await c.post(
                "/v1/chat/completions",
                json=_img_payload(tools=[{
                    "type": "function",
                    "function": {
                        "name": "lookup",
                        "parameters": {"type": "object", "properties": {}},
                    },
                }]),
            )
            return resp.status, await resp.json()

        status, body = loop.run_until_complete(do())
        assert status == 200, body
        assert body["choices"][0]["finish_reason"] in (
            "stop", "length", "tool_calls",
        )

    def test_http_mllm_still_gated(self, tmp_path):
        """With an HTTP-style MLLM (no continuous server) the logprobs /
        response_format vision gates still 400 — capability-based, not
        blanket-removed."""
        from aiohttp.test_utils import TestClient, TestServer

        from multimodal_rag_tpu.embedder import EmbeddingManager
        from multimodal_rag_tpu.ingest.parser import DocumentParser
        from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
        from multimodal_rag_tpu.models.adapters import FakeLLMAdapter
        from multimodal_rag_tpu.models.minilm import (
            EncoderConfig,
            TextEncoder,
        )
        from multimodal_rag_tpu.models.minilm import (
            init_params as init_enc,
        )
        from multimodal_rag_tpu.parallel.sharding import get_mesh
        from multimodal_rag_tpu.server.api import Components, create_app
        from multimodal_rag_tpu.storage.kv import MemoryKV
        from multimodal_rag_tpu.storage.retriever import (
            MultiVectorRetriever,
        )
        from multimodal_rag_tpu.vectorstore import VectorStore

        enc_cfg = EncoderConfig(
            vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4,
            ff_dim=128, max_position=64, compute_dtype=jnp.float32,
        )
        encoder = TextEncoder(
            params=init_enc(jax.random.key(0), enc_cfg), cfg=enc_cfg,
            seq_buckets=(16, 32), batch_buckets=(4, 8),
        )
        store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                            initial_capacity=512, dtype=jnp.float32)
        mllm = FakeLLMAdapter()
        comps = Components(
            parser=DocumentParser(figures_dir=tmp_path / "figures",
                                  enable_ocr=False),
            llm_adapter=FakeLLMAdapter(),
            mllm_adapter=mllm,
            summarizer=ContentSummarizer(mllm, max_concurrent=5,
                                         max_retries=2),
            embedder=EmbeddingManager(encoder=encoder, store=store),
            retriever=MultiVectorRetriever(
                kv=MemoryKV(str(tmp_path / "kv"))
            ),
        )
        loop = asyncio.new_event_loop()
        loop.run_until_complete(comps.initialize())
        app = create_app(components=comps)
        client = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(client.start_server())
        try:
            async def do(payload):
                resp = await client.post(
                    "/v1/chat/completions", json=payload,
                )
                return resp.status

            assert loop.run_until_complete(
                do(_img_payload(logprobs=True))
            ) == 400
            assert loop.run_until_complete(
                do(_img_payload(response_format={"type": "json_object"}))
            ) == 400
        finally:
            loop.run_until_complete(client.close())
            loop.close()
