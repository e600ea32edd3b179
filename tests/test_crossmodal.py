"""Cross-modal figure index: text↔image retrieval (BASELINE config 2).

Runs the tiny CLIP/SigLIP configs on CPU; encoder-family selection via the
CLIP_MODEL knob; API route contract for /search/images.
"""

import asyncio
import base64
import io

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_rag_tpu.crossmodal import CrossModalIndex, build_dual_encoder
from multimodal_rag_tpu.models.clip import CLIPConfig, CLIPEncoder
from multimodal_rag_tpu.models.siglip import SigLIPConfig, SigLIPEncoder
from multimodal_rag_tpu.parallel.sharding import get_mesh
from multimodal_rag_tpu.vectorstore import VectorStore

TINY_CLIP = CLIPConfig(
    vocab_size=1024, text_width=64, text_layers=2, text_heads=4,
    context_length=16, image_size=64, patch_size=16, vision_width=64,
    vision_layers=2, vision_heads=4, embed_dim=32,
    compute_dtype=jnp.float32,
)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def make_png(seed=0, size=(64, 64)) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "PNG")
    return buf.getvalue()


def tiny_index():
    enc = CLIPEncoder(cfg=TINY_CLIP)
    store = VectorStore(dim=TINY_CLIP.embed_dim, mesh=get_mesh(1),
                        tile_n=256, initial_capacity=512, dtype=jnp.float32)
    return CrossModalIndex(encoder=enc, store=store)


def image_obj(i):
    return {
        "id": f"img_{i}",
        "base64": base64.b64encode(make_png(i)).decode(),
        "metadata": {"page": 1},
    }


class TestEncoderSelection:
    def test_default_is_clip(self):
        assert type(build_dual_encoder("ViT-B/32")).__name__ == "CLIPEncoder"

    def test_siglip_by_name(self):
        assert (
            type(build_dual_encoder("siglip-base-patch16-224")).__name__
            == "SigLIPEncoder"
        )


class TestIndex:
    def test_index_and_text_search(self):
        idx = tiny_index()
        n = run(idx.index_document_images("doc_a", [image_obj(0), image_obj(1)]))
        assert n == 2
        hits = run(idx.search_text("a photo of noise", k=2))
        assert len(hits) == 2
        assert {h["doc_id"] for h in hits} == {"doc_a"}
        for h in hits:
            assert 0.0 <= h["relevance"] <= 1.0

    def test_image_to_image_search_finds_self(self):
        idx = tiny_index()
        run(idx.index_document_images("doc_a", [image_obj(i) for i in range(4)]))
        hits = run(idx.search_image(make_png(2), k=1))
        assert hits[0]["id"] == "doc_a_img_2"
        assert hits[0]["relevance"] > 0.99  # exact same image

    def test_delete_document(self):
        idx = tiny_index()
        run(idx.index_document_images("doc_a", [image_obj(0)]))
        run(idx.index_document_images("doc_b", [image_obj(1)]))
        deleted = run(idx.delete_document("doc_a"))
        assert deleted == 1
        hits = run(idx.search_text("anything", k=5))
        assert all(h["doc_id"] == "doc_b" for h in hits)

    def test_empty_store_search(self):
        idx = tiny_index()
        assert run(idx.search_text("x", k=3)) == []

    def test_bad_base64_skipped(self):
        idx = tiny_index()
        n = run(
            idx.index_document_images(
                "doc_a", [{"id": "bad", "base64": "!!!not-base64!!!"}]
            )
        )
        assert n == 0

    def test_stats(self):
        idx = tiny_index()
        run(idx.index_document_images("doc_a", [image_obj(0)]))
        run(idx.search_text("q", k=1))
        s = idx.get_stats()
        assert s["images_indexed"] == 1
        assert s["text_queries"] == 1
        assert s["figures"] == 1
        assert s["ready"]


class TestSigLIPIndex:
    def test_siglip_backend_index_roundtrip(self):
        cfg = SigLIPConfig(
            vocab_size=512, text_width=48, text_layers=1, text_heads=4,
            context_length=8, image_size=32, patch_size=16, vision_width=64,
            vision_layers=1, vision_heads=4, embed_dim=64,
            compute_dtype=jnp.float32,
        )
        enc = SigLIPEncoder(cfg=cfg)
        store = VectorStore(dim=64, mesh=get_mesh(1), tile_n=256,
                            initial_capacity=512, dtype=jnp.float32)
        idx = CrossModalIndex(encoder=enc, store=store)
        assert run(idx.index_document_images("d", [image_obj(0)])) == 1
        assert len(run(idx.search_text("query", k=1))) == 1


class TestApiRoute:
    def test_disabled_route_503(self, tmp_path):
        from aiohttp.test_utils import TestClient, TestServer

        from tests.test_api import make_components
        from multimodal_rag_tpu.server.api import create_app

        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)  # no crossmodal component
        loop.run_until_complete(comps.initialize())
        app = create_app(components=comps)
        client = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(client.start_server())
        try:
            async def do():
                resp = await client.post(
                    "/search/images", json={"query": "x", "top_k": 3}
                )
                return resp.status

            assert loop.run_until_complete(do()) == 503
        finally:
            loop.run_until_complete(client.close())
            loop.close()

    def test_enabled_route_end_to_end(self, tmp_path):
        from aiohttp.test_utils import TestClient, TestServer

        from tests.test_api import make_components
        from multimodal_rag_tpu.server.api import create_app

        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)
        comps.crossmodal = tiny_index()
        loop.run_until_complete(comps.initialize())
        loop.run_until_complete(
            comps.crossmodal.index_document_images(
                "doc_x", [image_obj(0), image_obj(1)]
            )
        )
        app = create_app(components=comps)
        client = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(client.start_server())
        try:
            async def do():
                resp = await client.post(
                    "/search/images", json={"query": "diagram", "top_k": 2}
                )
                return resp.status, await resp.json()

            status, body = loop.run_until_complete(do())
            assert status == 200
            assert len(body["results"]) == 2
            assert body["results"][0]["doc_id"] == "doc_x"

            async def bad():
                r1 = await client.post("/search/images", json={"query": ""})
                r2 = await client.post(
                    "/search/images", json={"query": "x", "top_k": 99}
                )
                return r1.status, r2.status

            assert loop.run_until_complete(bad()) == (422, 422)
        finally:
            loop.run_until_complete(client.close())
            loop.close()


class TestImageToImageRoute:
    def test_multipart_image_search(self, tmp_path):
        from aiohttp.test_utils import TestClient, TestServer

        from tests.test_api import make_components
        from multimodal_rag_tpu.server.api import create_app

        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)
        comps.crossmodal = tiny_index()
        loop.run_until_complete(comps.initialize())
        loop.run_until_complete(
            comps.crossmodal.index_document_images(
                "doc_i", [image_obj(i) for i in range(3)]
            )
        )
        app = create_app(components=comps)
        client = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(client.start_server())
        try:
            import aiohttp

            async def do():
                form = aiohttp.FormData()
                form.add_field("file", io.BytesIO(make_png(1)),
                               filename="q.png",
                               content_type="image/png")
                form.add_field("top_k", "2")
                resp = await client.post("/search/images", data=form)
                return resp.status, await resp.json()

            status, body = loop.run_until_complete(do())
            assert status == 200
            assert body["results"][0]["id"] == "doc_i_img_1"  # exact match
            assert body["results"][0]["relevance"] > 0.99

            async def missing_file():
                form = aiohttp.FormData()
                form.add_field("top_k", "2")
                resp = await client.post("/search/images", data=form)
                return resp.status

            assert loop.run_until_complete(missing_file()) == 422
        finally:
            loop.run_until_complete(client.close())
            loop.close()


class TestDimMismatchRecovery:
    def test_persisted_store_with_wrong_dim_is_ignored(self, tmp_path):
        """A store persisted under a different CLIP_MODEL (different
        embed dim) must be rejected at load — otherwise every later
        query/add dies on a shape assert until a manual wipe."""
        enc = CLIPEncoder(cfg=TINY_CLIP)
        # Persist a store with a DIFFERENT dim under the crossmodal name.
        from multimodal_rag_tpu.crossmodal import COLLECTION

        other = VectorStore(dim=TINY_CLIP.embed_dim + 32, name=COLLECTION,
                            mesh=get_mesh(1), tile_n=256,
                            initial_capacity=512, dtype=jnp.float32)
        other.add(["x"],
                  np.zeros((1, TINY_CLIP.embed_dim + 32), np.float32))
        other.save(str(tmp_path))

        idx = CrossModalIndex(encoder=enc, persist_dir=str(tmp_path))
        n = run(idx.index_document_images("doc_a", [image_obj(0)]))
        assert n == 1  # fresh store with the encoder's dim; no assert
        hits = run(idx.search_text("noise", k=1))
        assert len(hits) == 1
