"""Native KV + retriever tests: key-schema parity, gzip format,
persistence, index-assisted delete."""

import asyncio
import gzip as pygzip
import json

import pytest

from multimodal_rag_tpu.storage.kv import MemoryKV, NativeKV, native_available
from multimodal_rag_tpu.storage.retriever import MultiVectorRetriever


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


needs_native = pytest.mark.skipif(
    not native_available(), reason="native kv library unavailable"
)


@needs_native
class TestNativeKV:
    def test_set_get_delete(self, tmp_path):
        kv = NativeKV(str(tmp_path))
        kv.set("k1", b"value one")
        assert kv.get("k1") == b"value one"
        assert kv.get("missing") is None
        assert kv.delete("k1") == 1
        assert kv.get("k1") is None

    def test_binary_values(self, tmp_path):
        kv = NativeKV(str(tmp_path))
        blob = bytes(range(256)) * 100
        kv.set("bin", blob)
        assert kv.get("bin") == blob

    def test_scan_prefix(self, tmp_path):
        kv = NativeKV(str(tmp_path))
        for key in ("doc:a:1", "doc:a:2", "doc:b:1", "doc_meta:a"):
            kv.set(key, b"x")
        assert sorted(kv.scan("doc:a:")) == ["doc:a:1", "doc:a:2"]
        assert kv.scan("doc_meta:") == ["doc_meta:a"]
        assert kv.scan("nope") == []

    def test_persistence_roundtrip(self, tmp_path):
        kv = NativeKV(str(tmp_path))
        kv.set("persist", b"me")
        kv.save()
        kv.close()
        kv2 = NativeKV(str(tmp_path))
        assert kv2.get("persist") == b"me"

    def test_count_clear(self, tmp_path):
        kv = NativeKV(str(tmp_path))
        for i in range(10):
            kv.set(f"k{i}", b"v")
        assert kv.count() == 10
        kv.clear()
        assert kv.count() == 0

    def test_gzip_python_compatible(self, tmp_path):
        """Native gzip output must gunzip with Python's gzip module and
        vice versa (stored-corpus compatibility)."""
        kv = NativeKV(str(tmp_path))
        data = ("hello compression " * 100).encode()
        native_gz = kv.gzip(data, 6)
        assert pygzip.decompress(native_gz) == data
        py_gz = pygzip.compress(data, compresslevel=6)
        assert kv.gunzip(py_gz) == data
        assert len(native_gz) < len(data) // 3


SUMMARIES = [
    {"id": "chunk_0_abcd1234", "summary": "s0", "raw": "raw text zero",
     "type": "text"},
    {"id": "chunk_1_efgh5678", "summary": "s1", "raw": "raw text one",
     "type": "text"},
    {"id": "table_0", "summary": "tsum", "raw": "| a | b |", "type": "table"},
    {"id": "embedded_0", "summary": "isum", "raw": "QUJDRA==",
     "type": "image", "path": "/figs/x.png"},
]


@pytest.fixture()
def retriever(tmp_path):
    kv = MemoryKV(str(tmp_path))
    return MultiVectorRetriever(kv=kv)


class TestRetriever:
    def test_key_codec(self):
        assert (
            MultiVectorRetriever.item_id_to_key("doc_abc123_chunk_0_a1b2c3")
            == "doc:doc_abc123:chunk_0_a1b2c3"
        )
        assert MultiVectorRetriever.item_id_to_key("short") == "doc:short"

    def test_store_schema(self, retriever):
        run(retriever.store_raw_documents("doc_x1", SUMMARIES, "f.pdf"))
        kv = retriever._kv
        blob = kv.get("doc:doc_x1:chunk_0_abcd1234")
        item = json.loads(pygzip.decompress(blob))
        assert item == {"id": "chunk_0_abcd1234", "type": "text",
                        "raw": "raw text zero", "summary": "s0"}
        idx = json.loads(kv.get("doc_index:doc_x1"))
        assert idx == [s["id"] for s in SUMMARIES]
        meta = json.loads(kv.get("doc_meta:doc_x1"))
        assert meta["filename"] == "f.pdf"
        assert meta["chunks"] == {"text": 2, "table": 1, "image": 1}
        assert meta["compressed"] is True

    def test_image_item_keeps_path(self, retriever):
        run(retriever.store_raw_documents("doc_x1", SUMMARIES, "f.pdf"))
        blob = retriever._kv.get("doc:doc_x1:embedded_0")
        item = json.loads(pygzip.decompress(blob))
        assert item["path"] == "/figs/x.png"

    def test_retrieve_grouped_by_type(self, retriever):
        async def flow():
            await retriever.store_raw_documents("doc_x1", SUMMARIES, "f.pdf")
            return await retriever.retrieve_raw_documents(
                ["doc_x1_chunk_0_abcd1234", "doc_x1_table_0",
                 "doc_x1_embedded_0", "doc_x1_chunk_1_efgh5678"]
            )

        out = run(flow())
        assert out["text_chunks"] == ["raw text zero", "raw text one"]
        assert out["table_chunks"] == ["| a | b |"]
        assert out["image_chunks"] == ["QUJDRA=="]

    def test_retrieve_cache(self, retriever):
        async def flow():
            await retriever.store_raw_documents("doc_x1", SUMMARIES, "f.pdf")
            await retriever.retrieve_raw_documents(["doc_x1_table_0"])
            await retriever.retrieve_raw_documents(["doc_x1_table_0"])

        run(flow())
        assert retriever.stats["cache_hits"] == 1

    def test_delete_document_uses_index(self, retriever):
        async def flow():
            await retriever.store_raw_documents("doc_x1", SUMMARIES, "f.pdf")
            await retriever.store_raw_documents("doc_y2", SUMMARIES, "g.pdf")
            await retriever.delete_document("doc_x1")

        run(flow())
        kv = retriever._kv
        assert kv.get("doc:doc_x1:table_0") is None
        assert kv.get("doc_index:doc_x1") is None
        assert kv.get("doc_meta:doc_x1") is None
        assert kv.get("doc:doc_y2:table_0") is not None

    def test_delete_without_index_scans(self, retriever):
        async def flow():
            await retriever.store_raw_documents("doc_x1", SUMMARIES, "f.pdf")
            retriever._kv.delete("doc_index:doc_x1")
            await retriever.delete_document("doc_x1")

        run(flow())
        assert retriever._kv.scan("doc:doc_x1:") == []

    def test_delete_all(self, retriever):
        async def flow():
            await retriever.store_raw_documents("doc_x1", SUMMARIES, "f.pdf")
            await retriever.store_raw_documents("doc_y2", SUMMARIES, "g.pdf")
            return await retriever.delete_all()

        n = run(flow())
        assert n > 0
        assert retriever._kv.count() == 0

    def test_list_all_sorted_desc(self, retriever):
        async def flow():
            await retriever.store_raw_documents("doc_a1", SUMMARIES, "a.pdf")
            await asyncio.sleep(0.01)
            await retriever.store_raw_documents("doc_b2", SUMMARIES, "b.pdf")
            return await retriever.list_all_documents()

        docs = run(flow())
        assert [d["filename"] for d in docs] == ["b.pdf", "a.pdf"]

    def test_stats_and_health(self, retriever):
        run(retriever.store_raw_documents("doc_x1", SUMMARIES, "f.pdf"))
        stats = run(retriever.get_stats())
        assert stats["operations"]["total_stored"] == 4
        assert 0 < stats["compression"]["ratio"] <= 1.2
        health = run(retriever.health_check())
        assert health["healthy"] is True
        assert health["latency_ms"] is not None

    @needs_native
    def test_native_backend_end_to_end(self, tmp_path):
        kv = NativeKV(str(tmp_path / "nkv"))
        r = MultiVectorRetriever(kv=kv)

        async def flow():
            await r.store_raw_documents("doc_x1", SUMMARIES, "f.pdf")
            return await r.retrieve_raw_documents(["doc_x1_chunk_0_abcd1234"])

        out = run(flow())
        assert out["text_chunks"] == ["raw text zero"]
        # snapshot survives reopen
        kv.save()
        kv.close()
        kv2 = NativeKV(str(tmp_path / "nkv"))
        assert kv2.get("doc_meta:doc_x1") is not None
