"""Chroma persist-dir importer: WAL replay + hnswlib segment parsing."""

import json
import os
import sqlite3
import struct

import numpy as np
import pytest

from multimodal_rag_tpu.tools.import_chroma import (
    import_chroma,
    load_chroma_records,
    read_hnsw_vectors,
)

REFERENCE_CHROMA = "/root/reference/chroma_db"


def make_queue_db(path, records, deletes=()):
    db = sqlite3.connect(path)
    db.execute(
        "CREATE TABLE embeddings_queue (seq_id INTEGER PRIMARY KEY,"
        " created_at TEXT, operation INTEGER, topic TEXT, id TEXT,"
        " vector BLOB, encoding TEXT, metadata TEXT)"
    )
    db.execute(
        "CREATE TABLE embeddings (id INTEGER, segment_id TEXT,"
        " embedding_id TEXT, seq_id BLOB, created_at TEXT)"
    )
    db.execute(
        "CREATE TABLE embedding_metadata (id INTEGER, key TEXT,"
        " string_value TEXT, int_value INTEGER, float_value REAL,"
        " bool_value INTEGER)"
    )
    seq = 0
    for rec_id, vec, doc, meta in records:
        seq += 1
        m = dict(meta or {})
        if doc is not None:
            m["chroma:document"] = doc
        db.execute(
            "INSERT INTO embeddings_queue VALUES (?,?,?,?,?,?,?,?)",
            (seq, "", 0, "t", rec_id,
             np.asarray(vec, np.float32).tobytes(), "f32", json.dumps(m)),
        )
    for rec_id in deletes:
        seq += 1
        db.execute(
            "INSERT INTO embeddings_queue VALUES (?,?,?,?,?,?,?,?)",
            (seq, "", 3, "t", rec_id, None, None, None),
        )
    db.commit()
    db.close()


def make_hnsw_segment(seg_dir, vectors_by_label, dim=8, max_m0=4):
    os.makedirs(seg_dir, exist_ok=True)
    link_bytes = 4 + max_m0 * 4
    spe = link_bytes + dim * 4 + 8
    labels = sorted(vectors_by_label)
    header = struct.pack(
        "<6Q", 0, 100, len(labels), spe, link_bytes + dim * 4, link_bytes
    )
    header += struct.pack("<iI", 0, 0)
    header += struct.pack("<3Q", max_m0 // 2, max_m0, max_m0 // 2)
    header += struct.pack("<d", 1.0)
    header += struct.pack("<Q", 100)
    (seg_dir / "header.bin").write_bytes(header.ljust(100, b"\0"))
    blob = b""
    for label in labels:
        vec = np.asarray(vectors_by_label[label], np.float32)
        blob += b"\0" * link_bytes + vec.tobytes() + struct.pack("<Q", label)
    (seg_dir / "data_level0.bin").write_bytes(blob)


class TestQueueReplay:
    def test_adds_and_deletes(self, tmp_path):
        d = tmp_path / "chroma"
        d.mkdir()
        vec = lambda s: np.full((8,), s, np.float32)  # noqa: E731
        make_queue_db(
            d / "chroma.sqlite3",
            [
                ("doc_a_text_0", vec(0.1), "summary a", {"doc_id": "doc_a"}),
                ("doc_b_text_0", vec(0.2), "summary b", {"doc_id": "doc_b"}),
                ("doc_c_text_0", vec(0.3), None, None),
            ],
            deletes=["doc_b_text_0"],
        )
        records = load_chroma_records(str(d))
        ids = {r[0] for r in records}
        assert ids == {"doc_a_text_0", "doc_c_text_0"}
        by_id = {r[0]: r for r in records}
        assert by_id["doc_a_text_0"][2] == "summary a"
        assert by_id["doc_a_text_0"][3] == {"doc_id": "doc_a"}
        np.testing.assert_allclose(by_id["doc_c_text_0"][1], vec(0.3))

    def test_import_to_store_and_reload(self, tmp_path):
        d = tmp_path / "chroma"
        d.mkdir()
        rng = np.random.default_rng(0)
        make_queue_db(
            d / "chroma.sqlite3",
            [(f"doc_x_text_{i}", rng.normal(size=8).astype(np.float32),
              f"s{i}", {"type": "text"}) for i in range(5)],
        )
        out = tmp_path / "imported"
        result = import_chroma(str(d), str(out))
        assert result["records"] == 5

        from multimodal_rag_tpu.vectorstore import VectorStore

        store = VectorStore.load(str(out), "multimodal_rag")
        assert store.count() == 5
        got = store.get(ids=["doc_x_text_3"], include=("documents",))
        assert got["documents"] == ["s3"]


class TestHnswSegment:
    def test_binary_roundtrip(self, tmp_path):
        seg = tmp_path / "seg"
        vectors = {7: np.arange(8, dtype=np.float32),
                   42: np.ones(8, np.float32)}
        make_hnsw_segment(seg, vectors)
        got = read_hnsw_vectors(str(seg))
        assert set(got) == {7, 42}
        np.testing.assert_allclose(got[7], vectors[7])

    def test_compacted_records_join(self, tmp_path):
        d = tmp_path / "chroma"
        d.mkdir()
        make_queue_db(d / "chroma.sqlite3", [])
        db = sqlite3.connect(d / "chroma.sqlite3")
        db.execute(
            "INSERT INTO embeddings VALUES (1, 'seg01', 'doc_z_text_0',"
            " NULL, '')"
        )
        db.execute(
            "INSERT INTO embedding_metadata VALUES"
            " (1, 'chroma:document', 'compacted summary', NULL, NULL, NULL)"
        )
        db.execute(
            "INSERT INTO embedding_metadata VALUES"
            " (1, 'doc_id', 'doc_z', NULL, NULL, NULL)"
        )
        db.commit()
        db.close()
        make_hnsw_segment(
            d / "seg01", {1: np.full((8,), 0.5, np.float32)}
        )
        records = load_chroma_records(str(d))
        assert len(records) == 1
        rid, vec, doc, meta = records[0]
        assert rid == "doc_z_text_0"
        assert doc == "compacted summary"
        assert meta == {"doc_id": "doc_z"}
        np.testing.assert_allclose(vec, 0.5)


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CHROMA), reason="reference corpus absent"
)
class TestReferenceCorpus:
    def test_shipped_corpus_parses(self, tmp_path):
        """The reference's own chroma_db: 70 adds fully deleted in its WAL
        → zero live records, and the parser must see exactly that."""
        records = load_chroma_records(REFERENCE_CHROMA)
        assert records == []
        result = import_chroma(REFERENCE_CHROMA, str(tmp_path / "o"))
        assert result["records"] == 0
        assert "note" in result

    def test_shipped_hnsw_header_parses(self):
        import glob

        from multimodal_rag_tpu.tools.import_chroma import read_hnsw_header

        segs = [
            p for p in glob.glob(os.path.join(REFERENCE_CHROMA, "*"))
            if os.path.isdir(p)
        ]
        assert segs
        h = read_hnsw_header(os.path.join(segs[0], "header.bin"))
        # chroma fork layout (4-byte version prefix): record = 132B links
        # + 384-d f32 vector + 8B label
        assert h["size_per_element"] == 1676
        assert (h["label_offset"] - h["offset_data"]) // 4 == 384
        # the shipped corpus deleted everything: no live elements
        assert h["cur_count"] == 0
        assert read_hnsw_vectors(segs[0]) == {}
