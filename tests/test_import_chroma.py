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
        """Chroma assigns hnswlib labels 0-based in insertion order, NOT
        by sqlite rowid (which is 1-based autoincrement and can be offset
        arbitrarily after deletes/compactions)."""
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
            d / "seg01", {0: np.full((8,), 0.5, np.float32)}
        )
        records = load_chroma_records(str(d))
        assert len(records) == 1
        rid, vec, doc, meta = records[0]
        assert rid == "doc_z_text_0"
        assert doc == "compacted summary"
        assert meta == {"doc_id": "doc_z"}
        np.testing.assert_allclose(vec, 0.5)

    def _compacted_db(self, tmp_path, rowid_offset=7):
        """Three compacted records whose rowids do NOT equal their labels
        (offset autoincrement after prior deletes — the real-corpus shape
        that broke the rowid==label join)."""
        d = tmp_path / "chroma"
        d.mkdir()
        make_queue_db(d / "chroma.sqlite3", [])
        db = sqlite3.connect(d / "chroma.sqlite3")
        for i in range(3):
            rowid = rowid_offset + i
            db.execute(
                "INSERT INTO embeddings VALUES (?, 'seg01', ?, NULL, '')",
                (rowid, f"doc_{i}_text_0"),
            )
            db.execute(
                "INSERT INTO embedding_metadata VALUES"
                " (?, 'chroma:document', ?, NULL, NULL, NULL)",
                (rowid, f"summary {i}"),
            )
        db.commit()
        db.close()
        # labels 0..2 in insertion order
        make_hnsw_segment(
            d / "seg01",
            {i: np.full((8,), float(i) + 0.5, np.float32) for i in range(3)},
        )
        return d

    def test_offset_rowids_fallback_order(self, tmp_path):
        """No index_metadata.pickle → labels inferred from insertion
        order, so offset rowids still map to the right vectors."""
        d = self._compacted_db(tmp_path)
        records = {r[0]: r for r in load_chroma_records(str(d))}
        assert set(records) == {f"doc_{i}_text_0" for i in range(3)}
        for i in range(3):
            np.testing.assert_allclose(
                records[f"doc_{i}_text_0"][1], float(i) + 0.5
            )
            assert records[f"doc_{i}_text_0"][2] == f"summary {i}"

    def test_id_to_label_pickle_wins(self, tmp_path):
        """A chroma-style index_metadata.pickle (chromadb class refs,
        read via the stubbing Unpickler) overrides insertion order —
        here labels are deliberately permuted."""
        import pickle
        import sys
        import types

        d = self._compacted_db(tmp_path)

        # Fabricate the pickle exactly as chromadb would: an instance of
        # chromadb...PersistentData with an id_to_label attribute.
        mod_name = "chromadb.segment.impl.vector.local_persistent_hnsw"
        mod = types.ModuleType(mod_name)

        class PersistentData:
            pass

        PersistentData.__module__ = mod_name
        PersistentData.__qualname__ = "PersistentData"
        mod.PersistentData = PersistentData
        parts = mod_name.split(".")
        for i in range(1, len(parts)):
            sys.modules.setdefault(
                ".".join(parts[:i]), types.ModuleType(".".join(parts[:i]))
            )
        sys.modules[mod_name] = mod
        try:
            pd = PersistentData()
            pd.dimensionality = 8
            pd.total_elements_added = 3
            # Permuted: doc_0 → label 2, doc_1 → label 0, doc_2 → label 1
            pd.id_to_label = {
                "doc_0_text_0": 2, "doc_1_text_0": 0, "doc_2_text_0": 1,
            }
            (d / "seg01" / "index_metadata.pickle").write_bytes(
                pickle.dumps(pd)
            )
        finally:
            for i in range(1, len(parts) + 1):
                sys.modules.pop(".".join(parts[:i]), None)

        records = {r[0]: r for r in load_chroma_records(str(d))}
        np.testing.assert_allclose(records["doc_0_text_0"][1], 2.5)
        np.testing.assert_allclose(records["doc_1_text_0"][1], 0.5)
        np.testing.assert_allclose(records["doc_2_text_0"][1], 1.5)

    def test_segment_parsed_once(self, tmp_path, monkeypatch):
        """The segment binary is read once per segment, not once per row."""
        from multimodal_rag_tpu.tools import import_chroma as ic

        d = self._compacted_db(tmp_path)
        calls = []
        real = ic.read_hnsw_vectors

        def counting(seg_dir):
            calls.append(seg_dir)
            return real(seg_dir)

        monkeypatch.setattr(ic, "read_hnsw_vectors", counting)
        ic.load_chroma_records(str(d))
        assert len(calls) == 1


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
