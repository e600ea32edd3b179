"""Import a ChromaDB persist directory into the TPU vector store.

"Existing corpora work unchanged" (BASELINE.md §3): deployments of the
reference carry a ``chroma_db/`` directory (sqlite WAL + hnswlib segment
files, reference ``embedder.py:165-183``). This tool reads that state
directly — no chromadb dependency — and replays it into a
``vectorstore.VectorStore`` persist dir our server loads at startup.

Two sources, matching chroma's two-tier persistence:

* **WAL replay** — ``embeddings_queue`` rows (operation 0/1/2 = add/
  update/upsert with a float32 vector blob + metadata JSON carrying
  ``chroma:document``; 3 = delete) replayed in ``seq_id`` order. This is
  the complete state for corpora that chroma has not compacted.
* **Compacted segment** — when the ``embeddings`` table is non-empty, the
  vectors live in the hnswlib files; ``data_level0.bin`` stores
  ``cur_element_count`` records of ``size_data_per_element`` bytes laid
  out as [4B link_count + maxM0·4B links][dim·4B float32 vector]
  [8B label]; ``header.bin`` is the 100-byte hnswlib header. hnswlib
  labels are assigned by the segment's ``index_metadata.pickle``
  ``id_to_label`` map (0-based insertion order) — NOT by the sqlite
  ``embeddings.id`` rowid. The pickle references chromadb classes; a
  stubbing Unpickler reads it without chromadb installed. When the
  pickle is absent, labels fall back to insertion order (ascending
  rowid) within the segment.

Usage:
    python -m multimodal_rag_tpu.tools.import_chroma CHROMA_DIR OUT_DIR
        [--collection multimodal_rag]
"""

from __future__ import annotations

import argparse
import json
import os
import sqlite3
import struct
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

OP_ADD, OP_UPDATE, OP_UPSERT, OP_DELETE = 0, 1, 2, 3


def read_hnsw_header(path: str) -> Dict[str, int]:
    """Parse hnswlib's saved header.

    Two layouts exist: stock hnswlib starts directly with ``offsetLevel0_``
    (six size_t fields), while chroma's persistent fork prepends a 4-byte
    version word. Both are tried; the one whose fields satisfy the
    structural invariants (label fills the last 8 bytes of each record,
    vector data precedes it) wins."""
    with open(path, "rb") as f:
        raw = f.read(100)

    def parse(base: int) -> Dict[str, int]:
        (
            _offset_level0, max_elements, cur_count, size_per_element,
            label_offset, offset_data,
        ) = struct.unpack("<6Q", raw[base : base + 48])
        return {
            "max_elements": max_elements,
            "cur_count": cur_count,
            "size_per_element": size_per_element,
            "label_offset": label_offset,
            "offset_data": offset_data,
        }

    for base in (0, 4):
        try:
            h = parse(base)
        except struct.error:
            continue
        if (
            0 < h["size_per_element"] < (1 << 31)
            and h["label_offset"] + 8 == h["size_per_element"]
            and 0 < h["offset_data"] < h["label_offset"]
            and h["cur_count"] <= h["max_elements"]
        ):
            return h
    raise ValueError(f"unrecognized hnswlib header layout in {path}")


def read_hnsw_vectors(
    segment_dir: str,
) -> Dict[int, np.ndarray]:
    """data_level0.bin → {label: float32 vector}."""
    header = read_hnsw_header(os.path.join(segment_dir, "header.bin"))
    spe = header["size_per_element"]
    data_off = header["offset_data"]
    label_off = header["label_offset"]
    dim = (label_off - data_off) // 4
    out: Dict[int, np.ndarray] = {}
    with open(os.path.join(segment_dir, "data_level0.bin"), "rb") as f:
        blob = f.read()
    n = min(header["cur_count"], len(blob) // spe) if spe else 0
    for i in range(n):
        rec = blob[i * spe : (i + 1) * spe]
        (label,) = struct.unpack("<Q", rec[label_off : label_off + 8])
        vec = np.frombuffer(
            rec[data_off : data_off + dim * 4], np.float32
        ).copy()
        out[label] = vec
    return out


class _ChromaStub:
    """Absorbs any chromadb class during unpickling: instance state lands
    in ``__dict__`` whether pickled via __reduce__, __setstate__, or plain
    attribute dicts."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


def read_segment_labels(segment_dir: str) -> Optional[Dict[str, int]]:
    """``index_metadata.pickle`` → {embedding_id: hnswlib label}, read
    without chromadb installed (its ``PersistentData`` class is stubbed).
    None when the pickle is absent or carries no usable map."""
    import io
    import pickle

    path = os.path.join(segment_dir, "index_metadata.pickle")
    if not os.path.exists(path):
        return None

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] == "chromadb":
                return _ChromaStub
            return super().find_class(module, name)

    try:
        with open(path, "rb") as f:
            data = _Unpickler(io.BufferedReader(f)).load()
    except Exception:  # noqa: BLE001 — fall back to insertion order
        return None
    mapping = None
    if isinstance(data, dict):
        mapping = data.get("id_to_label")
    else:
        mapping = getattr(data, "id_to_label", None)
    if isinstance(mapping, dict) and all(
        isinstance(v, int) for v in mapping.values()
    ):
        return mapping
    return None


def load_chroma_records(
    chroma_dir: str,
) -> List[Tuple[str, np.ndarray, Optional[str], Optional[dict]]]:
    """→ [(id, vector, document, metadata)] of the LIVE records."""
    db_path = os.path.join(chroma_dir, "chroma.sqlite3")
    db = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    cur = db.cursor()

    records: Dict[str, Tuple[np.ndarray, Optional[str], Optional[dict]]] = {}

    # --- WAL replay ---
    for _seq, op, rec_id, vec_blob, meta_json in cur.execute(
        "SELECT seq_id, operation, id, vector, metadata "
        "FROM embeddings_queue ORDER BY seq_id"
    ):
        if op == OP_DELETE:
            records.pop(rec_id, None)
            continue
        if vec_blob is None:
            continue
        vec = np.frombuffer(vec_blob, np.float32).copy()
        doc = None
        meta = None
        if meta_json:
            meta = json.loads(meta_json)
            doc = meta.pop("chroma:document", None)
            meta = {k: v for k, v in meta.items()} or None
        records[rec_id] = (vec, doc, meta)

    # --- compacted segment (vectors in hnswlib files) ---
    try:
        rows = cur.execute(
            "SELECT e.id, e.embedding_id, e.segment_id FROM embeddings e"
        ).fetchall()
    except sqlite3.OperationalError:
        rows = []
    if rows:
        # metadata/document per embedding row
        meta_by_rowid: Dict[int, dict] = {}
        doc_by_rowid: Dict[int, str] = {}
        try:
            for rowid, key, str_v, int_v, float_v, bool_v in cur.execute(
                "SELECT id, key, string_value, int_value, float_value,"
                " bool_value FROM embedding_metadata"
            ):
                if key == "chroma:document":
                    doc_by_rowid[rowid] = str_v
                else:
                    value = next(
                        (v for v in (str_v, int_v, float_v, bool_v)
                         if v is not None),
                        None,
                    )
                    meta_by_rowid.setdefault(rowid, {})[key] = value
        except sqlite3.OperationalError:
            pass
        # One parse per segment (a per-row re-read of data_level0.bin is
        # O(N²) I/O and unusable beyond toy corpora).
        by_segment: Dict[str, List[Tuple[int, str]]] = {}
        for rowid, embedding_id, segment_id in rows:
            by_segment.setdefault(str(segment_id), []).append(
                (rowid, embedding_id)
            )
        for segment_id, seg_rows in by_segment.items():
            seg_dir = os.path.join(chroma_dir, segment_id)
            if not os.path.isdir(seg_dir):
                continue
            vectors = read_hnsw_vectors(seg_dir)
            labels = read_segment_labels(seg_dir)
            if labels is None:
                # No index_metadata.pickle: chroma assigns labels in
                # insertion order starting at 0; rowids are autoincrement,
                # so ascending rowid reproduces that order.
                labels = {
                    eid: i
                    for i, (_rid, eid) in enumerate(sorted(seg_rows))
                }
            for rowid, embedding_id in seg_rows:
                label = labels.get(embedding_id)
                vec = vectors.get(label) if label is not None else None
                if vec is None:
                    continue
                records[embedding_id] = (
                    vec,
                    doc_by_rowid.get(rowid),
                    meta_by_rowid.get(rowid),
                )
    db.close()
    return [(rid, v, d, m) for rid, (v, d, m) in records.items()]


def import_chroma(
    chroma_dir: str, out_dir: str, collection: str = "multimodal_rag"
) -> dict:
    from multimodal_rag_tpu.vectorstore import VectorStore

    records = load_chroma_records(chroma_dir)
    result = {
        "metric": "import_chroma",
        "records": len(records),
        "collection": collection,
        "out_dir": out_dir,
    }
    if not records:
        result["note"] = (
            "no live records (the shipped reference corpus was fully "
            "deleted in its own WAL); nothing to import"
        )
        return result
    dim = len(records[0][1])
    store = VectorStore(dim=dim, name=collection)
    store.add(
        ids=[r[0] for r in records],
        embeddings=np.stack([r[1] for r in records]),
        documents=[r[2] for r in records],
        metadatas=[r[3] for r in records],
    )
    store.save(out_dir)
    result["dim"] = dim
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("chroma_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--collection", default="multimodal_rag")
    args = ap.parse_args(argv)
    result = import_chroma(args.chroma_dir, args.out_dir, args.collection)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
