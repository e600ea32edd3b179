"""HBM-resident vector store with a ChromaDB-collection-shaped API.

Replaces the reference's embedded ChromaDB collection (created at
``app/utils/embedder.py:165-183``, queried at ``:595-609``, mutated at
``:619-688``) with device-resident shards searched by the fused Pallas MIPS
top-k kernel. The public methods mirror the Chroma collection surface the
reference uses — ``add / query / get / delete / count`` — so the embedding
manager maps 1:1.

TPU-first design decisions:

* **Fixed-shape device arrays.** Vectors live in a ``(capacity, D)`` bf16
  array; capacity grows by doubling in ``row_block``-aligned steps so XLA
  sees a handful of shapes, each compiled once. A ``(1, capacity)`` float32
  additive mask (0 = live, -1e30 = dead/empty) makes deletes *O(1)
  tombstone flips* instead of array reshapes — queries need no recompile
  after any mutation (SURVEY.md §7 hard part 4).
* **Host mirror.** ids / documents / metadatas stay host-side (they are
  Python objects); embeddings keep a host float32 mirror so capacity
  growth, persistence, and compaction never read back from device.
  Metadata lookups are numpy-vectorized: a ``doc_id → rows`` index
  (maintained in ``add``/``_tombstone``) serves the delete path, and
  per-key object columns serve arbitrary equality filters — no Python
  O(N) scan sits on any request path.
* **Single- or multi-chip.** With a mesh of >1 devices the vector array is
  row-sharded over HBM and queries run through the collectives-based
  merge (``parallel.distributed_search``); single-chip uses the kernel
  directly. Capacity is always aligned to ``devices × tile_n``.
* **Compaction.** Tombstones accumulate until ``compact()`` (auto-invoked
  when dead fraction exceeds ``compact_threshold``) rewrites the arrays
  densely.
* **IVF deletes/adds stay honest.** Tombstones flip entries in the
  clustered layout's additive mask (both engines honor it in-kernel), and
  rows added after a build are searched by an exact scan over a
  device-resident *tail* buffer merged with the IVF candidates — the fast
  path survives mutation instead of silently falling back to a full exact
  scan. Fallbacks that do happen are counted and logged.

Persistence: ``save()`` writes bf16 vector shard files + per-shard
ids/docs/metas JSON segments + a packed live bitmap + a JSON manifest, all
atomically (tmp+rename) and incrementally (only shards dirtied since the
last save — both vec and meta writes are O(dirty), not O(corpus), so the
debounced autosave never stalls queries behind a full-corpus rewrite).
The manifest is written last and is the commit point: ``load()`` takes
size/shard-count only from it, so a crash mid-save recovers the previous
committed state. ``load()`` streams shards directly into the pre-allocated
mirror (no peak-memory doubling) — covering the reference's Chroma
persist-dir restart semantics (SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import logging
import os
import threading
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rag_tpu.ops.mips_topk import (
    NEG_INF,
    default_use_pallas,
    mips_topk,
    mips_topk_xla,
)
from multimodal_rag_tpu.parallel.sharding import (
    col_sharding,
    get_mesh,
    row_sharding,
)

logger = logging.getLogger(__name__)

_MISSING = object()

# Rows per persisted vector shard file (1M rows × 384 dim × bf16 ≈ 768 MB).
SHARD_ROWS = 1 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class VectorStore:
    """A named collection of (id, embedding, document, metadata) records."""

    def __init__(
        self,
        dim: int = 384,
        name: str = "multimodal_rag",
        mesh=None,
        tile_n: int = 1024,
        dtype=None,
        initial_capacity: int = 1 << 14,
        compact_threshold: float = 0.5,
        use_pallas: Optional[bool] = None,
        ivf_threshold: Optional[int] = None,
        ivf_nprobe: Optional[int] = None,
    ) -> None:
        self.dim = dim
        self.name = name
        self.mesh = mesh if mesh is not None else get_mesh()
        self.n_devices = self.mesh.size
        self.tile_n = tile_n
        # Device dtype for the search stream. "int8" selects the quantized
        # exact path: per-row int8 + f32 scales on device (half the bf16
        # HBM traffic), candidates exactly rescored against the f32 host
        # mirror. IVF layouts / the tail buffer / persistence then use bf16.
        if dtype is None:
            from multimodal_rag_tpu.config import settings as _cfg

            dtype = _cfg.VECTOR_DTYPE
        named = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                 "int8": jnp.int8}
        if isinstance(dtype, str):
            dtype = named[dtype]
        self.quantized = dtype == jnp.int8
        self.dtype = jnp.bfloat16 if self.quantized else dtype
        self.compact_threshold = compact_threshold
        self.use_pallas = (
            use_pallas if use_pallas is not None else default_use_pallas()
        )
        self._align = self.n_devices * tile_n
        self._initial_capacity = initial_capacity
        self._lock = threading.RLock()

        # IVF planner knobs (single source: config; SURVEY.md §7 layer 4).
        from multimodal_rag_tpu.config import settings as _settings

        self.ivf_threshold = (
            ivf_threshold
            if ivf_threshold is not None
            else _settings.IVF_THRESHOLD
        )
        self.ivf_nprobe = (
            ivf_nprobe if ivf_nprobe is not None else _settings.IVF_NPROBE
        )

        self.counters = {
            "ivf_builds": 0,
            "ivf_searches": 0,
            "ivf_fallbacks": 0,
            "compactions": 0,
            "saves": 0,  # incl. autosaves; shards_written tracks the
            "shards_written": 0,  # incremental cost actually paid
        }
        self._reset_state()

    def _reset_state(self) -> None:
        """(Re)initialize all mutable state. Never rebinds ``_lock`` —
        callers must already hold it when resetting a live store."""
        self._capacity = _round_up(self._initial_capacity, self._align)
        self._size = 0  # rows ever written (dense prefix, incl. tombstones)
        self._dead = 0

        # Host mirrors.
        self._vecs = np.zeros((self._capacity, self.dim), np.float32)
        self._mask = np.full((1, self._capacity), NEG_INF, np.float32)
        self._ids: List[str] = []
        self._docs: List[Optional[str]] = []
        self._metas: List[Optional[dict]] = []
        self._id_to_row: Dict[str, int] = {}
        # Metadata indexes: doc_id → set of live rows (the delete path),
        # plus lazily-built per-key object columns for arbitrary filters.
        self._doc_rows: Dict[Any, set] = {}
        self._meta_cols: Dict[str, Tuple[np.ndarray, int]] = {}

        # Persistence dirty tracking: shard indexes whose rows changed
        # since the last save(); _save_all forces a full rewrite (fresh
        # store, compaction, reset). Tombstones touch only the mask
        # bitmap, which is tiny and rewritten every save.
        self._dirty_shards: set = set()
        self._save_all = True
        self._last_save_dir: Optional[str] = None

        # Device arrays (lazily refreshed).
        self._dev_vecs = None
        self._dev_mask = None
        self._dev_q8 = None  # quantized mode: int8 rows
        self._dev_scales = None  # quantized mode: (1, capacity) f32
        self._dirty = True

        # IVF planner state.
        self._layout_gen = getattr(self, "_layout_gen", 0) + 1
        self._ivf_building = False
        self._ivf_build_thread = None
        self._ivf_build_failures = 0
        self._ivf_layout = None
        self._ivf_rows = None  # layout row → store row (single-device)
        self._ivf_store_to_layout = None  # store row → layout/virtual row
        self._ivf_pending_dead: List[int] = []
        self._ivf_built_count = 0
        self._ivf_built_size = 0  # store _size watermark at build time
        # Exact-scan tail buffer for rows added after the IVF build.
        self._tail_dev = None
        self._tail_cap = 0
        self._tail_len = 0

        # Fused embed→search chains, keyed (embed_fn, k, tile); jax.jit
        # handles shape polymorphism (capacity growth) per entry.
        self._fused_fns: Dict[tuple, Any] = {}

    # ------------------------------------------------------------------
    # Device sync
    # ------------------------------------------------------------------

    def _sync(self) -> None:
        if not self._dirty:
            return
        mask = jnp.asarray(self._mask)
        if self.n_devices > 1:
            mask = jax.device_put(mask, col_sharding(self.mesh))
        if self.quantized:
            from multimodal_rag_tpu.ops.mips_topk_q8 import quantize_rows

            q8_host, scales_host = quantize_rows(self._vecs)
            q8 = jnp.asarray(q8_host)
            scales = jnp.asarray(scales_host)
            if self.n_devices > 1:
                q8 = jax.device_put(q8, row_sharding(self.mesh))
                scales = jax.device_put(scales, col_sharding(self.mesh))
            self._dev_q8, self._dev_scales = q8, scales
            self._dev_vecs = None  # HBM holds int8 only, not a bf16 copy
        else:
            vecs = jnp.asarray(self._vecs, self.dtype)
            if self.n_devices > 1:
                vecs = jax.device_put(vecs, row_sharding(self.mesh))
            self._dev_vecs = vecs
        self._dev_mask = mask
        self._dirty = False

    def _grow(self, need_rows: int) -> None:
        new_cap = self._capacity
        while new_cap - self._size < need_rows:
            new_cap *= 2
        if new_cap != self._capacity:
            vecs = np.zeros((new_cap, self.dim), np.float32)
            vecs[: self._capacity] = self._vecs
            mask = np.full((1, new_cap), NEG_INF, np.float32)
            mask[:, : self._capacity] = self._mask
            self._vecs, self._mask, self._capacity = vecs, mask, new_cap
            self._dirty = True

    # ------------------------------------------------------------------
    # Mutations (Chroma collection parity: embedder.py:467-479, 619-688)
    # ------------------------------------------------------------------

    def add(
        self,
        ids: Sequence[str],
        embeddings: Sequence[Sequence[float]],
        documents: Optional[Sequence[str]] = None,
        metadatas: Optional[Sequence[dict]] = None,
    ) -> None:
        if len(ids) == 0:
            return
        emb = np.asarray(embeddings, np.float32)
        assert emb.shape == (len(ids), self.dim), emb.shape
        documents = documents if documents is not None else [None] * len(ids)
        metadatas = metadatas if metadatas is not None else [None] * len(ids)
        with self._lock:
            # Upsert semantics: re-adding an existing id tombstones the old row.
            for id_ in ids:
                row = self._id_to_row.get(id_)
                if row is not None:
                    self._tombstone(row)
            self._grow(len(ids))
            start = self._size
            self._vecs[start : start + len(ids)] = emb
            self._mask[0, start : start + len(ids)] = 0.0
            for offset, (id_, doc, meta) in enumerate(
                zip(ids, documents, metadatas)
            ):
                row = start + offset
                self._ids.append(id_)
                self._docs.append(doc)
                self._metas.append(meta)
                self._id_to_row[id_] = row
                if meta is not None and "doc_id" in meta:
                    self._doc_rows.setdefault(meta["doc_id"], set()).add(row)
            self._size += len(ids)
            self._dirty = True
            end = start + len(ids)
            self._dirty_shards.update(
                range(start // SHARD_ROWS, (end - 1) // SHARD_ROWS + 1)
            )

    def _tombstone(self, row: int) -> None:
        if self._mask[0, row] == 0.0:
            self._mask[0, row] = NEG_INF
            self._dead += 1
            meta = self._metas[row]
            if meta is not None and "doc_id" in meta:
                rows = self._doc_rows.get(meta["doc_id"])
                if rows is not None:
                    rows.discard(row)
                    if not rows:
                        self._doc_rows.pop(meta["doc_id"], None)
            self._ivf_mark_deleted(row)
        self._id_to_row.pop(self._ids[row], None)
        self._dirty = True

    def delete(
        self, ids: Optional[Sequence[str]] = None, where: Optional[dict] = None
    ) -> int:
        """Delete by explicit ids and/or metadata filter. Returns count."""
        with self._lock:
            rows = set()
            if ids:
                for id_ in ids:
                    row = self._id_to_row.get(id_)
                    if row is not None:
                        rows.add(row)
            if where:
                rows.update(int(r) for r in self._rows_matching(where))
            for row in rows:
                self._tombstone(row)
            if rows:
                self._maybe_compact()
            return len(rows)

    def delete_all(self) -> None:
        """Drop-and-recreate semantics (reference embedder.py:658-688).
        Resets state in place under the existing lock — the lock object is
        never rebound, so concurrent readers serialize correctly."""
        with self._lock:
            self._reset_state()

    def _maybe_compact(self) -> None:
        if self._size and self._dead / self._size > self.compact_threshold:
            self.compact()

    def compact(self) -> None:
        """Rewrite arrays densely, dropping tombstoned rows."""
        with self._lock:
            live = self._live_rows()
            vecs = np.zeros_like(self._vecs)
            vecs[: len(live)] = self._vecs[live]
            mask = np.full_like(self._mask, NEG_INF)
            mask[0, : len(live)] = 0.0
            self._ids = [self._ids[r] for r in live]
            self._docs = [self._docs[r] for r in live]
            self._metas = [self._metas[r] for r in live]
            self._id_to_row = {id_: i for i, id_ in enumerate(self._ids)}
            self._rebuild_meta_indexes()
            self._vecs, self._mask = vecs, mask
            self._size, self._dead = len(live), 0
            self._dirty = True
            self._save_all = True  # rows were remapped on disk too
            self._layout_gen += 1  # invalidate any in-flight IVF build
            self._drop_ivf()  # store rows were remapped
            # The corpus changed shape: a deterministic build failure
            # (e.g. device OOM at the old size) may no longer apply, so
            # give background builds a fresh 3-strike budget — this is
            # the "compaction clears the breaker" recovery contract
            # documented at _start_ivf_build.
            self._ivf_build_failures = 0
            self.counters["compactions"] += 1

    def _rebuild_meta_indexes(self) -> None:
        self._doc_rows = {}
        for row, meta in enumerate(self._metas):
            if meta is not None and "doc_id" in meta:
                self._doc_rows.setdefault(meta["doc_id"], set()).add(row)
        self._meta_cols = {}

    def _drop_ivf(self) -> None:
        self._ivf_layout = None
        self._ivf_rows = None
        self._ivf_store_to_layout = None
        self._ivf_pending_dead = []
        self._ivf_built_count = 0
        self._ivf_built_size = 0
        self._tail_dev = None
        self._tail_cap = 0
        self._tail_len = 0

    # ------------------------------------------------------------------
    # Reads
    # ------------------------------------------------------------------

    def _live_rows(self) -> np.ndarray:
        """Vectorized live-row index — never a Python loop over the corpus."""
        return np.flatnonzero(self._mask[0, : self._size] == 0.0)

    def _meta_col(self, key: str) -> np.ndarray:
        """Per-key metadata column (object dtype), built lazily and extended
        incrementally so repeated filtered queries are numpy-vectorized."""
        col, filled = self._meta_cols.get(key, (None, 0))
        if col is None or col.shape[0] < self._capacity:
            new = np.empty((self._capacity,), object)
            if col is not None:
                new[:filled] = col[:filled]
            col = new
        if filled < self._size:
            metas = self._metas
            for r in range(filled, self._size):
                m = metas[r]
                col[r] = m.get(key) if m is not None else None
            filled = self._size
        self._meta_cols[key] = (col, filled)
        return col

    def _rows_matching(self, where: dict) -> np.ndarray:
        """Live rows whose metadata equals every (key, value) in ``where``.
        ``doc_id`` filters resolve through the eager doc index; other keys
        through vectorized object-column comparison."""
        live = self._mask[0, : self._size] == 0.0
        rest = dict(where)
        doc_id = rest.pop("doc_id", _MISSING)
        if doc_id is not _MISSING:
            bucket = self._doc_rows.get(doc_id)
            if not bucket:
                return np.empty((0,), np.int64)
            rows = np.fromiter(bucket, np.int64, len(bucket))
            rows.sort()
            for k, v in rest.items():  # small candidate set by now
                keep = [
                    self._metas[r] is not None and self._metas[r].get(k) == v
                    for r in rows
                ]
                rows = rows[np.asarray(keep, bool)]
                if rows.size == 0:
                    break
            return rows
        sel = live
        for k, v in rest.items():
            col = self._meta_col(key=k)
            sel = sel & (col[: self._size] == v)
        return np.flatnonzero(sel)

    @staticmethod
    def _matches(meta: Optional[dict], where: dict) -> bool:
        if meta is None:
            return False
        return all(meta.get(k) == v for k, v in where.items())

    def count(self) -> int:
        return self._size - self._dead

    def get(
        self,
        ids: Optional[Sequence[str]] = None,
        where: Optional[dict] = None,
        include: Sequence[str] = ("metadatas",),
    ) -> Dict[str, list]:
        """Chroma-style get: filter by ids and/or metadata equality."""
        with self._lock:
            if ids is not None:
                rows = [
                    self._id_to_row[i] for i in ids if i in self._id_to_row
                ]
                if where:
                    rows = [
                        r for r in rows if self._matches(self._metas[r], where)
                    ]
            elif where:
                rows = self._rows_matching(where).tolist()
            else:
                rows = self._live_rows().tolist()
            out: Dict[str, list] = {"ids": [self._ids[r] for r in rows]}
            if "documents" in include:
                out["documents"] = [self._docs[r] for r in rows]
            if "metadatas" in include:
                out["metadatas"] = [self._metas[r] for r in rows]
            if "embeddings" in include:
                out["embeddings"] = [self._vecs[r].tolist() for r in rows]
            return out

    def query(
        self,
        query_embeddings: Sequence[Sequence[float]],
        n_results: int = 5,
        include: Sequence[str] = ("metadatas", "documents", "distances"),
        where: Optional[dict] = None,
    ) -> Dict[str, list]:
        """Top-k search. Returns Chroma-shaped lists-of-lists with cosine
        distances (= 1 - score for unit-norm embeddings), matching the
        relevance math at reference ``api.py:390``."""
        q = np.asarray(query_embeddings, np.float32)
        assert q.ndim == 2 and q.shape[1] == self.dim, q.shape
        with self._lock:
            live = self.count()
            if live == 0:
                empty = [[] for _ in range(q.shape[0])]
                out = {"ids": empty}
                for key in ("documents", "metadatas", "distances"):
                    if key in include:
                        out[key] = [[] for _ in range(q.shape[0])]
                return out
            k = min(n_results, live)
            if where:
                # Metadata pre-filter: restrict search to matching rows.
                sel = self._rows_matching(where)
                mask = np.full_like(self._mask, NEG_INF)
                mask[0, sel] = 0.0
                vals, idx = self._search_masked(q, jnp.asarray(mask), k)
            else:
                vals, idx = self._search_masked(q, None, k)
            vals = np.asarray(vals)
            idx = np.asarray(idx)
        return self._format_rows(vals, idx, include)

    def _format_rows(
        self, vals: np.ndarray, idx: np.ndarray, include: Sequence[str]
    ) -> Dict[str, list]:
        """(B, k) scores + store rows → Chroma-shaped lists-of-lists."""
        out = {"ids": []}
        docs, metas, dists = [], [], []
        for row_vals, row_idx in zip(vals, idx):
            keep = [
                (v, r) for v, r in zip(row_vals, row_idx) if v > NEG_INF / 2
            ]
            out["ids"].append([self._ids[r] for _, r in keep])
            docs.append([self._docs[r] for _, r in keep])
            metas.append([self._metas[r] for _, r in keep])
            dists.append([float(1.0 - v) for v, _ in keep])
        if "documents" in include:
            out["documents"] = docs
        if "metadatas" in include:
            out["metadatas"] = metas
        if "distances" in include:
            out["distances"] = dists
        return out

    def search_fused(
        self,
        embed_fn,
        embed_args: tuple,
        n_results: int = 5,
        include: Sequence[str] = ("metadatas", "documents", "distances"),
    ):
        """Single-dispatch embed-forward → exact MIPS top-k (the serving
        hot path fuses the encoder and the similarity kernel into ONE jit
        call — no host round-trip between them; BASELINE north star).

        ``embed_fn(*embed_args)`` must be jittable and return (B, dim)
        unit-norm embeddings (``TextEncoder.embed_fn`` +
        ``TextEncoder.prepare``). Returns (results, embeddings) with
        Chroma-shaped results, or None when this path doesn't apply
        (multi-device, IVF-scale corpus, XLA fallback, or empty store) —
        callers then use the regular two-dispatch path."""
        with self._lock:
            live = self.count()
            if (
                self.n_devices > 1
                or live == 0
                or live >= self.ivf_threshold
            ):
                return None
            self._sync()
            k_eff = min(n_results, live)
            tile = self._query_tile()
            use_pallas = self.use_pallas
            if self.quantized:
                from multimodal_rag_tpu.ops.mips_topk_q8 import (
                    mips_topk_q8,
                    mips_topk_q8_xla,
                    prefer_pallas_q8,
                    rescore_exact,
                    rescore_margin,
                )

                kc = rescore_margin(k_eff, live)
                # Small corpora take the exact-quantized XLA path: the
                # pooled kernel's (tile, class) collision miss is only
                # negligible at scale (ops/mips_topk_q8.py docstring).
                # Gate on the dense prefix of WRITTEN rows, not the padded
                # device capacity: a 10M-capacity store holding 4k rows has
                # its live rows packed into a handful of tiles — exactly
                # the (tile, class) collision regime the gate must avoid.
                use_pallas = use_pallas and prefer_pallas_q8(
                    self._size, tile
                )
                key = (embed_fn, "q8", kc, tile, use_pallas)
                fn = self._fused_fns.get(key)
                if fn is None:
                    def chain_q8(args, Vq, S, M):
                        emb = embed_fn(*args)
                        q = emb.astype(jnp.float32)
                        if use_pallas:
                            vals, idx = mips_topk_q8(
                                q, Vq, S, M, k=kc, tile_n=tile
                            )
                        else:
                            vals, idx = mips_topk_q8_xla(q, Vq, S, M, kc)
                        return vals, idx, emb

                    fn = jax.jit(chain_q8)
                    self._fused_fns[key] = fn
                vals, idx, emb = fn(
                    tuple(embed_args), self._dev_q8, self._dev_scales,
                    self._dev_mask,
                )
                emb = np.asarray(emb)
                vals, idx = rescore_exact(
                    np.asarray(emb, np.float32), self._vecs,
                    np.asarray(vals), np.asarray(idx), k_eff,
                )
                return self._format_rows(vals, idx, include), emb
            key = (embed_fn, k_eff, tile, use_pallas)
            fn = self._fused_fns.get(key)
            if fn is None:
                def chain(args, V, M):
                    emb = embed_fn(*args)
                    q = emb.astype(jnp.float32)
                    if use_pallas:
                        vals, idx = mips_topk(q, V, M, k=k_eff, tile_n=tile)
                    else:
                        vals, idx = mips_topk_xla(
                            q, V, k_eff, valid=M[0] > NEG_INF / 2
                        )
                    return vals, idx, emb

                fn = jax.jit(chain)
                self._fused_fns[key] = fn
            vals, idx, emb = fn(
                tuple(embed_args), self._dev_vecs, self._dev_mask
            )
            vals, idx = np.asarray(vals), np.asarray(idx)
            emb = np.asarray(emb)
        return self._format_rows(vals, idx, include), emb

    # ------------------------------------------------------------------
    # Query planner: exact below ivf_threshold, IVF above (SURVEY.md §7)
    # ------------------------------------------------------------------

    def _ivf_stale(self) -> bool:
        if self._ivf_layout is None:
            return True
        built = self._ivf_built_count
        # Rebuild when the corpus grew >20% (tail scan covers the interim)
        # or deletes shrank it >10% past the build (mask entries keep the
        # interim exact; the rebuild restores probe efficiency).
        grown = self.count() > built * 1.2
        shrunk = self.count() < built * 0.9
        return grown or shrunk

    # -- IVF build: computed OFF the query path ------------------------
    #
    # The reference's HNSW inserts incrementally and never stalls a query
    # behind an index build (app/utils/embedder.py:502-537). Here the
    # clustered layout IS rebuilt wholesale, so the rebuild runs in a
    # worker thread on a row snapshot while queries keep serving the OLD
    # layout + exact tail (still exact-correct for post-build rows); the
    # new layout swaps in atomically under the store lock. Queries never
    # run _compute_ivf synchronously.

    def wait_for_ivf(self, timeout: Optional[float] = None) -> None:
        """Block until any in-flight background IVF build finishes
        (tests/benches; serving never calls this)."""
        t = self._ivf_build_thread
        if t is not None:
            t.join(timeout)

    def _start_ivf_build(self) -> None:
        """Kick a background build if none is running. Caller holds the
        lock. Snapshot = live-row indexes + a size watermark; the row
        bytes themselves are read OUTSIDE the lock (rows below the
        watermark are append-frozen; compaction bumps ``_layout_gen``
        which discards the build at install time)."""
        if self._ivf_building:
            return
        if self._ivf_build_failures >= 3:
            # A deterministic failure (e.g. device OOM at this corpus
            # size) must not be re-kicked by every query — each doomed
            # attempt burns ~minutes of chip time. Queries keep serving
            # the exact path; compaction/reset clears the breaker.
            return
        self._ivf_building = True
        live = np.asarray(self._live_rows(), dtype=np.int64)
        gen = self._layout_gen
        watermark = self._size
        t = threading.Thread(
            target=self._ivf_build_worker,
            args=(live, watermark, gen),
            daemon=True,
            name=f"ivf-build-{self.name}",
        )
        self._ivf_build_thread = t
        t.start()

    def _ivf_build_worker(
        self, live: np.ndarray, watermark: int, gen: int
    ) -> None:
        try:
            pieces = self._compute_ivf(self._vecs[live], live)
        except Exception:  # noqa: BLE001 — a failed build must not wedge
            with self._lock:
                self._ivf_building = False
                self._ivf_build_failures += 1
                tripped = self._ivf_build_failures >= 3
            logger.exception(
                "background IVF build failed (%d consecutive)%s",
                self._ivf_build_failures,
                "; giving up until compaction/reset — queries stay on "
                "the exact path" if tripped else "",
            )
            return
        with self._lock:
            try:
                if self._layout_gen != gen:
                    # Rows were remapped (compaction/reset) mid-build:
                    # the snapshot's row indexes are meaningless now.
                    logger.info(
                        "discarding IVF build: store rows remapped "
                        "during the build"
                    )
                    return
                self._install_ivf(pieces, len(live), watermark)
                self._ivf_build_failures = 0
            finally:
                self._ivf_building = False

    def _build_ivf(self) -> None:
        """Synchronous build + install (offline/bulk paths and tests;
        the query path uses ``_start_ivf_build``)."""
        live = np.asarray(self._live_rows(), dtype=np.int64)
        pieces = self._compute_ivf(self._vecs[live], live)
        self._install_ivf(pieces, len(live), self._size)

    def _compute_ivf(self, vecs: np.ndarray, live: np.ndarray) -> dict:
        """Cluster + reorder ``vecs`` (the live snapshot) into a fresh
        layout. Pure compute — touches no mutable store state, so it is
        safe off-lock."""
        if self.n_devices > 1:
            from multimodal_rag_tpu.parallel.sharded_ivf import (
                build_sharded_ivf,
            )

            from multimodal_rag_tpu.config import settings as _s

            index = build_sharded_ivf(
                vecs, self.mesh, block_rows=min(self.tile_n, 256),
                dtype=self.dtype, n_clusters=_s.IVF_NLIST,
            )
            # index.row_map indexes into `live`; compose to store rows.
            store_rows = np.full_like(index.row_map, -1)
            ok = index.row_map >= 0
            store_rows[ok] = live[index.row_map[ok]]
            return {
                "layout": index._replace(row_map=store_rows),
                "ivf_rows": None,
                "flat_rows": store_rows.reshape(-1),
            }
        else:
            from multimodal_rag_tpu.ops.ivf import (
                build_clustered_layout,
                build_clustered_layout_device,
            )

            from multimodal_rag_tpu.config import settings as _s

            if self.use_pallas:
                # TPU: build on device — k-means, assignment, sort, and the
                # reorder gather all run on-chip; the host path would move
                # the whole corpus through the host↔device link in
                # assignment batches (measured: dominates build at 10M).
                layout = build_clustered_layout_device(
                    jnp.asarray(vecs, self.dtype),
                    block_rows=min(self.tile_n, 256),
                    n_clusters=_s.IVF_NLIST,
                )
            else:
                layout = build_clustered_layout(
                    vecs, block_rows=min(self.tile_n, 256), dtype=self.dtype,
                    n_clusters=_s.IVF_NLIST,
                )
            store_rows = np.full_like(layout.row_to_original, -1)
            ok = layout.row_to_original >= 0
            store_rows[ok] = live[layout.row_to_original[ok]]
            return {
                "layout": layout,
                "ivf_rows": store_rows,
                "flat_rows": store_rows,
            }

    def _install_ivf(
        self, pieces: dict, live_count: int, watermark: int
    ) -> None:
        """Atomically swap a freshly computed layout in. Caller holds the
        lock. ``watermark`` = ``_size`` at snapshot time: rows at or past
        it stay covered by the exact tail scan."""
        self._ivf_layout = pieces["layout"]
        self._ivf_rows = pieces["ivf_rows"]
        flat_rows = pieces["flat_rows"]
        # Inverse map: store row → layout (or flat virtual) row, used to
        # flip mask entries when rows are tombstoned after the build.
        inv = np.full((self._capacity,), -1, np.int64)
        ok = flat_rows >= 0
        inv[flat_rows[ok]] = np.flatnonzero(ok)
        self._ivf_store_to_layout = inv
        # Tombstones that landed while the build ran in the background
        # must flip the NEW layout's mask — re-derive them from the
        # current mask over the snapshot range (empty for sync builds).
        dead = np.flatnonzero(self._mask[0, :watermark] != 0.0)
        lrows = inv[dead]
        self._ivf_pending_dead = [int(r) for r in lrows[lrows >= 0]]
        self._ivf_built_count = live_count
        self._ivf_built_size = watermark
        self._tail_dev = None
        self._tail_cap = 0
        self._tail_len = 0
        self.counters["ivf_builds"] += 1

    def _ivf_mark_deleted(self, store_row: int) -> None:
        """Queue a post-build tombstone for the layout mask (flushed in one
        scatter at the next IVF search)."""
        inv = self._ivf_store_to_layout
        if inv is None or store_row >= inv.shape[0]:
            return
        lrow = inv[store_row]
        if lrow >= 0:
            self._ivf_pending_dead.append(int(lrow))

    def _ivf_flush_deletes(self) -> None:
        if not self._ivf_pending_dead or self._ivf_layout is None:
            return
        rows = np.asarray(sorted(set(self._ivf_pending_dead)), np.int64)
        self._ivf_pending_dead = []
        if self.n_devices > 1:
            from multimodal_rag_tpu.parallel.sharded_ivf import mark_deleted

            self._ivf_layout = mark_deleted(self._ivf_layout, rows)
        else:
            new_mask = self._ivf_layout.mask.at[0, rows].set(NEG_INF)
            self._ivf_layout = self._ivf_layout._replace(mask=new_mask)

    def _tail_search(self, q: np.ndarray, k: int):
        """Exact scan over rows appended after the IVF build (the *tail*),
        kept in a bucketed device buffer so post-build adds stay visible
        without an immediate rebuild. Returns ((B, kt), (B, kt) store rows)
        or None when the tail is empty."""
        lo, hi = self._ivf_built_size, self._size
        n_tail = hi - lo
        if n_tail <= 0:
            return None
        cap = max(1024, 1 << (n_tail - 1).bit_length())
        if (
            self._tail_dev is None
            or self._tail_cap != cap
            or self._tail_len != n_tail
        ):
            buf = np.zeros((cap, self.dim), np.float32)
            buf[:n_tail] = self._vecs[lo:hi]
            self._tail_dev = jnp.asarray(buf, self.dtype)
            self._tail_cap, self._tail_len = cap, n_tail
        valid = np.zeros((cap,), bool)
        valid[:n_tail] = self._mask[0, lo:hi] == 0.0
        kt = min(k, n_tail)
        vals, idx = mips_topk_xla(
            jnp.asarray(q), self._tail_dev, kt, valid=jnp.asarray(valid)
        )
        vals = np.asarray(vals)
        rows = np.asarray(idx).astype(np.int64) + lo
        rows[vals <= NEG_INF / 2] = -1
        return vals, rows

    def _ivf_search(self, q: np.ndarray, k: int):
        """IVF path: probe the clustered layout (tombstones masked
        in-kernel), exact-scan the post-build tail, merge. Falls back to
        exact (counted + logged) only when the probed blocks cannot supply
        k live candidates."""
        from multimodal_rag_tpu.ops.ivf import ivf_search, ivf_search_xla

        if self._ivf_stale():
            # NEVER build on the query path: kick a background build and
            # keep serving — the old layout + exact tail stays correct
            # for grown corpora; with no layout yet the caller's exact
            # scan serves until the first build lands.
            self._start_ivf_build()
            if self._ivf_layout is None:
                return None
        self._ivf_flush_deletes()
        layout = self._ivf_layout
        from multimodal_rag_tpu.config import settings as _settings

        if self.n_devices > 1:
            from multimodal_rag_tpu.parallel.sharded_ivf import (
                sharded_ivf_search,
            )

            fetch_k = k + 8
            vals, store_rows = sharded_ivf_search(
                jnp.asarray(q), layout, k=fetch_k, nprobe=self.ivf_nprobe,
                use_pallas=self.use_pallas,
            )
        else:
            fetch_k = min(
                k + 8,
                layout.block_centroids.shape[0] * layout.block_rows,
            )
            if self.use_pallas and _settings.IVF_ENGINE == "pallas":
                vals, rows = ivf_search(
                    jnp.asarray(q), layout, k=fetch_k,
                    nprobe=self.ivf_nprobe,
                )
            else:
                vals, rows = ivf_search_xla(
                    jnp.asarray(q), layout, k=fetch_k,
                    nprobe=self.ivf_nprobe,
                )
            vals = np.asarray(vals)
            rows = np.asarray(rows)
            store_rows = np.full(vals.shape, -1, np.int64)
            ok = rows >= 0
            store_rows[ok] = self._ivf_rows[rows[ok]]

        # Merge in the exact-scan tail (rows added after the build).
        tail = self._tail_search(q, k)
        if tail is not None:
            vals = np.concatenate([vals, tail[0]], axis=1)
            store_rows = np.concatenate([store_rows, tail[1]], axis=1)

        # Vectorized finalize: drop padding/sentinels, keep top-k per query
        # with the kernel tie-break contract (score desc, row asc).
        valid = (vals > NEG_INF / 2) & (store_rows >= 0)
        vals = np.where(valid, vals, NEG_INF)
        B = q.shape[0]
        out_vals = np.full((B, k), NEG_INF, np.float32)
        out_idx = np.full((B, k), -1, np.int64)
        for r in range(B):  # B ≤ top_k cap (20); inner ops vectorized
            order = np.lexsort((store_rows[r], -vals[r]))[:k]
            out_vals[r] = vals[r, order]
            out_idx[r] = store_rows[r, order]
        survivors = (out_vals > NEG_INF / 2).sum(axis=1)
        want = min(k, self.count())
        if (survivors < want).any():
            self.counters["ivf_fallbacks"] += 1
            logger.warning(
                "IVF path returned %d/%d candidates (nprobe=%d); "
                "falling back to exact scan",
                int(survivors.min()), want, self.ivf_nprobe,
            )
            return None  # caller runs the exact path
        self.counters["ivf_searches"] += 1
        return out_vals, out_idx

    def _query_tile(self) -> int:
        """Streaming tile for the exact-MIPS kernel. Larger tiles amortize
        the per-tile top-k selection against the HBM stream — measured 3x
        at 1M vectors (tile 1024: 3.0 ms, tile 8192: 0.99 ms ≈ HBM
        speed-of-light on v5e). Doubles while it still divides the
        per-device row count, capped at 8192."""
        per_device = self._capacity // self.n_devices
        tile = min(self.tile_n, per_device)
        while tile * 2 <= 8192 and per_device % (tile * 2) == 0:
            tile *= 2
        return tile

    def _search_masked(self, q: np.ndarray, mask, k: int):
        """mask None → the store's live/tombstone mask; else an ad-hoc
        (1, capacity) additive mask (metadata pre-filter)."""
        if mask is None and self.count() >= self.ivf_threshold:
            result = self._ivf_search(q, k)
            if result is not None:
                return result
        self._sync()
        qd = jnp.asarray(q)
        if self.quantized:
            return self._search_masked_q8(q, qd, mask, k)
        if self.n_devices > 1:
            from multimodal_rag_tpu.parallel.distributed_search import (
                sharded_mips_topk,
            )

            if mask is None:
                mask = self._dev_mask
            else:
                mask = jax.device_put(mask, col_sharding(self.mesh))
            return sharded_mips_topk(
                qd, self._dev_vecs, mask, mesh=self.mesh, k=k,
                tile_n=self._query_tile(), use_pallas=self.use_pallas,
            )
        if mask is None:
            mask = self._dev_mask
        if self.use_pallas:
            return mips_topk(
                qd, self._dev_vecs, mask, k=k, tile_n=self._query_tile()
            )
        valid = mask[0] > NEG_INF / 2
        return mips_topk_xla(qd, self._dev_vecs, k, valid=valid)

    def _search_masked_q8(self, q: np.ndarray, qd, mask, k: int):
        """Quantized exact path: int8 candidate pass (kc = rescore_margin)
        on device, exact f32 rescore of the candidates against the host
        mirror. Caller holds the lock; ``_sync`` already ran."""
        from multimodal_rag_tpu.ops.mips_topk_q8 import (
            mips_topk_q8,
            mips_topk_q8_xla,
            prefer_pallas_q8,
            rescore_exact,
            rescore_margin,
        )

        kc = rescore_margin(k, self.count())
        # Written-row prefix per shard, not capacity (see search_fused):
        # the floor-divide understates tiles on unevenly filled shards,
        # which errs toward the exact XLA path — never toward recall loss.
        use_pallas = self.use_pallas and prefer_pallas_q8(
            self._size // max(1, self.n_devices),
            self._query_tile(),
        )
        if self.n_devices > 1:
            from multimodal_rag_tpu.parallel.distributed_search import (
                sharded_mips_topk_q8,
            )

            if mask is None:
                mask = self._dev_mask
            else:
                mask = jax.device_put(mask, col_sharding(self.mesh))
            vals, idx = sharded_mips_topk_q8(
                qd, self._dev_q8, self._dev_scales, mask, mesh=self.mesh,
                k=kc, tile_n=self._query_tile(), use_pallas=use_pallas,
            )
        else:
            if mask is None:
                mask = self._dev_mask
            if use_pallas:
                vals, idx = mips_topk_q8(
                    qd, self._dev_q8, self._dev_scales, mask, k=kc,
                    tile_n=self._query_tile(),
                )
            else:
                vals, idx = mips_topk_q8_xla(
                    qd, self._dev_q8, self._dev_scales, mask, kc
                )
        return rescore_exact(
            q, self._vecs, np.asarray(vals), np.asarray(idx), k
        )

    # ------------------------------------------------------------------
    # Persistence (reference Chroma persist-dir semantics, SURVEY.md §5.4)
    #
    # Format 2: JSON manifest + bf16 vector shard files (SHARD_ROWS rows
    # each; halves the 10M footprint vs f32) + packed live bitmap + the
    # ids/docs/metas JSON. Shards stream directly into the pre-allocated
    # mirror on load — peak host memory = mirror + ONE shard, not 2×corpus.
    # ------------------------------------------------------------------

    @staticmethod
    def _write_atomic(path: str, writer) -> None:
        """tmp + os.replace so a crash mid-save never truncates the
        previous good file (the reference's Chroma/sqlite gave this for
        free; flat files must earn it)."""
        tmp = path + ".tmp"
        writer(tmp)
        os.replace(tmp, path)

    def save(self, directory: str) -> None:
        import ml_dtypes

        with self._lock:
            os.makedirs(directory, exist_ok=True)
            # Dirty state is relative to ONE directory — saving somewhere
            # new must write everything, or the new dir gets a manifest
            # claiming shards that were only ever written to the old dir.
            if getattr(self, "_last_save_dir", None) != directory:
                self._save_all = True
            size = self._size
            # Disk dtype mirrors the device dtype: bf16 shards halve the
            # 10M-row footprint (~7.5 GB vs 15) and lose nothing the search
            # kernel would have seen; f32 stores stay lossless.
            vec_dtype = (
                "float32" if self.dtype == jnp.float32 else "bfloat16"
            )
            np_dtype = (
                np.float32 if vec_dtype == "float32" else ml_dtypes.bfloat16
            )
            n_shards = max(1, _round_up(size, SHARD_ROWS) // SHARD_ROWS)
            # Incremental: only shards whose rows changed since the last
            # save are rewritten (append-heavy workloads touch one). The
            # ids/docs/metas segment alongside each vec shard keeps the
            # meta write O(dirty) too — at 10M rows a monolithic meta
            # JSON would cost seconds under the store lock per autosave.
            dirty = (
                set(range(n_shards)) if self._save_all
                else {s for s in self._dirty_shards if s < n_shards}
            )

            def dump_json(obj):
                def write(tmp):
                    with open(tmp, "w") as f:
                        json.dump(obj, f)
                return write

            for i in sorted(dirty):
                lo = i * SHARD_ROWS
                hi = min(size, lo + SHARD_ROWS)
                shard = self._vecs[lo:hi].astype(np_dtype)
                self._write_atomic(
                    os.path.join(directory, f"{self.name}.vec.{i:04d}.bin"),
                    shard.tofile,
                )
                self._write_atomic(
                    os.path.join(
                        directory, f"{self.name}.meta.{i:04d}.json"
                    ),
                    dump_json({
                        "ids": self._ids[lo:hi],
                        "docs": self._docs[lo:hi],
                        "metas": self._metas[lo:hi],
                    }),
                )
            live_bits = np.packbits(self._mask[0, :size] == 0.0)
            self._write_atomic(
                os.path.join(directory, f"{self.name}.mask.bin"),
                live_bits.tofile,
            )
            manifest = {
                "format": 3,
                "name": self.name,
                "dim": self.dim,
                "size": size,
                "shard_rows": SHARD_ROWS,
                "n_shards": n_shards,
                "vec_dtype": vec_dtype,
            }
            # Manifest last: it is the commit point — load() takes size
            # and shard count ONLY from here, so a crash anywhere above
            # recovers the previous committed state.
            self._write_atomic(
                os.path.join(directory, f"{self.name}.manifest.json"),
                dump_json(manifest),
            )
            self.counters["saves"] += 1
            self.counters["shards_written"] += len(dirty)
            self._dirty_shards.clear()
            self._save_all = False
            self._last_save_dir = directory
            # Cleanup strictly AFTER the manifest commit: a crash anywhere
            # before the os.replace above must leave every file the
            # previous committed manifest references intact. Stale shards
            # past the current count (post-reset / post-compaction shrink)
            # and superseded format-1/2 blobs are only ever unreferenced
            # once the new manifest is durable.
            for pattern in (f"{self.name}.vec.*.bin",
                            f"{self.name}.meta.*.json"):
                for stale in Path(directory).glob(pattern):
                    try:
                        idx = int(stale.name.rsplit(".", 2)[-2])
                    except ValueError:
                        continue
                    if idx >= n_shards:
                        stale.unlink()
            for legacy_name in (f"{self.name}.npz", f"{self.name}.json"):
                legacy = os.path.join(directory, legacy_name)
                if os.path.exists(legacy):
                    os.remove(legacy)

    @classmethod
    def load(cls, directory: str, name: str = "multimodal_rag", **kwargs):
        manifest_path = os.path.join(directory, f"{name}.manifest.json")
        if os.path.exists(manifest_path):
            import ml_dtypes

            with open(manifest_path) as f:
                manifest = json.load(f)
            # The manifest is the COMMIT POINT: size/dim/shard count come
            # only from here, so a crash mid-save (newer shard/meta files,
            # older manifest) recovers the previous committed state.
            store = cls(dim=manifest["dim"], name=name, **kwargs)
            size = manifest["size"]
            store._grow(size)
            shard_rows = manifest["shard_rows"]
            np_dtype = (
                np.float32
                if manifest.get("vec_dtype") == "float32"
                else ml_dtypes.bfloat16
            )
            ids: List[str] = []
            docs: List[Optional[str]] = []
            metas: List[Optional[dict]] = []
            # Rows whose bytes are missing on disk (a shrinking save's
            # in-place shard rewrite raced a crash before its manifest
            # committed). They are force-tombstoned below — never surfaced
            # — and the store schedules a full clean rewrite.
            lost_rows: List[int] = []
            for i in range(manifest["n_shards"]):
                lo = i * shard_rows
                hi = min(size, lo + shard_rows)
                vec_path = os.path.join(
                    directory, f"{name}.vec.{i:04d}.bin"
                )
                try:
                    shard = np.fromfile(vec_path, dtype=np_dtype).reshape(
                        -1, manifest["dim"]
                    )
                except FileNotFoundError:
                    shard = np.zeros((0, manifest["dim"]), np_dtype)
                got = min(hi - lo, shard.shape[0])
                store._vecs[lo : lo + got] = shard[:got]
                if got < hi - lo:
                    lost_rows.extend(range(lo + got, hi))
                if manifest.get("format", 2) >= 3:
                    try:
                        with open(
                            os.path.join(
                                directory, f"{name}.meta.{i:04d}.json"
                            )
                        ) as f:
                            seg = json.load(f)
                    except FileNotFoundError:
                        seg = {"ids": [], "docs": [], "metas": []}
                    # A dirty shard rewritten before the crash may carry
                    # rows past the committed size (trim) or fewer rows
                    # than committed (pad with tombstoned placeholders —
                    # the manifest is the only source of truth for size,
                    # so row alignment across shards must be preserved).
                    n_seg = min(hi - lo, len(seg["ids"]))
                    ids.extend(seg["ids"][:n_seg])
                    docs.extend(seg["docs"][:n_seg])
                    metas.extend(seg["metas"][:n_seg])
                    if n_seg < hi - lo:
                        lost_rows.extend(range(lo + n_seg, hi))
                        ids.extend(
                            f"__lost__{r}" for r in range(lo + n_seg, hi)
                        )
                        docs.extend([None] * (hi - lo - n_seg))
                        metas.extend([None] * (hi - lo - n_seg))
            if manifest.get("format", 2) < 3:  # format 2: monolithic meta
                with open(os.path.join(directory, f"{name}.json")) as f:
                    meta = json.load(f)
                ids = list(meta["ids"])[:size]
                docs = list(meta["docs"])[:size]
                metas = list(meta["metas"])[:size]
            bits = np.fromfile(
                os.path.join(directory, f"{name}.mask.bin"), dtype=np.uint8
            )
            avail = min(size, bits.size * 8)
            live = np.zeros((size,), bool)
            if avail:
                live[:avail] = np.unpackbits(bits, count=avail).astype(bool)
            if avail < size:  # short bitmap: same crash window as shards
                lost_rows.extend(range(avail, size))
            store._mask[0, :size] = np.where(live, 0.0, NEG_INF)
            if lost_rows:
                lost = np.unique(np.asarray(lost_rows, np.int64))
                store._mask[0, lost] = NEG_INF
                logger.warning(
                    "%s: %d rows were unrecoverable (crash during a "
                    "shrinking save); they are tombstoned and the next "
                    "save() rewrites the store in full",
                    name, int(lost.size),
                )
            # Pre-format-3 stores have no per-shard meta segments on disk;
            # an incremental first save would commit a format-3 manifest
            # claiming segments that were never written, then delete the
            # monolithic blobs — destroying clean shards' metadata. Force
            # a full rewrite before any legacy file is touched.
            needs_full_save = (
                manifest.get("format", 2) < 3 or bool(lost_rows)
            )
        else:  # legacy format-1 monolithic npz + json
            with open(os.path.join(directory, f"{name}.json")) as f:
                meta = json.load(f)
            store = cls(dim=meta["dim"], name=name, **kwargs)
            size = meta["size"]
            store._grow(size)
            data = np.load(os.path.join(directory, f"{name}.npz"))
            store._vecs[:size] = data["vecs"]
            store._mask[:, :size] = data["mask"]
            ids = list(meta["ids"])
            docs = list(meta["docs"])
            metas = list(meta["metas"])
            needs_full_save = True  # no format-3 segments exist on disk
        store._ids = ids
        store._docs = docs
        store._metas = metas
        store._size = size
        store._dead = int((store._mask[0, :size] != 0.0).sum())
        store._dirty_shards.clear()
        if needs_full_save:
            # Legacy/degraded on-disk state: the first save must be a full
            # format-3 rewrite, never an incremental one.
            store._save_all = True
            store._last_save_dir = None
        else:
            store._save_all = False  # disk now matches memory...
            store._last_save_dir = directory  # ...for THIS directory
        store._id_to_row = {
            id_: r
            for r, id_ in enumerate(store._ids)
            if store._mask[0, r] == 0.0
        }
        store._rebuild_meta_indexes()
        # Doc index must only hold live rows.
        live_set = set(store._id_to_row.values())
        for doc_id in list(store._doc_rows):
            store._doc_rows[doc_id] &= live_set
            if not store._doc_rows[doc_id]:
                del store._doc_rows[doc_id]
        store._dirty = True
        return store

    def get_stats(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "count": self.count(),
            "capacity": self._capacity,
            "dead": self._dead,
            "devices": self.n_devices,
            "dim": self.dim,
            "dtype": "int8"
            if self.quantized
            else str(
                self.dtype.__name__
                if hasattr(self.dtype, "__name__")
                else self.dtype
            ),
            "counters": dict(self.counters),
            "ivf_builds_in_progress": int(self._ivf_building),
            "ivf_build_failures": self._ivf_build_failures,
            "ivf_built_count": self._ivf_built_count,
            "ivf_tail_rows": max(0, self._size - self._ivf_built_size)
            if self._ivf_layout is not None
            else 0,
        }
