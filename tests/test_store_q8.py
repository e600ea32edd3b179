"""VectorStore int8 mode (VECTOR_DTYPE=int8 / dtype="int8").

The quantized store must be *observably identical* to the bf16 store:
same Chroma-shaped results, same oracle-exact top-k (candidates rescored
in full precision), same mutation semantics — only the device stream
changes (int8 rows + f32 scales, no bf16 copy in HBM).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_rag_tpu.ops.oracle import mips_topk_oracle
from multimodal_rag_tpu.parallel.sharding import get_mesh
from multimodal_rag_tpu.vectorstore import VectorStore

DIM = 64


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def make_store(n=50, seed=0, **kwargs):
    kwargs.setdefault("mesh", get_mesh(1))
    kwargs.setdefault("tile_n", 256)
    kwargs.setdefault("initial_capacity", 512)
    kwargs.setdefault("dtype", "int8")
    store = VectorStore(dim=DIM, **kwargs)
    rng = np.random.default_rng(seed)
    emb = unit(rng.standard_normal((n, DIM)).astype(np.float32))
    ids = [f"doc_{i // 10}_item_{i}" for i in range(n)]
    docs = [f"summary {i}" for i in range(n)]
    metas = [{"doc_id": f"doc_{i // 10}", "item_id": f"item_{i}",
              "type": "text"} for i in range(n)]
    store.add(ids, emb, docs, metas)
    return store, emb, ids


class TestQuantizedStore:
    def test_dtype_resolution(self):
        store, _, _ = make_store(10)
        assert store.quantized and store.dtype == jnp.bfloat16
        assert store.get_stats()["dtype"] == "int8"

    def test_query_matches_oracle(self):
        store, emb, ids = make_store(200, seed=1)
        q = unit(np.random.default_rng(2).standard_normal((4, DIM))
                 .astype(np.float32))
        res = store.query(q, n_results=5)
        _, oidx = mips_topk_oracle(q, emb, 5)
        for row in range(4):
            assert res["ids"][row] == [ids[i] for i in oidx[row]]
        for d in res["distances"]:
            assert d == sorted(d)

    def test_no_bf16_copy_on_device(self):
        store, _, _ = make_store(10)
        store.query(np.eye(DIM, dtype=np.float32)[:1], n_results=3)
        assert store._dev_vecs is None
        assert store._dev_q8.dtype == jnp.int8
        assert store._dev_scales.shape == (1, store._capacity)

    def test_deletes_and_upserts(self):
        store, emb, ids = make_store(60, seed=3)
        store.delete(ids=ids[:10])
        q = unit(np.random.default_rng(4).standard_normal((2, DIM))
                 .astype(np.float32))
        valid = np.ones((60,), bool)
        valid[:10] = False
        res = store.query(q, n_results=5)
        _, oidx = mips_topk_oracle(q, emb, 5, valid=valid)
        for row in range(2):
            assert res["ids"][row] == [ids[i] for i in oidx[row]]

    def test_where_filter(self):
        store, emb, ids = make_store(40, seed=5)
        q = unit(np.random.default_rng(6).standard_normal((1, DIM))
                 .astype(np.float32))
        res = store.query(q, n_results=3, where={"doc_id": "doc_2"})
        valid = np.zeros((40,), bool)
        valid[20:30] = True
        _, oidx = mips_topk_oracle(q, emb, 3, valid=valid)
        assert res["ids"][0] == [ids[i] for i in oidx[0]]

    def test_multi_device_matches_single(self):
        rng = np.random.default_rng(7)
        emb = unit(rng.standard_normal((300, DIM)).astype(np.float32))
        ids = [f"d_{i}" for i in range(300)]
        s1 = VectorStore(dim=DIM, mesh=get_mesh(1), tile_n=256,
                         initial_capacity=512, dtype="int8")
        s8 = VectorStore(dim=DIM, mesh=get_mesh(8), tile_n=64,
                         initial_capacity=512, dtype="int8")
        s1.add(ids, emb)
        s8.add(ids, emb)
        q = unit(rng.standard_normal((3, DIM)).astype(np.float32))
        r1 = s1.query(q, n_results=5)
        r8 = s8.query(q, n_results=5)
        assert r1["ids"] == r8["ids"]
        _, oidx = mips_topk_oracle(q, emb, 5)
        for row in range(3):
            assert r1["ids"][row] == [ids[i] for i in oidx[row]]

    def test_save_load_preserves_quantized_mode(self, tmp_path):
        store, emb, ids = make_store(30, seed=8)
        store.save(str(tmp_path))
        loaded = VectorStore.load(
            str(tmp_path), mesh=get_mesh(1), tile_n=256,
            initial_capacity=512, dtype="int8",
        )
        assert loaded.quantized
        q = unit(np.random.default_rng(9).standard_normal((1, DIM))
                 .astype(np.float32))
        # Disk shards are bf16 (quantization is derived state), so compare
        # against an oracle over the bf16-rounded mirror.
        _, oidx = mips_topk_oracle(q, loaded._vecs[:30], 5)
        res = loaded.query(q, n_results=5)
        assert res["ids"][0] == [ids[i] for i in oidx[0]]

    def test_pallas_gate_uses_written_rows_not_capacity(self):
        """A pre-allocated store (large capacity, few rows) must route by
        the dense prefix of WRITTEN rows: its live rows pack into a
        handful of tiles, exactly the (tile, class) collision regime the
        pooled kernel's gate exists to avoid. Capacity would pass the
        tile-count gate here; _size must not — and the query stays
        oracle-exact through the XLA path."""
        from multimodal_rag_tpu.ops.mips_topk_q8 import (
            Q8_PALLAS_MIN_TILES,
            prefer_pallas_q8,
        )

        # _query_tile auto-doubles to 8192 here, so the smallest capacity
        # that (wrongly) passes the tile-count gate is 8192 * MIN_TILES.
        store, emb, ids = make_store(
            50, seed=12,
            initial_capacity=8192 * Q8_PALLAS_MIN_TILES,
        )
        tile = store._query_tile()
        # Capacity alone would (wrongly) qualify for the pooled kernel...
        assert prefer_pallas_q8(store._capacity, tile)
        # ...but the written-row prefix must not.
        assert not prefer_pallas_q8(store._size, tile)
        q = unit(np.random.default_rng(13).standard_normal((2, DIM))
                 .astype(np.float32))
        res = store.query(q, n_results=5)
        _, oidx = mips_topk_oracle(q, emb, 5)
        for row in range(2):
            assert res["ids"][row] == [ids[i] for i in oidx[row]]

    def test_fused_query_rescored(self):
        store, emb, ids = make_store(80, seed=10)
        q = unit(np.random.default_rng(11).standard_normal((1, DIM))
                 .astype(np.float32))
        fixed = jnp.asarray(q)

        def embed_fn():
            return fixed

        out = store.search_fused(embed_fn, (), n_results=5)
        assert out is not None
        res, emb_out = out
        _, oidx = mips_topk_oracle(q, emb, 5)
        assert res["ids"][0] == [ids[i] for i in oidx[0]]
        np.testing.assert_allclose(np.asarray(emb_out), q, atol=1e-6)
