"""Multi-device store + IVF planner integration on the 8-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.ops.oracle import mips_topk_oracle
from multimodal_rag_tpu.parallel.sharding import get_mesh
from multimodal_rag_tpu.vectorstore import VectorStore

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def clustered(n, d=64, seed=0):
    rng = np.random.default_rng(seed)
    centers = unit(rng.standard_normal((20, d)))
    noise = rng.standard_normal((n, d)) * (0.3 / np.sqrt(d))
    return unit(centers[rng.integers(0, 20, n)] + noise).astype(np.float32)


def test_multi_device_planner_uses_sharded_ivf():
    X = clustered(4000)
    store = VectorStore(
        dim=64, mesh=get_mesh(8), tile_n=128, initial_capacity=8 * 1024,
        dtype=jnp.float32, ivf_threshold=1000, ivf_nprobe=8,
    )
    store.add([f"i{j}" for j in range(4000)], X)
    q = X[50:54]
    store.query(q[:1], n_results=1)  # kicks the background build
    store.wait_for_ivf()
    res = store.query(q, n_results=5)
    assert store._ivf_layout is not None
    _, oidx = mips_topk_oracle(q, X, 5)
    recalls = [
        len({f"i{j}" for j in oidx[r]} & set(res["ids"][r])) / 5
        for r in range(4)
    ]
    assert np.mean(recalls) >= 0.85


def test_multi_device_ivf_delete_postfilter():
    X = clustered(3000, seed=3)
    store = VectorStore(
        dim=64, mesh=get_mesh(8), tile_n=128, initial_capacity=8 * 512,
        dtype=jnp.float32, ivf_threshold=1000, ivf_nprobe=8,
    )
    store.add([f"i{j}" for j in range(3000)], X)
    store.query(X[:1], n_results=1)
    store.wait_for_ivf()
    top = store.query(X[:1], n_results=1)["ids"][0][0]
    store.delete(ids=[top])
    res = store.query(X[:1], n_results=5)
    assert top not in res["ids"][0]
    assert len(res["ids"][0]) == 5
