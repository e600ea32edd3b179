"""Multi-chip IVF tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax

from multimodal_rag_tpu.ops.oracle import mips_topk_oracle
from multimodal_rag_tpu.parallel.sharded_ivf import (
    build_sharded_ivf,
    sharded_ivf_search,
)
from multimodal_rag_tpu.parallel.sharding import get_mesh

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def clustered(n, d=64, n_centers=24, seed=0):
    rng = np.random.default_rng(seed)
    centers = unit(rng.standard_normal((n_centers, d)))
    noise = rng.standard_normal((n, d)) * (0.3 / np.sqrt(d))
    return unit(centers[rng.integers(0, n_centers, n)] + noise).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def index_and_data():
    X = clustered(6000)
    mesh = get_mesh(8)
    index = build_sharded_ivf(
        X, mesh, block_rows=128, dtype=jnp.float32, kmeans_iters=4
    )
    return X, index


class TestShardedIVF:
    def test_build_shapes(self, index_and_data):
        X, index = index_and_data
        assert index.vectors.shape[0] == 8
        assert index.centroids.shape[0] == 8
        live = index.row_map[index.row_map >= 0]
        assert sorted(live.tolist()) == list(range(6000))

    def test_recall(self, index_and_data):
        X, index = index_and_data
        rng = np.random.default_rng(5)
        Q = X[rng.choice(6000, 8)]
        vals, rows = sharded_ivf_search(
            jnp.asarray(Q), index, k=5, nprobe=8
        )
        _, oidx = mips_topk_oracle(Q, X, 5)
        recalls = [
            len(set(rows[i]) & set(oidx[i])) / 5 for i in range(8)
        ]
        assert np.mean(recalls) >= 0.85

    def test_full_probe_exact(self, index_and_data):
        X, index = index_and_data
        Q = X[:4]
        max_blocks = index.centroids.shape[1]
        vals, rows = sharded_ivf_search(
            jnp.asarray(Q), index, k=5, nprobe=max_blocks
        )
        _, oidx = mips_topk_oracle(Q, X, 5)
        np.testing.assert_array_equal(rows, oidx)

    def test_scores_descending_and_rows_valid(self, index_and_data):
        X, index = index_and_data
        Q = X[10:13]
        vals, rows = sharded_ivf_search(jnp.asarray(Q), index, k=7, nprobe=8)
        for r in range(3):
            assert list(vals[r]) == sorted(vals[r], reverse=True)
            assert (rows[r] >= 0).all()
