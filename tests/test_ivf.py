"""IVF tests: kmeans, layout invariants, recall vs brute-force oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.ops.ivf import (
    build_clustered_layout,
    ivf_fine_search,
    ivf_search,
    ivf_search_xla,
    kmeans,
)
from multimodal_rag_tpu.ops.oracle import mips_topk_oracle


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def clustered_data(n=4000, d=64, n_centers=20, seed=0):
    rng = np.random.default_rng(seed)
    centers = unit(rng.standard_normal((n_centers, d)))
    assign = rng.integers(0, n_centers, n)
    # noise scaled so its norm is ~0.3 regardless of dimension
    noise = rng.standard_normal((n, d)) * (0.3 / np.sqrt(d))
    X = unit(centers[assign] + noise)
    return X.astype(np.float32)


class TestKmeans:
    def test_centroids_unit_norm(self):
        X = jnp.asarray(clustered_data(1000))
        C = kmeans(X, k=16, iters=5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(C), axis=1), 1.0, rtol=1e-4
        )

    def test_clusters_capture_structure(self):
        X = clustered_data(2000, n_centers=8, seed=1)
        C = np.asarray(kmeans(jnp.asarray(X), k=8, iters=10))
        # every point should be close to its assigned centroid
        sims = (X @ C.T).max(axis=1)
        assert sims.mean() > 0.9


class TestLayout:
    def test_row_mapping_is_permutation(self):
        X = clustered_data(1000)
        layout = build_clustered_layout(X, block_rows=128, dtype=jnp.float32)
        live = layout.row_to_original[layout.row_to_original >= 0]
        assert sorted(live.tolist()) == list(range(1000))

    def test_padding_masked(self):
        X = clustered_data(1000)
        layout = build_clustered_layout(X, block_rows=128, dtype=jnp.float32)
        mask = np.asarray(layout.mask)[0]
        n_pad = layout.vectors.shape[0]
        assert n_pad % 128 == 0
        assert (mask[: 1000] == 0).all() or (mask == 0).sum() == 1000

    def test_vectors_match_originals(self):
        X = clustered_data(500)
        layout = build_clustered_layout(X, block_rows=128, dtype=jnp.float32)
        V = np.asarray(layout.vectors)
        for row in [0, 100, 499]:
            orig = layout.row_to_original[row]
            np.testing.assert_allclose(V[row], X[orig], atol=1e-6)


class TestSearch:
    @pytest.fixture(scope="class")
    def setup(self):
        X = clustered_data(4000, d=64, n_centers=25, seed=2)
        layout = build_clustered_layout(
            X, block_rows=128, dtype=jnp.float32, n_clusters=25
        )
        rng = np.random.default_rng(3)
        # queries near the data manifold so top-k is meaningful
        Q = unit(
            X[rng.choice(4000, 8)] + 0.1 * rng.standard_normal((8, 64))
        ).astype(np.float32)
        return X, layout, Q

    def _recall(self, X, layout, got_rows, Q, k):
        _, oracle_idx = mips_topk_oracle(Q, X, k)
        got_orig = layout.row_to_original[np.asarray(got_rows)]
        recalls = [
            len(set(got_orig[i]) & set(oracle_idx[i])) / k
            for i in range(Q.shape[0])
        ]
        return float(np.mean(recalls))

    def test_full_probe_is_exact(self, setup):
        X, layout, Q = setup
        n_blocks = layout.block_centroids.shape[0]
        vals, rows = ivf_search_xla(
            jnp.asarray(Q), layout, k=5, nprobe=n_blocks
        )
        assert self._recall(X, layout, rows, Q, 5) == 1.0

    def test_partial_probe_recall(self, setup):
        X, layout, Q = setup
        n_blocks = layout.block_centroids.shape[0]
        vals, rows = ivf_search_xla(
            jnp.asarray(Q), layout, k=5, nprobe=max(4, n_blocks // 4)
        )
        assert self._recall(X, layout, rows, Q, 5) >= 0.9

    def test_pallas_matches_xla(self, setup):
        X, layout, Q = setup
        n_blocks = layout.block_centroids.shape[0]
        nprobe = max(4, n_blocks // 4)
        v1, r1 = ivf_search(
            jnp.asarray(Q), layout, k=5, nprobe=nprobe, interpret=True
        )
        v2, r2 = ivf_search_xla(jnp.asarray(Q), layout, k=5, nprobe=nprobe)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)

    def test_fine_search_respects_block_ids(self, setup):
        X, layout, Q = setup
        ids = jnp.zeros((8, 2), jnp.int32)  # only blocks 0 and 0
        vals, rows = ivf_fine_search(
            jnp.asarray(Q), layout.vectors, jnp.int32(layout.n_live), ids,
            k=3, block_rows=128, interpret=True,
        )
        assert (np.asarray(rows) < 128).all()

    def test_masked_rows_never_returned(self):
        X = clustered_data(300, d=64)
        layout = build_clustered_layout(X, block_rows=128, dtype=jnp.float32)
        Q = X[:2]
        vals, rows = ivf_search(
            jnp.asarray(Q), layout, k=5,
            nprobe=layout.block_centroids.shape[0], interpret=True,
        )
        assert (layout.row_to_original[np.asarray(rows)] >= 0).all()


class TestDeviceBuild:
    def test_device_layout_matches_host_semantics(self):
        import jax.numpy as jnp

        from multimodal_rag_tpu.ops.ivf import (
            build_clustered_layout_device,
            ivf_search_xla,
        )
        from multimodal_rag_tpu.ops.oracle import mips_topk_oracle

        rng = np.random.default_rng(0)
        V = rng.standard_normal((5000, 64)).astype(np.float32)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        lay = build_clustered_layout_device(jnp.asarray(V), block_rows=128)
        assert lay.n_live == 5000
        assert lay.vectors.shape[0] % 128 == 0
        r2o = lay.row_to_original
        # a permutation of the input rows, padding marked -1
        assert sorted(r2o[:5000].tolist()) == list(range(5000))
        assert (r2o[5000:] == -1).all()
        np.testing.assert_allclose(
            np.asarray(lay.vectors)[:5000], V[r2o[:5000]], atol=1e-6
        )
        mask = np.asarray(lay.mask)[0]
        assert (mask[:5000] == 0).all() and (mask[5000:] < -1e29).all()

        Q = rng.standard_normal((4, 64)).astype(np.float32)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        _, idx = ivf_search_xla(jnp.asarray(Q), lay, k=5, nprobe=12)
        store_idx = r2o[np.asarray(idx)]
        _, oidx = mips_topk_oracle(Q, V, 5)
        recall = np.mean(
            [len(set(store_idx[b]) & set(oidx[b])) / 5 for b in range(4)]
        )
        # random (unclusterable) data is the worst case; just require that
        # probing finds a substantial fraction of the true neighbors
        assert recall >= 0.5

    def test_block_centroids_are_block_means(self):
        import jax.numpy as jnp

        from multimodal_rag_tpu.ops.ivf import build_clustered_layout_device

        rng = np.random.default_rng(1)
        V = rng.standard_normal((700, 32)).astype(np.float32)
        lay = build_clustered_layout_device(jnp.asarray(V), block_rows=256)
        blocks = np.asarray(lay.vectors).reshape(-1, 256, 32)
        counts = [(np.asarray(lay.row_to_original).reshape(-1, 256)[i] >= 0).sum()
                  for i in range(blocks.shape[0])]
        for i, c in enumerate(counts):
            want = blocks[i].sum(axis=0) / max(c, 1)
            np.testing.assert_allclose(
                np.asarray(lay.block_centroids)[i], want, atol=1e-4
            )
