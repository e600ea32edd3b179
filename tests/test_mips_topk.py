"""MIPS top-k kernel vs NumPy oracle (interpret mode on CPU).

Exactness contract: indices match the brute-force oracle bit-for-bit
(including ties → lower index); values match to float32 matmul tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.ops.mips_topk import (
    mips_topk_padded,
    mips_topk_xla,
)
from multimodal_rag_tpu.ops.oracle import mips_topk_oracle

INTERP = dict(interpret=True)


def rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def check(Q, V, k, valid=None, tile_n=256, atol=1e-3):
    vals, idx = mips_topk_padded(
        jnp.asarray(Q), jnp.asarray(V), k=k,
        valid=None if valid is None else jnp.asarray(valid),
        tile_n=tile_n, **INTERP,
    )
    ovals, oidx = mips_topk_oracle(Q, V, k, valid=valid)
    np.testing.assert_array_equal(np.asarray(idx), oidx.astype(np.int32))
    np.testing.assert_allclose(np.asarray(vals), ovals, atol=atol)


class TestExactness:
    def test_single_tile(self):
        check(rand((4, 128)), rand((256, 128), 1), k=5)

    def test_multi_tile(self):
        check(rand((3, 128)), rand((1024, 128), 2), k=5, tile_n=256)

    def test_unaligned_n(self):
        check(rand((2, 128)), rand((700, 128), 3), k=5, tile_n=256)

    def test_k_larger_than_lanes_slice(self):
        check(rand((2, 128)), rand((512, 128), 4), k=20, tile_n=256)

    def test_single_query(self):
        check(rand((1, 384)), rand((512, 384), 5), k=5, tile_n=256)

    def test_many_queries_tiled_batch(self):
        # b_pad spans multiple batch tiles (tile_b default 32 → 40 queries).
        check(rand((40, 128), 6), rand((512, 128), 7), k=3, tile_n=256)

    def test_k_exceeds_n(self):
        Q, V = rand((2, 128)), rand((64, 128), 8)
        vals, idx = mips_topk_padded(
            jnp.asarray(Q), jnp.asarray(V), k=100, tile_n=256, **INTERP
        )
        assert vals.shape == (2, 64)
        ovals, oidx = mips_topk_oracle(Q, V, 64)
        np.testing.assert_array_equal(np.asarray(idx), oidx.astype(np.int32))


class TestTies:
    def test_duplicate_rows_lower_index_wins(self):
        V = np.tile(rand((16, 64), 9), (8, 1))  # every vector ×8
        Q = rand((3, 64), 10)
        check(Q, V, k=10, tile_n=64)

    def test_all_identical(self):
        V = np.tile(rand((1, 64), 11), (256, 1))
        Q = rand((2, 64), 12)
        vals, idx = mips_topk_padded(
            jnp.asarray(Q), jnp.asarray(V), k=4, tile_n=64, **INTERP
        )
        np.testing.assert_array_equal(
            np.asarray(idx), np.tile(np.arange(4, dtype=np.int32), (2, 1))
        )


class TestTombstones:
    def test_masked_rows_excluded(self):
        Q, V = rand((2, 128)), rand((512, 128), 13)
        _, top = mips_topk_oracle(Q, V, 5)
        valid = np.ones(512, bool)
        valid[np.unique(top)] = False  # delete every current winner
        check(Q, V, k=5, valid=valid, tile_n=256)

    def test_sparse_survivors(self):
        Q, V = rand((1, 128)), rand((512, 128), 14)
        valid = np.zeros(512, bool)
        valid[[7, 100, 300, 501]] = True
        vals, idx = mips_topk_padded(
            jnp.asarray(Q), jnp.asarray(V), k=4,
            valid=jnp.asarray(valid), tile_n=256, **INTERP,
        )
        assert set(np.asarray(idx)[0].tolist()) == {7, 100, 300, 501}


class TestDtypes:
    def test_bf16_database_recall(self):
        Q, V = rand((4, 256), 15), rand((2048, 256), 16)
        vals, idx = mips_topk_padded(
            jnp.asarray(Q), jnp.asarray(V).astype(jnp.bfloat16), k=10,
            tile_n=256, **INTERP,
        )
        _, oidx = mips_topk_oracle(Q, V, 10)
        # bf16 rounding may swap near-equal neighbours; demand >=90% overlap.
        overlap = np.mean([
            len(set(np.asarray(idx)[r]) & set(oidx[r])) / 10 for r in range(4)
        ])
        assert overlap >= 0.9

    def test_values_are_f32(self):
        vals, idx = mips_topk_padded(
            jnp.asarray(rand((1, 128))),
            jnp.asarray(rand((256, 128), 17)).astype(jnp.bfloat16),
            k=3, tile_n=256, **INTERP,
        )
        assert vals.dtype == jnp.float32
        assert idx.dtype == jnp.int32


class TestXlaFallback:
    def test_matches_oracle(self):
        Q, V = rand((3, 128)), rand((500, 128), 18)
        vals, idx = mips_topk_xla(jnp.asarray(Q), jnp.asarray(V), 5)
        ovals, oidx = mips_topk_oracle(Q, V, 5)
        np.testing.assert_array_equal(np.asarray(idx), oidx.astype(np.int32))
        np.testing.assert_allclose(np.asarray(vals), ovals, atol=1e-3)
