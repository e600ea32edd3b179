"""Int8-quantized MIPS path: quantize → candidate pass → exact rescore.

Contract (ops/mips_topk_q8.py): after rescoring the kc-candidate set
against the f32 mirror, the final top-k indices match the brute-force
oracle exactly and the scores are full-precision f32 dots — quantization
affects only which candidates are fetched, and the 2k/k+16 margin keeps
recall at 1.0 for non-adversarial data (verified empirically here).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_rag_tpu.ops.mips_topk import NEG_INF
from multimodal_rag_tpu.ops.mips_topk_q8 import (
    mips_topk_q8,
    mips_topk_q8_xla,
    quantize_rows,
    rescore_exact,
    rescore_margin,
)
from multimodal_rag_tpu.ops.oracle import mips_topk_oracle


def unit_rows(shape, seed=0):
    v = np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def pad_rows(V, mult):
    N = V.shape[0]
    n_pad = ((N + mult - 1) // mult) * mult
    mask = np.full((1, n_pad), NEG_INF, np.float32)
    mask[0, :N] = 0.0
    if n_pad != N:
        V = np.concatenate([V, np.zeros((n_pad - N, V.shape[1]), V.dtype)])
    return V, mask


class TestQuantize:
    def test_round_trip_error_bound(self):
        V = unit_rows((512, 384), 1)
        q8, scales = quantize_rows(V)
        assert q8.dtype == np.int8 and scales.shape == (1, 512)
        recon = q8.astype(np.float32) * scales.T
        # Per-element error ≤ scale/2 = max|row|/254.
        bound = (np.abs(V).max(axis=1) / 254.0)[:, None] + 1e-7
        assert (np.abs(recon - V) <= bound).all()

    def test_zero_rows_quantize_to_zero(self):
        V = np.zeros((4, 16), np.float32)
        q8, scales = quantize_rows(V)
        assert (q8 == 0).all() and (scales > 0).all()


def run_q8(Q, V, k, tile_n=256, use_kernel=True, valid=None):
    Vp, mask = pad_rows(V, tile_n)
    if valid is not None:
        mask[0, : len(valid)] = np.where(valid, 0.0, NEG_INF)
    q8, scales = quantize_rows(Vp)
    kc = rescore_margin(k, V.shape[0])
    if use_kernel:
        vals, idx = mips_topk_q8(
            jnp.asarray(Q), jnp.asarray(q8), jnp.asarray(scales),
            jnp.asarray(mask), k=kc, tile_n=tile_n, interpret=True,
        )
    else:
        vals, idx = mips_topk_q8_xla(
            jnp.asarray(Q), jnp.asarray(q8), jnp.asarray(scales),
            jnp.asarray(mask), kc,
        )
    return rescore_exact(Q, V, np.asarray(vals), np.asarray(idx), k)


@pytest.mark.parametrize("use_kernel", [True, False],
                         ids=["pallas-interpret", "xla"])
class TestEndToEndExactness:
    def test_matches_oracle_unit_norm(self, use_kernel):
        Q, V = unit_rows((4, 64), 2), unit_rows((3000, 64), 3)
        vals, idx = run_q8(Q, V, k=10, use_kernel=use_kernel)
        ovals, oidx = mips_topk_oracle(Q, V, 10)
        np.testing.assert_array_equal(idx, oidx)
        np.testing.assert_allclose(vals, ovals, atol=1e-5)

    def test_matches_oracle_multi_tile_384d(self, use_kernel):
        Q, V = unit_rows((2, 384), 4), unit_rows((2048, 384), 5)
        vals, idx = run_q8(Q, V, k=5, tile_n=512, use_kernel=use_kernel)
        ovals, oidx = mips_topk_oracle(Q, V, 5)
        np.testing.assert_array_equal(idx, oidx)
        np.testing.assert_allclose(vals, ovals, atol=1e-5)

    def test_dead_rows_never_returned(self, use_kernel):
        Q, V = unit_rows((3, 64), 6), unit_rows((500, 64), 7)
        valid = np.ones((500,), bool)
        valid[::3] = False
        vals, idx = run_q8(Q, V, k=8, use_kernel=use_kernel, valid=valid)
        ovals, oidx = mips_topk_oracle(Q, V, 8, valid=valid)
        np.testing.assert_array_equal(idx, oidx)
        assert not np.isin(idx, np.flatnonzero(~valid)).any()

    def test_duplicate_rows_tie_break_lower_index(self, use_kernel):
        # Exact duplicates quantize identically; rescore ties must resolve
        # to the lower row per the kernel/oracle contract.
        V = unit_rows((256, 32), 8)
        V[100] = V[7]
        V[200] = V[7]
        Q = V[7:8]
        vals, idx = run_q8(Q, V, k=3, use_kernel=use_kernel)
        np.testing.assert_array_equal(idx[0], [7, 100, 200])


class TestRescore:
    def test_rescore_pads_short_candidate_sets(self):
        V = unit_rows((10, 16), 9)
        Q = unit_rows((1, 16), 10)
        cand_vals = np.array([[0.5, NEG_INF, NEG_INF]], np.float32)
        cand_idx = np.array([[4, -1, -1]], np.int32)
        vals, idx = rescore_exact(Q, V, cand_vals, cand_idx, k=3)
        assert idx[0, 0] == 4 and (idx[0, 1:] == -1).all()
        assert vals[0, 0] == pytest.approx(float(V[4] @ Q[0]), abs=1e-6)
        assert (vals[0, 1:] <= NEG_INF / 2).all()

    def test_rescore_dedupes_candidates(self):
        V = unit_rows((10, 16), 11)
        Q = unit_rows((1, 16), 12)
        cand_vals = np.array([[0.5, 0.5, 0.4]], np.float32)
        cand_idx = np.array([[4, 4, 2]], np.int32)
        vals, idx = rescore_exact(Q, V, cand_vals, cand_idx, k=3)
        assert sorted(idx[0][idx[0] >= 0].tolist()) == [2, 4]

    def test_margin(self):
        assert rescore_margin(5, 10_000) == 21
        assert rescore_margin(20, 10_000) == 40
        assert rescore_margin(5, 3) == 3
