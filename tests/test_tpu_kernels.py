"""Real-TPU kernel tier: the same oracle contracts as the interpret-mode
tests, but COMPILED on the chip (``interpret=False``) — catching
VMEM-budget, layout, and CompilerParams regressions interpret mode cannot
see (VERDICT r1 #5).

Run on a TPU host with:

    MMRAG_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -v

(under the axon tunnel also export PYTHONPATH=/root/.axon_site:$PYTHONPATH
so the TPU plugin registers). Skipped everywhere else.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

if jax.default_backend() != "tpu":
    pytest.skip(
        "compiled-kernel tier needs a TPU backend", allow_module_level=True
    )

from multimodal_rag_tpu.ops.fused_attention import (  # noqa: E402
    attention_xla,
    fused_attention,
)
from multimodal_rag_tpu.ops.ivf import (  # noqa: E402
    NEG_INF,
    build_clustered_layout,
    build_clustered_layout_device,
    ivf_fine_search,
    ivf_search,
)
from multimodal_rag_tpu.ops.mips_topk import (  # noqa: E402
    mips_topk_padded,
)
from multimodal_rag_tpu.ops.mips_topk_q8 import (  # noqa: E402
    mips_topk_q8,
    quantize_rows,
    rescore_exact,
    rescore_margin,
)
from multimodal_rag_tpu.ops.oracle import mips_topk_oracle  # noqa: E402


def rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32
    )


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestMipsTopkCompiled:
    """Exactness contract compiled on the chip: indices equal the
    brute-force oracle bit-for-bit (ties → lower index)."""

    def check(self, Q, V, k, valid=None, tile_n=256, atol=1e-3):
        # Production shape: the store holds bf16; the kernel casts queries
        # to the database dtype. The oracle mirrors both casts so the only
        # difference left is MXU-vs-numpy f32 accumulation order.
        Vb = jnp.asarray(V, jnp.bfloat16)
        vals, idx = mips_topk_padded(
            jnp.asarray(Q), Vb, k=k,
            valid=None if valid is None else jnp.asarray(valid),
            tile_n=tile_n,
        )
        Qh = np.asarray(jnp.asarray(Q, jnp.bfloat16).astype(jnp.float32))
        Vh = np.asarray(Vb.astype(jnp.float32))
        ovals, oidx = mips_topk_oracle(Qh, Vh, k, valid=valid)
        np.testing.assert_array_equal(np.asarray(idx), oidx.astype(np.int32))
        np.testing.assert_allclose(np.asarray(vals), ovals, atol=atol)

    def test_multi_tile(self):
        self.check(rand((3, 128)), rand((1024, 128), 2), k=5)

    def test_unaligned_n(self):
        self.check(rand((2, 128)), rand((700, 128), 3), k=5)

    def test_dim_384(self):
        self.check(rand((8, 384)), rand((4096, 384), 5), k=5, tile_n=1024)

    def test_valid_mask(self):
        V = rand((512, 128), 9)
        valid = np.ones((512,), bool)
        valid[::3] = False
        self.check(rand((2, 128), 8), V, k=7, valid=valid)

    def test_large_tile(self):
        # The serving tile (8192) — the shape bench.py runs.
        self.check(rand((8, 384), 1), rand((16384, 384), 4), k=5,
                   tile_n=8192)


class TestMipsTopkQ8Compiled:
    """Int8 candidate pass compiled on the chip + exact f32 rescore must
    equal the oracle (the quantized store's end-to-end contract)."""

    def check(self, Q, V, k, tile_n=256):
        from multimodal_rag_tpu.ops.mips_topk import NEG_INF as NINF

        N, D = V.shape
        n_pad = ((N + tile_n - 1) // tile_n) * tile_n
        mask = np.full((1, n_pad), NINF, np.float32)
        mask[0, :N] = 0.0
        Vp = np.concatenate([V, np.zeros((n_pad - N, D), V.dtype)])
        q8, scales = quantize_rows(Vp)
        kc = rescore_margin(k, N)
        vals, idx = mips_topk_q8(
            jnp.asarray(Q), jnp.asarray(q8), jnp.asarray(scales),
            jnp.asarray(mask), k=kc, tile_n=tile_n,
        )
        rvals, ridx = rescore_exact(Q, V, np.asarray(vals), np.asarray(idx), k)
        ovals, oidx = mips_topk_oracle(Q, V, k)
        np.testing.assert_array_equal(ridx, oidx)
        np.testing.assert_allclose(rvals, ovals, atol=1e-4)

    def test_multi_tile_384(self):
        self.check(unit(rand((8, 384), 21)), unit(rand((8192, 384), 22)), k=5,
                   tile_n=1024)

    def test_large_tile_serving_shape(self):
        self.check(unit(rand((8, 384), 23)), unit(rand((16384, 384), 24)),
                   k=5, tile_n=8192)

    def test_k20_xla_exact(self):
        """At 4 tiles the pooled kernel's (tile, class) collision miss is
        a few percent per query (ops/mips_topk_q8.py docstring) — the
        store routes corpora this small to the exact-quantized XLA path
        (prefer_pallas_q8), which must match the oracle strictly."""
        from multimodal_rag_tpu.ops.mips_topk_q8 import (
            mips_topk_q8_xla,
            prefer_pallas_q8,
        )

        assert not prefer_pallas_q8(4096, 1024)
        Q, V, k = unit(rand((4, 384), 25)), unit(rand((4096, 384), 26)), 20
        q8, scales = quantize_rows(V)
        mask = np.zeros((1, 4096), np.float32)
        kc = rescore_margin(k, 4096)
        vals, idx = mips_topk_q8_xla(
            jnp.asarray(Q), jnp.asarray(q8), jnp.asarray(scales),
            jnp.asarray(mask), kc,
        )
        rvals, ridx = rescore_exact(Q, V, np.asarray(vals), np.asarray(idx), k)
        ovals, oidx = mips_topk_oracle(Q, V, k)
        np.testing.assert_array_equal(ridx, oidx)
        np.testing.assert_allclose(rvals, ovals, atol=1e-4)

    def test_k20_pallas_recall_contract(self):
        """The pooled kernel at few tiles: assert the DOCUMENTED contract
        — high recall, and any swapped-in candidate's exact score within
        the quantization-noise band of the true kth score — rather than
        strict equality the kernel does not promise at this size."""
        Q, V, k = unit(rand((4, 384), 25)), unit(rand((4096, 384), 26)), 20
        N = 4096
        q8, scales = quantize_rows(V)
        mask = np.zeros((1, N), np.float32)
        kc = rescore_margin(k, N)
        vals, idx = mips_topk_q8(
            jnp.asarray(Q), jnp.asarray(q8), jnp.asarray(scales),
            jnp.asarray(mask), k=kc, tile_n=1024,
        )
        rvals, ridx = rescore_exact(Q, V, np.asarray(vals), np.asarray(idx), k)
        ovals, oidx = mips_topk_oracle(Q, V, k)
        hits = sum(
            len(set(ridx[r]) & set(oidx[r])) for r in range(Q.shape[0])
        )
        recall = hits / (Q.shape[0] * k)
        assert recall >= 0.9, recall
        # Swapped-in rows must be near-ties: exact score within the noise
        # band of the true kth.
        assert (rvals >= ovals[:, -1:] - 5e-3).all(), (rvals, ovals)


class TestIvfCompiled:
    def _layout(self, n=4096, d=128, on_device=False, block_rows=256):
        X = unit(rand((n, d), 7))
        if on_device:
            return X, build_clustered_layout_device(
                jnp.asarray(X, jnp.bfloat16), block_rows=block_rows
            )
        return X, build_clustered_layout(X, block_rows=block_rows)

    def test_full_probe_equals_oracle(self):
        """nprobe == all blocks → IVF must equal the exact oracle."""
        X, layout = self._layout()
        Q = unit(rand((4, 128), 11))
        vals, rows = ivf_search(
            jnp.asarray(Q), layout, k=5,
            nprobe=layout.block_centroids.shape[0],
        )
        rows = np.asarray(rows)
        store_rows = layout.row_to_original[rows]
        Xb = np.asarray(
            jnp.asarray(X, layout.vectors.dtype).astype(jnp.float32)
        )
        _, oidx = mips_topk_oracle(Q, Xb, 5)
        # Same candidate set (tie order may differ across layouts).
        for r in range(4):
            assert set(store_rows[r]) == set(oidx[r])

    def test_device_build_full_probe(self):
        X, layout = self._layout(on_device=True)
        Q = unit(rand((2, 128), 13))
        vals, rows = ivf_search(
            jnp.asarray(Q), layout, k=3,
            nprobe=layout.block_centroids.shape[0],
        )
        store_rows = layout.row_to_original[np.asarray(rows)]
        Xb = np.asarray(layout.vectors.astype(jnp.float32))
        # oracle over the reordered (layout) vectors, mapped back
        _, oidx = mips_topk_oracle(Q, Xb[: layout.n_live], 3)
        want = layout.row_to_original[oidx]
        for r in range(2):
            assert set(store_rows[r]) == set(want[r])

    def test_partial_probe_recall(self):
        X, layout = self._layout(n=8192)
        Q = unit(rand((8, 128), 17))
        vals, rows = ivf_search(jnp.asarray(Q), layout, k=5, nprobe=8)
        store_rows = layout.row_to_original[np.asarray(rows)]
        _, oidx = mips_topk_oracle(Q, X, 5)
        recall = np.mean(
            [len(set(store_rows[r]) & set(oidx[r])) / 5 for r in range(8)]
        )
        assert recall >= 0.8, recall

    def test_tombstone_mask_honored_in_kernel(self):
        """Flip mask entries (the store's delete path) and prove the
        compiled fine-scan kernel never returns those rows."""
        X, layout = self._layout()
        Q = unit(rand((4, 128), 19))
        top = ivf_search(
            jnp.asarray(Q), layout, k=3,
            nprobe=layout.block_centroids.shape[0],
        )[1]
        dead_layout_rows = np.unique(np.asarray(top).reshape(-1))
        masked = layout._replace(
            mask=layout.mask.at[0, dead_layout_rows].set(NEG_INF)
        )
        vals2, rows2 = ivf_search(
            jnp.asarray(Q), masked, k=3,
            nprobe=layout.block_centroids.shape[0],
        )
        rows2 = np.asarray(rows2)
        vals2 = np.asarray(vals2)
        live = vals2 > NEG_INF / 2
        assert not np.isin(rows2[live], dead_layout_rows).any()

    def test_fine_search_dedup_union(self):
        X, layout = self._layout()
        ids = jnp.asarray([0, 3, 5, 1 << 30], jnp.int32)
        vals, rows = ivf_fine_search(
            jnp.asarray(unit(rand((2, 128), 23))), layout.vectors,
            jnp.int32(layout.n_live), ids, k=4, n_scan=3,
            block_rows=layout.block_rows, mask=layout.mask,
        )
        rows = np.asarray(rows)
        assert ((rows // layout.block_rows)[:, :4] < 6).all()


class TestFusedAttentionCompiled:
    def test_matches_xla(self):
        B, S, H, nh = 8, 128, 384, 12
        q = jnp.asarray(rand((B * S, H), 1), jnp.bfloat16)
        k = jnp.asarray(rand((B * S, H), 2), jnp.bfloat16)
        v = jnp.asarray(rand((B * S, H), 3), jnp.bfloat16)
        key_bias = np.zeros((B, S), np.float32)
        key_bias[:, 100:] = -1e9  # padding tail
        key_bias = jnp.asarray(key_bias)
        sm = float(1.0 / np.sqrt(H // nh))
        out_pallas = fused_attention(q, k, v, key_bias, sm, nh, S)
        out_xla = attention_xla(q, k, v, key_bias, sm, nh, S)
        np.testing.assert_allclose(
            np.asarray(out_pallas[: 100 * B]).astype(np.float32),
            np.asarray(out_xla[: 100 * B]).astype(np.float32),
            atol=3e-2, rtol=3e-2,
        )

    def test_pos_bias_causal(self):
        B, S, H, nh = 8, 64, 128, 4
        q = jnp.asarray(rand((B * S, H), 4), jnp.bfloat16)
        k = jnp.asarray(rand((B * S, H), 5), jnp.bfloat16)
        v = jnp.asarray(rand((B * S, H), 6), jnp.bfloat16)
        key_bias = jnp.zeros((B, S), jnp.float32)
        causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)
        sm = float(1.0 / np.sqrt(H // nh))
        out_pallas = fused_attention(q, k, v, key_bias, sm, nh, S, causal)
        out_xla = attention_xla(q, k, v, key_bias, sm, nh, S, causal)
        np.testing.assert_allclose(
            np.asarray(out_pallas).astype(np.float32),
            np.asarray(out_xla).astype(np.float32),
            atol=3e-2, rtol=3e-2,
        )


class TestPaddedFusedAttentionCompiled:
    def _cmp(self, S, nh=4, H=128, B=8):
        from multimodal_rag_tpu.ops.fused_attention import (
            attention_xla,
            fused_attention_padded,
        )

        q = jnp.asarray(rand((B * S, H), 31), jnp.bfloat16)
        k = jnp.asarray(rand((B * S, H), 32), jnp.bfloat16)
        v = jnp.asarray(rand((B * S, H), 33), jnp.bfloat16)
        key_bias = jnp.zeros((B, S), jnp.float32)
        sm = float(1.0 / np.sqrt(H // nh))
        causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)
        out_p = fused_attention_padded(q, k, v, key_bias, sm, nh, S, causal)
        out_x = attention_xla(q, k, v, key_bias, sm, nh, S, causal)
        np.testing.assert_allclose(
            np.asarray(out_p).astype(np.float32),
            np.asarray(out_x).astype(np.float32),
            atol=3e-2, rtol=3e-2,
        )

    def test_clip_text_shape(self):
        self._cmp(S=77)

    def test_clip_vision_shape(self):
        self._cmp(S=50)
