"""Packed-nibble int4 weight matmul (ops/qmatmul_int4.py): quantize
round-trip, Pallas kernel vs the XLA oracle (interpret mode off-TPU),
and the decoder's bits=4 integration (quantize_decoder_params /
_qmatmul dispatch / TextDecoder quantize="int4")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.ops.qmatmul_int4 import (
    _qmatmul_int4_2d,
    qmatmul_int4,
    quantize_int4,
    unpack_int4_reference,
)

INTERPRET = jax.default_backend() != "tpu"


class TestQuantize:
    def test_round_trip_error_bound(self):
        rng = np.random.default_rng(0)
        w = rng.normal(0, 0.05, (64, 256)).astype(np.float32)
        packed, scale = quantize_int4(w)
        assert packed.shape == (32, 256) and packed.dtype == jnp.uint8
        assert scale.shape == (1, 256)
        back = np.asarray(unpack_int4_reference(packed, scale))
        # Symmetric 4-bit: |err| <= scale/2 per element.
        assert np.max(np.abs(back - w) / np.asarray(scale)) <= 0.5 + 1e-6

    def test_extremes_survive(self):
        """absmax columns must map to ±7 * scale (clipping is exact at
        the range ends; the -8 code is unused by construction)."""
        w = np.zeros((8, 128), np.float32)
        w[0, 0], w[1, 0] = 0.7, -0.7
        packed, scale = quantize_int4(w)
        back = np.asarray(unpack_int4_reference(packed, scale))
        np.testing.assert_allclose(back[0, 0], 0.7, rtol=1e-6)
        np.testing.assert_allclose(back[1, 0], -0.7, rtol=1e-6)


class TestKernel:
    @pytest.mark.parametrize("M,d_in,d_out", [
        (8, 64, 256), (1, 128, 512), (33, 256, 384),
    ])
    def test_kernel_matches_oracle(self, M, d_in, d_out):
        """The Pallas kernel (interpret off-TPU) must equal the plain
        XLA matmul over the dequantized weights, both in bf16 compute."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (M, d_in)), jnp.float32)
        w = rng.normal(0, 0.05, (d_in, d_out)).astype(np.float32)
        packed, scale = quantize_int4(w)
        got = _qmatmul_int4_2d(x, packed, scale, interpret=INTERPRET)
        lo = (packed & jnp.uint8(0xF)).astype(jnp.bfloat16) - 8
        hi = (packed >> jnp.uint8(4)).astype(jnp.bfloat16) - 8
        dense = jnp.concatenate([lo, hi], axis=0)
        want = jnp.dot(
            x.astype(jnp.bfloat16), dense,
            preferred_element_type=jnp.float32,
        ) * scale
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_stacked_matches_per_layer(self):
        """qmatmul_int4_stacked(layer=i) must equal the per-layer
        qmatmul_int4 over stack slice i — including under a lax.scan
        carrying the layer index (the decoder's usage)."""
        from multimodal_rag_tpu.ops.qmatmul_int4 import (
            qmatmul_int4_stacked,
        )

        rng = np.random.default_rng(3)
        L, d_in, d_out = 3, 64, 256
        w = rng.normal(0, 0.05, (L, d_in, d_out)).astype(np.float32)
        packed, scale = jax.vmap(quantize_int4)(jnp.asarray(w))
        x = jnp.asarray(rng.normal(0, 1, (4, d_in)), jnp.float32)
        for i in range(L):
            got = qmatmul_int4_stacked(x, i, packed, scale)
            want = qmatmul_int4(x, packed[i], scale[i])
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-6
            )

        def body(c, li):
            return c, qmatmul_int4_stacked(c, li, packed, scale)

        _, ys = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        for i in range(L):
            np.testing.assert_allclose(
                np.asarray(ys[i]),
                np.asarray(qmatmul_int4(x, packed[i], scale[i])),
                rtol=1e-6,
            )

    def test_wrapper_leading_dims(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 1, (2, 5, 64)), jnp.float32)
        w = rng.normal(0, 0.05, (64, 128)).astype(np.float32)
        packed, scale = quantize_int4(w)
        y = qmatmul_int4(x, packed, scale)
        assert y.shape == (2, 5, 128)
        flat = qmatmul_int4(x.reshape(10, 64), packed, scale)
        np.testing.assert_allclose(
            np.asarray(y).reshape(10, 128), np.asarray(flat),
            rtol=1e-6,
        )


class TestDecoderInt4:
    def test_quantize_and_generate(self):
        from multimodal_rag_tpu.models.decoder import (
            DecoderConfig,
            TextDecoder,
            init_params,
            quantize_decoder_params,
        )

        cfg = DecoderConfig(
            vocab_size=128, hidden_dim=64, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16, ff_dim=128,
        )
        params = init_params(jax.random.key(0), cfg)
        q4 = quantize_decoder_params(params, bits=4)
        # Packed stacks live OUTSIDE the scanned layer dict so the layer
        # scan keeps them invariant (scalar-prefetch indexing, not a
        # materialized per-layer slice).
        names = set(q4["layers"])
        assert "wq" not in names and "wq_q" not in names
        assert "wq_q4" not in names
        stash = q4["layers_q4"]
        assert "wq_q4" in stash and "wq_s4" in stash
        # ~4x smaller than f32, ~2x smaller than int8 for the projections.
        assert stash["wq_q4"].dtype == jnp.uint8
        assert stash["wq_q4"].shape == (2, 32, 64)

        dec = TextDecoder(
            params=init_params(jax.random.key(0), cfg), cfg=cfg,
            quantize="int4", prompt_buckets=(16,),
        )
        out = dec.generate(["ab"], max_new_tokens=6, temperature=0.0)
        out2 = dec.generate(["ab"], max_new_tokens=6, temperature=0.0)
        assert out == out2  # deterministic greedy

    def test_int4_output_tracks_dense(self):
        """4-bit logits must stay close to the f32 logits for
        small-magnitude weights (sanity that scales/halves aren't
        swapped — a layout bug produces garbage, not a small delta)."""
        from multimodal_rag_tpu.models.decoder import (
            DecoderConfig,
            init_params,
            prefill,
            quantize_decoder_params,
        )

        cfg = DecoderConfig(
            vocab_size=128, hidden_dim=64, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16, ff_dim=128,
            compute_dtype=jnp.float32,
        )
        params = init_params(jax.random.key(1), cfg)
        q4 = quantize_decoder_params(params, bits=4)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(3, 128, (1, 8)), jnp.int32
        )
        mask = jnp.ones_like(ids)
        ref, _ = prefill(params, ids, mask, cfg, 12)
        got, _ = prefill(q4, ids, mask, cfg, 12)
        ref, got = np.asarray(ref), np.asarray(got)
        # Correlated, not equal: 4-bit noise but the same distribution.
        corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
        assert corr > 0.98, corr
