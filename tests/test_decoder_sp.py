"""Sequence-parallel ring-attention prefill (parallel/decoder_sp.py).

Covers: logits + KV-cache equality with the single-device prefill (the
online-softmax ring recurrence must be a pure re-association of the same
attention), ragged left-padded prompts (causality + pad masking via
global indices), end-to-end sp_generate equality with generate_tokens
(greedy and sampled), and composition with the config axes that touch
attention (GQA, qk-norm, Gemma softcaps/post-norms, MoE MLPs, int8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    generate_tokens,
    init_params,
    prefill,
    quantize_decoder_params,
)
from multimodal_rag_tpu.parallel.decoder_sp import (
    sp_generate,
    sp_mesh,
    sp_prefill,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)

CFG = DecoderConfig(
    vocab_size=96,
    hidden_dim=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    ff_dim=48,
    max_position=128,
    compute_dtype=jnp.float32,
)


def _ids(B, P, seed=0, max_pad=5):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, CFG.vocab_size, (B, P))
    mask = np.ones((B, P), np.int32)
    for i in range(B):
        mask[i, : (i * 2) % max_pad] = 0
    ids = np.where(mask > 0, ids, 0)
    return jnp.asarray(ids, jnp.int32), jnp.asarray(mask)


def _check_prefill(cfg, params, B=4, P=16, seed=0):
    ids, mask = _ids(B, P, seed)
    ref_logits, ref_cache = prefill(params, ids, mask, cfg, P)
    mesh = sp_mesh(8)
    sp_logits, sp_cache = sp_prefill(params, ids, mask, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sp_cache["k"]),
        np.asarray(ref_cache["k"][:, :, :, :P]),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sp_cache["v"]),
        np.asarray(ref_cache["v"][:, :, :, :P]),
        rtol=2e-5, atol=2e-5,
    )


class TestPrefillEquality:
    def test_base_config(self):
        params = init_params(jax.random.key(0), CFG)
        _check_prefill(CFG, params)

    def test_longer_prompt_more_blocks_per_chip(self):
        params = init_params(jax.random.key(1), CFG)
        _check_prefill(CFG, params, B=2, P=64, seed=1)

    def test_qk_norm(self):
        cfg = DecoderConfig(**{**CFG.__dict__, "qk_norm": True})
        params = init_params(jax.random.key(2), cfg)
        _check_prefill(cfg, params, seed=2)

    def test_gemma_softcap_and_post_norms(self):
        cfg = DecoderConfig(
            **{
                **CFG.__dict__,
                "act": "gelu_tanh",
                "post_norms": True,
                "attn_logit_softcap": 50.0,
                "final_logit_softcap": 30.0,
                "scale_embeddings": True,
                "tie_embeddings": True,
            }
        )
        params = init_params(jax.random.key(3), cfg)
        _check_prefill(cfg, params, seed=3)

    def test_moe_mlp(self):
        cfg = DecoderConfig(
            **{**CFG.__dict__, "num_experts": 4, "experts_per_tok": 2}
        )
        params = init_params(jax.random.key(4), cfg)
        _check_prefill(cfg, params, seed=4)

    def test_gemma3_interleaved_windows(self):
        """Per-layer sliding windows (Gemma3) must mask identically in
        the ring — a visiting kv block partially outside a query's
        window contributes only its in-window slots. Window 5 < P=16
        binds across block boundaries on the 8-chip mesh (T_loc=2)."""
        cfg = DecoderConfig(
            **{
                **CFG.__dict__,
                "qk_norm": True,
                "layer_windows": (5, 0),
                "rope_local_theta": 10000.0,
                "rope_theta": 1000000.0,
            }
        )
        params = init_params(jax.random.key(11), cfg)
        _check_prefill(cfg, params, seed=11)

    def test_int8_params(self):
        params = quantize_decoder_params(init_params(jax.random.key(5), CFG))
        _check_prefill(CFG, params, seed=5)

    def test_rejects_indivisible_prompt(self):
        params = init_params(jax.random.key(6), CFG)
        ids, mask = _ids(2, 12, 6)
        with pytest.raises(AssertionError, match="divide"):
            sp_prefill(params, ids, mask, CFG, sp_mesh(8))


class TestGenerate:
    def test_greedy_matches_generate_tokens(self):
        params = init_params(jax.random.key(7), CFG)
        ids, mask = _ids(4, 16, 7)
        ref, ref_len = generate_tokens(
            params, ids, mask, jax.random.key(0), CFG,
            max_new_tokens=5, temperature=0.0,
        )
        out, out_len = sp_generate(
            params, ids, mask, jax.random.key(0), CFG, sp_mesh(8),
            max_new_tokens=5, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        np.testing.assert_array_equal(
            np.asarray(out_len), np.asarray(ref_len)
        )

    def test_sampled_matches_with_same_keys(self):
        params = init_params(jax.random.key(8), CFG)
        ids, mask = _ids(4, 16, 8)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(9), CFG,
            max_new_tokens=4, temperature=0.9, top_k=16, top_p=0.9,
        )
        out, _ = sp_generate(
            params, ids, mask, jax.random.key(9), CFG, sp_mesh(8),
            max_new_tokens=4, temperature=0.9, top_k=16, top_p=0.9,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
