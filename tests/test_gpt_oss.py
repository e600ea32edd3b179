"""GPT-OSS family: attention sinks, alternating sliding windows, biased
clamped-SwiGLU MoE with softmax-over-top-k routing.

The reference consumes whatever models its Ollama endpoint hosts
(`/root/reference/app/models/llm_adapter.py:64`); this framework runs the
family on-chip. The distinctive pieces, each HF-golden-tested against
``GptOssForCausalLM`` (torch cpu, ``transformers/models/gpt_oss/
modular_gpt_oss.py``):

* per-head learnable SINKS join every attention softmax's denominator
  and their mass is dropped (decoder._attn_scores ``sinks``);
* alternating 128-token sliding windows ride the same per-layer-window
  mechanism as Gemma3, but with EVERY layer sharing the yarn-scaled
  frequencies (rope_local_theta None ⇒ windowed layers use the scaled
  inv_freq, decoder._interleaved_rope_leaves);
* the MoE router top-ks the RAW biased logits then softmaxes only the
  selected values; experts carry biases and the clamped α=1.702 SwiGLU
  with the (up + 1) shift;
* q/k/v/o projection biases (o-bias is new to this family).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    config_from_hf,
    generate_tokens,
    init_params,
    prefill,
    quantize_decoder_params,
)

torch = pytest.importorskip("torch")


def _hf_pair(tmp_path, seed=0, n_layers=4, window=4):
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    torch.manual_seed(seed)
    from transformers import GptOssConfig, GptOssForCausalLM

    from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

    hf_cfg = GptOssConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=n_layers, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, sliding_window=window,
        num_local_experts=4, num_experts_per_tok=2,
        rope_theta=10000.0, max_position_embeddings=64,
        rope_scaling={
            "rope_type": "yarn", "factor": 2.0, "beta_fast": 32.0,
            "beta_slow": 1.0, "truncate": False,
            "original_max_position_embeddings": 32,
        },
        tie_word_embeddings=False,
    )
    model = GptOssForCausalLM(hf_cfg)
    model.eval()
    path = str(tmp_path / "gptoss")
    model.save_pretrained(path, safe_serialization=True)
    params, cfg = load_hf_causal_lm(path)
    cfg = DecoderConfig(**{**cfg.__dict__, "compute_dtype": jnp.float32})
    return model, params, cfg


IDS = np.array([[3, 14, 15, 9, 2, 6, 31, 7]], np.int32)


class TestConfig:
    def test_config_from_hf(self):
        cfg = config_from_hf({
            "model_type": "gpt_oss", "vocab_size": 201088,
            "hidden_size": 2880, "num_hidden_layers": 36,
            "num_attention_heads": 64, "num_key_value_heads": 8,
            "head_dim": 64, "sliding_window": 128,
            "intermediate_size": 2880, "num_local_experts": 128,
            "num_experts_per_tok": 4, "rope_theta": 150000.0,
            "max_position_embeddings": 131072,
            "rope_scaling": {
                "rope_type": "yarn", "factor": 32.0, "beta_fast": 32.0,
                "beta_slow": 1.0, "truncate": False,
                "original_max_position_embeddings": 4096,
            },
        })
        assert cfg.attn_sinks and cfg.o_bias and cfg.qkv_bias
        assert cfg.moe_softmax_topk and cfg.moe_expert_bias
        assert cfg.clamped_swiglu and cfg.swiglu_limit == 7.0
        # Default layer_types: odd layers (1-indexed) slide, even full.
        assert cfg.layer_windows[:4] == (128, 0, 128, 0)
        assert cfg.num_experts == 128 and cfg.experts_per_tok == 4
        # Yarn with no mscale: cos/sin scale by 0.1·ln(32)+1.
        assert cfg.rope_attn_factor == pytest.approx(
            0.1 * np.log(32.0) + 1.0
        )

    def test_sinks_change_the_distribution(self):
        """Zero sinks halve every softmax denominator's extra term vs
        large sinks — outputs must differ (the leaf is live)."""
        cfg = config_from_hf({
            "model_type": "gpt_oss", "vocab_size": 64,
            "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 8, "sliding_window": 4,
            "intermediate_size": 48, "num_local_experts": 4,
            "num_experts_per_tok": 2, "rope_theta": 10000.0,
            "max_position_embeddings": 64, "rope_scaling": None,
        })
        cfg = DecoderConfig(
            **{**cfg.__dict__, "compute_dtype": jnp.float32}
        )
        params = init_params(jax.random.key(0), cfg)
        base, _ = prefill(
            params, jnp.asarray(IDS), jnp.ones_like(jnp.asarray(IDS)),
            cfg, 9,
        )
        big = dict(params)
        big["layers"] = {
            **params["layers"],
            "attn_sinks": jnp.full_like(
                params["layers"]["attn_sinks"], 25.0
            ),
        }
        loud, _ = prefill(
            big, jnp.asarray(IDS), jnp.ones_like(jnp.asarray(IDS)),
            cfg, 9,
        )
        assert not np.allclose(np.asarray(base), np.asarray(loud))


class TestHFGolden:
    def test_prefill_logits(self, tmp_path):
        model, params, cfg = _hf_pair(tmp_path)
        # The window (4) binds within this 8-token prompt, and layers
        # alternate sliding/full — both mask regimes are exercised.
        assert cfg.layer_windows == (4, 0, 4, 0)
        with torch.no_grad():
            ref = model(torch.tensor(IDS, dtype=torch.long)).logits.numpy()
        logits, _ = prefill(
            params, jnp.asarray(IDS), jnp.ones_like(jnp.asarray(IDS)),
            cfg, IDS.shape[1] + 1,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref[:, -1, :], rtol=2e-4, atol=2e-4
        )

    def test_greedy_generate_matches_hf(self, tmp_path):
        """Token-for-token greedy parity THROUGH the decode path — the
        sliding windows must keep binding as the sequence grows past
        the prompt (cache-slot window mask) and sinks must join every
        decode step's softmax."""
        model, params, cfg = _hf_pair(tmp_path, seed=1)
        with torch.no_grad():
            ref = model.generate(
                torch.tensor(IDS, dtype=torch.long), max_new_tokens=10,
                do_sample=False, eos_token_id=None, pad_token_id=0,
            ).numpy()[:, IDS.shape[1]:]
        toks, _ = generate_tokens(
            params, jnp.asarray(IDS), jnp.ones_like(jnp.asarray(IDS)),
            jax.random.key(0), cfg, max_new_tokens=10, temperature=0.0,
            top_k=64, eos_id=-1,
        )
        np.testing.assert_array_equal(np.asarray(toks), ref)

    def test_int8_runs_and_tracks(self, tmp_path):
        _model, params, cfg = _hf_pair(tmp_path, seed=2)
        mask = jnp.ones_like(jnp.asarray(IDS))
        base, _ = prefill(params, jnp.asarray(IDS), mask, cfg, 9)
        qp = quantize_decoder_params(params)
        # Biases, sinks and the router(+bias) stay full precision.
        assert "w_gate_q" in qp["layers"]
        for name in ("b_gate", "b_down", "attn_sinks", "router_bias",
                     "bo"):
            assert name in qp["layers"], name
        lq, _ = prefill(qp, jnp.asarray(IDS), mask, cfg, 9)
        corr = np.corrcoef(np.asarray(base)[0], np.asarray(lq)[0])[0, 1]
        assert corr > 0.99
