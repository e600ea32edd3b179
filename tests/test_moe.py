"""Mixture-of-experts decoder (Mixtral family).

Covers: routing semantics (identical experts ⇒ dense equivalence; a
dominant router ⇒ only the selected experts contribute), int8 expert
quantization (router stays f32), expert-parallel sharding equality on the
8-virtual-device mesh, greedy generation, and an HF golden test against
``MixtralForCausalLM`` (torch cpu) proving the checkpoint mapping —
w1=gate / w3=up / w2=down per expert, router transpose, top-2 renorm.

The reference consumes Mixtral-class models through Ollama's model tags
(``/root/reference/app/models/llm_adapter.py:64``); here the family runs
on-chip like the dense Llama/Qwen/Gemma/Phi-3 decoders.
"""

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

MOE_CFG = DecoderConfig(
    vocab_size=64,
    hidden_dim=32,
    num_layers=2,
    num_heads=8,
    num_kv_heads=8,
    head_dim=4,
    ff_dim=48,
    max_position=64,
    num_experts=4,
    experts_per_tok=2,
    compute_dtype=jnp.float32,
)


def _ids(B=2, P=8, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(3, MOE_CFG.vocab_size, (B, P)), jnp.int32)
    return ids, jnp.ones((B, P), jnp.int32)


class TestRouting:
    def test_identical_experts_equal_dense(self):
        """With every expert holding the SAME weights, the renormalized
        top-k combine must reproduce the dense MLP exactly — the routing
        weights sum to 1, so WHICH experts win cannot matter."""
        dense_cfg = DecoderConfig(
            **{**MOE_CFG.__dict__, "num_experts": 0}
        )
        dense = init_params(jax.random.key(0), dense_cfg)
        moe = init_params(jax.random.key(0), MOE_CFG)
        lay = dict(moe["layers"])
        for name in ("w_gate", "w_up", "w_down"):
            lay[name] = jnp.broadcast_to(
                dense["layers"][name][:, None],
                (MOE_CFG.num_layers, MOE_CFG.num_experts)
                + dense["layers"][name].shape[1:],
            )
        for name in ("wq", "wk", "wv", "wo", "ln_attn", "ln_mlp"):
            lay[name] = dense["layers"][name]
        moe = {**dense, "layers": lay}

        ids, mask = _ids()
        ref, _ = prefill(dense, ids, mask, dense_cfg, 16)
        out, _ = prefill(moe, ids, mask, MOE_CFG, 16)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_only_selected_experts_contribute(self):
        """Route every token to experts {0, 1} via a router that reads
        only the (strictly positive) first hidden component, then corrupt
        the NON-selected experts' weights — the output must not move
        (their combine weight is exactly 0) — while corrupting a SELECTED
        expert must move it."""
        from multimodal_rag_tpu.models.decoder import _moe_mlp

        E, H, F = MOE_CFG.num_experts, MOE_CFG.hidden_dim, MOE_CFG.ff_dim
        rng = np.random.default_rng(1)
        router = np.zeros((H, E), np.float32)
        router[0] = [5.0, 4.0, -5.0, -5.0]
        lp = {
            "w_router": jnp.asarray(router),
            "w_gate": jnp.asarray(rng.normal(0, 0.1, (E, H, F)), jnp.float32),
            "w_up": jnp.asarray(rng.normal(0, 0.1, (E, H, F)), jnp.float32),
            "w_down": jnp.asarray(rng.normal(0, 0.1, (E, F, H)), jnp.float32),
        }
        h = jnp.asarray(rng.normal(0, 1, (2, 3, H)), jnp.float32)
        h = h.at[:, :, 0].set(jnp.abs(h[:, :, 0]) + 0.5)  # logit0 > logit1 > rest
        ref = np.asarray(_moe_mlp(h, lp, MOE_CFG, jnp.float32))

        unselected = dict(lp)
        for name in ("w_gate", "w_up", "w_down"):
            w = np.asarray(lp[name]).copy()
            w[2:] = 1e3
            unselected[name] = jnp.asarray(w)
        out = np.asarray(_moe_mlp(h, unselected, MOE_CFG, jnp.float32))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

        selected = dict(lp)
        w = np.asarray(lp["w_up"]).copy()
        w[0] *= 3.0
        selected["w_up"] = jnp.asarray(w)
        out2 = np.asarray(_moe_mlp(h, selected, MOE_CFG, jnp.float32))
        assert np.abs(out2 - ref).max() > 1e-4

    def test_greedy_generation_runs(self):
        params = init_params(jax.random.key(2), MOE_CFG)
        ids, mask = _ids(B=2, P=4, seed=2)
        toks, lengths = generate_tokens(
            params, ids, mask, jax.random.key(0), MOE_CFG,
            max_new_tokens=6, temperature=0.0,
        )
        assert np.asarray(toks).shape == (2, 6)
        assert np.asarray(lengths).min() >= 1


class TestQuantized:
    def test_router_stays_f32_and_logits_close(self):
        params = init_params(jax.random.key(3), MOE_CFG)
        qp = quantize_decoder_params(params)
        lay = qp["layers"]
        assert "w_router" in lay and lay["w_router"].dtype == jnp.float32
        assert lay["w_gate_q"].dtype == jnp.int8
        assert lay["w_gate_q"].shape == (
            MOE_CFG.num_layers, MOE_CFG.num_experts,
            MOE_CFG.hidden_dim, MOE_CFG.ff_dim,
        )
        assert lay["w_down_s"].shape == (
            MOE_CFG.num_layers, MOE_CFG.num_experts, 1, MOE_CFG.hidden_dim,
        )
        ids, mask = _ids(seed=3)
        ref, _ = prefill(params, ids, mask, MOE_CFG, 16)
        out, _ = prefill(qp, ids, mask, MOE_CFG, 16)
        # int8 weight + dynamic activation quant: small relative error.
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        scale = np.abs(np.asarray(ref)).max()
        assert err < 0.05 * scale + 0.05, (err, scale)


class TestHFConfig:
    def test_config_from_hf_mixtral(self):
        cfg = config_from_hf({
            "model_type": "mixtral",
            "vocab_size": 64,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "intermediate_size": 48,
            "num_local_experts": 4,
            "num_experts_per_tok": 2,
        })
        assert cfg.num_experts == 4
        assert cfg.experts_per_tok == 2
        assert cfg.norm_topk_prob is True
        assert cfg.act == "silu"

    def test_dense_types_have_no_experts(self):
        cfg = config_from_hf({"model_type": "mistral", "vocab_size": 64})
        assert cfg.num_experts == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestExpertParallel:
    def test_ep_sharded_prefill_matches_single_device(self):
        from multimodal_rag_tpu.parallel.decoder_tp import (
            decoder_param_specs,
            shard_decoder,
            tp_mesh,
        )
        from jax.sharding import PartitionSpec as P

        cfg = DecoderConfig(
            **{**MOE_CFG.__dict__, "num_experts": 8}
        )
        specs = decoder_param_specs(cfg, 8)
        # 8 experts over 8 devices → true expert parallelism.
        assert specs["layers"]["w_gate"] == P(None, "model", None, None)

        params = init_params(jax.random.key(4), cfg)
        ids, mask = _ids(seed=4)
        ref, _ = prefill(params, ids, mask, cfg, 16)
        sharded, _ = shard_decoder(params, tp_mesh(8), cfg)
        out, _ = prefill(sharded, ids, mask, cfg, 16)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_uneven_experts_fall_back_to_ffn_sharding(self):
        from multimodal_rag_tpu.parallel.decoder_tp import (
            decoder_param_specs,
        )
        from jax.sharding import PartitionSpec as P

        cfg = DecoderConfig(
            **{**MOE_CFG.__dict__, "num_experts": 4, "ff_dim": 64}
        )
        specs = decoder_param_specs(cfg, 8)
        assert specs["layers"]["w_gate"] == P(None, None, None, "model")
        assert specs["layers"]["w_down"] == P(None, None, "model", None)


# ---------------------------------------------------------------------------
# HF golden (torch cpu): the Mixtral mapping proof
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


class TestHFGolden:
    def test_mixtral(self, tmp_path):
        import os

        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        torch.manual_seed(0)
        from transformers import MixtralConfig, MixtralForCausalLM

        from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

        hf_cfg = MixtralConfig(
            vocab_size=64, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            num_local_experts=4, num_experts_per_tok=2,
            rope_theta=10000.0, tie_word_embeddings=False,
        )
        model = MixtralForCausalLM(hf_cfg)
        model.eval()
        path = str(tmp_path / "mixtral")
        model.save_pretrained(path, safe_serialization=True)

        params, cfg = load_hf_causal_lm(path)
        assert cfg.num_experts == 4 and cfg.experts_per_tok == 2
        cfg = DecoderConfig(**{**cfg.__dict__, "compute_dtype": jnp.float32})
        ids = np.array([[3, 14, 15, 9, 2, 6]], np.int32)
        with torch.no_grad():
            ref = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        logits, _ = prefill(
            params, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)), cfg,
            ids.shape[1] + 1,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref[:, -1, :], rtol=2e-4, atol=2e-4
        )
