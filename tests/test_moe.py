"""Mixture-of-experts decoder (Mixtral + Qwen2-MoE families).

Covers: routing semantics (identical experts ⇒ dense equivalence; a
dominant router ⇒ only the selected experts contribute), int8 expert
quantization (router stays f32), expert-parallel sharding equality on the
8-virtual-device mesh, greedy generation, the Qwen2-MoE always-on shared
expert (sigmoid-scalar gated, no top-k renorm by default), and HF golden
tests against ``MixtralForCausalLM`` / ``Qwen2MoeForCausalLM`` (torch
cpu) proving the checkpoint mappings — Mixtral's w1=gate / w3=up /
w2=down vs Qwen2-MoE's mlp.experts.N.{gate,up,down}_proj + shared
expert, router transpose, renorm flag.

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


QMOE_CFG = DecoderConfig(
    **{
        **MOE_CFG.__dict__,
        "shared_expert_dim": 40,
        "norm_topk_prob": False,
        "qkv_bias": True,
    }
)


class TestSharedExpert:
    def test_zeroed_shared_expert_equals_routed_only(self):
        """With the shared expert's down projection zeroed its contribution
        vanishes, so the block must equal the routed-only combine of the
        same weights under a shared_expert_dim=0 config (which never reads
        the shared tensors)."""
        from multimodal_rag_tpu.models.decoder import _moe_mlp

        params = init_params(jax.random.key(7), QMOE_CFG)
        lp = {
            k: v[0] for k, v in params["layers"].items()
            if k.startswith("w_") or k == "shared_gate"
        }
        lp_zero = dict(lp)
        lp_zero["w_shared_down"] = jnp.zeros_like(lp["w_shared_down"])

        rng = np.random.default_rng(7)
        h = jnp.asarray(
            rng.normal(0, 1, (2, 3, QMOE_CFG.hidden_dim)), jnp.float32
        )
        routed_cfg = DecoderConfig(
            **{**QMOE_CFG.__dict__, "shared_expert_dim": 0}
        )
        ref = np.asarray(_moe_mlp(h, lp, routed_cfg, jnp.float32))
        out = np.asarray(_moe_mlp(h, lp_zero, QMOE_CFG, jnp.float32))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_sigmoid_gate_scales_shared_contribution(self):
        """shared_gate = 0 ⇒ scale exactly 0.5; a saturating positive gate
        ⇒ scale ~1.0. The shared-expert delta must double between the two,
        proving the scalar gate multiplies ONLY the shared branch."""
        from multimodal_rag_tpu.models.decoder import _moe_mlp

        params = init_params(jax.random.key(8), QMOE_CFG)
        lp = {
            k: v[0] for k, v in params["layers"].items()
            if k.startswith("w_") or k == "shared_gate"
        }
        rng = np.random.default_rng(8)
        h = jnp.asarray(
            rng.normal(0, 1, (2, 3, QMOE_CFG.hidden_dim)), jnp.float32
        )
        routed_cfg = DecoderConfig(
            **{**QMOE_CFG.__dict__, "shared_expert_dim": 0}
        )
        routed = np.asarray(_moe_mlp(h, lp, routed_cfg, jnp.float32))

        lp_half = dict(lp)
        lp_half["shared_gate"] = jnp.zeros_like(lp["shared_gate"])
        half = np.asarray(_moe_mlp(h, lp_half, QMOE_CFG, jnp.float32))

        lp_full = dict(lp)
        lp_full["shared_gate"] = jnp.full_like(lp["shared_gate"], 50.0)
        # sigmoid(50·sum(h)) saturates to 0 or 1 per token; force positive
        # by making every hidden component's contribution positive.
        h_pos = jnp.abs(h) + 0.1
        full = np.asarray(_moe_mlp(h_pos, lp_full, QMOE_CFG, jnp.float32))
        routed_pos = np.asarray(_moe_mlp(h_pos, lp, routed_cfg, jnp.float32))
        half_pos = np.asarray(
            _moe_mlp(h_pos, lp_half, QMOE_CFG, jnp.float32)
        )

        # gate=0 must still move the output (scale 0.5, not 0).
        assert np.abs(half - routed).max() > 1e-5
        # Full delta ≈ 2 × half delta on the positive inputs where the
        # saturated gate is exactly 1.
        np.testing.assert_allclose(
            full - routed_pos,
            2.0 * (half_pos - routed_pos),
            rtol=1e-5, atol=1e-6,
        )

    def test_prefill_and_generation_run_with_shared_expert(self):
        params = init_params(jax.random.key(9), QMOE_CFG)
        ids, mask = _ids(B=2, P=4, seed=9)
        logits, _ = prefill(params, ids, mask, QMOE_CFG, 16)
        assert np.isfinite(np.asarray(logits)).all()
        toks, lengths = generate_tokens(
            params, ids, mask, jax.random.key(0), QMOE_CFG,
            max_new_tokens=4, temperature=0.0,
        )
        assert np.asarray(toks).shape == (2, 4)


class TestQuantized:
    def test_shared_expert_quantizes_but_scalar_gate_stays_f32(self):
        params = init_params(jax.random.key(11), QMOE_CFG)
        qp = quantize_decoder_params(params)
        lay = qp["layers"]
        assert lay["w_shared_gate_q"].dtype == jnp.int8
        assert lay["w_shared_down_q"].shape == (
            QMOE_CFG.num_layers, QMOE_CFG.shared_expert_dim,
            QMOE_CFG.hidden_dim,
        )
        # The sigmoid scalar gate (like the router) keeps f32: its output
        # multiplies the whole shared branch, so quant noise there scales
        # everything rather than averaging out.
        assert "shared_gate" in lay and lay["shared_gate"].dtype == jnp.float32
        ids, mask = _ids(seed=11)
        ref, _ = prefill(params, ids, mask, QMOE_CFG, 16)
        out, _ = prefill(qp, ids, mask, QMOE_CFG, 16)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        scale = np.abs(np.asarray(ref)).max()
        assert err < 0.05 * scale + 0.05, (err, scale)

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

    def test_config_from_hf_qwen2_moe(self):
        cfg = config_from_hf({
            "model_type": "qwen2_moe",
            "vocab_size": 64,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "intermediate_size": 96,       # dense width: must be IGNORED
            "moe_intermediate_size": 48,   # routed expert width
            "shared_expert_intermediate_size": 80,
            "num_experts": 4,
            "num_experts_per_tok": 2,
        })
        assert cfg.num_experts == 4
        assert cfg.experts_per_tok == 2
        assert cfg.ff_dim == 48            # routed width, not dense
        assert cfg.shared_expert_dim == 80
        # HF Qwen2MoeConfig defaults norm_topk_prob to False.
        assert cfg.norm_topk_prob is False
        assert cfg.qkv_bias is True

    def test_config_from_hf_qwen3_moe(self):
        cfg = config_from_hf({
            "model_type": "qwen3_moe",
            "vocab_size": 64,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "head_dim": 8,
            "moe_intermediate_size": 48,
            "num_experts": 4,
            "num_experts_per_tok": 2,
            "norm_topk_prob": True,
        })
        assert cfg.num_experts == 4
        assert cfg.qk_norm is True          # Qwen3 per-head q/k norms
        assert cfg.qkv_bias is False        # Qwen3 dropped the biases
        assert cfg.shared_expert_dim == 0   # Qwen3-MoE has no shared expert
        assert cfg.norm_topk_prob is True

    def test_qwen2_moe_rejects_interleaved_dense(self):
        base = {
            "model_type": "qwen2_moe",
            "vocab_size": 64,
            "hidden_size": 32,
            "num_hidden_layers": 4,
            "num_attention_heads": 4,
        }
        with pytest.raises(ValueError, match="dense layers"):
            config_from_hf({**base, "decoder_sparse_step": 2})
        with pytest.raises(ValueError, match="dense layers"):
            config_from_hf({**base, "mlp_only_layers": [0]})


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

    def test_shared_expert_specs_split_when_divisible(self):
        from multimodal_rag_tpu.parallel.decoder_tp import (
            decoder_param_specs,
        )
        from jax.sharding import PartitionSpec as P

        cfg = DecoderConfig(
            **{**QMOE_CFG.__dict__, "shared_expert_dim": 64}
        )
        specs = decoder_param_specs(cfg, 8)["layers"]
        assert specs["w_shared_gate"] == P(None, None, "model")
        assert specs["w_shared_down"] == P(None, "model", None)
        assert specs["shared_gate"] == P()

        ragged = DecoderConfig(
            **{**QMOE_CFG.__dict__, "shared_expert_dim": 44}
        )
        rspecs = decoder_param_specs(ragged, 8)["layers"]
        assert rspecs["w_shared_gate"] == P()
        assert rspecs["w_shared_down"] == P()

    def test_qwen_moe_sharded_prefill_matches_single_device(self):
        from multimodal_rag_tpu.parallel.decoder_tp import (
            shard_decoder,
            tp_mesh,
        )

        cfg = DecoderConfig(
            **{**QMOE_CFG.__dict__, "num_experts": 8, "shared_expert_dim": 64}
        )
        params = init_params(jax.random.key(12), cfg)
        ids, mask = _ids(seed=12)
        ref, _ = prefill(params, ids, mask, cfg, 16)
        sharded, _ = shard_decoder(params, tp_mesh(8), cfg)
        out, _ = prefill(sharded, ids, mask, cfg, 16)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


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

    def test_qwen3_moe(self, tmp_path):
        """Qwen3-MoE = routed experts with per-head q/k norms and NO
        shared expert; norm_topk_prob renormalization per config."""
        import os

        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        torch.manual_seed(2)
        try:
            from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
        except ImportError:
            pytest.skip("transformers too old for Qwen3-MoE")

        from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

        hf_cfg = Qwen3MoeConfig(
            vocab_size=64, hidden_size=32, intermediate_size=96,
            moe_intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64,
            num_experts=4, num_experts_per_tok=2,
            decoder_sparse_step=1, mlp_only_layers=[],
            norm_topk_prob=True, rope_theta=10000.0,
            tie_word_embeddings=False,
        )
        model = Qwen3MoeForCausalLM(hf_cfg)
        model.eval()
        path = str(tmp_path / "qwen3moe")
        model.save_pretrained(path, safe_serialization=True)

        params, cfg = load_hf_causal_lm(path)
        assert cfg.num_experts == 4 and cfg.shared_expert_dim == 0
        assert cfg.qk_norm is True and cfg.norm_topk_prob is True
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

    def test_qwen2_moe(self, tmp_path):
        import os

        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        torch.manual_seed(1)
        try:
            from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
        except ImportError:
            pytest.skip("transformers too old for Qwen2-MoE")

        from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

        hf_cfg = Qwen2MoeConfig(
            vocab_size=64, hidden_size=32, intermediate_size=96,
            moe_intermediate_size=48, shared_expert_intermediate_size=80,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            num_experts=4, num_experts_per_tok=2,
            decoder_sparse_step=1, mlp_only_layers=[],
            norm_topk_prob=False, rope_theta=10000.0,
            tie_word_embeddings=False,
        )
        model = Qwen2MoeForCausalLM(hf_cfg)
        model.eval()
        path = str(tmp_path / "qwen2moe")
        model.save_pretrained(path, safe_serialization=True)

        params, cfg = load_hf_causal_lm(path)
        assert cfg.num_experts == 4 and cfg.shared_expert_dim == 80
        assert cfg.ff_dim == 48 and cfg.norm_topk_prob is False
        assert cfg.qkv_bias is True
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
