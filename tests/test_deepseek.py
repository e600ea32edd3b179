"""DeepSeek-V2/V3 family: multi-head latent attention + DeepSeekMoE.

The reference consumes whatever models its Ollama endpoint hosts
(`/root/reference/app/models/llm_adapter.py:64`); this framework runs the
family on-chip. The TPU-native form is the ABSORBED latent attention
(decoder._mla_attn): the cache holds only the rank-r compressed kv plus
one shared roped key per token (decoder.init_cache MLA branch), and
``kv_b`` folds into the query/output sides — exact-arithmetic-equal to
HF's materialized per-head k/v, with a 9x-smaller cache at V3 geometry.

Covers: HF golden parity against ``DeepseekV3ForCausalLM`` /
``DeepseekV2ForCausalLM`` (torch cpu) — prefill logits AND greedy
generate token-for-token, proving the q/kv LoRA mapping, interleaved
rotary, sigmoid+bias group-limited routing, ungated shared experts, and
the first_k_dense dense-prefix stack; the latent cache layout; decode ==
prefill consistency; int8; and the continuous-batching server paths.
"""

import asyncio
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    config_from_hf,
    generate_tokens,
    init_cache,
    init_params,
    prefill,
    quantize_decoder_params,
)

torch = pytest.importorskip("torch")

MLA_CFG = DecoderConfig(
    vocab_size=128,
    hidden_dim=48,
    num_layers=3,
    num_heads=4,
    num_kv_heads=1,
    head_dim=24,
    ff_dim=32,
    max_position=256,
    compute_dtype=jnp.float32,
    kv_lora_rank=16,
    q_lora_rank=20,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=12,
    rope_interleave=True,
    num_experts=4,
    experts_per_tok=2,
    moe_sigmoid_routing=True,
    n_group=2,
    topk_group=1,
    routed_scaling_factor=2.5,
    norm_topk_prob=True,
    shared_expert_dim=32,
    shared_expert_gated=False,
    first_k_dense=1,
    dense_ff_dim=40,
)


class TestLatentCache:
    def test_cache_is_latent_sized(self):
        cache = init_cache(MLA_CFG, 2, 32)
        assert cache["k"].shape == (3, 2, 1, 32, 16)  # kv_lora_rank
        assert cache["v"].shape == (3, 2, 1, 32, 8)   # qk_rope_head_dim
        # vs the materialized form: n_heads * (qk_head + v_head) per
        # token — the compression the serving stack banks on.
        latent = 16 + 8
        materialized = 4 * ((16 + 8) + 12)
        assert materialized / latent == 6.0

    def test_decode_consistent_with_prefill(self):
        params = init_params(jax.random.key(0), MLA_CFG)
        ids = np.array([[5, 9, 5, 9, 7, 3]], np.int32)
        mask = np.ones_like(ids)
        toks, _ = generate_tokens(
            params, jnp.asarray(ids), jnp.asarray(mask), jax.random.key(0),
            MLA_CFG, max_new_tokens=6, temperature=0.0, top_k=64, eos_id=-1,
        )
        toks = np.asarray(toks)
        ids2 = np.concatenate([ids, toks[:, :3]], axis=1)
        l2, _ = prefill(
            params, jnp.asarray(ids2),
            jnp.asarray(np.ones_like(ids2)), MLA_CFG, ids2.shape[1] + 1,
        )
        assert int(np.argmax(np.asarray(l2)[0])) == int(toks[0, 3])

    def test_int8_runs_and_tracks(self):
        params = init_params(jax.random.key(0), MLA_CFG)
        ids = np.array([[5, 9, 5, 9, 7, 3]], np.int32)
        mask = jnp.asarray(np.ones_like(ids))
        base, _ = prefill(params, jnp.asarray(ids), mask, MLA_CFG, 8)
        qp = quantize_decoder_params(params)
        assert "w_kvb_q" in qp["layers"]
        assert "w_kvb_q" in qp["dense_layers"]
        lq, _ = prefill(qp, jnp.asarray(ids), mask, MLA_CFG, 8)
        corr = np.corrcoef(np.asarray(base)[0], np.asarray(lq)[0])[0, 1]
        assert corr > 0.99


class TestConfigFromHF:
    def test_v3(self):
        cfg = config_from_hf({
            "model_type": "deepseek_v3", "vocab_size": 129280,
            "hidden_size": 7168, "num_hidden_layers": 61,
            "num_attention_heads": 128, "kv_lora_rank": 512,
            "q_lora_rank": 1536, "qk_nope_head_dim": 128,
            "qk_rope_head_dim": 64, "v_head_dim": 128,
            "head_dim": 64,  # HF aliases this to the ROTARY dim
            "n_routed_experts": 256, "num_experts_per_tok": 8,
            "n_shared_experts": 1, "moe_intermediate_size": 2048,
            "intermediate_size": 18432, "first_k_dense_replace": 3,
            "n_group": 8, "topk_group": 4,
            "routed_scaling_factor": 2.5, "norm_topk_prob": True,
        })
        assert cfg.kv_lora_rank == 512 and cfg.q_lora_rank == 1536
        assert cfg.head_dim == 192  # qk_nope + qk_rope, NOT hf head_dim
        assert cfg.moe_sigmoid_routing and cfg.n_group == 8
        assert cfg.first_k_dense == 3 and cfg.dense_ff_dim == 18432
        assert cfg.shared_expert_dim == 2048
        assert not cfg.shared_expert_gated
        assert cfg.ff_dim == 2048
        assert cfg.sm_scale == pytest.approx((128 + 64) ** -0.5)

    def test_v2_lite_greedy_routing(self):
        cfg = config_from_hf({
            "model_type": "deepseek_v2", "vocab_size": 102400,
            "hidden_size": 2048, "num_hidden_layers": 27,
            "num_attention_heads": 16, "kv_lora_rank": 512,
            "q_lora_rank": None, "qk_nope_head_dim": 128,
            "qk_rope_head_dim": 64, "v_head_dim": 128,
            "n_routed_experts": 64, "num_experts_per_tok": 6,
            "n_shared_experts": 2, "moe_intermediate_size": 1408,
            "first_k_dense_replace": 1, "topk_method": "greedy",
            "routed_scaling_factor": 1.0,
        })
        assert cfg.q_lora_rank == 0  # full q projection (V2-Lite)
        assert not cfg.moe_sigmoid_routing and cfg.n_group == 0
        assert cfg.shared_expert_dim == 2 * 1408


def _hf_v3_pair(tmp_path, seed=0):
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    torch.manual_seed(seed)
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

    hf_cfg = DeepseekV3Config(
        vocab_size=64, hidden_size=32, intermediate_size=56,
        moe_intermediate_size=24, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=16, q_lora_rank=20, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=12,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, routed_scaling_factor=2.5,
        norm_topk_prob=True, first_k_dense_replace=1,
        max_position_embeddings=64, rope_theta=10000.0,
        tie_word_embeddings=False, rope_scaling=None,
        attention_bias=False, attention_dropout=0.0,
    )
    model = DeepseekV3ForCausalLM(hf_cfg)
    # The correction bias initializes to zero — randomize it so the
    # golden test actually exercises biased selection vs unbiased
    # weights. POSITIVE bias only: a negative bias can push a selected-
    # group expert's choice score below the masked-out experts' exact
    # 0.0 fill, and then torch.topk's tie order among equal zeros is
    # undefined (jax.lax.top_k takes the lowest index) — an HF-side
    # nondeterminism, not a mappable semantic.
    with torch.no_grad():
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(0.02, 0.4)
    model.eval()
    path = str(tmp_path / "dsv3")
    model.save_pretrained(path, safe_serialization=True)
    params, cfg = load_hf_causal_lm(path)
    cfg = DecoderConfig(**{**cfg.__dict__, "compute_dtype": jnp.float32})
    return model, params, cfg


class TestHFGolden:
    def test_v3_prefill_logits(self, tmp_path):
        model, params, cfg = _hf_v3_pair(tmp_path)
        assert cfg.first_k_dense == 1 and "dense_layers" in params
        ids = np.array([[3, 14, 15, 9, 2, 6]], np.int32)
        with torch.no_grad():
            ref = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        logits, _ = prefill(
            params, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            cfg, ids.shape[1] + 1,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref[:, -1, :], rtol=2e-4, atol=2e-4
        )

    def test_v3_greedy_generate_matches_hf(self, tmp_path):
        model, params, cfg = _hf_v3_pair(tmp_path, seed=1)
        ids = np.array([[3, 14, 15, 9, 2, 6]], np.int32)
        with torch.no_grad():
            ref = model.generate(
                torch.tensor(ids, dtype=torch.long), max_new_tokens=8,
                do_sample=False, eos_token_id=None, pad_token_id=0,
            ).numpy()[:, ids.shape[1]:]
        toks, _ = generate_tokens(
            params, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            jax.random.key(0), cfg, max_new_tokens=8, temperature=0.0,
            top_k=64, eos_id=-1,
        )
        np.testing.assert_array_equal(np.asarray(toks), ref)

    def test_v2_prefill_logits(self, tmp_path):
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        torch.manual_seed(3)
        try:
            from transformers import (
                DeepseekV2Config,
                DeepseekV2ForCausalLM,
            )
        except ImportError:
            pytest.skip("transformers too old for DeepSeek-V2")

        from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

        hf_cfg = DeepseekV2Config(
            vocab_size=64, hidden_size=32, intermediate_size=56,
            moe_intermediate_size=24, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            kv_lora_rank=16, q_lora_rank=None, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=12,
            n_routed_experts=4, num_experts_per_tok=2,
            n_shared_experts=1, topk_method="greedy",
            routed_scaling_factor=1.0, first_k_dense_replace=0,
            max_position_embeddings=64, rope_theta=10000.0,
            tie_word_embeddings=False, rope_scaling=None,
            attention_bias=False, attention_dropout=0.0,
        )
        model = DeepseekV2ForCausalLM(hf_cfg)
        model.eval()
        path = str(tmp_path / "dsv2")
        model.save_pretrained(path, safe_serialization=True)
        params, cfg = load_hf_causal_lm(path)
        assert cfg.q_lora_rank == 0 and not cfg.moe_sigmoid_routing
        cfg = DecoderConfig(
            **{**cfg.__dict__, "compute_dtype": jnp.float32}
        )
        ids = np.array([[3, 14, 15, 9, 2, 6]], np.int32)
        with torch.no_grad():
            ref = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        logits, _ = prefill(
            params, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            cfg, ids.shape[1] + 1,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref[:, -1, :], rtol=2e-4, atol=2e-4
        )


class TestYarn:
    def test_yarn_divisors_match_hf_at_real_v3_scale(self):
        """Yarn inv_freq blend vs transformers' _compute_yarn_parameters
        at the REAL DeepSeek-V3 geometry (rope dim 64, theta 10000,
        factor 40, orig 4096) — every divisor, plus the mscale²
        attention-scale multiplier HF applies in DeepseekV3Attention."""
        import torch as _torch
        from transformers import DeepseekV3Config
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

        from multimodal_rag_tpu.models.decoder import (
            _rope_scaling_from_hf,
        )

        rs = {
            "rope_type": "yarn", "factor": 40.0,
            "original_max_position_embeddings": 4096,
            "beta_fast": 32, "beta_slow": 1,
            "mscale": 1.0, "mscale_all_dim": 1.0,
        }
        hf = {"rope_theta": 10000.0, "rope_scaling": dict(rs),
              "max_position_embeddings": 163840}
        divisors, attn = _rope_scaling_from_hf(hf, 64)
        # mscale == mscale_all_dim ⇒ cos/sin factor is exactly 1.
        assert attn == 1.0

        cfg = DeepseekV3Config(
            rope_theta=10000.0, max_position_embeddings=163840,
            rope_scaling=dict(rs), qk_rope_head_dim=64,
        )
        hf_inv, hf_attn = ROPE_INIT_FUNCTIONS["yarn"](cfg, device="cpu")
        hf_inv = np.asarray(
            hf_inv.numpy() if _torch.is_tensor(hf_inv) else hf_inv,
            np.float64,
        )
        assert hf_attn == pytest.approx(attn)
        base = 10000.0 ** (-np.arange(0, 32, dtype=np.float64) / 32)
        np.testing.assert_allclose(
            base / np.asarray(divisors, np.float64), hf_inv, rtol=1e-5
        )
        # The blend must actually interpolate: some dims near 1 (keep),
        # some near 40 (full interpolation), some between.
        ds = np.asarray(divisors)
        assert ds.min() < 1.01 and ds.max() > 39.0
        assert ((ds > 1.5) & (ds < 35.0)).any()

    def test_v3_golden_with_yarn(self, tmp_path):
        """Full-model parity with yarn active: inv_freq blend AND the
        mscale² attention-scale multiplier must both match HF."""
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        torch.manual_seed(4)
        from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

        from multimodal_rag_tpu.models.decoder import load_hf_causal_lm

        hf_cfg = DeepseekV3Config(
            vocab_size=64, hidden_size=32, intermediate_size=56,
            moe_intermediate_size=24, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            kv_lora_rank=16, q_lora_rank=20, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=12,
            n_routed_experts=4, num_experts_per_tok=2,
            n_shared_experts=1, n_group=2, topk_group=1,
            routed_scaling_factor=2.5, norm_topk_prob=True,
            first_k_dense_replace=0, max_position_embeddings=256,
            rope_theta=10000.0, tie_word_embeddings=False,
            rope_scaling={
                "rope_type": "yarn", "factor": 4.0,
                "original_max_position_embeddings": 64,
                "beta_fast": 32, "beta_slow": 1,
                "mscale": 1.0, "mscale_all_dim": 1.0,
            },
            attention_bias=False, attention_dropout=0.0,
        )
        model = DeepseekV3ForCausalLM(hf_cfg)
        model.eval()
        path = str(tmp_path / "dsv3_yarn")
        model.save_pretrained(path, safe_serialization=True)
        params, cfg = load_hf_causal_lm(path)
        assert cfg.rope_factors is not None
        m = 0.1 * np.log(4.0) + 1.0
        assert cfg.sm_scale_mult == pytest.approx(m * m)
        cfg = DecoderConfig(
            **{**cfg.__dict__, "compute_dtype": jnp.float32}
        )
        ids = np.array([[3, 14, 15, 9, 2, 6]], np.int32)
        with torch.no_grad():
            ref = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        logits, _ = prefill(
            params, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            cfg, ids.shape[1] + 1,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref[:, -1, :], rtol=2e-4, atol=2e-4
        )


class TestServing:
    def test_decode_server_paths_serve_mla(self):
        """The continuous-batching server (classic AND fused chunked
        prefill) runs the MLA family unchanged — the latent pair rides
        the same {k, v} cache contract."""
        from multimodal_rag_tpu.serving_decode import DecodeServer

        params = init_params(jax.random.key(0), MLA_CFG)
        dec = TextDecoder(params=params, cfg=MLA_CFG,
                          prompt_buckets=(16, 32))
        plain = dec.generate(["ab ab", "xyz"], max_new_tokens=6,
                             temperature=0.0)

        def serve(**kw):
            async def go():
                srv = DecodeServer(dec, slots=2, max_new_cap=6, **kw)
                outs = await asyncio.gather(*[
                    srv.submit(p, max_new_tokens=6, temperature=0.0)
                    for p in ["ab ab", "xyz"]
                ])
                await srv.stop()
                return outs

            return asyncio.run(go())

        assert serve() == plain
        assert serve(chunk_tokens=8) == plain
