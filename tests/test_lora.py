"""LoRA adapter merging (models/lora.py): PEFT-layout golden test
against a pre-merged HF checkpoint, fused-projection splitting, config
wiring, and the loud-failure contract for malformed adapters."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    init_params,
    load_hf_causal_lm,
    prefill,
)
from multimodal_rag_tpu.models.lora import (
    load_lora_adapter,
    merge_lora,
)

_ATTN = {"q_proj", "k_proj", "v_proj", "o_proj", "qkv_proj"}


def _write_adapter(path, modules, r=4, alpha=8.0):
    """modules: {(layer, hf_module): (A (r, in), B (out, r))}."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({
            "peft_type": "LORA", "r": r, "lora_alpha": alpha,
            "target_modules": sorted({m for (_l, m) in modules}),
        }, f)
    tensors = {}
    for (layer, module), (A, B) in modules.items():
        group = "self_attn" if module in _ATTN else "mlp"
        stem = f"base_model.model.model.layers.{layer}.{group}.{module}"
        tensors[f"{stem}.lora_A.weight"] = np.asarray(A, np.float32)
        tensors[f"{stem}.lora_B.weight"] = np.asarray(B, np.float32)
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    return path


def _tiny_llama(tmp_path, name="llama"):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=64,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg)
    path = str(tmp_path / name)
    model.save_pretrained(path, safe_serialization=True)
    return model, path


class TestGoldenMerge:
    def test_matches_premerged_hf_checkpoint(self, tmp_path):
        """merge_lora(base, adapter) must equal loading a checkpoint
        whose torch weights already carry W += scale * B @ A — the
        strongest check of key mapping, orientation, and scaling."""
        import torch

        model, base_path = _tiny_llama(tmp_path)
        rng = np.random.default_rng(0)
        r, alpha = 4, 8.0
        scale = alpha / r
        mods = {}
        for layer in (0, 1):
            for module, out_d, in_d in (
                ("q_proj", 32, 32), ("k_proj", 16, 32),
                ("v_proj", 16, 32), ("o_proj", 32, 32),
                ("gate_proj", 64, 32), ("up_proj", 64, 32),
                ("down_proj", 32, 64),
            ):
                A = rng.normal(0, 0.1, (r, in_d)).astype(np.float32)
                B = rng.normal(0, 0.1, (out_d, r)).astype(np.float32)
                mods[(layer, module)] = (A, B)
        adapter = _write_adapter(str(tmp_path / "adapter"), mods,
                                 r=r, alpha=alpha)
        # Reference: merge into the torch weights, save, load normally.
        with torch.no_grad():
            for (layer, module), (A, B) in mods.items():
                holder = model.model.layers[layer]
                group = (holder.self_attn if module in _ATTN
                         else holder.mlp)
                w = getattr(group, module).weight  # (out, in)
                w += torch.from_numpy(scale * (B @ A))
        merged_path = str(tmp_path / "premerged")
        model.save_pretrained(merged_path, safe_serialization=True)

        base_params, dcfg = load_hf_causal_lm(base_path)
        ours = merge_lora(base_params, dcfg, adapter)
        ref_params, _ = load_hf_causal_lm(merged_path)

        ids = jnp.asarray([[1, 5, 9, 20, 33, 2]], jnp.int32)
        mask = jnp.ones_like(ids)
        got, _ = prefill(ours, ids, mask, dcfg, ids.shape[1] + 1)
        want, _ = prefill(ref_params, ids, mask, dcfg, ids.shape[1] + 1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_decoder_wires_lora_paths(self, tmp_path):
        _model, base_path = _tiny_llama(tmp_path)
        rng = np.random.default_rng(1)
        adapter = _write_adapter(
            str(tmp_path / "a"),
            {(0, "q_proj"): (
                rng.normal(0, 0.1, (4, 32)).astype(np.float32),
                rng.normal(0, 0.1, (32, 4)).astype(np.float32),
            )},
        )
        dec = TextDecoder(checkpoint_path=base_path,
                          lora_paths=[adapter],
                          prompt_buckets=(16,))
        assert dec.lora_paths == (adapter,)
        base = TextDecoder(checkpoint_path=base_path,
                           prompt_buckets=(16,))
        assert not np.allclose(
            np.asarray(dec.params["layers"]["wq"]),
            np.asarray(base.params["layers"]["wq"]),
        )
        # Untouched leaves are bit-identical.
        np.testing.assert_array_equal(
            np.asarray(dec.params["layers"]["wk"]),
            np.asarray(base.params["layers"]["wk"]),
        )


class TestFusedSplit:
    def test_qkv_proj_splits_rows(self):
        cfg = DecoderConfig(
            vocab_size=64, hidden_dim=32, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=8, ff_dim=64, max_position=64,
            compute_dtype=jnp.float32,
        )
        params = init_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(2)
        r = 4
        qd, kvd = 32, 16
        A = rng.normal(0, 0.1, (r, 32)).astype(np.float32)
        B = rng.normal(0, 0.1, (qd + 2 * kvd, r)).astype(np.float32)
        import json as _json
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            _write_adapter(td, {(1, "qkv_proj"): (A, B)}, r=r, alpha=r)
            merged = merge_lora(params, cfg, td)
        for name, lo, hi in (("wq", 0, 32), ("wk", 32, 48),
                             ("wv", 48, 64)):
            delta = (B[lo:hi] @ A).T  # scale = alpha/r = 1
            np.testing.assert_allclose(
                np.asarray(merged["layers"][name][1]),
                np.asarray(params["layers"][name][1]) + delta,
                rtol=1e-5, atol=1e-6,
            )
            # layer 0 untouched
            np.testing.assert_array_equal(
                np.asarray(merged["layers"][name][0]),
                np.asarray(params["layers"][name][0]),
            )
        del _json


class TestFailureContracts:
    def _params(self):
        cfg = DecoderConfig(
            vocab_size=64, hidden_dim=32, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=8, ff_dim=64, max_position=64,
            compute_dtype=jnp.float32,
        )
        return init_params(jax.random.key(0), cfg), cfg

    def test_missing_config_raises(self, tmp_path):
        with pytest.raises(ValueError, match="adapter_config"):
            load_lora_adapter(str(tmp_path))

    def test_rank_mismatch_raises(self, tmp_path):
        rng = np.random.default_rng(0)
        path = _write_adapter(
            str(tmp_path / "bad"),
            {(0, "q_proj"): (
                rng.normal(0, 0.1, (8, 32)).astype(np.float32),
                rng.normal(0, 0.1, (32, 8)).astype(np.float32),
            )},
            r=4,
        )
        with pytest.raises(ValueError, match="rank mismatch"):
            load_lora_adapter(path)

    def test_shape_mismatch_raises(self, tmp_path):
        rng = np.random.default_rng(0)
        params, cfg = self._params()
        path = _write_adapter(
            str(tmp_path / "wrongdim"),
            {(0, "q_proj"): (
                rng.normal(0, 0.1, (4, 48)).astype(np.float32),
                rng.normal(0, 0.1, (48, 4)).astype(np.float32),
            )},
        )
        with pytest.raises(ValueError, match="does not match"):
            merge_lora(params, cfg, path)

    def test_quantized_params_rejected(self, tmp_path):
        from multimodal_rag_tpu.models.decoder import (
            quantize_decoder_params,
        )

        rng = np.random.default_rng(0)
        params, cfg = self._params()
        qparams = quantize_decoder_params(params)
        path = _write_adapter(
            str(tmp_path / "a"),
            {(0, "q_proj"): (
                rng.normal(0, 0.1, (4, 32)).astype(np.float32),
                rng.normal(0, 0.1, (32, 4)).astype(np.float32),
            )},
        )
        with pytest.raises(ValueError, match="quantiz"):
            merge_lora(qparams, cfg, path)

    def test_no_supported_pairs_raises(self, tmp_path):
        from safetensors.numpy import save_file

        path = str(tmp_path / "empty")
        os.makedirs(path)
        with open(os.path.join(path, "adapter_config.json"), "w") as f:
            json.dump({"peft_type": "LORA", "r": 4, "lora_alpha": 4}, f)
        save_file(
            {"base_model.model.lm_head.lora_A.weight":
             np.zeros((4, 32), np.float32)},
            os.path.join(path, "adapter_model.safetensors"),
        )
        with pytest.raises(ValueError, match="no supported"):
            load_lora_adapter(path)

    def test_missing_env_path_raises(self, monkeypatch):
        from multimodal_rag_tpu.config import settings
        from multimodal_rag_tpu.models.lora import find_lora_paths

        monkeypatch.setattr(
            settings, "MMRAG_LLM_LORA_PATH", "/nonexistent/adapter"
        )
        with pytest.raises(ValueError, match="do not exist"):
            find_lora_paths()
