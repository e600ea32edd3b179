"""Pipeline-parallel decoder (parallel/decoder_pp.py).

Covers: stage placement (each chip holds L/S layers, 1/S of the weight
bytes), greedy equality with the single-device ``generate_tokens`` (the
ring schedule must be a pure re-ordering of the same math), sampled
equality under per-row key streams, EOS padding semantics, int8 params
through the pipeline, MoE (Mixtral-family) composition, and the
GQA/bias/Gemma config axes.

The reference has no pipeline (or any) model parallelism — SURVEY.md
§2.4; this is the capacity axis for checkpoints larger than one chip's
HBM.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    generate_tokens,
    init_params,
    quantize_decoder_params,
)
from multimodal_rag_tpu.parallel.decoder_pp import (
    pp_generate,
    pp_mesh,
    shard_decoder_pp,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)

CFG = DecoderConfig(
    vocab_size=96,
    hidden_dim=32,
    num_layers=8,   # 1 layer per stage on the 8-device mesh
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    ff_dim=48,
    max_position=128,
    compute_dtype=jnp.float32,
)


def _ids(B, P, seed=0, vocab=96):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(3, vocab, (B, P)), jnp.int32)
    # Ragged left-padding: row i pads its first (i % 3) positions.
    mask = np.ones((B, P), np.int32)
    for i in range(B):
        mask[i, : i % 3] = 0
    ids = jnp.where(jnp.asarray(mask) > 0, ids, 0)
    return ids, jnp.asarray(mask)


class TestPlacement:
    def test_each_stage_holds_its_layer_slice(self):
        mesh = pp_mesh(8)
        params = init_params(jax.random.key(0), CFG)
        staged = shard_decoder_pp(params, mesh, CFG)
        wq = staged["layers"]["wq"]
        assert wq.shape == (8, 1) + params["layers"]["wq"].shape[1:]
        # Addressable shard on device i is exactly layer slice i.
        for shard in wq.addressable_shards:
            i = shard.index[0].start or 0
            np.testing.assert_array_equal(
                np.asarray(shard.data)[0, 0],
                np.asarray(params["layers"]["wq"][i]),
            )
        # Replicated leaves: every device sees the full embed table.
        assert staged["embed"].sharding.is_fully_replicated

    def test_rejects_indivisible_layers(self):
        mesh = pp_mesh(8)
        cfg = DecoderConfig(**{**CFG.__dict__, "num_layers": 6})
        params = init_params(jax.random.key(0), cfg)
        with pytest.raises(AssertionError, match="divide"):
            shard_decoder_pp(params, mesh, cfg)


class TestGreedyEquality:
    def test_matches_single_device(self):
        mesh = pp_mesh(8)
        params = init_params(jax.random.key(1), CFG)
        ids, mask = _ids(B=16, P=6, seed=1)
        ref, ref_len = generate_tokens(
            params, ids, mask, jax.random.key(0), CFG,
            max_new_tokens=5, temperature=0.0,
        )
        staged = shard_decoder_pp(params, mesh, CFG)
        out, out_len = pp_generate(
            staged, ids, mask, jax.random.key(0), CFG, mesh,
            max_new_tokens=5, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        np.testing.assert_array_equal(
            np.asarray(out_len), np.asarray(ref_len)
        )

    def test_single_token_budget(self):
        mesh = pp_mesh(8)
        params = init_params(jax.random.key(2), CFG)
        ids, mask = _ids(B=8, P=4, seed=2)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(0), CFG,
            max_new_tokens=1, temperature=0.0,
        )
        staged = shard_decoder_pp(params, mesh, CFG)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(0), CFG, mesh,
            max_new_tokens=1, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_eos_rows_pad_identically(self):
        """Force an EOS mid-stream via a vocab-biased head and check the
        PP path pads finished rows exactly like the single-device loop."""
        mesh = pp_mesh(8)
        params = init_params(jax.random.key(3), CFG)
        eos = 7
        ids, mask = _ids(B=8, P=4, seed=3)
        ref, ref_len = generate_tokens(
            params, ids, mask, jax.random.key(0), CFG,
            max_new_tokens=6, temperature=0.0, eos_id=eos,
        )
        staged = shard_decoder_pp(params, mesh, CFG)
        out, out_len = pp_generate(
            staged, ids, mask, jax.random.key(0), CFG, mesh,
            max_new_tokens=6, temperature=0.0, eos_id=eos,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        np.testing.assert_array_equal(
            np.asarray(out_len), np.asarray(ref_len)
        )


class TestSampledEquality:
    def test_same_per_row_keys_reproduce_tokens(self):
        mesh = pp_mesh(8)
        params = init_params(jax.random.key(4), CFG)
        ids, mask = _ids(B=8, P=5, seed=4)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(42), CFG,
            max_new_tokens=4, temperature=0.8, top_k=16, top_p=0.9,
        )
        staged = shard_decoder_pp(params, mesh, CFG)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(42), CFG, mesh,
            max_new_tokens=4, temperature=0.8, top_k=16, top_p=0.9,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestVariants:
    def test_int8_params_flow_through(self):
        mesh = pp_mesh(8)
        params = quantize_decoder_params(init_params(jax.random.key(5), CFG))
        ids, mask = _ids(B=8, P=4, seed=5)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(0), CFG,
            max_new_tokens=4, temperature=0.0,
        )
        staged = shard_decoder_pp(params, mesh, CFG)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(0), CFG, mesh,
            max_new_tokens=4, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_moe_composes_with_pp(self):
        mesh = pp_mesh(8)
        cfg = DecoderConfig(
            **{
                **CFG.__dict__,
                "num_experts": 4,
                "experts_per_tok": 2,
            }
        )
        params = init_params(jax.random.key(6), cfg)
        ids, mask = _ids(B=8, P=4, seed=6)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(0), cfg,
            max_new_tokens=4, temperature=0.0,
        )
        staged = shard_decoder_pp(params, mesh, cfg)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(0), cfg, mesh,
            max_new_tokens=4, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_gemma_axes(self):
        """scale_embeddings + post-norms + softcaps + tied embeddings
        through the pipeline."""
        mesh = pp_mesh(8)
        cfg = DecoderConfig(
            **{
                **CFG.__dict__,
                "act": "gelu_tanh",
                "scale_embeddings": True,
                "post_norms": True,
                "tie_embeddings": True,
                "final_logit_softcap": 30.0,
            }
        )
        params = init_params(jax.random.key(7), cfg)
        ids, mask = _ids(B=8, P=4, seed=7)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(0), cfg,
            max_new_tokens=4, temperature=0.0,
        )
        staged = shard_decoder_pp(params, mesh, cfg)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(0), cfg, mesh,
            max_new_tokens=4, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_gemma3_windows_compose_with_pp(self):
        """Per-layer sliding windows + per-layer rope (Gemma3): the
        derived (L,) / (L, half) leaves must reshape into stages and
        slice correctly inside each stage's local scan."""
        mesh = pp_mesh(8)
        cfg = DecoderConfig(
            **{
                **CFG.__dict__,
                "qk_norm": True,
                "layer_windows": (4, 0) * 4,  # alternate local/global
                "rope_local_theta": 10000.0,
                "rope_theta": 1000000.0,
            }
        )
        params = init_params(jax.random.key(13), cfg)
        ids, mask = _ids(B=8, P=6, seed=13)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(0), cfg,
            max_new_tokens=4, temperature=0.0,
        )
        staged = shard_decoder_pp(params, mesh, cfg)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(0), cfg, mesh,
            max_new_tokens=4, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_multi_layer_stages(self):
        """num_layers=16 on 8 stages → 2 layers per stage."""
        mesh = pp_mesh(8)
        cfg = DecoderConfig(**{**CFG.__dict__, "num_layers": 16})
        params = init_params(jax.random.key(8), cfg)
        ids, mask = _ids(B=8, P=4, seed=8)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(0), cfg,
            max_new_tokens=3, temperature=0.0,
        )
        staged = shard_decoder_pp(params, mesh, cfg)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(0), cfg, mesh,
            max_new_tokens=3, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
