"""TP×PP composition (parallel/decoder_pp.py on a 2-D mesh): the pipe
axis runs the manual ring schedule while the model axis carries
Megatron TP shardings under GSPMD (shard_map ``axis_names={"pipe"}``).
Outputs must equal the single-device ``generate_tokens`` exactly — the
composition is a pure re-ordering/re-placement of the same math.

The reference has no model parallelism of any kind (SURVEY.md §2.4).
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
from multimodal_rag_tpu.parallel.decoder_tp import MODEL_AXIS

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)

CFG = DecoderConfig(
    vocab_size=96,
    hidden_dim=32,
    num_layers=4,
    num_heads=4,
    num_kv_heads=4,
    head_dim=8,
    ff_dim=64,
    max_position=128,
    compute_dtype=jnp.float32,
)


def _ids(B, P_, seed=0, vocab=96):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(3, vocab, (B, P_)), jnp.int32)
    mask = np.ones((B, P_), np.int32)
    for i in range(B):
        mask[i, : i % 3] = 0
    ids = jnp.where(jnp.asarray(mask) > 0, ids, 0)
    return ids, jnp.asarray(mask)


class TestTpPp:
    def test_mesh_shape(self):
        mesh = pp_mesh(8, tp=4)
        assert mesh.shape == {"pipe": 2, MODEL_AXIS: 4}

    def test_placement_stage_and_tp_split(self):
        mesh = pp_mesh(8, tp=4)
        params = init_params(jax.random.key(0), CFG)
        staged = shard_decoder_pp(params, mesh, CFG)
        wq = staged["layers"]["wq"]  # (2, 2, H, n*hd)
        assert wq.shape == (2, 2) + params["layers"]["wq"].shape[1:]
        # Each shard holds one stage's layers and 1/4 of the out dim.
        shard = wq.addressable_shards[0]
        assert np.asarray(shard.data).shape == (1, 2, 32, 32 // 4)
        assert staged["embed"].sharding.is_fully_replicated

    def test_greedy_matches_single_device(self):
        mesh = pp_mesh(8, tp=4)
        params = init_params(jax.random.key(1), CFG)
        ids, mask = _ids(B=8, P_=6, seed=1)
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

    def test_sampled_matches_single_device(self):
        mesh = pp_mesh(8, tp=2)  # 4 stages × 2-way TP
        params = init_params(jax.random.key(2), CFG)
        ids, mask = _ids(B=8, P_=5, seed=2)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(7), CFG,
            max_new_tokens=4, temperature=1.0, top_k=8,
        )
        staged = shard_decoder_pp(params, mesh, CFG)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(7), CFG, mesh,
            max_new_tokens=4, temperature=1.0, top_k=8,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_int8_composes(self):
        mesh = pp_mesh(8, tp=4)
        params = quantize_decoder_params(init_params(jax.random.key(3), CFG))
        ids, mask = _ids(B=8, P_=5, seed=3)
        ref, _ = generate_tokens(
            params, ids, mask, jax.random.key(0), CFG,
            max_new_tokens=4, temperature=0.0,
        )
        staged = shard_decoder_pp(params, mesh, CFG)
        # int8 leaves carry both the stage split and the TP split.
        assert staged["layers"]["wq_q"].dtype == jnp.int8
        assert staged["layers"]["wq_q"].addressable_shards[0].data.shape \
            == (1, 2, 32, 8)
        out, _ = pp_generate(
            staged, ids, mask, jax.random.key(0), CFG, mesh,
            max_new_tokens=4, temperature=0.0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_windowed_composes(self):
        cfg = DecoderConfig(**{
            **CFG.__dict__,
            "layer_windows": (6, 0, 6, 0),
            "rope_local_theta": 10000.0,
        })
        mesh = pp_mesh(8, tp=4)
        params = init_params(jax.random.key(4), cfg)
        ids, mask = _ids(B=8, P_=6, seed=4)
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
