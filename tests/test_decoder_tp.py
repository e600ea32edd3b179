"""Tensor-parallel decoder: sharded forward must equal the single-device
forward bit-for-bit (same dtype, same math — GSPMD only changes layout),
and greedy generation must produce the same tokens.

Runs on the 8-virtual-CPU-device mesh from conftest.
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
)
from multimodal_rag_tpu.parallel.decoder_tp import (
    cache_spec,
    decoder_param_specs,
    shard_decoder,
    tp_mesh,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)

CFG = DecoderConfig(
    vocab_size=64,
    hidden_dim=32,
    num_layers=2,
    num_heads=8,
    num_kv_heads=8,
    head_dim=4,
    ff_dim=64,
    max_position=64,
    compute_dtype=jnp.float32,
)
CFG_GQA = DecoderConfig(**{**CFG.__dict__, "num_kv_heads": 4})  # kv replicated


@pytest.fixture(scope="module")
def mesh():
    return tp_mesh(8)


@pytest.mark.parametrize("cfg", [CFG, CFG_GQA], ids=["mha", "gqa-replicated-kv"])
def test_prefill_matches_single_device(mesh, cfg):
    params = init_params(jax.random.key(0), cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(3, cfg.vocab_size, (2, 8)), jnp.int32
    )
    mask = jnp.ones((2, 8), jnp.int32)
    ref, _ = prefill(params, ids, mask, cfg, 16)

    sharded, _cache_sh = shard_decoder(params, mesh, cfg)
    out, cache = prefill(sharded, ids, mask, cfg, 16)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # The cache must actually be head-sharded when heads divide.
    if cfg.num_kv_heads % 8 == 0:
        shard_shape = cache["k"].sharding.shard_shape(cache["k"].shape)
        assert shard_shape[2] == cfg.num_kv_heads // 8


def test_greedy_generation_matches(mesh):
    params = init_params(jax.random.key(1), CFG)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    ref, _ = generate_tokens(
        params, ids, mask, jax.random.key(0), CFG,
        max_new_tokens=6, temperature=0.0, eos_id=-7,
    )
    sharded, _ = shard_decoder(params, mesh, CFG)
    out, _ = generate_tokens(
        sharded, ids, mask, jax.random.key(0), CFG,
        max_new_tokens=6, temperature=0.0, eos_id=-7,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_textdecoder_auto_tp(mesh):
    """TextDecoder shards over all local devices when dims divide."""
    from multimodal_rag_tpu.models.decoder import TextDecoder

    cfg = DecoderConfig(**{**CFG.__dict__, "vocab_size": 512})
    params = init_params(jax.random.key(0), cfg)
    dec = TextDecoder(params=params, cfg=cfg)
    sh = dec.params["layers"]["wq"].sharding
    shape = dec.params["layers"]["wq"].shape
    assert sh.shard_shape(shape)[2] == shape[2] // 8
    out = dec.generate(["hi"], max_new_tokens=4, temperature=0.0)
    assert isinstance(out[0], str)


def test_specs_cover_params():
    """Every param leaf has a spec (incl. untied lm_head)."""
    cfg = DecoderConfig(**{**CFG.__dict__, "tie_embeddings": False})
    params = init_params(jax.random.key(0), cfg)
    specs = decoder_param_specs(cfg, tp=8)

    def walk(p, s):
        if isinstance(p, dict):
            for k, v in p.items():
                assert k in s, k
                walk(v, s[k])

    walk(params, specs)
    assert cache_spec(cfg, 8)[2] == "model"
