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


def test_greedy_generation_matches_flash_kernel_path(mesh, monkeypatch):
    """VERDICT r4 #1: TP-sharded serving must keep the flash-decode
    kernel. Force the kernel path on the CPU mesh (interpret mode) and
    assert greedy equality between the sharded kernel run and the
    unsharded XLA run — the kernel partitions per-shard on the kv-head
    axis via custom_partitioning."""
    from multimodal_rag_tpu.config import settings

    cfg = DecoderConfig(
        vocab_size=64,
        hidden_dim=64,
        num_layers=2,
        num_heads=8,
        num_kv_heads=8,
        head_dim=64,
        ff_dim=64,
        max_position=256,
        compute_dtype=jnp.float32,
    )
    params = init_params(jax.random.key(2), cfg)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(3, 64, (2, 96)), jnp.int32
    )
    mask = jnp.ones((2, 96), jnp.int32)
    # Unsharded, XLA attention path (flash off).
    monkeypatch.setattr(settings, "TPU_LLM_FLASH_DECODE", False)
    ref, _ = generate_tokens(
        params, ids, mask, jax.random.key(0), cfg,
        max_new_tokens=32, temperature=0.0, eos_id=-7,
    )
    # TP-sharded, kernel path (interpret mode on CPU): P + new = 128
    # divides the 128 tile, head_dim 64 — flash_decode_ok passes.
    monkeypatch.setattr(settings, "TPU_LLM_FLASH_DECODE", True)
    monkeypatch.setattr(settings, "TPU_LLM_FLASH_INTERPRET", True)
    # Guard against a silent fallback: count kernel-path traces.
    from multimodal_rag_tpu.ops import flash_decode as fd_mod

    calls = []
    real = fd_mod.flash_decode

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(
        "multimodal_rag_tpu.models.decoder.flash_decode",
        counting, raising=False,
    )
    monkeypatch.setattr(fd_mod, "flash_decode", counting)
    sharded, _ = shard_decoder(params, mesh, cfg)
    out, _ = generate_tokens(
        sharded, ids, mask, jax.random.key(0), cfg,
        max_new_tokens=32, temperature=0.0, eos_id=-7,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert calls, "flash-decode kernel path was never traced"


def test_deepseek_mla_tp_greedy_with_flash_kernel(mesh, monkeypatch):
    """MLA (DeepSeek) under TP: query heads shard, the latent cache
    replicates, and the absorbed-latent flash kernel partitions on the
    head axis — greedy tokens must equal the unsharded XLA run."""
    from multimodal_rag_tpu.config import settings

    cfg = DecoderConfig(
        vocab_size=64,
        hidden_dim=48,
        num_layers=2,
        num_heads=8,
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
    )
    params = init_params(jax.random.key(3), cfg)
    ids = jnp.asarray(
        np.random.default_rng(3).integers(3, 64, (2, 96)), jnp.int32
    )
    mask = jnp.ones((2, 96), jnp.int32)
    monkeypatch.setattr(settings, "TPU_LLM_FLASH_DECODE", False)
    ref, _ = generate_tokens(
        params, ids, mask, jax.random.key(0), cfg,
        max_new_tokens=32, temperature=0.0, eos_id=-7,
    )
    monkeypatch.setattr(settings, "TPU_LLM_FLASH_DECODE", True)
    monkeypatch.setattr(settings, "TPU_LLM_FLASH_INTERPRET", True)
    from multimodal_rag_tpu.ops import flash_decode as fd_mod

    calls = []
    real = fd_mod.flash_decode_mla

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(fd_mod, "flash_decode_mla", counting)
    sharded, _ = shard_decoder(params, mesh, cfg)
    out, _ = generate_tokens(
        sharded, ids, mask, jax.random.key(0), cfg,
        max_new_tokens=32, temperature=0.0, eos_id=-7,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert calls, "MLA flash kernel path was never traced"
