"""Continuous-batching decode server × tensor parallelism: with
TP-sharded decoder params (decoder_tp.shard_decoder) and the KV pool
placed with the matching head-axis sharding, every server mode (classic,
chunked, chunked+prefix-cache, speculative) must produce exactly the
unsharded greedy outputs — GSPMD propagates the shardings through the
jitted steps with no serving-code changes. The server derives the pool
sharding from ``decoder.cache_sharding`` (recorded by
``TextDecoder._maybe_shard_tp``), so no plumbing is needed per mode."""

import asyncio

import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    init_params,
)
from multimodal_rag_tpu.parallel.decoder_tp import shard_decoder, tp_mesh
from multimodal_rag_tpu.serving_decode import DecodeServer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)

CFG = DecoderConfig(
    vocab_size=512,
    hidden_dim=64,
    num_layers=2,
    num_heads=8,
    num_kv_heads=4,
    head_dim=8,
    ff_dim=64,
    max_position=2048,
    compute_dtype=jnp.float32,
)


def _decoders():
    """(single-device, 4-way-TP) decoder pair over the same weights."""
    params = init_params(jax.random.key(0), CFG)
    plain = TextDecoder(params=params, cfg=CFG, prompt_buckets=(16, 32))
    # __init__ auto-TPs over all local devices when the dims divide;
    # force the reference copy back to one device so it really is the
    # unsharded baseline.
    plain.params = jax.device_put(params, jax.devices()[0])
    plain.cache_sharding = None
    mesh = tp_mesh(4)
    sharded_params, cache_sh = shard_decoder(params, mesh, CFG)
    tp = TextDecoder(params=sharded_params, cfg=CFG,
                     prompt_buckets=(16, 32))
    # Pre-sharded params must survive __init__ (no re-placement) and the
    # matching cache sharding must be derived from their mesh.
    assert tp.params["layers"]["wq"].sharding == (
        sharded_params["layers"]["wq"].sharding
    )
    assert tp.cache_sharding == cache_sh
    return plain, tp


def _run(dec, prompts, *, max_new=8, **srv_kw):
    async def go():
        srv = DecodeServer(dec, slots=4, max_new_cap=max_new, **srv_kw)
        out = await asyncio.gather(*[
            srv.submit(p, max_new_tokens=max_new, temperature=0.0)
            for p in prompts
        ])
        stats = srv.get_stats()
        await srv.stop()
        return out, stats

    return asyncio.run(go())


PROMPTS = ["ab ab ab ab", "a different prompt here", "x"]


class TestServingTP:
    def test_classic_mode(self):
        plain, tp = _decoders()
        want, _ = _run(plain, PROMPTS)
        got, _ = _run(tp, PROMPTS)
        assert got == want

    def test_chunked_with_prefix_cache(self):
        plain, tp = _decoders()
        want, _ = _run(plain, PROMPTS, chunk_tokens=8, prefix_entries=2)
        got, stats = _run(tp, PROMPTS, chunk_tokens=8, prefix_entries=2)
        assert got == want
        assert stats["chunk_passes"] > 0

    def test_speculative(self):
        plain, tp = _decoders()
        want, _ = _run(plain, PROMPTS, chunk_tokens=8, spec_k=4)
        got, stats = _run(tp, PROMPTS, chunk_tokens=8, spec_k=4)
        assert got == want
        assert stats["spec_passes"] > 0
