"""Chunked-prefill + prefix-cache mode of the continuous-batching decode
server: fused passes must reproduce the classic path's greedy outputs
exactly (unpadded layout, per-chunk causality, decode piggybacking), and
prefix-cache hits must skip recompute without changing any output."""

import asyncio

import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    init_params,
)
from multimodal_rag_tpu.serving_decode import DecodeServer

TINY = DecoderConfig(
    vocab_size=512,
    hidden_dim=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    ff_dim=64,
    max_position=2048,
    compute_dtype=jnp.float32,
)

# Gemma3-style interleaved sliding/global layers: the window path
# (cache-slot distances) must agree between the classic left-padded
# layout and the chunked unpadded one.
WINDOWED = DecoderConfig(
    vocab_size=512,
    hidden_dim=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    ff_dim=64,
    max_position=2048,
    compute_dtype=jnp.float32,
    layer_windows=(6, 0),
    rope_local_theta=10000.0,
)


def _decoder(cfg=TINY):
    return TextDecoder(
        params=init_params(jax.random.key(0), cfg),
        cfg=cfg,
        prompt_buckets=(16, 32),
    )


def _serve(dec, prompts, *, chunk=None, prefix=0, stagger=0.0,
           max_new=8, temperature=0.0, slots=4):
    """Run prompts through one DecodeServer; returns (outputs, stats)."""

    async def run():
        srv = DecodeServer(dec, slots=slots, max_new_cap=max_new,
                           chunk_tokens=chunk, prefix_entries=prefix)
        tasks = []
        for p in prompts:
            tasks.append(asyncio.create_task(
                srv.submit(p, max_new_tokens=max_new,
                           temperature=temperature)
            ))
            if stagger:
                await asyncio.sleep(stagger)
        out = await asyncio.gather(*tasks)
        stats = srv.get_stats()
        await srv.stop()
        return out, stats

    return asyncio.run(run())


class TestChunkedPrefill:
    def test_greedy_equals_classic(self):
        """Multi-chunk prompts (C=8 over ~10-30 token prompts), admitted
        together, must produce exactly the classic server's greedy
        outputs."""
        dec = _decoder()
        prompts = [
            "alpha beta",                                # ~2 chunks
            "a much longer prompt that spans chunks!!",  # truncs to cap
            "x",                                         # sub-chunk
        ]
        classic, _ = _serve(dec, prompts)
        chunked, stats = _serve(dec, prompts, chunk=8)
        assert chunked == classic, (chunked, classic)
        assert stats["chunk_passes"] > 0

    def test_staggered_decode_rows_unperturbed(self):
        """A long prompt admitted mid-flight must not perturb a row that
        is already decoding (its tokens ride the fused passes)."""
        dec = _decoder()

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=12,
                               chunk_tokens=8)
            t1 = asyncio.create_task(
                srv.submit("alpha beta", max_new_tokens=12,
                           temperature=0.0)
            )
            await asyncio.sleep(0.15)  # t1 starts decoding
            t2 = asyncio.create_task(
                srv.submit("this second prompt spans several chunks",
                           max_new_tokens=12, temperature=0.0)
            )
            out = await asyncio.gather(t1, t2)
            await srv.stop()
            return out

        out = asyncio.run(run())
        solo2, _ = _serve(dec, ["alpha beta"], chunk=8, max_new=12)
        assert out[0] == solo2[0]
        # And equal to the classic non-chunked result.
        classic, _ = _serve(
            dec, ["this second prompt spans several chunks"], max_new=12
        )
        assert out[1] == classic[0]

    def test_windowed_model_greedy_equals_classic(self):
        """Sliding-window layers: chunked unpadded layout must match the
        classic left-padded layout (slot distances are pad-invariant)."""
        dec = _decoder(WINDOWED)
        prompts = ["sliding window prompt", "tiny"]
        classic, _ = _serve(dec, prompts)
        chunked, _ = _serve(dec, prompts, chunk=8)
        assert chunked == classic

    def test_top_p_tiny_equals_greedy(self):
        """Sampling flows through the fused pass: a vanishing nucleus at
        temperature>0 must reduce to greedy."""
        dec = _decoder()
        greedy, _ = _serve(dec, ["alpha beta"], chunk=8)
        out, _ = _serve(dec, ["alpha beta"], chunk=8, temperature=1.0)
        # different stream, but with top_p→0 only argmax survives:

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=8, chunk_tokens=8)
            o = await srv.submit("alpha beta", max_new_tokens=8,
                                 temperature=1.0, top_p=1e-6)
            await srv.stop()
            return o

        assert asyncio.run(run()) == greedy[0]

    def test_streaming_assembles(self):
        dec = _decoder()

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=8, chunk_tokens=8)
            whole = await srv.submit("stream me", max_new_tokens=8,
                                     temperature=0.0)
            deltas, fins = [], []
            async for d, f in srv.submit_stream(
                "stream me", max_new_tokens=8, temperature=0.0
            ):
                deltas.append(d)
                fins.append(f)
            await srv.stop()
            return whole, deltas, fins

        whole, deltas, fins = asyncio.run(run())
        assert "".join(deltas) == whole
        assert fins[-1] in ("stop", "length")


class TestPrefixCache:
    def test_requires_chunked(self):
        with pytest.raises(ValueError):
            DecodeServer(_decoder(), prefix_entries=2)

    def test_hit_skips_recompute_same_output(self):
        """Two prompts sharing a >=2-chunk prefix: the second must hit
        the cache (tokens_reused = chunk-aligned shared length) and still
        produce exactly the no-cache greedy output."""
        dec = _decoder()
        shared = "context context one "  # 20 byte-tokens
        p1, p2 = shared + "Q1", shared + "Q2"
        want, _ = _serve(dec, [p1, p2], chunk=8)  # no prefix cache

        # Sequential so p1 completes (and stores) before p2 admits.
        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=8,
                               chunk_tokens=8, prefix_entries=2)
            o1 = await srv.submit(p1, max_new_tokens=8, temperature=0.0)
            o2 = await srv.submit(p2, max_new_tokens=8, temperature=0.0)
            stats = srv.get_stats()
            await srv.stop()
            return [o1, o2], stats

        got, stats = asyncio.run(run())
        assert got == want, (got, want)
        n1 = len(dec.tokenizer.encode(p1))
        n2 = len(dec.tokenizer.encode(p2))
        aligned = min((n1 // 8) * 8, ((n2 - 1) // 8) * 8)
        assert stats["prefix_cache_hits"] == 1
        assert stats["prefix_tokens_reused"] == aligned
        # p2's own prefix is covered by p1's entry — no second store.
        assert stats["prefix_cache_entries"] == 1

    def test_lru_eviction(self):
        """With one entry, a third distinct prompt evicts the first; a
        repeat of the first then misses."""
        dec = _decoder()
        a = "first unique preamble " + "A" * 10
        b = "second unique preamble " + "B" * 10

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=4,
                               chunk_tokens=8, prefix_entries=1)
            await srv.submit(a, max_new_tokens=4, temperature=0.0)
            await srv.submit(b, max_new_tokens=4, temperature=0.0)  # evicts a
            await srv.submit(a, max_new_tokens=4, temperature=0.0)  # miss
            stats = srv.get_stats()
            await srv.stop()
            return stats

        stats = asyncio.run(run())
        assert stats["prefix_cache_hits"] == 0
        assert stats["prefix_cache_entries"] == 1

    def test_hit_under_concurrent_decode(self):
        """A prefix hit while another row is decoding must not perturb
        either output (block copy touches only the admitted row)."""
        dec = _decoder()
        shared = "shared context bits "
        p1, p2 = shared + "first", shared + "second"
        neighbor = "an unrelated neighbor"
        want, _ = _serve(dec, [p2], chunk=8, max_new=10)
        want_n, _ = _serve(dec, [neighbor], chunk=8, max_new=10)

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=10,
                               chunk_tokens=8, prefix_entries=2)
            await srv.submit(p1, max_new_tokens=10, temperature=0.0)
            t1 = asyncio.create_task(
                srv.submit(neighbor, max_new_tokens=10, temperature=0.0)
            )
            await asyncio.sleep(0.15)  # neighbor decoding
            t2 = asyncio.create_task(
                srv.submit(p2, max_new_tokens=10, temperature=0.0)
            )
            o_n, o2 = await asyncio.gather(t1, t2)
            stats = srv.get_stats()
            await srv.stop()
            return o_n, o2, stats

        o_n, o2, stats = asyncio.run(run())
        assert stats["prefix_cache_hits"] >= 1
        assert o2 == want[0], (o2, want[0])
        assert o_n == want_n[0], (o_n, want_n[0])

    def test_adapter_wiring(self):
        """TPULLMAdapter builds a chunked+prefix server from settings."""
        from multimodal_rag_tpu.config import settings
        from multimodal_rag_tpu.models.adapters import TPULLMAdapter

        old = (settings.TPU_LLM_CHUNKED_PREFILL,
               settings.TPU_LLM_PREFILL_CHUNK,
               settings.TPU_LLM_PREFIX_CACHE)
        settings.TPU_LLM_CHUNKED_PREFILL = True
        settings.TPU_LLM_PREFILL_CHUNK = 8
        settings.TPU_LLM_PREFIX_CACHE = 2
        try:
            a = TPULLMAdapter(decoder=_decoder(), continuous=True)

            async def run():
                await a.initialize()
                out = await a.generate_text("hello there",
                                            max_tokens=4, temperature=0.0)
                stats = a._server.get_stats()
                await a.cleanup()
                return out, stats

            out, stats = asyncio.run(run())
            assert isinstance(out, str)
            assert stats["chunk_tokens"] == 8
            assert "prefix_cache_hits" in stats
        finally:
            (settings.TPU_LLM_CHUNKED_PREFILL,
             settings.TPU_LLM_PREFILL_CHUNK,
             settings.TPU_LLM_PREFIX_CACHE) = old
