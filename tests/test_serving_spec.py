"""Speculative decoding inside the continuous-batching server
(serving_decode._step_spec): decode-only passes draft K tokens by prompt
lookup and emit 1..K+1 verified tokens per dispatch. Greedy outputs must
be bit-equal to the non-speculative server; sampled rows keep per-row
reproducibility."""

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


def _decoder():
    return TextDecoder(
        params=init_params(jax.random.key(0), TINY),
        cfg=TINY,
        prompt_buckets=(16, 32),
    )


def _serve(dec, prompts, *, spec=0, max_new=16, temperature=0.0,
           stagger=0.0, slots=4, seeds=None):
    async def run():
        srv = DecodeServer(dec, slots=slots, max_new_cap=max_new,
                           chunk_tokens=8, spec_k=spec)
        tasks = []
        for n, p in enumerate(prompts):
            tasks.append(asyncio.create_task(
                srv.submit(p, max_new_tokens=max_new,
                           temperature=temperature,
                           seed=None if seeds is None else seeds[n],
                           return_finish=True)
            ))
            if stagger:
                await asyncio.sleep(stagger)
        out = await asyncio.gather(*tasks)
        stats = srv.get_stats()
        await srv.stop()
        return out, stats

    return asyncio.run(run())


class TestServingSpec:
    def test_requires_chunked(self):
        with pytest.raises(ValueError, match="chunked"):
            DecodeServer(_decoder(), spec_k=4)

    def test_spec_k_must_fit_chunk(self):
        with pytest.raises(ValueError, match="chunk_tokens >="):
            DecodeServer(_decoder(), chunk_tokens=4, spec_k=4)

    def test_greedy_bit_equal_and_fewer_passes(self):
        """Greedy spec output == greedy non-spec output, and the pass
        count must drop (acceptance > 0 on a repetitive prompt)."""
        dec = _decoder()
        # Repetitive prompts give the bigram drafter real matches.
        prompts = ["ab ab ab ab ab", "xyz xyz xyz", "q"]
        want, base_stats = _serve(dec, prompts, max_new=16)
        got, stats = _serve(dec, prompts, spec=4, max_new=16)
        assert got == want, (got, want)
        assert stats["spec_passes"] > 0
        assert stats["spec_tokens_emitted"] >= stats["spec_passes"]
        # Every request finished; the server never stalls.
        assert stats["requests_done"] == 3 == base_stats["requests_done"]

    def test_greedy_staggered_admission(self):
        """Rows joining mid-flight (chunk passes interleaved with spec
        passes) must still produce the solo greedy outputs."""
        dec = _decoder()
        prompts = ["ab ab ab ab", "a longer second prompt arrives late"]
        solo = [
            _serve(dec, [p], spec=4, max_new=12)[0][0] for p in prompts
        ]
        got, _ = _serve(dec, prompts, spec=4, max_new=12, stagger=0.2,
                        slots=2)
        assert got == solo, (got, solo)

    def test_seeded_sampling_reproducible(self):
        """A seeded sampled request emits the same text spec-on whether
        it runs alone or next to a neighbor (per-row key streams through
        the accept/reject path)."""
        dec = _decoder()
        alone, _ = _serve(dec, ["sample me"], spec=4, max_new=10,
                          temperature=1.2, seeds=[42])
        both, _ = _serve(dec, ["noise neighbor row", "sample me"],
                         spec=4, max_new=10, temperature=1.2,
                         seeds=[7, 42])
        assert both[1] == alone[0], (both[1], alone[0])

    def test_top_p_tiny_equals_greedy(self):
        """temperature>0 + top_p→0 must reduce to the greedy output
        through the per-row speculative accept path."""
        dec = _decoder()
        greedy, _ = _serve(dec, ["ab ab ab ab"], spec=4, max_new=10)

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=10,
                               chunk_tokens=8, spec_k=4)
            o = await srv.submit("ab ab ab ab", max_new_tokens=10,
                                 temperature=1.0, top_p=1e-6,
                                 return_finish=True)
            await srv.stop()
            return o

        assert asyncio.run(run()) == greedy[0]

    def test_finish_reasons(self):
        """Budget exhaustion inside a multi-token emit must report
        finish='length' and exactly max_new_tokens tokens."""
        dec = _decoder()
        out, _ = _serve(dec, ["ab ab ab ab ab ab"], spec=4, max_new=5)
        text, fin = out[0]
        want, _ = _serve(dec, ["ab ab ab ab ab ab"], max_new=5)
        assert (text, fin) == want[0]

    def test_streaming_with_spec(self):
        dec = _decoder()

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=10,
                               chunk_tokens=8, spec_k=4)
            whole = await srv.submit("stream ab ab ab", max_new_tokens=10,
                                     temperature=0.0)
            deltas, fins = [], []
            async for d, f in srv.submit_stream(
                "stream ab ab ab", max_new_tokens=10, temperature=0.0
            ):
                deltas.append(d)
                fins.append(f)
            await srv.stop()
            return whole, deltas, fins

        whole, deltas, fins = asyncio.run(run())
        assert "".join(deltas) == whole
        assert fins[-1] in ("stop", "length")

    def test_adapter_spec_wiring(self):
        from multimodal_rag_tpu.config import settings
        from multimodal_rag_tpu.models.adapters import TPULLMAdapter

        old = (settings.TPU_LLM_CHUNKED_PREFILL,
               settings.TPU_LLM_PREFILL_CHUNK,
               settings.TPU_LLM_SPECULATIVE, settings.TPU_LLM_SPEC_K)
        settings.TPU_LLM_CHUNKED_PREFILL = True
        settings.TPU_LLM_PREFILL_CHUNK = 8
        settings.TPU_LLM_SPECULATIVE = True
        settings.TPU_LLM_SPEC_K = 4
        try:
            dec = TextDecoder(
                params=init_params(jax.random.key(0), TINY),
                cfg=TINY, prompt_buckets=(16, 32), speculative=True,
            )
            a = TPULLMAdapter(decoder=dec, continuous=True)

            async def run():
                await a.initialize()
                out = await a.generate_text("ab ab ab", max_tokens=8,
                                            temperature=0.0)
                stats = a._server.get_stats()
                await a.cleanup()
                return out, stats

            out, stats = asyncio.run(run())
            assert isinstance(out, str)
            assert stats.get("spec_k") == 4
        finally:
            (settings.TPU_LLM_CHUNKED_PREFILL,
             settings.TPU_LLM_PREFILL_CHUNK,
             settings.TPU_LLM_SPECULATIVE,
             settings.TPU_LLM_SPEC_K) = old
