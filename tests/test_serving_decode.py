"""Continuous-batching decode server: correctness of per-row cache
positions under staggered admission, slot reuse, and parity with the
fused single-request generation path."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    decode_step,
    decode_step_rows,
    init_params,
    prefill,
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


class TestDecodeStepRows:
    def test_matches_scalar_pos(self):
        """With every row at the same position, decode_step_rows must equal
        decode_step exactly."""
        params = init_params(jax.random.key(0), TINY)
        B, P, S = 2, 8, 16
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, 500, (B, P)), jnp.int32)
        mask = jnp.ones((B, P), jnp.int32)
        _, cache = prefill(params, ids, mask, TINY, S)
        key_mask = jnp.concatenate(
            [mask, jnp.zeros((B, S - P), jnp.int32)], axis=1
        ).at[:, P].set(1)
        tok = jnp.asarray([7, 9], jnp.int32)
        positions = jnp.full((B,), P, jnp.int32)
        ref, _ = decode_step(params, cache, tok, P, key_mask, positions, TINY)
        got, _ = decode_step_rows(
            params, cache, tok, jnp.full((B,), P, jnp.int32), key_mask,
            positions, TINY,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestDecodeServer:
    def test_staggered_equals_solo(self):
        """Requests admitted mid-flight must produce exactly the solo
        greedy outputs — per-row positions keep rows independent."""
        dec = _decoder()
        prompts = ["alpha beta", "a different and longer prompt here", "x"]
        solo = [
            dec.generate([p], max_new_tokens=8, temperature=0.0)[0]
            for p in prompts
        ]

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=8)
            t1 = asyncio.create_task(
                srv.submit(prompts[0], max_new_tokens=8, temperature=0.0)
            )
            await asyncio.sleep(0.15)  # let it start decoding
            t2 = asyncio.create_task(
                srv.submit(prompts[1], max_new_tokens=8, temperature=0.0)
            )
            t3 = asyncio.create_task(  # queues behind the 2 slots
                srv.submit(prompts[2], max_new_tokens=8, temperature=0.0)
            )
            out = await asyncio.gather(t1, t2, t3)
            stats = srv.get_stats()
            await srv.stop()
            return out, stats

        out, stats = asyncio.run(run())
        assert out == solo, (out, solo)
        assert stats["requests_done"] == 3
        # Slot reuse: 3 requests through 2 slots.
        assert stats["slots"] == 2

    def test_per_row_top_p_tiny_equals_greedy(self):
        """A vanishing per-row nucleus keeps only the argmax candidate:
        temperature>0 + top_p→0 through the continuous server must equal
        the greedy submit — while a neighboring hot row keeps sampling
        (per-row vectors, no cross-row coupling)."""
        dec = _decoder()
        greedy = dec.generate(
            ["alpha beta"], max_new_tokens=8, temperature=0.0
        )[0]

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=8)
            out = await asyncio.gather(
                srv.submit("alpha beta", max_new_tokens=8,
                           temperature=1.0, top_p=1e-6),
                srv.submit("other words", max_new_tokens=8,
                           temperature=1.5, top_p=1.0),
            )
            await srv.stop()
            return out

        out = asyncio.run(run())
        assert out[0] == greedy, (out[0], greedy)

    def test_seed_reproducible_under_continuous_batching(self):
        """A seeded request must produce the same sampled text whether it
        runs alone or staggered next to other rows (per-slot key
        streams)."""
        dec = _decoder()

        async def run_solo():
            srv = DecodeServer(dec, slots=2, max_new_cap=8)
            out = await srv.submit("sample text", max_new_tokens=8,
                                   temperature=1.5, seed=42)
            await srv.stop()
            return out

        async def run_batched():
            srv = DecodeServer(dec, slots=2, max_new_cap=8, seed=9)
            t1 = asyncio.create_task(
                srv.submit("a different neighbor prompt", max_new_tokens=8,
                           temperature=1.5)
            )
            await asyncio.sleep(0.1)
            t2 = asyncio.create_task(
                srv.submit("sample text", max_new_tokens=8,
                           temperature=1.5, seed=42)
            )
            _, out = await asyncio.gather(t1, t2)
            await srv.stop()
            return out

        solo = asyncio.run(run_solo())
        batched = asyncio.run(run_batched())
        assert solo == batched, (solo, batched)

    def test_adapter_continuous_mode(self):
        """TPULLMAdapter(continuous=True) routes through DecodeServer."""
        from multimodal_rag_tpu.models.adapters import TPULLMAdapter

        dec = _decoder()
        a = TPULLMAdapter(decoder=dec, continuous=True)

        async def run():
            await a.initialize()
            outs = await asyncio.gather(
                a.generate_text("one", max_tokens=4, temperature=0.0),
                a.generate_text("two", max_tokens=4, temperature=0.0),
            )
            assert a._server is not None
            assert a._server.get_stats()["requests_done"] == 2
            await a.cleanup()
            return outs

        outs = asyncio.run(run())
        assert all(isinstance(o, str) for o in outs)

    def test_submit_stream_matches_submit(self):
        """Streaming must assemble to exactly the non-streamed greedy text,
        arrive in more than one delta (per-step flushing), and end with a
        finish reason."""
        dec = _decoder()

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=8)
            whole = await srv.submit(
                "stream me", max_new_tokens=8, temperature=0.0
            )
            deltas, fins = [], []
            async for delta, fin in srv.submit_stream(
                "stream me", max_new_tokens=8, temperature=0.0
            ):
                deltas.append(delta)
                fins.append(fin)
            await srv.stop()
            return whole, deltas, fins

        whole, deltas, fins = asyncio.run(run())
        assert "".join(deltas) == whole
        assert len([d for d in deltas if d]) > 1  # genuinely incremental
        assert fins[-1] in ("stop", "length")
        assert all(f is None for f in fins[:-1])

    def test_adapter_stream_coalesced_and_continuous(self):
        """generate_text_stream: one coarse delta in coalesced mode,
        per-token deltas in continuous mode; both assemble to the
        non-streamed answer."""
        from multimodal_rag_tpu.models.adapters import TPULLMAdapter

        async def collect(a, **kw):
            deltas, fin = [], None
            async for d, f in a.generate_text_stream("hi", **kw):
                deltas.append(d)
                if f is not None:
                    fin = f
            return deltas, fin

        async def run(continuous):
            a = TPULLMAdapter(decoder=_decoder(), continuous=continuous)
            await a.initialize()
            whole = await a.generate_text("hi", max_tokens=6, temperature=0.0)
            deltas, fin = await collect(a, max_tokens=6, temperature=0.0)
            await a.cleanup()
            return whole, deltas, fin

        whole, deltas, fin = asyncio.run(run(False))
        assert "".join(deltas) == whole and fin in ("stop", "length")
        whole, deltas, fin = asyncio.run(run(True))
        assert "".join(deltas).strip() == whole.strip()
        assert fin in ("stop", "length")

    def test_single_request(self):
        dec = _decoder()

        async def run():
            srv = DecodeServer(dec, slots=2, max_new_cap=8)
            out = await srv.submit("hello", max_new_tokens=4, temperature=0.0)
            await srv.stop()
            return out

        out = asyncio.run(run())
        assert isinstance(out, str)
        assert out == dec.generate(["hello"], max_new_tokens=4,
                                   temperature=0.0)[0]
