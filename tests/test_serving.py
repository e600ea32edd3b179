"""Continuous-batching scheduler tests."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.minilm import (
    EncoderConfig,
    TextEncoder,
    init_params,
)
from multimodal_rag_tpu.serving import EmbedBatcher

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=64, compute_dtype=jnp.float32,
)


def make_encoder():
    return TextEncoder(
        params=init_params(jax.random.key(0), TINY), cfg=TINY,
        seq_buckets=(16, 32), batch_buckets=(4, 8, 32),
    )


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


class TestBatcher:
    def test_single_submit(self):
        enc = make_encoder()

        async def flow():
            b = EmbedBatcher(enc, max_wait_ms=1)
            out = await b.submit(["hello", "world"])
            await b.stop()
            return out

        out = run(flow())
        assert out.shape == (2, 64)
        np.testing.assert_allclose(
            out, enc.encode(["hello", "world"]), atol=1e-5
        )

    def test_concurrent_submits_coalesced(self):
        enc = make_encoder()

        async def flow():
            b = EmbedBatcher(enc, max_wait_ms=30)
            outs = await asyncio.gather(
                b.submit(["alpha"]),
                b.submit(["beta", "gamma"]),
                b.submit(["delta"]),
            )
            stats = dict(b.stats)
            await b.stop()
            return outs, stats

        outs, stats = run(flow())
        # all four texts in one device batch
        assert stats["batches"] == 1
        assert stats["items"] == 4
        np.testing.assert_allclose(outs[0][0], enc.encode(["alpha"])[0],
                                   atol=1e-5)
        np.testing.assert_allclose(outs[1][1], enc.encode(["gamma"])[0],
                                   atol=1e-5)

    def test_results_routed_correctly_under_load(self):
        enc = make_encoder()

        async def flow():
            b = EmbedBatcher(enc, max_wait_ms=5, max_batch=16)
            texts = [[f"text {i} {j}" for j in range(i % 3 + 1)]
                     for i in range(12)]
            outs = await asyncio.gather(*(b.submit(t) for t in texts))
            await b.stop()
            return texts, outs

        texts, outs = run(flow())
        for t, o in zip(texts, outs):
            assert o.shape == (len(t), 64)
            np.testing.assert_allclose(o, enc.encode(t), atol=1e-5)

    def test_empty_submit(self):
        enc = make_encoder()

        async def flow():
            b = EmbedBatcher(enc)
            out = await b.submit([])
            await b.stop()
            return out

        assert run(flow()).shape == (0, 64)

    def test_encoder_error_propagates(self):
        class BoomEncoder:
            dim = 64

            def encode(self, texts):
                raise RuntimeError("boom")

        async def flow():
            b = EmbedBatcher(BoomEncoder(), max_wait_ms=1)
            with pytest.raises(RuntimeError):
                await b.submit(["x"])
            await b.stop()

        run(flow())

    def test_deterministic_vs_serial(self):
        """SURVEY §5.2: concurrency safety by determinism — any interleaving
        of concurrent submits must produce the same embeddings the serial
        encoder produces for the same texts."""
        import numpy as np

        encoder = make_encoder()
        batcher = EmbedBatcher(encoder, max_batch=16, max_wait_ms=1.0)
        texts = [f"deterministic text number {i}" for i in range(24)]

        async def concurrent():
            batcher.start()
            outs = await asyncio.gather(
                *(batcher.submit([t]) for t in texts)
            )
            await batcher.stop()
            return np.concatenate(outs)

        got = asyncio.new_event_loop().run_until_complete(concurrent())
        want = encoder.encode(texts)
        np.testing.assert_allclose(got, want, atol=1e-5)
