"""flash_decode kernel vs the exact XLA oracle (interpret mode on CPU;
MMRAG_TPU_TESTS=1 compiles the same contracts on the chip via
tests/test_tpu_kernels.py-style usage in test_tpu_e2e)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.ops.flash_decode import (
    flash_decode,
    flash_decode_reference,
)


def _mk(B=2, n=2, g=3, hd=64, L=3, S=256, seed=0, ragged=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, n, g, hd)), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((L, B, n, S, hd)), jnp.bfloat16
    )
    v = jnp.asarray(
        rng.standard_normal((L, B, n, S, hd)), jnp.bfloat16
    )
    mask = np.zeros((B, S), np.float32)
    if ragged:
        for b in range(B):
            depth = rng.integers(S // 4, S)
            mask[b, depth:] = -1e9  # slots beyond this row's depth
    return q, k, v, jnp.asarray(mask)


def _check(q, k, v, layer, mask, sinks=None, softcap=0.0, scale=0.125):
    got = flash_decode(
        q, k, v, layer, mask, sinks, sm_scale=scale, softcap=softcap,
        interpret=True,
    )
    want = flash_decode_reference(
        q, k, v, layer, mask, sinks, sm_scale=scale, softcap=softcap,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    # The coarse tolerance above absorbs bf16; ALSO require tight
    # agreement relative to the magnitude scale of the output.
    denom = max(1e-3, float(jnp.max(jnp.abs(want))))
    rel = float(jnp.max(jnp.abs(got - want))) / denom
    assert rel < 5e-2, rel


class TestFlashDecode:
    def test_matches_oracle_every_layer(self):
        q, k, v, mask = _mk()
        for layer in range(3):
            _check(q, k, v, jnp.int32(layer), mask)

    def test_hd128_and_tile_512(self):
        q, k, v, mask = _mk(hd=128, S=512, n=1, g=2, L=2)
        _check(q, k, v, jnp.int32(1), mask)

    def test_softcap(self):
        q, k, v, mask = _mk(S=128)
        _check(q, k, v, jnp.int32(0), mask, softcap=50.0)

    def test_sinks_join_denominator(self):
        rng = np.random.default_rng(3)
        q, k, v, mask = _mk(S=128, seed=3)
        sinks = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
        got = flash_decode(
            q, k, v, jnp.int32(0), mask, sinks, sm_scale=0.125,
            interpret=True,
        )
        want = flash_decode_reference(
            q, k, v, jnp.int32(0), mask, sinks, sm_scale=0.125,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )
        # Sinks must CHANGE the output (denominator grows).
        plain = flash_decode_reference(
            q, k, v, jnp.int32(0), mask, None, sm_scale=0.125,
        )
        assert float(jnp.max(jnp.abs(want - plain))) > 1e-4

    def test_ring_style_scattered_mask(self):
        """Ring caches produce masks with attendable slots scattered
        non-contiguously — the kernel must not assume a prefix."""
        rng = np.random.default_rng(5)
        q, k, v, _ = _mk(S=256, seed=5, ragged=False)
        mask = np.where(
            rng.random((2, 256)) < 0.5, 0.0, -1e9
        ).astype(np.float32)
        mask[:, 0] = 0.0  # at least one attendable slot
        _check(q, k, v, jnp.int32(2), jnp.asarray(mask))

    def test_ragged_span_leading_and_trailing_dead_tiles(self):
        """Left-pad bucketing masks whole LEADING tiles and the unwritten
        generation tail masks TRAILING ones — the early-exit index clamp
        must skip both without touching the live-span math."""
        rng = np.random.default_rng(7)
        q, k, v, _ = _mk(S=512, seed=7, ragged=False)
        mask = np.full((2, 512), -1e9, np.float32)
        mask[0, 140:300] = 0.0   # live span crosses tile boundaries
        mask[1, 130:260] = 0.0
        _check(q, k, v, jnp.int32(1), jnp.asarray(mask))

    def test_single_live_tile(self):
        q, k, v, _ = _mk(S=512, seed=9, ragged=False)
        mask = np.full((2, 512), -1e9, np.float32)
        mask[:, 256:300] = 0.0   # one interior tile live
        _check(q, k, v, jnp.int32(0), jnp.asarray(mask))

    def test_traced_layer_index(self):
        q, k, v, mask = _mk(S=128)

        def run(li):
            return flash_decode(
                q, k, v, li, mask, sm_scale=0.125, interpret=True
            )

        outs = jax.lax.map(run, jnp.arange(3, dtype=jnp.int32))
        for layer in range(3):
            want = flash_decode_reference(
                q, k, v, layer, mask, sm_scale=0.125
            )
            np.testing.assert_allclose(
                np.asarray(outs[layer]), np.asarray(want),
                rtol=2e-2, atol=2e-2,
            )
