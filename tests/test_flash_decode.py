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


def _quantize_stack(x):
    """Per-(token, head) int8 symmetric quantization of an
    (L, B, n, S, hd) stack → (int8 stack, (L, B, n, S) f32 scales)."""
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-6)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


class TestFlashDecodeInt8KV:
    def test_matches_dequant_oracle(self):
        q, k, v, mask = _mk(S=256)
        kq, ks = _quantize_stack(k)
        vq, vs = _quantize_stack(v)
        got = flash_decode(
            q, kq, vq, jnp.int32(1), mask, k_scale=ks, v_scale=vs,
            sm_scale=0.125, interpret=True,
        )
        want = flash_decode_reference(
            q, kq, vq, jnp.int32(1), mask, k_scale=ks, v_scale=vs,
            sm_scale=0.125,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )

    def test_close_to_bf16_attention(self):
        """int8 KV is an approximation of the bf16 cache — the error
        budget must stay small relative to the output scale."""
        q, k, v, mask = _mk(S=256, seed=11)
        kq, ks = _quantize_stack(k)
        vq, vs = _quantize_stack(v)
        got = flash_decode(
            q, kq, vq, jnp.int32(0), mask, k_scale=ks, v_scale=vs,
            sm_scale=0.125, interpret=True,
        )
        exact = flash_decode_reference(
            q, k, v, jnp.int32(0), mask, sm_scale=0.125
        )
        denom = max(1e-3, float(jnp.max(jnp.abs(exact))))
        rel = float(jnp.max(jnp.abs(got - exact))) / denom
        assert rel < 0.06, rel


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestFlashDecodeTP:
    """GSPMD partitioning of the kernel (custom_partitioning): sharding
    the cache on batch x kv-head axes must keep kernel-vs-oracle
    equality — each shard runs the kernel on its local rows."""

    def _run_sharded(self, spec_kv, B=4, n=4, quant=False):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        q, k, v, mask = _mk(B=B, n=n, g=2, hd=64, L=2, S=256, seed=13)
        mesh = Mesh(
            np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model")
        )
        kv_sh = NamedSharding(mesh, spec_kv)
        extra = {}
        if quant:
            kq, ks = _quantize_stack(k)
            vq, vs = _quantize_stack(v)
            sc_sh = NamedSharding(mesh, P(*spec_kv[:4]))
            extra = dict(
                k_scale=jax.device_put(ks, sc_sh),
                v_scale=jax.device_put(vs, sc_sh),
            )
            k_in, v_in = jax.device_put(kq, kv_sh), jax.device_put(vq, kv_sh)
            want = flash_decode_reference(
                q, kq, vq, jnp.int32(1), mask, sm_scale=0.125,
                k_scale=ks, v_scale=vs,
            )
        else:
            k_in, v_in = jax.device_put(k, kv_sh), jax.device_put(v, kv_sh)
            want = flash_decode_reference(
                q, k, v, jnp.int32(1), mask, sm_scale=0.125
            )
        got = flash_decode(
            q, k_in, v_in, jnp.int32(1), mask, sm_scale=0.125,
            interpret=True, **extra,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )
        return got

    def test_head_and_batch_sharded(self):
        from jax.sharding import PartitionSpec as P

        out = self._run_sharded(P(None, "data", "model", None, None))
        # The result must come back sharded the same way (no gather).
        assert "model" in str(out.sharding), out.sharding

    def test_head_sharded_int8(self):
        from jax.sharding import PartitionSpec as P

        self._run_sharded(
            P(None, "data", "model", None, None), quant=True
        )

    def test_replicated_cache(self):
        from jax.sharding import PartitionSpec as P

        self._run_sharded(P(None, None, None, None, None))


class TestFlashDecodeMLA:
    """Absorbed-latent (DeepSeek MLA) variant vs its XLA oracle."""

    def _mk(self, B=2, n=4, r=64, dr=32, L=3, S=256, seed=21):
        from multimodal_rag_tpu.ops.flash_decode import (
            flash_decode_mla,
            flash_decode_mla_reference,
        )

        rng = np.random.default_rng(seed)
        qa = jnp.asarray(rng.standard_normal((B, n, r)), jnp.float32)
        qr = jnp.asarray(rng.standard_normal((B, n, dr)), jnp.float32)
        c = jnp.asarray(
            rng.standard_normal((L, B, 1, S, r)), jnp.bfloat16
        )
        kr = jnp.asarray(
            rng.standard_normal((L, B, 1, S, dr)), jnp.bfloat16
        )
        mask = np.zeros((B, S), np.float32)
        for b in range(B):
            mask[b, rng.integers(S // 4, S):] = -1e9
        return (flash_decode_mla, flash_decode_mla_reference, qa, qr, c,
                kr, jnp.asarray(mask))

    def test_matches_oracle_every_layer(self):
        fd, ref, qa, qr, c, kr, mask = self._mk()
        for layer in range(3):
            got = fd(qa, qr, c, kr, jnp.int32(layer), mask,
                     sm_scale=0.135, interpret=True)
            want = ref(qa, qr, c, kr, layer, mask, sm_scale=0.135)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
            )

    def test_ragged_interior_span(self):
        fd, ref, qa, qr, c, kr, _ = self._mk(S=512)
        mask = np.full((2, 512), -1e9, np.float32)
        mask[0, 140:300] = 0.0
        mask[1, 130:260] = 0.0
        mask = jnp.asarray(mask)
        got = fd(qa, qr, c, kr, jnp.int32(1), mask, sm_scale=0.135,
                 interpret=True)
        want = ref(qa, qr, c, kr, 1, mask, sm_scale=0.135)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_query_heads_sharded(self):
        """DeepSeek TP shards QUERY heads; the latent cache replicates.
        The kernel must partition on q's head axis."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        fd, ref, qa, qr, c, kr, mask = self._mk(B=2, n=8)
        mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
        qsh = NamedSharding(mesh, P(None, "model", None))
        qa_s = jax.device_put(qa, qsh)
        qr_s = jax.device_put(qr, qsh)
        got = fd(qa_s, qr_s, c, kr, jnp.int32(0), mask, sm_scale=0.135,
                 interpret=True)
        want = ref(qa, qr, c, kr, 0, mask, sm_scale=0.135)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )
