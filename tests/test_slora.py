"""S-LoRA multi-adapter serving (models/lora.py stack_lora_adapters +
decoder.with_adapter_rows): N finetunes served CONCURRENTLY from one
base weight copy, routed per request — golden against the merged path,
mixed-batch isolation, int8 composition, prefix-cache keying, and the
OpenAI model-name routing through TPULLMAdapter/LoRAView.

VERDICT r3 §3 done-criteria: N>=4 adapters from one base, outputs golden
vs merge_lora, HBM growth = adapters only, composes with int8 and the
continuous-batching server.
"""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    TextDecoder,
    has_adapter_stack,
    init_params,
    prefill,
    quantize_decoder_params,
    with_adapter_rows,
)
from multimodal_rag_tpu.models.lora import merge_lora, stack_lora_adapters
from tests.test_lora import _write_adapter

# f32 compute: the golden comparisons isolate the STACKING math from
# bf16 rounding (merged computes x@(W+Δ) in bf16 where stacked computes
# x@W in bf16 + x@Δ in f32 — a legitimate ~2^-8 difference that would
# swamp the assertions).
CFG = DecoderConfig(
    vocab_size=64, hidden_dim=32, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=8, ff_dim=64, compute_dtype=jnp.float32,
)

_SHAPES = (
    ("q_proj", 32, 32), ("k_proj", 16, 32), ("v_proj", 16, 32),
    ("o_proj", 32, 32), ("gate_proj", 64, 32), ("up_proj", 64, 32),
    ("down_proj", 32, 64),
)


def _make_adapter(tmp_path, name, seed, r=4, alpha=8.0, modules=None):
    rng = np.random.default_rng(seed)
    mods = {}
    for layer in range(CFG.num_layers):
        for module, out_d, in_d in _SHAPES:
            if modules is not None and module not in modules:
                continue
            mods[(layer, module)] = (
                rng.normal(0, 0.2, (r, in_d)).astype(np.float32),
                rng.normal(0, 0.2, (out_d, r)).astype(np.float32),
            )
    return _write_adapter(str(tmp_path / name), mods, r=r, alpha=alpha)


@pytest.fixture(scope="module")
def base_params():
    return init_params(jax.random.key(0), CFG)


def _prefill_logits(params, ids, rows=None):
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)
    if rows is not None:
        params = with_adapter_rows(params, np.asarray(rows, np.int32))
    logits, _cache = prefill(params, ids, mask, CFG, ids.shape[1] + 4)
    return np.asarray(logits)


class TestStackGolden:
    def test_stack_matches_merge(self, tmp_path, base_params):
        """Stacked slot j must reproduce merge_lora of adapter j, and
        slot 0 must be the base exactly."""
        paths = [
            _make_adapter(tmp_path, f"ad{j}", seed=10 + j, r=2 + j)
            for j in range(4)
        ]
        stacked = stack_lora_adapters(base_params, CFG, paths)
        rng = np.random.default_rng(0)
        ids = rng.integers(3, CFG.vocab_size, (1, 12))

        base_logits = _prefill_logits(base_params, ids)
        # Slot 0 == base: the side-path adds an exact 0, but the extra
        # einsum changes XLA's fusion order, so compare at f32-ulp
        # tightness rather than bitwise.
        np.testing.assert_allclose(
            _prefill_logits(stacked, ids, rows=[0]), base_logits,
            rtol=1e-6, atol=1e-6,
        )
        for j, path in enumerate(paths, start=1):
            merged = merge_lora(base_params, CFG, path)
            got = _prefill_logits(stacked, ids, rows=[j])
            want = _prefill_logits(merged, ids)
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
            assert not np.allclose(got, base_logits, atol=1e-3)

    def test_mixed_batch_rows_are_isolated(self, tmp_path, base_params):
        """Rows with different adapter ids in ONE dispatch each match
        their solo runs — no cross-row contamination."""
        paths = [
            _make_adapter(tmp_path, f"mix{j}", seed=20 + j)
            for j in range(2)
        ]
        stacked = stack_lora_adapters(base_params, CFG, paths)
        rng = np.random.default_rng(1)
        ids = rng.integers(3, CFG.vocab_size, (3, 10))
        batch = _prefill_logits(stacked, ids, rows=[0, 1, 2])
        for row, aid in enumerate([0, 1, 2]):
            solo = _prefill_logits(
                stacked, ids[row: row + 1], rows=[aid]
            )
            np.testing.assert_allclose(
                batch[row: row + 1], solo, rtol=1e-5, atol=1e-5
            )

    def test_rank_padding_and_partial_targets(self, tmp_path, base_params):
        """Adapters with different ranks and different target subsets
        coexist: the zero padding is exact."""
        p_full = _make_adapter(tmp_path, "full", seed=30, r=8)
        p_qv = _make_adapter(
            tmp_path, "qv", seed=31, r=2, modules={"q_proj", "v_proj"}
        )
        stacked = stack_lora_adapters(base_params, CFG, [p_full, p_qv])
        rng = np.random.default_rng(2)
        ids = rng.integers(3, CFG.vocab_size, (1, 8))
        merged_qv = merge_lora(base_params, CFG, p_qv)
        np.testing.assert_allclose(
            _prefill_logits(stacked, ids, rows=[2]),
            _prefill_logits(merged_qv, ids),
            rtol=2e-3, atol=2e-3,
        )

    def test_hbm_growth_is_adapters_only(self, tmp_path, base_params):
        paths = [_make_adapter(tmp_path, f"hb{j}", seed=40 + j)
                 for j in range(4)]
        stacked = stack_lora_adapters(base_params, CFG, paths)
        new = set(stacked["layers"]) - set(base_params["layers"])
        assert new and all(k.startswith("slora_") for k in new)
        # Base leaves are the SAME arrays (no copies).
        for k, v in base_params["layers"].items():
            assert stacked["layers"][k] is v
        assert has_adapter_stack(stacked)
        assert not has_adapter_stack(base_params)

    def test_int8_base_composes(self, tmp_path, base_params):
        """Quantized base + f32 stacked side-path: adapter rows differ
        from base rows; slot 0 stays bit-equal to the plain int8 path."""
        path = _make_adapter(tmp_path, "q8", seed=50)
        q = quantize_decoder_params(base_params)
        stacked = stack_lora_adapters(q, CFG, [path])
        rng = np.random.default_rng(3)
        ids = rng.integers(3, CFG.vocab_size, (2, 8))
        base_q = _prefill_logits(q, ids)
        np.testing.assert_allclose(
            _prefill_logits(stacked, ids, rows=[0, 0]), base_q,
            rtol=1e-6, atol=1e-6,
        )
        routed = _prefill_logits(stacked, ids, rows=[1, 1])
        assert not np.allclose(routed, base_q, atol=1e-3)

    def test_moe_and_mla_rejected(self, tmp_path, base_params):
        path = _make_adapter(tmp_path, "rej", seed=60)
        mla_cfg = DecoderConfig(
            vocab_size=64, hidden_dim=32, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=8, ff_dim=64, kv_lora_rank=8,
        )
        with pytest.raises(ValueError, match="MLA"):
            stack_lora_adapters(base_params, mla_cfg, [path])


class TestDecoderRouting:
    def test_generate_adapter_per_row(self, tmp_path, base_params):
        """Coalesced path: per-row adapter routing through
        TextDecoder.generate matches solo runs (greedy)."""
        paths = [(f"ft{j}", _make_adapter(tmp_path, f"gen{j}", seed=70 + j))
                 for j in range(2)]
        dec = TextDecoder(
            params=base_params, cfg=CFG, lora_stack=paths,
            prompt_buckets=(16, 32),
        )
        prompts = ["hello world", "hello world", "hello world"]
        mixed = dec.generate(
            prompts, max_new_tokens=8, temperature=0.0,
            adapter_per_row=[0, 1, 2],
        )
        for i, aid in enumerate([0, 1, 2]):
            solo = dec.generate(
                [prompts[i]], max_new_tokens=8, temperature=0.0,
                adapter_per_row=[aid],
            )
            assert mixed[i] == solo[0]
        assert dec.adapter_index("ft0") == 1
        assert dec.adapter_index(None) == 0
        with pytest.raises(KeyError):
            dec.adapter_index("nope")

    def test_base_rows_unchanged_by_stack(self, tmp_path, base_params):
        paths = [("ft0", _make_adapter(tmp_path, "bse", seed=80))]
        dec_plain = TextDecoder(
            params=base_params, cfg=CFG, prompt_buckets=(16, 32),
        )
        dec_stack = TextDecoder(
            params=base_params, cfg=CFG, lora_stack=paths,
            prompt_buckets=(16, 32),
        )
        out_p = dec_plain.generate(["abc"], max_new_tokens=6,
                                   temperature=0.0)
        out_s = dec_stack.generate(["abc"], max_new_tokens=6,
                                   temperature=0.0)
        assert out_p == out_s


class TestDecodeServerRouting:
    def _decoder(self, tmp_path, base_params, n=2, seed0=90):
        paths = [
            (f"ft{j}", _make_adapter(tmp_path, f"srv{j}", seed=seed0 + j))
            for j in range(n)
        ]
        return TextDecoder(
            params=base_params, cfg=CFG, lora_stack=paths,
            prompt_buckets=(16, 32),
        )

    def test_concurrent_mixed_adapters(self, tmp_path, base_params):
        """Four concurrent requests on adapters 0/1/2/0 through the
        continuous-batching server each match the coalesced solo run
        with the same adapter (greedy ⇒ deterministic)."""
        from multimodal_rag_tpu.serving_decode import DecodeServer

        dec = self._decoder(tmp_path, base_params)
        server = DecodeServer(
            dec, slots=4, max_new_cap=8, chunk_tokens=8,
        )

        async def drive():
            outs = await asyncio.gather(*(
                server.submit(
                    "hello world", max_new_tokens=8, temperature=0.0,
                    adapter_id=aid,
                )
                for aid in (0, 1, 2, 0)
            ))
            await server.stop()
            return outs

        outs = asyncio.run(drive())
        for aid, got in zip((0, 1, 2, 0), outs):
            want = dec.generate(
                ["hello world"], max_new_tokens=8, temperature=0.0,
                adapter_per_row=[aid],
            )[0]
            assert got == want, (aid, got, want)
        assert outs[1] != outs[0]  # the finetune really differs

    def test_classic_admission_path(self, tmp_path, base_params):
        """Non-chunked (bucket-prefill) admission routes adapters too."""
        from multimodal_rag_tpu.serving_decode import DecodeServer

        dec = self._decoder(tmp_path, base_params, seed0=95)
        server = DecodeServer(dec, slots=2, max_new_cap=6)

        async def drive():
            outs = await asyncio.gather(*(
                server.submit(
                    "abc def", max_new_tokens=6, temperature=0.0,
                    adapter_id=aid,
                )
                for aid in (0, 1)
            ))
            await server.stop()
            return outs

        outs = asyncio.run(drive())
        for aid, got in zip((0, 1), outs):
            want = dec.generate(
                ["abc def"], max_new_tokens=6, temperature=0.0,
                adapter_per_row=[aid],
            )[0]
            assert got == want

    def test_prefix_cache_keyed_by_adapter(self, tmp_path, base_params):
        """A prefix prefilled under adapter 1 must NOT serve adapter 2:
        the k/v content depends on the adapter's projections."""
        from multimodal_rag_tpu.serving_decode import DecodeServer

        dec = self._decoder(tmp_path, base_params, seed0=97)
        server = DecodeServer(
            dec, slots=2, max_new_cap=4, chunk_tokens=4,
            prefix_entries=4,
        )
        prompt = "shared preamble text!" * 2  # > 2 chunks

        async def drive():
            o1 = await server.submit(
                prompt, max_new_tokens=4, temperature=0.0, adapter_id=1
            )
            hits_before = server.prefix_hits
            o2 = await server.submit(
                prompt, max_new_tokens=4, temperature=0.0, adapter_id=2
            )
            cross_hits = server.prefix_hits - hits_before
            o1b = await server.submit(
                prompt, max_new_tokens=4, temperature=0.0, adapter_id=1
            )
            same_hits = server.prefix_hits - hits_before - cross_hits
            await server.stop()
            return o1, o2, o1b, cross_hits, same_hits

        o1, o2, o1b, cross_hits, same_hits = asyncio.run(drive())
        assert cross_hits == 0
        assert same_hits == 1
        assert o1 == o1b
        want2 = dec.generate(
            [prompt], max_new_tokens=4, temperature=0.0,
            adapter_per_row=[2],
        )[0]
        assert o2 == want2


class TestAdapterAndView:
    def test_lora_view_routes_by_name(self, tmp_path, base_params):
        """LoRAView (the /v1 ``model`` registry entry) injects its
        adapter name; outputs match direct adapter-kwarg calls."""
        from multimodal_rag_tpu.models.adapters.tpu_llm import (
            LoRAView,
            TPULLMAdapter,
        )

        paths = [("ft0", _make_adapter(tmp_path, "view0", seed=99))]
        dec = TextDecoder(
            params=base_params, cfg=CFG, lora_stack=paths,
            prompt_buckets=(16, 32),
        )
        adapter = TPULLMAdapter(decoder=dec, continuous=False)
        view = LoRAView(adapter, "ft0")

        async def drive():
            via_view = await view.generate_text(
                "hi", max_tokens=6, temperature=0.0
            )
            direct = await adapter.generate_text(
                "hi", max_tokens=6, temperature=0.0, adapter="ft0"
            )
            base = await adapter.generate_text(
                "hi", max_tokens=6, temperature=0.0
            )
            await adapter.cleanup()
            return via_view, direct, base

        via_view, direct, base = asyncio.run(drive())
        assert via_view == direct
        assert via_view != base
        assert view.model_name == "ft0"
        # Proxying reaches base-adapter attributes.
        assert view.backend == "tpu"

    def test_parse_lora_adapters(self, tmp_path):
        from multimodal_rag_tpu.models.adapters.tpu_llm import (
            parse_lora_adapters,
        )

        p = _make_adapter(tmp_path, "cfg0", seed=101)
        assert parse_lora_adapters(f"ft0={p}") == [("ft0", p)]
        assert parse_lora_adapters("") == []
        with pytest.raises(ValueError, match="name=/path"):
            parse_lora_adapters("justaname")
        with pytest.raises(ValueError, match="does not exist"):
            parse_lora_adapters("x=/nonexistent/path")
