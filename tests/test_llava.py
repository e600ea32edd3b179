"""LLaVA multimodal generation: splice semantics, offline generator, and
the HF golden test (our vision-tower → projector → decoder chain vs the
torch ``LlavaForConditionalGeneration`` forward of the same weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.clip import CLIPConfig
from multimodal_rag_tpu.models.decoder import DecoderConfig
from multimodal_rag_tpu.models.llava import (
    LlavaConfig,
    LlavaGenerator,
    encode_images_for_llm,
    init_llava_params,
    splice_multimodal,
)

TINY = LlavaConfig(
    text=DecoderConfig(
        vocab_size=64, hidden_dim=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, ff_dim=64, max_position=128,
        compute_dtype=jnp.float32,
    ),
    vision=CLIPConfig(
        image_size=32, patch_size=16, vision_width=32, vision_layers=2,
        vision_heads=4, compute_dtype=jnp.float32, fused_attention=False,
    ),
    image_token_id=63,
)


@pytest.fixture(scope="module")
def tiny():
    return init_llava_params(jax.random.key(0), TINY)


class TestSplice:
    def test_placeholder_expands(self, tiny):
        pixels = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32
        )
        img = encode_images_for_llm(tiny, pixels, TINY)
        assert img.shape == (1, TINY.n_image_tokens, 32)
        ids = [5, 6, TINY.image_token_id, 7]
        embeds = splice_multimodal(tiny, ids, img, TINY)
        assert embeds.shape == (3 + TINY.n_image_tokens, 32)
        # Rows around the splice are the token embeddings.
        plain = splice_multimodal(tiny, [5, 6, 7], None, TINY)
        np.testing.assert_allclose(embeds[:2], plain[:2], rtol=1e-6)
        np.testing.assert_allclose(embeds[-1], plain[-1], rtol=1e-6)
        # The spliced block is the projected image features.
        np.testing.assert_allclose(
            embeds[2:2 + TINY.n_image_tokens], np.asarray(img)[0], rtol=1e-6
        )

    def test_no_images_is_token_embedding(self, tiny):
        out = splice_multimodal(tiny, [3, 4, 5], None, TINY)
        assert out.shape == (3, 32)


class TestGenerator:
    def test_offline_generate_with_image(self):
        gen = LlavaGenerator(
            params=init_llava_params(jax.random.key(0), TINY_BYTE),
            cfg=TINY_BYTE,
        )
        img = np.zeros((40, 40, 3), np.uint8)
        from PIL import Image

        out = gen.generate(
            "describe this", images=[Image.fromarray(img)],
            max_new_tokens=8, temperature=0.0,
        )
        assert isinstance(out, str)

    def test_text_only(self):
        gen = LlavaGenerator(
            params=init_llava_params(jax.random.key(0), TINY_BYTE),
            cfg=TINY_BYTE,
        )
        out = gen.generate("hello", max_new_tokens=8, temperature=0.0)
        assert isinstance(out, str)

    def test_overflow_keeps_image_rows(self, caplog):
        """A prompt that overflows the largest bucket must truncate the
        text MIDDLE, not the image rows at the front (naive left-slice
        would silently turn the generation text-only)."""
        import logging

        gen = LlavaGenerator(
            params=init_llava_params(jax.random.key(0), TINY_BYTE),
            cfg=TINY_BYTE,
            prompt_buckets=(32, 64),
        )
        img = np.zeros((40, 40, 3), np.uint8)
        from PIL import Image

        long_prompt = "lots of words " * 40  # way past the 64 bucket
        with caplog.at_level(logging.WARNING):
            out = gen.generate(
                "describe " + long_prompt, images=[Image.fromarray(img)],
                max_new_tokens=8, temperature=0.0,
            )
        assert isinstance(out, str)
        assert any(
            "keeping" in r.message and "image rows" in r.message
            for r in caplog.records
        ), [r.message for r in caplog.records]

    def test_image_region_end(self):
        gen = LlavaGenerator(
            params=init_llava_params(jax.random.key(0), TINY_BYTE),
            cfg=TINY_BYTE,
        )
        # ids: 2 text tokens, one image placeholder, 2 text tokens.
        ids = [3, 4, TINY_BYTE.image_token_id, 5, 6]
        end = gen._image_region_end(ids, 1)
        assert end == 2 + TINY_BYTE.n_image_tokens
        assert gen._image_region_end([3, 4], 0) == 0


TINY_BYTE = LlavaConfig(
    text=DecoderConfig(
        vocab_size=513, hidden_dim=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, ff_dim=64, max_position=2048,
        compute_dtype=jnp.float32,
    ),
    vision=CLIPConfig(
        image_size=32, patch_size=16, vision_width=32, vision_layers=2,
        vision_heads=4, compute_dtype=jnp.float32, fused_attention=False,
    ),
    image_token_id=512,
)


class TestTPUMLLMAdapter:
    def _adapter(self):
        from multimodal_rag_tpu.models.adapters import TPUMLLMAdapter

        gen = LlavaGenerator(
            params=init_llava_params(jax.random.key(0), TINY_BYTE),
            cfg=TINY_BYTE,
        )
        return TPUMLLMAdapter(generator=gen)

    def test_generate_multimodal_with_base64(self):
        import asyncio
        import base64
        from io import BytesIO

        from PIL import Image

        buf = BytesIO()
        Image.new("RGB", (40, 40), (100, 50, 20)).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()

        async def run():
            a = self._adapter()
            await a.initialize()
            out = await a.generate_multimodal(
                "what is in the image?", images=[b64], tables=["|a|b|"],
                max_tokens=8,
            )
            assert isinstance(out, str)
            s = await a.summarize(
                "", content_type="image", image_base64=b64, max_length=64
            )
            assert isinstance(s, str) and len(s) <= 64
            h = await a.health_check()
            assert h["supports_vision"] and h["backend"] == "tpu"
            from multimodal_rag_tpu.models.adapters import ModelCapability

            assert ModelCapability.VISION in a.get_capabilities()

        asyncio.run(run())

    def test_all_bad_images_raise(self):
        """Undecodable-only image lists must error, not silently answer
        an image prompt with no image (hallucinated description)."""
        import asyncio

        async def run():
            a = self._adapter()
            await a.initialize()
            try:
                await a.generate_multimodal(
                    "hello", images=["not-base64!!"], max_tokens=8
                )
            except ValueError as e:
                return str(e)
            return None

        msg = asyncio.run(run())
        assert msg is not None and "decoded" in msg


# ---------------------------------------------------------------------------
# HF golden test
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_golden_vs_hf(tmp_path):
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    torch.manual_seed(0)
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    vc = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=32,
    )
    tc = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    hf_cfg = HFLlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=63,
        projector_hidden_act="gelu", vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    model = LlavaForConditionalGeneration(hf_cfg)
    model.eval()
    path = str(tmp_path / "llava")
    model.save_pretrained(path, safe_serialization=True)

    from multimodal_rag_tpu.models.llava import load_hf_llava

    params, cfg = load_hf_llava(path)
    cfg = LlavaConfig(
        text=DecoderConfig(
            **{**cfg.text.__dict__, "compute_dtype": jnp.float32}
        ),
        vision=CLIPConfig(
            **{
                **cfg.vision.__dict__,
                "compute_dtype": jnp.float32,
                "fused_attention": False,
            }
        ),
        image_token_id=cfg.image_token_id,
        vision_feature_layer=cfg.vision_feature_layer,
        drop_cls=cfg.drop_cls,
        projector_act=cfg.projector_act,
    )

    rng = np.random.default_rng(0)
    pixels_hwc = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    # Ours: ONE placeholder per image (expanded in splice_multimodal);
    # modern HF llava expects the placeholder pre-repeated per patch —
    # same final embedding sequence either way.
    ids = [3, 14, 63, 9, 6]
    n_patch = cfg.n_image_tokens
    hf_ids = [3, 14] + [63] * n_patch + [9, 6]

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor([hf_ids], dtype=torch.long),
            pixel_values=torch.tensor(
                pixels_hwc.transpose(0, 3, 1, 2)
            ),
        ).logits.numpy()

    img = encode_images_for_llm(params, jnp.asarray(pixels_hwc), cfg)
    embeds = splice_multimodal(params, ids, img, cfg)
    from multimodal_rag_tpu.models.decoder import prefill_embeds

    T = embeds.shape[0]
    logits, _ = prefill_embeds(
        params["lm"],
        jnp.asarray(embeds[None]),
        jnp.ones((1, T), jnp.int32),
        cfg.text,
        T + 1,
    )
    np.testing.assert_allclose(
        np.asarray(logits)[0], ref[0, -1, :], rtol=5e-4, atol=5e-4
    )


class TestReviewRegressions:
    def test_ndarray_image_input(self):
        """generate()'s documented '(H, W, 3) arrays' contract: raw pixel
        arrays must preprocess, not crash PIL with a missing header."""
        import numpy as np

        from multimodal_rag_tpu.models.clip import preprocess_image

        arr = np.zeros((40, 52, 3), np.uint8)
        out = preprocess_image(arr, image_size=32)
        assert out.shape == (32, 32, 3)

    def test_projector_act_variants(self):
        """projector_hidden_act from the checkpoint config must change
        the activation (it was parsed-but-ignored)."""
        import jax.numpy as jnp
        import numpy as np

        from multimodal_rag_tpu.models.llava import _project

        pp = {
            "w1": jnp.eye(4), "b1": jnp.zeros(4),
            "w2": jnp.eye(4), "b2": jnp.zeros(4),
        }
        feats = jnp.asarray([[-1.0, 0.5, 2.0, -0.1]])
        exact = np.asarray(_project(pp, feats, act="gelu"))
        tanh = np.asarray(_project(pp, feats, act="gelu_pytorch_tanh"))
        quick = np.asarray(_project(pp, feats, act="quick_gelu"))
        assert not np.allclose(exact, quick, atol=1e-4)
        assert np.allclose(exact, tanh, atol=1e-2)  # close but distinct
        assert not np.array_equal(exact, tanh)


class TestMLLMAdapterImageFailure:
    def test_all_undecodable_images_is_error_not_hallucination(self):
        """If every image payload fails to decode, the adapter must NOT
        generate a text-only 'description' of an image it never saw."""
        import asyncio

        from multimodal_rag_tpu.models.adapters.tpu_mllm import (
            TPUMLLMAdapter,
        )

        adapter = TPUMLLMAdapter.__new__(TPUMLLMAdapter)
        adapter.is_initialized = True  # skip heavy init; fails before use

        async def flow():
            try:
                await adapter.generate_multimodal(
                    "describe this", images=["!!!not-base64!!!"]
                )
            except ValueError as e:
                return str(e)
            return None

        msg = asyncio.new_event_loop().run_until_complete(flow())
        assert msg is not None and "decoded" in msg

    def test_summarize_returns_unavailable_marker(self):
        import asyncio

        from multimodal_rag_tpu.models.adapters.tpu_mllm import (
            TPUMLLMAdapter,
        )

        adapter = TPUMLLMAdapter.__new__(TPUMLLMAdapter)
        adapter.is_initialized = True

        out = asyncio.new_event_loop().run_until_complete(
            adapter.summarize(
                "", content_type="image", image_base64="!!!bad!!!"
            )
        )
        assert out == "Image content (description unavailable)"
