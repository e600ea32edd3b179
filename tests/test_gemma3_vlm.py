"""Gemma3 VLM (models/gemma3_vlm.py): golden vs HF, projector math,
bidirectional image-block overlay, and the host-facing generator.

The reference's vision path is an Ollama HTTP call
(/root/reference/app/models/mllm_adapter.py:211-263); this family runs
the SigLIP-tower Gemma3 recipe on-chip next to the CLIP-tower llava.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

try:
    from transformers import (
        Gemma3Config,
        Gemma3ForConditionalGeneration,
        Gemma3TextConfig,
    )
    from transformers.models.siglip import SiglipVisionConfig
except ImportError:  # pragma: no cover
    pytest.skip("transformers too old for Gemma3", allow_module_level=True)

from multimodal_rag_tpu.models.decoder import prefill_embeds
from multimodal_rag_tpu.models.gemma3_vlm import (
    Gemma3VLMConfig,
    Gemma3VLMGenerator,
    encode_images_for_llm,
    image_block_overlay,
    init_gemma3_vlm_params,
    load_hf_gemma3_vlm,
)
from multimodal_rag_tpu.models.llava import splice_multimodal


def tiny_hf(tmp_path, mm_tokens=4, layer_types=None):
    torch.manual_seed(0)
    vc = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
    )
    tc = Gemma3TextConfig(
        vocab_size=270, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=1, head_dim=8, query_pre_attn_scalar=8,
        max_position_embeddings=64,
        sliding_window=4,
        layer_types=layer_types
        or ["sliding_attention", "full_attention"],
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
    )
    cfg = Gemma3Config(
        text_config=tc, vision_config=vc, mm_tokens_per_image=mm_tokens,
        image_token_index=257, boi_token_index=255, eoi_token_index=256,
    )
    model = Gemma3ForConditionalGeneration(cfg)
    model.eval()
    # HF zero-initializes mm_input_projection_weight — a golden test on
    # a fresh model would compare all-zero soft tokens (vacuously
    # image-independent). Randomize so the image path carries signal.
    with torch.no_grad():
        model.model.multi_modal_projector.mm_input_projection_weight \
            .normal_(0, 0.05)
    path = str(tmp_path / "gemma3vlm")
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def our_forward(path, ids, pixels_nhwc, overlay=None):
    from multimodal_rag_tpu.models.decoder import DecoderConfig

    params, cfg = load_hf_gemma3_vlm(path)
    # Serving defaults bf16 for the text decoder; goldens compare f32.
    cfg = Gemma3VLMConfig(**{
        **cfg.__dict__,
        "text": DecoderConfig(**{
            **cfg.text.__dict__, "compute_dtype": jnp.float32,
        }),
    })
    # The CPU backend's default matmul precision adds ~1e-3 noise that
    # would swamp a mask/rope bug; goldens compare at full f32.
    with jax.default_matmul_precision("highest"):
        img = encode_images_for_llm(
            params, jnp.asarray(pixels_nhwc), cfg
        )
        embeds = splice_multimodal(params, ids, img, cfg)
        emb = jnp.asarray(np.asarray(embeds)[None])
        mask = jnp.ones((1, emb.shape[1]), jnp.int32)
        logits, _ = prefill_embeds(
            params["lm"], emb, mask, cfg.text, emb.shape[1] + 1,
            None if overlay is None else jnp.asarray(overlay),
        )
    return np.asarray(logits), cfg


class TestGolden:
    def test_matches_hf_forward(self, tmp_path):
        model, path = tiny_hf(tmp_path)
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        # Text with ONE placeholder (expanded by the splice to
        # mm_tokens_per_image rows) == HF ids with 4 image tokens.
        ids_ours = [2, 10, 11, 257, 12, 13, 14]
        ids_hf = [2, 10, 11, 257, 257, 257, 257, 12, 13, 14]
        with torch.no_grad():
            ref = model(
                input_ids=torch.tensor([ids_hf], dtype=torch.long),
                pixel_values=torch.tensor(
                    pixels.transpose(0, 3, 1, 2)
                ),
            ).logits.numpy()
        ours, _cfg = our_forward(path, ids_ours, pixels)
        np.testing.assert_allclose(
            ours, ref[:, -1, :], rtol=3e-4, atol=3e-4
        )

    def test_matches_hf_with_bidirectional_image_blocks(self, tmp_path):
        """token_type_ids engage HF's bidirectional image-block mask
        (which also bypasses the sliding window); our overlay must
        reproduce it. The image sits at the FRONT so window-4 layers
        would otherwise clip intra-image attention."""
        model, path = tiny_hf(tmp_path)
        rng = np.random.default_rng(1)
        pixels = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        ids_ours = [2, 257, 10, 11, 12, 13, 14, 15]
        ids_hf = [2, 257, 257, 257, 257, 10, 11, 12, 13, 14, 15]
        tt = [1 if t == 257 else 0 for t in ids_hf]
        with torch.no_grad():
            ref = model(
                input_ids=torch.tensor([ids_hf], dtype=torch.long),
                pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)),
                token_type_ids=torch.tensor([tt], dtype=torch.long),
            ).logits.numpy()
        P = len(ids_hf)
        overlay = image_block_overlay(ids_ours, 257, 4, 1, P)
        ours, _cfg = our_forward(path, ids_ours, pixels, overlay)
        np.testing.assert_allclose(
            ours, ref[:, -1, :], rtol=3e-4, atol=3e-4
        )
        # And the overlay must MATTER: without it the logits differ.
        plain, _ = our_forward(path, ids_ours, pixels)
        assert np.abs(plain - ref[:, -1, :]).max() > 1e-4

    def test_rejects_non_gemma3(self, tmp_path):
        (tmp_path / "config.json").write_text('{"model_type": "llava"}')
        with pytest.raises(ValueError, match="model_type"):
            load_hf_gemma3_vlm(str(tmp_path))


class TestOverlay:
    def test_left_padded_placement_and_grouping(self):
        # ids: text, img0 placeholder, text, img1 placeholder (2 tokens
        # each), padded into P=10.
        ids = [5, 90, 6, 90]
        ov = image_block_overlay(ids, 90, 2, 2, 10)[0]
        # Layout (right-aligned): pad*4, 5, i0, i0, 6, i1, i1.
        g = np.full(10, -1)
        g[5:7] = 0
        g[8:10] = 1
        expect = (g[:, None] == g[None, :]) & (g[:, None] >= 0)
        np.testing.assert_array_equal(ov, expect)
        # Different images never see each other via the overlay.
        assert not ov[5, 8] and not ov[8, 5]


class TestGenerator:
    def test_offline_generate_runs(self):
        gen = Gemma3VLMGenerator(seed=0)
        rng = np.random.default_rng(0)
        img = (rng.random((40, 52, 3)) * 255).astype(np.uint8)
        out = gen.generate(
            "describe this", images=[img], max_new_tokens=8,
            temperature=0.0,
        )
        assert isinstance(out, str)
        assert not gen.pretrained

    def test_text_only_generate_runs(self):
        gen = Gemma3VLMGenerator(seed=0)
        out = gen.generate("hello", max_new_tokens=8, temperature=0.0)
        assert isinstance(out, str)

    def test_adapter_dispatches_on_model_type(self, tmp_path):
        """TPUMLLMAdapter picks the Gemma3 generator for gemma3
        checkpoints and llava otherwise."""
        import json

        from multimodal_rag_tpu.models.adapters.tpu_mllm import (
            TPUMLLMAdapter,
        )
        from multimodal_rag_tpu.models.llava import LlavaGenerator

        (tmp_path / "config.json").write_text(
            json.dumps({"model_type": "gemma3"})
        )
        assert (
            TPUMLLMAdapter._generator_class(str(tmp_path))
            is Gemma3VLMGenerator
        )
        (tmp_path / "config.json").write_text(
            json.dumps({"model_type": "llava"})
        )
        assert (
            TPUMLLMAdapter._generator_class(str(tmp_path))
            is LlavaGenerator
        )
        assert TPUMLLMAdapter._generator_class(None) is LlavaGenerator

    def test_loader_roundtrip_through_generator(self, tmp_path):
        _model, path = tiny_hf(tmp_path)
        gen = Gemma3VLMGenerator(checkpoint_path=path)
        assert gen.pretrained
        assert gen.cfg.mm_tokens_per_image == 4
        assert gen.cfg.text.layer_windows == (4, 0)
        rng = np.random.default_rng(2)
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        out = gen.generate(
            "what is this", images=[img], max_new_tokens=4,
            temperature=0.0,
        )
        assert isinstance(out, str)
