"""CLIP dual-encoder tests (tiny config on CPU)."""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.clip import (
    CLIP_B32,
    CLIPConfig,
    CLIPEncoder,
    CLIPTokenizer,
    EOT,
    SOT,
    encode_image,
    encode_text,
    init_params,
    preprocess_image,
)

TINY = CLIPConfig(
    vocab_size=1024, text_width=64, text_layers=2, text_heads=4,
    context_length=16, image_size=64, patch_size=16, vision_width=64,
    vision_layers=2, vision_heads=4, embed_dim=32,
    compute_dtype=jnp.float32,
)


def make_image(seed=0, size=(80, 60)):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8), "RGB"
    )


class TestTokenizer:
    def test_framing(self):
        tok = CLIPTokenizer(TINY)
        ids = tok.encode_batch(["hello world"], 16)
        assert ids[0, 0] == SOT
        row = ids[0]
        eot_pos = int(np.argmax(row))
        assert row[eot_pos] == EOT
        assert (row[eot_pos + 1 :] == 0).all()

    def test_truncation(self):
        tok = CLIPTokenizer(TINY)
        ids = tok.encode_batch(["word " * 50], 16)
        assert int(ids[0].argmax()) == 15  # EOT at last position


class TestTowers:
    @pytest.fixture(scope="class")
    def params(self):
        return init_params(jax.random.key(0), TINY)

    def test_text_shapes_norm(self, params):
        tok = CLIPTokenizer(TINY)
        ids = jnp.asarray(tok.encode_batch(["a cat", "a dog on grass"], 16))
        out = encode_text(params, ids, TINY)
        assert out.shape == (2, 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5
        )

    def test_image_shapes_norm(self, params):
        pixels = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
            jnp.float32,
        )
        out = encode_image(params, pixels, TINY)
        assert out.shape == (2, 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5
        )

    def test_causal_mask(self, params):
        """Changing tokens after EOT must not change the embedding; the
        pooled position only sees the prefix (causal)."""
        tok = CLIPTokenizer(TINY)
        ids = tok.encode_batch(["short text"], 16)
        out1 = np.asarray(encode_text(params, jnp.asarray(ids), TINY))
        ids2 = ids.copy()
        eot_pos = int(ids[0].argmax())
        ids2[0, eot_pos + 1 :] = 7  # garbage after EOT (and after pooling)
        out2 = np.asarray(encode_text(params, jnp.asarray(ids2), TINY))
        np.testing.assert_allclose(out1, out2, atol=1e-5)

    def test_batch_independence(self, params):
        pixels = jnp.asarray(
            np.random.default_rng(1).standard_normal((3, 64, 64, 3)),
            jnp.float32,
        )
        full = np.asarray(encode_image(params, pixels, TINY))
        solo = np.asarray(encode_image(params, pixels[1:2], TINY))
        np.testing.assert_allclose(full[1], solo[0], atol=1e-5)


class TestPreprocess:
    def test_resize_crop_shape(self):
        arr = preprocess_image(make_image(), image_size=64)
        assert arr.shape == (64, 64, 3)
        assert arr.dtype == np.float32

    def test_bytes_input(self):
        buf = io.BytesIO()
        make_image().save(buf, "PNG")
        arr = preprocess_image(buf.getvalue(), image_size=64)
        assert arr.shape == (64, 64, 3)


class TestEncoder:
    def test_cross_modal_roundtrip(self):
        enc = CLIPEncoder(cfg=TINY)
        tvecs = enc.encode_texts(["a photo of a cat", "a diagram"])
        ivecs = enc.encode_images([make_image(1), make_image(2)])
        assert tvecs.shape == (2, 32)
        assert ivecs.shape == (2, 32)
        sims = tvecs @ ivecs.T  # finite, bounded — shared space
        assert np.isfinite(sims).all()
        assert (np.abs(sims) <= 1.01).all()

    def test_empty(self):
        enc = CLIPEncoder(cfg=TINY)
        assert enc.encode_texts([]).shape == (0, 32)
        assert enc.encode_images([]).shape == (0, 32)

    def test_default_config(self):
        assert CLIP_B32.embed_dim == 512
        assert CLIP_B32.n_patches == 49


class TestPaddedFusedAttention:
    """The S-padding wrapper that routes CLIP's unaligned towers (S=77/50)
    onto the VMEM kernel must be a numerical no-op: pad keys are masked,
    pad query rows sliced off."""

    def test_pad_mask_slice_is_identity(self, monkeypatch):
        import numpy as np

        import jax.numpy as jnp

        from multimodal_rag_tpu.ops import fused_attention as fa

        B, S, H, nh = 8, 77, 64, 4
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B * S, H)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B * S, H)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B * S, H)), jnp.float32)
        key_bias = jnp.zeros((B, S), jnp.float32)
        causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)
        sm = float(1.0 / np.sqrt(H // nh))

        # Route the inner kernel through the XLA formula so the wrapper's
        # pad/mask/slice logic is exercised hermetically on CPU.
        monkeypatch.setattr(
            fa, "fused_attention_ad",
            lambda q_, k_, v_, kb_, sm_, nh_, S_, pb_=None: fa.attention_xla(
                q_, k_, v_, kb_, sm_, nh_, S_, pb_
            ),
        )
        padded = fa.fused_attention_padded(
            q, k, v, key_bias, sm, nh, S, causal
        )
        direct = fa.attention_xla(q, k, v, key_bias, sm, nh, S, causal)
        np.testing.assert_allclose(
            np.asarray(padded), np.asarray(direct), atol=1e-5, rtol=1e-5
        )

    def test_supported_covers_clip_shapes(self, monkeypatch):
        import jax

        from multimodal_rag_tpu.ops import fused_attention as fa

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        # CLIP causal text (unaligned + pos_bias): qualifies
        assert fa.fused_attention_supported_padded(8, 77, 64, True)
        # CLIP mask-free vision (unaligned, no bias): measured slower fused
        assert not fa.fused_attention_supported_padded(8, 50, 64, False)
        # aligned shapes always qualify (SigLIP text S=64, MiniLM S=128)
        assert fa.fused_attention_supported_padded(8, 64, 64, False)
        assert fa.fused_attention_supported_padded(8, 128, 32, False)
        # SigLIP vision S=196 is unaligned and mask-free: stays on XLA
        assert not fa.fused_attention_supported_padded(8, 196, 64, False)
        assert not fa.fused_attention_supported_padded(7, 77, 64, True)
        assert not fa.fused_attention_supported_padded(8, 400, 64, True)
