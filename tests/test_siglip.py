"""SigLIP dual-encoder tests (tiny config on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.siglip import (
    SIGLIP_B16,
    SigLIPConfig,
    SigLIPEncoder,
    SigLIPTokenizer,
    encode_image,
    encode_text,
    init_params,
    siglip_pair_loss,
)

TINY = SigLIPConfig(
    vocab_size=1024, text_width=48, text_layers=2, text_heads=4,
    context_length=16, image_size=64, patch_size=16, vision_width=64,
    vision_layers=2, vision_heads=4, embed_dim=64,
    compute_dtype=jnp.float32,
)


def make_image(seed=0, size=(80, 60)):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8), "RGB"
    )


class TestTokenizer:
    def test_right_aligned_eos(self):
        tok = SigLIPTokenizer(TINY)
        ids = tok.encode_batch(["hello world"], 16)
        assert ids[0, -1] == TINY.vocab_size - 1  # EOS pooled at last pos
        assert ids[0, 0] == 0  # left padding

    def test_truncation(self):
        tok = SigLIPTokenizer(TINY)
        ids = tok.encode_batch(["word " * 50], 16)
        assert ids.shape == (1, 16)
        assert ids[0, -1] == TINY.vocab_size - 1
        assert (ids[0] != 0).all()  # fully used


class TestTowers:
    @pytest.fixture(scope="class")
    def params(self):
        return init_params(jax.random.key(0), TINY)

    def test_text_unit_norm(self, params):
        tok = SigLIPTokenizer(TINY)
        ids = jnp.asarray(tok.encode_batch(["a", "b c d", "xyz"], 16))
        z = encode_text(params, ids, TINY)
        assert z.shape == (3, TINY.embed_dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-5
        )

    def test_image_unit_norm(self, params):
        pixels = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
            jnp.float32,
        )
        z = encode_image(params, pixels, TINY)
        assert z.shape == (2, TINY.embed_dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-5
        )

    def test_deterministic(self, params):
        pixels = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.25
        z1 = np.asarray(encode_image(params, pixels, TINY))
        z2 = np.asarray(encode_image(params, pixels, TINY))
        np.testing.assert_array_equal(z1, z2)

    def test_no_causal_mask(self, params):
        """Bidirectional text: changing an early token must affect the
        pooled (last-position) embedding even when the last token is
        unchanged — a causal-masked tower would too, but a *reversed*
        check pins directionality: changing the LAST input token changes
        everything; changing the FIRST also does (bidirectional flow)."""
        tok = SigLIPTokenizer(TINY)
        base = tok.encode_batch(["alpha beta gamma delta"], 16)
        mod = base.copy()
        first_real = int(np.argmax(mod[0] != 0))
        mod[0, first_real] = (mod[0, first_real] + 7) % (TINY.vocab_size - 2) + 1
        z0 = np.asarray(encode_text(params, jnp.asarray(base), TINY))
        z1 = np.asarray(encode_text(params, jnp.asarray(mod), TINY))
        assert np.abs(z0 - z1).max() > 1e-6


class TestLoss:
    def test_pair_loss_prefers_matched(self):
        rng = np.random.default_rng(0)
        z = rng.normal(size=(4, 8))
        z /= np.linalg.norm(z, axis=-1, keepdims=True)
        zi = jnp.asarray(z, jnp.float32)
        scale = jnp.asarray(np.log(10.0), jnp.float32)
        bias = jnp.asarray(-10.0, jnp.float32)
        aligned = float(siglip_pair_loss(zi, zi, scale, bias))
        shuffled = float(siglip_pair_loss(zi, zi[::-1], scale, bias))
        assert aligned < shuffled

    def test_gradients_flow_to_calibration(self):
        z = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 8)), jnp.float32
        )

        def loss(scale, bias):
            return siglip_pair_loss(z, z, scale, bias)

        gs, gb = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(2.3, jnp.float32), jnp.asarray(-10.0, jnp.float32)
        )
        assert np.isfinite(float(gs)) and np.isfinite(float(gb))
        assert float(gs) != 0.0 and float(gb) != 0.0


class TestEncoder:
    def test_cross_modal_shapes_share_space(self):
        enc = SigLIPEncoder(cfg=TINY)
        zt = enc.encode_texts(["a diagram of a machine", "a red square"])
        zi = enc.encode_images([make_image(0), make_image(1)])
        assert zt.shape == zi.shape == (2, TINY.embed_dim)
        sims = zt @ zi.T
        assert np.isfinite(sims).all()

    def test_empty_inputs(self):
        enc = SigLIPEncoder(cfg=TINY)
        assert enc.encode_texts([]).shape == (0, TINY.embed_dim)
        assert enc.encode_images([]).shape == (0, TINY.embed_dim)

    def test_device_prep_matches_host_prep_roughly(self):
        from PIL import Image

        enc = SigLIPEncoder(cfg=TINY)
        # Smooth gradient image: the two resize pipelines (staged
        # nearest+cubic on device vs PIL bicubic on host) agree closely on
        # smooth content; random noise would amplify kernel differences
        # through the untrained network.
        yy, xx = np.mgrid[0:96, 0:128]
        arr = np.stack(
            [xx * 2 % 256, yy * 2 % 256, (xx + yy) % 256], axis=-1
        ).astype(np.uint8)
        img = Image.fromarray(arr, "RGB")
        z_dev = enc.encode_images([img], device_prep=True)
        z_host = enc.encode_images([img], device_prep=False)
        cos = float(z_dev[0] @ z_host[0])
        assert cos > 0.9


class TestDefaults:
    def test_b16_config_shapes(self):
        cfg = SIGLIP_B16
        assert cfg.n_patches == 196
        assert cfg.embed_dim == 768
        p = init_params(jax.random.key(0), TINY)
        assert float(p["logit_bias"]) == -10.0
        np.testing.assert_allclose(float(p["logit_scale"]), np.log(10.0))
