"""Golden tests for the HF checkpoint loaders (VERDICT r1 #2).

Each test builds a *tiny randomly-initialized HF model* with torch (cpu),
saves it as safetensors, loads it through our ``load_hf_*`` mapping, and
asserts the JAX forward matches the torch forward of the same weights —
proving the (out,in)→(in,out) transposes, stacking order, and pooling
conventions are right. A wrong transpose produces garbage embeddings that
no other test would catch (the encoder is otherwise exercised with random
init only).

torch + transformers are test-only dependencies (the serving path never
imports them).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RTOL, ATOL = 2e-4, 2e-4


@pytest.fixture(scope="module", autouse=True)
def _offline():
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    torch.manual_seed(0)


# ---------------------------------------------------------------------------
# BERT / MiniLM text encoder
# ---------------------------------------------------------------------------


def _tiny_bert(tmp_path, with_classifier=False):
    from transformers import (
        BertConfig,
        BertForSequenceClassification,
        BertModel,
    )

    cfg = BertConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_act="gelu",
    )
    if with_classifier:
        model = BertForSequenceClassification(
            BertConfig(**{**cfg.to_dict(), "num_labels": 1})
        )
    else:
        model = BertModel(cfg)
    model.eval()
    path = str(tmp_path / "bert")
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def _bert_tiny_cfg():
    from multimodal_rag_tpu.models.minilm import EncoderConfig

    return EncoderConfig(
        vocab_size=100, hidden_dim=32, num_layers=2, num_heads=4, ff_dim=64,
        max_position=64, compute_dtype=jnp.float32, fused_attention=False,
        # HF BERT uses exact-erf GELU; pin it so the golden comparison
        # proves the weight mapping, not the activation approximation.
        gelu="exact",
    )


class TestBertLoader:
    def test_forward_matches_hf(self, tmp_path):
        from multimodal_rag_tpu.models.minilm import (
            encoder_forward,
            load_hf_bert_params,
        )

        model, path = _tiny_bert(tmp_path)
        cfg = _bert_tiny_cfg()
        params = load_hf_bert_params(path, cfg)

        rng = np.random.default_rng(1)
        ids = rng.integers(1, 100, (2, 9)).astype(np.int64)
        mask = np.ones((2, 9), np.int64)
        mask[1, 6:] = 0  # padded row

        with torch.no_grad():
            ref = model(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).last_hidden_state.numpy()
        ours = np.asarray(
            encoder_forward(
                params, jnp.asarray(ids, jnp.uint32),
                jnp.asarray(mask, jnp.int32), cfg,
            )
        )
        # Compare real (non-pad) positions; pads attend identically but
        # HF may skip computing them in some versions.
        np.testing.assert_allclose(
            ours[0], ref[0], rtol=RTOL, atol=ATOL
        )
        np.testing.assert_allclose(
            ours[1, :6], ref[1, :6], rtol=RTOL, atol=ATOL
        )

    def test_embed_is_meanpool_l2(self, tmp_path):
        from multimodal_rag_tpu.models.minilm import (
            embed,
            load_hf_bert_params,
        )

        model, path = _tiny_bert(tmp_path)
        cfg = _bert_tiny_cfg()
        params = load_hf_bert_params(path, cfg)
        rng = np.random.default_rng(2)
        ids = rng.integers(1, 100, (1, 7)).astype(np.int64)
        mask = np.ones((1, 7), np.int64)
        with torch.no_grad():
            hid = model(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).last_hidden_state.numpy()
        pooled = hid.mean(axis=1)
        want = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)
        got = np.asarray(
            embed(params, jnp.asarray(ids, jnp.uint32),
                  jnp.asarray(mask, jnp.int32), cfg)
        )
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(
            np.linalg.norm(got, axis=-1), 1.0, atol=1e-5
        )

    def test_transposes_and_stacking(self, tmp_path):
        """The (out,in)→(in,out) transpose and the per-layer stacking order
        checked directly against the torch modules."""
        from multimodal_rag_tpu.models.minilm import load_hf_bert_params

        model, path = _tiny_bert(tmp_path)
        cfg = _bert_tiny_cfg()
        params = load_hf_bert_params(path, cfg)
        for i, layer in enumerate(model.encoder.layer):
            np.testing.assert_array_equal(
                np.asarray(params["layers"]["wq"][i]),
                layer.attention.self.query.weight.detach().numpy().T,
            )
            np.testing.assert_array_equal(
                np.asarray(params["layers"]["w2"][i]),
                layer.output.dense.weight.detach().numpy().T,
            )
            np.testing.assert_array_equal(
                np.asarray(params["layers"]["ln2_scale"][i]),
                layer.output.LayerNorm.weight.detach().numpy(),
            )
        np.testing.assert_array_equal(
            np.asarray(params["embed"]["word"]),
            model.embeddings.word_embeddings.weight.detach().numpy(),
        )


class TestCrossEncoderLoader:
    def test_logits_match_hf(self, tmp_path):
        from multimodal_rag_tpu.models.cross_encoder import (
            load_hf_cross_encoder,
            score_pairs,
        )

        model, path = _tiny_bert(tmp_path, with_classifier=True)
        cfg = _bert_tiny_cfg()
        params = load_hf_cross_encoder(path, cfg)
        rng = np.random.default_rng(3)
        ids = rng.integers(1, 100, (3, 10)).astype(np.int64)
        mask = np.ones((3, 10), np.int64)
        with torch.no_grad():
            # BertForSequenceClassification pools via tanh(dense(CLS)) —
            # the ms-marco cross-encoder contract our score_pairs mirrors
            # is classifier(CLS) directly, so compare against that:
            hid = model.bert(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).last_hidden_state
            ref = model.classifier(hid[:, 0]).numpy()[:, 0]
        got = np.asarray(
            score_pairs(params, jnp.asarray(ids, jnp.uint32),
                        jnp.asarray(mask, jnp.int32), cfg)
        )
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# CLIP dual towers
# ---------------------------------------------------------------------------


def _tiny_clip(tmp_path):
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config={
            "vocab_size": 99,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "max_position_embeddings": 16,
            # Real openai CLIP checkpoints use the legacy eos==2 argmax
            # pooling path (the convention encode_text mirrors); give the
            # tiny model an in-vocab eos and place it at the argmax so
            # both conventions pool the same position.
            "eos_token_id": 98,
        },
        vision_config={
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 96,
            "image_size": 16,
            "patch_size": 8,
        },
        projection_dim=24,
    )
    model = CLIPModel(cfg)
    model.eval()
    path = str(tmp_path / "clip")
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def _clip_tiny_cfg():
    from multimodal_rag_tpu.models.clip import CLIPConfig

    return CLIPConfig(
        vocab_size=99, text_width=32, text_layers=2, text_heads=4,
        context_length=16, image_size=16, patch_size=8, vision_width=48,
        vision_layers=2, vision_heads=4, embed_dim=24,
        compute_dtype=jnp.float32, fused_attention=False,
    )


class TestClipLoader:
    def test_text_features_match_hf(self, tmp_path):
        from multimodal_rag_tpu.models.clip import (
            encode_text,
            load_hf_clip_params,
        )

        model, path = _tiny_clip(tmp_path)
        cfg = _clip_tiny_cfg()
        params = load_hf_clip_params(path, cfg)
        rng = np.random.default_rng(4)
        # ids ascending so argmax == last position (EOT pooling convention)
        ids = np.sort(rng.integers(0, 98, (2, 16)), axis=1).astype(np.int64)
        ids[:, -1] = 98
        with torch.no_grad():
            ref = model.get_text_features(
                input_ids=torch.tensor(ids)
            ).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got = np.asarray(encode_text(params, jnp.asarray(ids), cfg))
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)

    def test_image_features_match_hf(self, tmp_path):
        from multimodal_rag_tpu.models.clip import (
            encode_image,
            load_hf_clip_params,
        )

        model, path = _tiny_clip(tmp_path)
        cfg = _clip_tiny_cfg()
        params = load_hf_clip_params(path, cfg)
        rng = np.random.default_rng(5)
        pixels = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            ref = model.get_image_features(
                pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
            ).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got = np.asarray(encode_image(params, jnp.asarray(pixels), cfg))
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# SigLIP dual towers
# ---------------------------------------------------------------------------


def _tiny_siglip(tmp_path):
    from transformers import SiglipConfig, SiglipModel

    cfg = SiglipConfig(
        text_config={
            "vocab_size": 99,
            # SigLIP towers share the joint width (no vision projection —
            # MAP-pooled output IS the embedding), so text width = 48 too.
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 96,
            "max_position_embeddings": 16,
        },
        vision_config={
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 96,
            "image_size": 16,
            "patch_size": 8,
        },
    )
    model = SiglipModel(cfg)
    model.eval()
    path = str(tmp_path / "siglip")
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def _siglip_tiny_cfg():
    from multimodal_rag_tpu.models.siglip import SigLIPConfig

    return SigLIPConfig(
        vocab_size=99, text_width=48, text_layers=2, text_heads=4,
        context_length=16, image_size=16, patch_size=8, vision_width=48,
        vision_layers=2, vision_heads=4, embed_dim=48,
        compute_dtype=jnp.float32, fused_attention=False,
    )


class TestSiglipLoader:
    def test_text_features_match_hf(self, tmp_path):
        from multimodal_rag_tpu.models.siglip import (
            encode_text,
            load_hf_siglip_params,
        )

        model, path = _tiny_siglip(tmp_path)
        cfg = _siglip_tiny_cfg()
        params = load_hf_siglip_params(path, cfg)
        rng = np.random.default_rng(6)
        ids = rng.integers(0, 98, (2, 16)).astype(np.int64)
        with torch.no_grad():
            ref = model.get_text_features(
                input_ids=torch.tensor(ids)
            ).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got = np.asarray(encode_text(params, jnp.asarray(ids), cfg))
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)

    def test_image_features_match_hf(self, tmp_path):
        from multimodal_rag_tpu.models.siglip import (
            encode_image,
            load_hf_siglip_params,
        )

        model, path = _tiny_siglip(tmp_path)
        cfg = _siglip_tiny_cfg()
        params = load_hf_siglip_params(path, cfg)
        rng = np.random.default_rng(7)
        pixels = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            ref = model.get_image_features(
                pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
            ).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got = np.asarray(encode_image(params, jnp.asarray(pixels), cfg))
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# Serving wiring (ADVICE r1: checkpoints must be reachable from the server)
# ---------------------------------------------------------------------------


class TestServingWiring:
    def test_text_encoder_loads_checkpoint_path(self, tmp_path):
        from multimodal_rag_tpu.models.minilm import TextEncoder

        model, path = _tiny_bert(tmp_path)
        cfg = _bert_tiny_cfg()
        enc = TextEncoder(cfg=cfg, checkpoint_path=path)
        assert enc.pretrained
        np.testing.assert_array_equal(
            np.asarray(enc.params["embed"]["word"]),
            model.embeddings.word_embeddings.weight.detach().numpy(),
        )

    def test_text_encoder_random_init_flagged(self):
        from multimodal_rag_tpu.models.minilm import TextEncoder

        enc = TextEncoder(cfg=_bert_tiny_cfg())
        assert not enc.pretrained

    def test_untrained_reranker_is_passthrough(self):
        from multimodal_rag_tpu.models.cross_encoder import (
            CrossEncoderReranker,
        )
        from multimodal_rag_tpu.models.tokenizer import HashingTokenizer

        rr = CrossEncoderReranker(
            cfg=_bert_tiny_cfg(), tokenizer=HashingTokenizer(vocab_size=100),
            seq_buckets=(32,), batch_buckets=(4,),
        )
        assert not rr.trained
        results = {
            "ids": ["a", "b"],
            "documents": ["passage one", "passage two"],
            "distances": [0.1, 0.2],
            "metadatas": [None, None],
        }
        assert rr.rerank("q", results) == results  # placeholder semantics

    def test_trained_reranker_reorders(self, tmp_path):
        from multimodal_rag_tpu.models.cross_encoder import (
            CrossEncoderReranker,
        )
        from multimodal_rag_tpu.models.tokenizer import HashingTokenizer

        _, path = _tiny_bert(tmp_path, with_classifier=True)
        rr = CrossEncoderReranker(
            cfg=_bert_tiny_cfg(), tokenizer=HashingTokenizer(vocab_size=100),
            seq_buckets=(32,), batch_buckets=(4,), checkpoint_path=path,
        )
        assert rr.trained
        results = {
            "ids": ["a", "b"],
            "documents": ["passage one", "passage two"],
            "distances": [0.1, 0.2],
            "metadatas": [None, None],
        }
        out = rr.rerank("q", results)
        assert "rerank_scores" in out
