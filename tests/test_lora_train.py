"""On-TPU LoRA finetuning (models/lora_train.py): zero-init equivalence,
loss descent, frozen base, and exact PEFT round-trip through BOTH
models/lora.merge_lora and the runtime side-path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    causal_lm_logits,
    init_params,
    prefill,
)
from multimodal_rag_tpu.models.lora import merge_lora
from multimodal_rag_tpu.models.lora_train import (
    batch_texts,
    init_lora_params,
    insert_lora,
    lm_loss,
    make_lora_optimizer,
    make_lora_train_step,
    save_peft_adapter,
)
from multimodal_rag_tpu.models.tokenizer import ByteTokenizer

TINY = DecoderConfig(
    vocab_size=512,
    hidden_dim=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    ff_dim=64,
    max_position=256,
    compute_dtype=jnp.float32,
)


def _base():
    return init_params(jax.random.key(0), TINY)


def _batch(seq=32, bs=2):
    tok = ByteTokenizer()
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
    ]
    return batch_texts(tok, texts, seq, bs)[0]


class TestForward:
    def test_zero_init_is_base_model(self):
        params = _base()
        lora = init_lora_params(jax.random.key(1), params, r=4)
        ids, mask = _batch()
        base_logits = causal_lm_logits(
            params, jnp.asarray(ids), jnp.asarray(mask), TINY
        )
        lora_logits = causal_lm_logits(
            insert_lora(params, lora), jnp.asarray(ids),
            jnp.asarray(mask), TINY,
        )
        np.testing.assert_allclose(
            np.asarray(lora_logits), np.asarray(base_logits),
            rtol=1e-6, atol=1e-6,
        )

    def test_causal_lm_logits_matches_prefill_last(self):
        """The training forward's last real position must equal the
        serving prefill's next-token logits."""
        params = _base()
        ids, mask = _batch()
        full = causal_lm_logits(
            params, jnp.asarray(ids), jnp.asarray(mask), TINY
        )
        n0 = int(mask[0].sum())
        # serving prefill is LEFT-padded; row 0 un-padded here
        pl, _ = prefill(
            params, jnp.asarray(ids[:1, :n0]),
            jnp.asarray(mask[:1, :n0]), TINY, n0 + 1,
        )
        np.testing.assert_allclose(
            np.asarray(full[0, n0 - 1]), np.asarray(pl[0]),
            rtol=1e-4, atol=1e-4,
        )


class TestTraining:
    def test_loss_descends_and_base_frozen(self):
        params = _base()
        lora = init_lora_params(jax.random.key(1), params, r=4)
        opt = make_lora_optimizer(lr=1e-2)
        step = make_lora_train_step(TINY, opt)
        state = opt.init(lora)
        ids, mask = _batch()
        before = float(lm_loss(lora, params, jnp.asarray(ids),
                               jnp.asarray(mask), TINY))
        losses = []
        for _ in range(20):
            lora, state, loss = step(
                params, lora, state, jnp.asarray(ids), jnp.asarray(mask)
            )
            losses.append(float(loss))
        # Rank-4 pairs on a random-init base won't memorize in 20 steps;
        # a clear monotone-ish drop is the contract.
        assert losses[-1] < before - 0.15, (before, losses)
        # B leaves moved off zero; the base tree was never touched.
        assert float(
            jnp.abs(lora["lora_B_wq"]).max()
        ) > 0.0
        np.testing.assert_array_equal(
            np.asarray(params["layers"]["wq"]),
            np.asarray(_base()["layers"]["wq"]),
        )

    def test_peft_round_trip_exact(self, tmp_path):
        """save_peft_adapter -> merge_lora must reproduce the runtime
        side-path's logits — the exported adapter IS the trained model."""
        params = _base()
        lora = init_lora_params(jax.random.key(1), params, r=4)
        opt = make_lora_optimizer(lr=5e-3)
        step = make_lora_train_step(TINY, opt)
        state = opt.init(lora)
        ids, mask = _batch()
        for _ in range(5):
            lora, state, _loss = step(
                params, lora, state, jnp.asarray(ids), jnp.asarray(mask)
            )
        runtime = causal_lm_logits(
            insert_lora(params, lora), jnp.asarray(ids),
            jnp.asarray(mask), TINY,
        )
        path = save_peft_adapter(lora, str(tmp_path / "out"), r=4,
                                 alpha=4.0)
        merged = merge_lora(_base(), TINY, path)
        merged_logits = causal_lm_logits(
            merged, jnp.asarray(ids), jnp.asarray(mask), TINY
        )
        np.testing.assert_allclose(
            np.asarray(merged_logits), np.asarray(runtime),
            rtol=2e-4, atol=2e-4,
        )

    def test_quantized_base_composes(self):
        """QLoRA-style: int8 base + f32 LoRA side-path trains (the
        side-path hook lives on both _qmatmul branches)."""
        from multimodal_rag_tpu.models.decoder import (
            quantize_decoder_params,
        )

        params = quantize_decoder_params(_base())
        lora = init_lora_params(
            jax.random.key(1), _base(), r=4, targets=("wq", "w_up")
        )
        ids, mask = _batch()
        opt = make_lora_optimizer(lr=5e-3)
        step = make_lora_train_step(TINY, opt)
        state = opt.init(lora)
        l0 = None
        for _ in range(8):
            lora, state, loss = step(
                params, lora, state, jnp.asarray(ids), jnp.asarray(mask)
            )
            l0 = l0 if l0 is not None else float(loss)
        assert float(loss) < l0


class TestHelpers:
    def test_batch_texts_shapes_and_padding(self):
        tok = ByteTokenizer()
        batches = batch_texts(tok, ["ab", "a much longer line"], 8, 2)
        assert len(batches) == 1
        ids, mask = batches[0]
        assert ids.shape == (2, 8) and mask.shape == (2, 8)
        assert mask[0].sum() == 3  # BOS + 2 bytes
        assert mask[1].sum() == 8  # truncated at seq_len

    def test_no_matching_targets_raises(self):
        params = _base()
        with pytest.raises(ValueError, match="no LoRA targets"):
            init_lora_params(jax.random.key(0), params,
                             targets=("nonexistent",))
