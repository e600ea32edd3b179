"""Training step + checkpoint/resume tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.minilm import EncoderConfig, init_params
from multimodal_rag_tpu.training import (
    TrainState,
    info_nce_loss,
    init_train_state,
    load_checkpoint,
    make_optimizer,
    make_sharded_train_step,
    save_checkpoint,
    shard_train_inputs,
    train_step,
)

TINY = EncoderConfig(
    vocab_size=512, hidden_dim=64, num_layers=2, num_heads=4, ff_dim=128,
    max_position=64, compute_dtype=jnp.float32,
)


def make_batch(B=8, S=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ids_a": jnp.asarray(rng.integers(103, 512, (B, S)), jnp.uint32),
        "mask_a": jnp.ones((B, S), jnp.int32),
        "ids_b": jnp.asarray(rng.integers(103, 512, (B, S)), jnp.uint32),
        "mask_b": jnp.ones((B, S), jnp.int32),
    }


class TestTrainStep:
    def test_loss_finite_and_decreases(self):
        params = init_params(jax.random.key(0), TINY)
        optimizer = make_optimizer(lr=1e-3, warmup=1)
        state = init_train_state(params, optimizer)
        batch = make_batch()
        losses = []
        for _ in range(5):
            state, loss = train_step(state, batch, optimizer, TINY)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # overfits a fixed batch
        assert int(state.step) == 5

    def test_identical_pairs_beat_random(self):
        """Loss on (x, x) pairs is below loss on mismatched pairs."""
        params = init_params(jax.random.key(0), TINY)
        batch = make_batch(seed=1)
        matched = dict(batch, ids_b=batch["ids_a"], mask_b=batch["mask_a"])
        l_matched = float(info_nce_loss(params, matched, TINY))
        l_random = float(info_nce_loss(params, batch, TINY))
        assert l_matched < l_random

    def test_sharded_step_on_mesh(self):
        from multimodal_rag_tpu.parallel.sharding import get_mesh

        mesh = get_mesh(8)
        params = init_params(jax.random.key(0), TINY)
        optimizer = make_optimizer(warmup=1)
        state = init_train_state(params, optimizer)
        batch = make_batch(B=16)
        state, batch = shard_train_inputs(mesh, state, batch)
        step = make_sharded_train_step(optimizer, TINY)
        state, loss = step(state, batch)
        assert np.isfinite(float(loss))

    def test_dp_matches_single_device(self):
        """The DP-sharded step must produce the same loss as unsharded."""
        from multimodal_rag_tpu.parallel.sharding import get_mesh

        params = init_params(jax.random.key(1), TINY)
        optimizer = make_optimizer(warmup=1)
        batch = make_batch(B=16, seed=2)

        s0 = init_train_state(params, optimizer)
        _, loss_single = train_step(s0, batch, optimizer, TINY)

        mesh = get_mesh(8)
        s1 = init_train_state(params, optimizer)
        s1, sharded_batch = shard_train_inputs(mesh, s1, batch)
        step = make_sharded_train_step(optimizer, TINY)
        _, loss_dp = step(s1, sharded_batch)
        np.testing.assert_allclose(
            float(loss_single), float(loss_dp), rtol=1e-5
        )


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        params = init_params(jax.random.key(0), TINY)
        optimizer = make_optimizer(warmup=1)
        state = init_train_state(params, optimizer)
        batch = make_batch()
        state, _ = train_step(state, batch, optimizer, TINY)
        state, _ = train_step(state, batch, optimizer, TINY)
        save_checkpoint(str(tmp_path), state)

        template = init_train_state(
            init_params(jax.random.key(9), TINY), optimizer
        )
        restored = load_checkpoint(str(tmp_path), template)
        assert int(restored.step) == 2
        np.testing.assert_allclose(
            np.asarray(restored.params["layers"]["wq"]),
            np.asarray(state.params["layers"]["wq"]),
        )
        # resumed training continues bit-compatibly
        a, la = train_step(state, batch, optimizer, TINY)
        b, lb = train_step(restored, batch, optimizer, TINY)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)


class TestSigLIPTraining:
    def test_siglip_train_step_decreases_loss(self):
        import dataclasses

        import numpy as np
        import jax
        import jax.numpy as jnp

        from multimodal_rag_tpu.models import siglip as sg
        from multimodal_rag_tpu.training import (
            init_train_state,
            make_optimizer,
            make_sharded_siglip_train_step,
        )

        cfg = sg.SigLIPConfig(
            vocab_size=256, text_width=32, text_layers=1, text_heads=2,
            context_length=8, image_size=32, patch_size=16, vision_width=32,
            vision_layers=1, vision_heads=2, embed_dim=32,
            compute_dtype=jnp.float32,
        )
        params = sg.init_params(jax.random.key(0), cfg)
        opt = make_optimizer(lr=1e-3, warmup=1)
        state = init_train_state(params, opt)
        rng = np.random.default_rng(0)
        batch = {
            "pixels": jnp.asarray(
                rng.normal(size=(4, 32, 32, 3)), jnp.float32
            ),
            "ids": jnp.asarray(
                rng.integers(1, 256, (4, 8)), jnp.uint32
            ),
        }
        step = make_sharded_siglip_train_step(opt, cfg)
        losses = []
        for _ in range(8):
            state, loss = step(state, batch)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_logit_calibration_updates(self):
        import dataclasses

        import numpy as np
        import jax
        import jax.numpy as jnp

        from multimodal_rag_tpu.models import siglip as sg
        from multimodal_rag_tpu.training import (
            init_train_state,
            make_optimizer,
            siglip_train_step,
        )

        cfg = sg.SigLIPConfig(
            vocab_size=128, text_width=32, text_layers=1, text_heads=2,
            context_length=8, image_size=32, patch_size=16, vision_width=32,
            vision_layers=1, vision_heads=2, embed_dim=32,
            compute_dtype=jnp.float32,
        )
        params = sg.init_params(jax.random.key(1), cfg)
        opt = make_optimizer(lr=1e-3, warmup=1)
        state = init_train_state(params, opt)
        rng = np.random.default_rng(1)
        batch = {
            "pixels": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
            "ids": jnp.asarray(rng.integers(1, 128, (2, 8)), jnp.uint32),
        }
        before = float(state.params["logit_bias"])
        # Two steps: the warmup schedule makes the first step's LR zero.
        state, _ = siglip_train_step(state, batch, opt, cfg)
        state, _ = siglip_train_step(state, batch, opt, cfg)
        assert float(state.params["logit_bias"]) != before
