"""Encoder training: in-batch contrastive (InfoNCE) fine-tuning.

The reference has no training path at all (models are consumed via HTTP or
sentence-transformers inference, SURVEY.md §2.4); the TPU framework makes
encoder fine-tuning a first-class capability: retrieval quality on a private
corpus comes from contrastively tuning the embedding tower on (query,
passage) pairs — the standard sentence-transformers MultipleNegativesRanking
objective, implemented here as a pure-JAX step designed for ``pjit``:

* batch sharded over the mesh ``data`` axis (DP); params/optimizer state
  replicated — XLA inserts the gradient ``psum`` automatically from the
  sharding annotations;
* the in-batch similarity matrix needs *global* batch negatives, so the
  loss all-gathers the (tiny) pooled embeddings rather than the activations;
  with jit-over-sharded-inputs XLA derives exactly that collective;
* bf16 forward, f32 loss/grads/optimizer (optax adamw).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from multimodal_rag_tpu.models.minilm import EncoderConfig, MINILM_L6, embed


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(
    lr: float = 2e-5, weight_decay: float = 0.01, warmup: int = 100
) -> optax.GradientTransformation:
    schedule = optax.linear_schedule(0.0, lr, warmup)
    return optax.adamw(schedule, weight_decay=weight_decay)


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def info_nce_loss(
    params,
    batch: Dict[str, jax.Array],
    cfg: EncoderConfig = MINILM_L6,
    temperature: float = 0.05,
) -> jax.Array:
    """Symmetric in-batch contrastive loss over (anchor, positive) pairs.

    batch: ids_a/mask_a (queries), ids_b/mask_b (positive passages);
    every other row in the batch is a negative.
    """
    za = embed(params, batch["ids_a"], batch["mask_a"], cfg)  # (B, H) f32
    zb = embed(params, batch["ids_b"], batch["mask_b"], cfg)
    logits = (za @ zb.T) / temperature
    labels = jnp.arange(logits.shape[0])
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_b = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_a + loss_b) * 0.5


def train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    optimizer: optax.GradientTransformation,
    cfg: EncoderConfig = MINILM_L6,
) -> Tuple[TrainState, jax.Array]:
    """One optimizer step. Pure; shard via jit in/out shardings (see
    ``make_sharded_train_step``)."""
    loss, grads = jax.value_and_grad(info_nce_loss)(state.params, batch, cfg)
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


# ---------------------------------------------------------------------------
# Dual-encoder (image-text) fine-tuning with the SigLIP sigmoid objective
# ---------------------------------------------------------------------------


def siglip_loss(
    params,
    batch: Dict[str, jax.Array],
    cfg=None,
) -> jax.Array:
    """Pairwise sigmoid loss over (image, caption) pairs
    (``models.siglip.siglip_pair_loss``). batch: pixels (B, H, W, 3) f32,
    ids (B, context) — matched row-wise. Unlike InfoNCE there is no
    batch-global softmax: with a DP-sharded batch each device can score
    its local block independently (the SigLIP paper's "chunked" property);
    under jit-over-sharded-inputs XLA still derives the all-gather of the
    (tiny) pooled embeddings for the full (B, B) score matrix."""
    from multimodal_rag_tpu.models import siglip as sg

    cfg = cfg or sg.SIGLIP_B16
    z_img = sg.encode_image(params, batch["pixels"], cfg)
    z_txt = sg.encode_text(params, batch["ids"], cfg)
    return sg.siglip_pair_loss(
        z_img, z_txt, params["logit_scale"], params["logit_bias"]
    )


def siglip_train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    optimizer: optax.GradientTransformation,
    cfg=None,
) -> Tuple[TrainState, jax.Array]:
    """One dual-encoder optimizer step (towers + logit scale/bias)."""
    loss, grads = jax.value_and_grad(siglip_loss)(state.params, batch, cfg)
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def make_sharded_siglip_train_step(optimizer, cfg=None):
    """jit the dual-encoder step; DP shardings propagate from inputs placed
    by ``shard_train_inputs``."""
    step_fn = functools.partial(siglip_train_step, optimizer=optimizer, cfg=cfg)
    return jax.jit(step_fn, donate_argnums=(0,))


def save_checkpoint(path: str, state: TrainState) -> None:
    """Orbax checkpoint of params/opt-state/step (checkpoint/resume
    subsystem — the reference had only storage-level durability,
    SURVEY.md §5.4)."""
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(os.path.join(path, f"step_{int(state.step)}")),
            state,
        )


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore the latest ``step_*`` checkpoint under ``path``."""
    import os

    import orbax.checkpoint as ocp

    def step_of(name: str):
        # An interrupted save leaves "step_N.orbax-checkpoint-tmp-<ts>"
        # dirs behind; they must not crash resume (the exact scenario
        # checkpointing exists for) or shadow the last intact step.
        try:
            return int(name.split("_", 1)[1])
        except ValueError:
            return None

    steps = sorted(
        (step_of(name), name)
        for name in os.listdir(path)
        if name.startswith("step_") and step_of(name) is not None
    )
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {path}")
    latest = os.path.abspath(os.path.join(path, steps[-1][1]))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(latest, template)


def shard_train_inputs(mesh, state: TrainState, batch: Dict[str, jax.Array]):
    """Place state replicated and batch rows sharded over ``data``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_rag_tpu.parallel.sharding import DATA_AXIS

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(DATA_AXIS, None))
    state = jax.device_put(state, repl)
    batch = {k: jax.device_put(v, rows) for k, v in batch.items()}
    return state, batch


def make_sharded_train_step(optimizer, cfg: EncoderConfig = MINILM_L6):
    """jit the train step; shardings propagate from the placed inputs
    (``shard_train_inputs``): DP over batch rows, replicated params — XLA
    derives the gradient psum and the all-gather of pooled embeddings the
    in-batch loss needs."""
    step_fn = functools.partial(train_step, optimizer=optimizer, cfg=cfg)
    return jax.jit(step_fn, donate_argnums=(0,))
