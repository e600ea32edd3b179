"""On-TPU LoRA finetuning for the decoder — the producer half of the
LoRA story (models/lora.py serves what this trains).

The base model stays FROZEN (closed over the jitted step, never
differentiated, streamed from HBM like a serving forward); only the
low-rank pairs train. The pairs ride inside ``params["layers"]`` as
``lora_A_<leaf>`` (L, in, r) / ``lora_B_<leaf>`` (L, r, out) scanned
leaves, so `_qmatmul`'s runtime side-path applies them in the SAME
stacked-scan forward serving uses — one forward definition, no
model-surgery per family. An int8-quantized base composes (QLoRA-style:
int8 base matmul + f32 LoRA side-path).

Scaling convention: the PEFT delta is ``(alpha / r) * B @ A``; here the
scale is FOLDED INTO the trained B (B_trained = scale * B_peft) so the
forward carries no extra scalar, and :func:`save_peft_adapter` divides
it back out — the exported directory round-trips through both
``models/lora.merge_lora`` and HF PEFT.

Data parallel: ``lora_train_step`` is a pure jitted function over
(batch, lora, opt_state); shard the batch over a mesh axis and the step
runs under GSPMD with one psum per reduction — same recipe as
``training.py``'s contrastive encoder step.
"""

from __future__ import annotations

import json
import logging
import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    causal_lm_logits,
)

logger = logging.getLogger(__name__)

__all__ = [
    "DEFAULT_TARGETS",
    "init_lora_params",
    "insert_lora",
    "lm_loss",
    "make_lora_optimizer",
    "make_lora_train_step",
    "lora_train_step",
    "save_peft_adapter",
    "batch_texts",
]

#: Leaves LoRA targets by default — the attention + MLP projections
#: (PEFT's common all-linear set for llama-family models).
DEFAULT_TARGETS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
)

#: Our leaf -> the HF/PEFT module name used in exported adapter keys.
_LEAF_TO_HF = {
    "wq": ("self_attn", "q_proj"),
    "wk": ("self_attn", "k_proj"),
    "wv": ("self_attn", "v_proj"),
    "wo": ("self_attn", "o_proj"),
    "w_gate": ("mlp", "gate_proj"),
    "w_up": ("mlp", "up_proj"),
    "w_down": ("mlp", "down_proj"),
}


def init_lora_params(
    rng: jax.Array,
    params: Dict,
    r: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict:
    """LoRA leaves for the given base ``params``: A ~ N(0, 1/r) (PEFT's
    kaiming-flavored init), B = 0 — the adapted model starts EXACTLY at
    the base model. Shapes follow each target leaf's (L, in, out)."""
    layers = params["layers"]
    out: Dict[str, jax.Array] = {}
    keys = jax.random.split(rng, max(len(targets), 1))
    for key, name in zip(keys, targets):
        w = layers.get(name)
        if w is None or w.ndim != 3:
            logger.warning(
                "LoRA target %r absent or non-matrix in this model; "
                "skipped", name,
            )
            continue
        L, d_in, d_out = w.shape
        out["lora_A_" + name] = (
            jax.random.normal(key, (L, d_in, r)) / np.sqrt(r)
        ).astype(dtype)
        out["lora_B_" + name] = jnp.zeros((L, r, d_out), dtype)
    if not out:
        raise ValueError(f"no LoRA targets matched {tuple(targets)}")
    return out


def insert_lora(params: Dict, lora: Dict) -> Dict:
    """Base params + LoRA leaves -> the forward's params tree (leaves
    join the scanned ``layers`` dict; `_qmatmul` picks them up)."""
    merged = dict(params)
    merged["layers"] = {**params["layers"], **lora}
    return merged


def lm_loss(lora: Dict, params: Dict, ids: jax.Array, mask: jax.Array,
            cfg: DecoderConfig) -> jax.Array:
    """Mean next-token cross-entropy over real (non-pad) positions.
    ids/mask (B, T) right-padded; position t's logits predict token
    t+1, so the last real token of each row contributes no loss."""
    logits = causal_lm_logits(insert_lora(params, lora), ids, mask, cfg)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    w = (mask[:, :-1] * mask[:, 1:]).astype(jnp.float32)
    return -(picked * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_lora_train_step(cfg: DecoderConfig, optimizer):
    """A REUSABLE jitted step ``(params, lora, opt_state, ids, mask) ->
    (lora, opt_state, loss)`` — build once, call per batch (a fresh
    closure per call would retrace every step). Gradients flow only to
    the LoRA leaves; the frozen base is streamed, never differentiated.
    ``lora``/``opt_state`` are donated so the update runs in place."""
    import optax

    @partial(jax.jit, donate_argnames=("lora", "opt_state"))
    def step(params, lora, opt_state, ids, mask):
        loss, grads = jax.value_and_grad(lm_loss)(
            lora, params, ids, mask, cfg
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    return step


def lora_train_step(params: Dict, lora: Dict, opt_state, ids, mask,
                    cfg: DecoderConfig, step_fn):
    """Convenience wrapper around a :func:`make_lora_train_step` step."""
    return step_fn(params, lora, opt_state, jnp.asarray(ids),
                   jnp.asarray(mask))


def make_lora_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                        clip: float = 1.0):
    import optax

    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def batch_texts(tokenizer, texts: Sequence[str], seq_len: int,
                batch_size: int) -> "list[Tuple[np.ndarray, np.ndarray]]":
    """Tokenize + RIGHT-pad texts into fixed-shape (ids, mask) training
    batches (truncated at ``seq_len``; short rows padded with 0)."""
    rows = []
    for t in texts:
        e = tokenizer.encode(t)[:seq_len]
        ids = np.zeros((seq_len,), np.int32)
        mask = np.zeros((seq_len,), np.int32)
        ids[:len(e)] = e
        mask[:len(e)] = 1
        rows.append((ids, mask))
    out = []
    for i in range(0, len(rows), batch_size):
        chunk = rows[i:i + batch_size]
        while len(chunk) < batch_size:  # pad the tail batch
            chunk.append((
                np.zeros((seq_len,), np.int32),
                np.zeros((seq_len,), np.int32),
            ))
        out.append((
            np.stack([c[0] for c in chunk]),
            np.stack([c[1] for c in chunk]),
        ))
    return out


def save_peft_adapter(
    lora: Dict,
    path: str,
    r: int,
    alpha: float = None,
    base_model_name: Optional[str] = None,
) -> str:
    """Export trained LoRA leaves as a PEFT adapter directory
    (adapter_config.json + adapter_model.safetensors) loadable by HF
    PEFT AND by this framework's ``models/lora.merge_lora``. The
    training fold (B_trained = scale * B_peft) is divided back out."""
    from safetensors.numpy import save_file

    alpha = float(alpha if alpha is not None else r)
    scale = alpha / r
    os.makedirs(path, exist_ok=True)
    tensors = {}
    target_modules = set()
    for key, value in lora.items():
        if key.startswith("lora_A_"):
            leaf, ab = key[len("lora_A_"):], "A"
        elif key.startswith("lora_B_"):
            leaf, ab = key[len("lora_B_"):], "B"
        else:
            continue
        hf = _LEAF_TO_HF.get(leaf)
        if hf is None:
            logger.warning("no PEFT name for leaf %r; not exported", leaf)
            continue
        group, module = hf
        target_modules.add(module)
        stacks = np.asarray(value, np.float32)  # (L, in, r) | (L, r, out)
        for layer in range(stacks.shape[0]):
            stem = (
                f"base_model.model.model.layers.{layer}.{group}."
                f"{module}.lora_{ab}.weight"
            )
            if ab == "A":
                tensors[stem] = np.ascontiguousarray(
                    stacks[layer].T
                )  # ours (in, r) -> PEFT (r, in)
            else:
                tensors[stem] = np.ascontiguousarray(
                    stacks[layer].T / scale
                )  # ours (r, out) scaled -> PEFT (out, r) raw
    if not tensors:
        raise ValueError("no exportable LoRA leaves")
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({
            "peft_type": "LORA",
            "r": int(r),
            "lora_alpha": alpha,
            "target_modules": sorted(target_modules),
            "base_model_name_or_path": base_model_name or "",
            "task_type": "CAUSAL_LM",
        }, f, indent=2)
    return path
