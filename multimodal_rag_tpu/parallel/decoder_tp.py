"""Tensor-parallel sharding for the on-TPU decoder (models/decoder.py).

Megatron-style TP expressed as GSPMD sharding annotations — no manual
collectives. Per transformer block:

* ``wq``/``wk``/``wv`` and ``w_gate``/``w_up`` are **column-sharded** on
  their output dim: every chip computes its own head group / FFN slice
  locally (head boundaries align with the shard boundaries because
  ``head_dim`` divides the per-chip output width — asserted below).
* ``wo`` and ``w_down`` are **row-sharded** on their input dim: the
  partial products are summed with one ``psum`` per block — XLA inserts
  exactly the two all-reduces per layer the Megatron recipe calls for,
  riding ICI.
* Embedding / norms / the logit head stay replicated (the embedding is
  the single biggest tensor, but it is read once per step — sharding it
  would trade one cheap gather for an all-gather per step).
* The KV cache shards on its **head axis** (same ``model`` axis as the
  head groups), so each chip holds only its own heads' cache — at long
  contexts the cache, not the weights, is the HBM bound.

Decode is weight-streaming bound, so TP over N chips streams 1/N of the
weights per chip per step: near-linear latency scaling until the two
per-layer all-reduces (a few hundred KB each at decode) dominate.

Use :func:`tp_mesh` to build a ("data", "model") mesh and
:func:`shard_decoder` to place params; ``prefill``/``decode_step``/
``generate_tokens`` then run unchanged — GSPMD propagates the shardings
through the scan. Verified equal to the single-device forward on an
8-device CPU mesh in ``tests/test_decoder_tp.py``.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_rag_tpu.models.decoder import DecoderConfig

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def tp_mesh(
    n_devices: Optional[int] = None, tp: Optional[int] = None
) -> Mesh:
    """A ("data", "model") mesh: ``tp``-way tensor parallel, data parallel
    over the rest. Default ``tp`` = all devices (pure TP — the decoder's
    serving batch is small, so model parallelism is the useful axis)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    tp = tp or n
    assert n % tp == 0, (n, tp)
    return Mesh(
        np.asarray(devices).reshape(n // tp, tp), (DATA_AXIS, MODEL_AXIS)
    )


def decoder_param_specs(cfg: DecoderConfig, tp: int) -> Dict:
    """PartitionSpec pytree matching ``init_params``/``load_hf_causal_lm``
    output. Head groups must split evenly over the model axis."""
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.ff_dim % tp == 0, (cfg.ff_dim, tp)
    # KV heads that don't divide tp fall back to REPLICATED wk/wv —
    # correct but each device then streams the full KV projections
    # (the HBM cost the module docstring warns about). Say so out loud.
    if cfg.num_kv_heads % tp != 0:
        logger.warning(
            "num_kv_heads=%d does not divide tp=%d: wk/wv replicate "
            "across the model axis instead of sharding",
            cfg.num_kv_heads, tp,
        )
    col = P(None, None, MODEL_AXIS)  # (L, in, out) → shard out
    row = P(None, MODEL_AXIS, None)  # (L, in, out) → shard in
    rep1 = P(None, None)
    # MoE experts (L, E, in, out): **expert parallelism** over the same
    # model axis when the expert count divides it — each chip owns E/tp
    # whole experts, the dense-routed combine in decoder._moe_mlp
    # contracts the expert axis, and GSPMD turns that contraction into
    # the single psum per block the EP recipe calls for. When E doesn't
    # divide tp, fall back to Megatron-within-every-expert (shard the
    # FFN dim instead — two psums per block, still no replicated expert
    # weights).
    if cfg.num_experts and cfg.num_experts % tp == 0:
        e_gate = e_up = P(None, MODEL_AXIS, None, None)
        e_down = P(None, MODEL_AXIS, None, None)
    else:
        if cfg.num_experts:
            assert cfg.ff_dim % tp == 0, (cfg.ff_dim, tp)
            logger.warning(
                "num_experts=%d does not divide tp=%d: sharding the FFN "
                "dim within every expert instead of expert-parallel",
                cfg.num_experts, tp,
            )
        e_gate = e_up = P(None, None, None, MODEL_AXIS)
        e_down = P(None, None, MODEL_AXIS, None)
    specs = {
        "embed": P(),
        "final_norm": P(),
        "lm_head": P(None, MODEL_AXIS),  # (h, V): vocab-sharded logits
        "layers": {
            "wq": col,
            "wk": col if cfg.num_kv_heads % tp == 0 else P(),
            "wv": col if cfg.num_kv_heads % tp == 0 else P(),
            "wo": row,
            "w_gate": e_gate if cfg.num_experts else col,
            "w_up": e_up if cfg.num_experts else col,
            "w_down": e_down if cfg.num_experts else row,
            "w_router": P(),  # (L, h, E): tiny, replicated
            # Qwen2-MoE shared expert: ordinary Megatron column/row split
            # over its own FFN dim (it runs for every token, dense) when
            # it divides; replicated otherwise.
            "w_shared_gate": (
                col if cfg.shared_expert_dim % tp == 0 else P()
            ),
            "w_shared_up": (
                col if cfg.shared_expert_dim % tp == 0 else P()
            ),
            "w_shared_down": (
                row if cfg.shared_expert_dim % tp == 0 else P()
            ),
            "shared_gate": P(),  # (L, h, 1): scalar gate, replicated
            "ln_attn": rep1,
            "ln_mlp": rep1,
            # Optional (qwen2 biases follow their projection's out-dim
            # sharding; gemma2 post-norms replicate like the pre-norms).
            "bq": P(None, MODEL_AXIS),
            "bk": P(None, MODEL_AXIS) if cfg.num_kv_heads % tp == 0 else P(),
            "bv": P(None, MODEL_AXIS) if cfg.num_kv_heads % tp == 0 else P(),
            # Qwen3 per-head q/k norms: (L, head_dim) — the normalized
            # axis is head_dim, identical on every head, so they
            # replicate regardless of how the heads shard.
            "ln_q": rep1,
            "ln_k": rep1,
            "ln_attn_post": rep1,
            "ln_mlp_post": rep1,
            # Gemma3 interleaved-attention leaves: tiny per-layer
            # derived constants, replicated.
            "rope_inv": rep1,
            "attn_window": P(None),
            # GPT-OSS leaves: the o-bias adds after the row-split wo's
            # psum (GSPMD keeps the math; replicating the tiny vector is
            # free), sinks/router-bias are tiny and replicate, expert
            # biases follow their experts' EP placement.
            "bo": rep1,
            "attn_sinks": rep1,
            "router_bias": rep1,
            "b_gate": (
                P(None, MODEL_AXIS, None)
                if cfg.num_experts and cfg.num_experts % tp == 0
                else P()
            ),
            "b_up": (
                P(None, MODEL_AXIS, None)
                if cfg.num_experts and cfg.num_experts % tp == 0
                else P()
            ),
            "b_down": (
                P(None, MODEL_AXIS, None)
                if cfg.num_experts and cfg.num_experts % tp == 0
                else P()
            ),
        },
    }
    # DeepSeek MLA leaves: TP shards the QUERY heads — the rank-r latent
    # cache has one shared "head" and replicates (its per-token bytes
    # are 57x smaller than materialized heads; replicating it costs far
    # less HBM than the all-gather a sharded softmax would need). The
    # down-projections (wq_a, w_kva) and their norms replicate; the
    # up-projections (wq_b / wq, w_kvb) column-shard on their head-major
    # output, so qn_abs/ctx/probs all carry the head shard and ``wo``'s
    # existing row split contracts it with one psum.
    specs["layers"].update({
        "wq_a": P(),
        "ln_q_a": rep1,
        "wq_b": col,
        "w_kva": P(),
        "ln_kv_a": rep1,
        "w_kvb": col,
    })
    if cfg.first_k_dense:
        # The dense-prefix stack (decoder._run_layers unrolls it) has
        # the same attention leaves plus a dense MLP on dense_ff_dim.
        dense_ok = cfg.dense_ff_dim % tp == 0
        if not dense_ok:
            logger.warning(
                "dense_ff_dim=%d does not divide tp=%d: the dense "
                "prefix MLP replicates", cfg.dense_ff_dim, tp,
            )
        specs["dense_layers"] = {
            k: v for k, v in specs["layers"].items()
            if not k.startswith(("b_", "w_router", "router",
                                 "w_shared", "shared_gate", "slora_"))
        }
        specs["dense_layers"].update({
            "w_gate": col if dense_ok else P(),
            "w_up": col if dense_ok else P(),
            "w_down": row if dense_ok else P(),
        })

    # S-LoRA stacked adapters (lora.stack_lora_adapters): (L, N+1, in, r)
    # A / (L, N+1, r, out) B side-path pairs follow their base matmul's
    # split — col-split bases shard B's out dim, row-split bases shard
    # A's in dim (the skinny x@A contraction then psums with wo/w_down's
    # existing reduction under GSPMD); the rank dim never shards.
    kv_col = cfg.num_kv_heads % tp == 0
    col4 = P(None, None, None, MODEL_AXIS)
    row4 = P(None, None, MODEL_AXIS, None)
    specs["layers"].update({
        "slora_ids": P(None, None),  # (L, B) per-dispatch routing ids
        "slora_A_wq": P(), "slora_B_wq": col4,
        "slora_A_wk": P(), "slora_B_wk": col4 if kv_col else P(),
        "slora_A_wv": P(), "slora_B_wv": col4 if kv_col else P(),
        "slora_A_wo": row4, "slora_B_wo": P(),
        "slora_A_w_gate": P(), "slora_B_w_gate": col4,
        "slora_A_w_up": P(), "slora_B_w_up": col4,
        "slora_A_w_down": row4, "slora_B_w_down": P(),
    })
    return specs


def cache_spec(cfg: DecoderConfig, tp: int) -> P:
    """KV cache (L, B, n_kv, S, hd): shard the head axis when it divides."""
    if cfg.num_kv_heads % tp == 0:
        return P(None, DATA_AXIS, MODEL_AXIS, None, None)
    return P(None, DATA_AXIS, None, None, None)


def shard_decoder(
    params: Dict, mesh: Mesh, cfg: DecoderConfig
) -> Tuple[Dict, NamedSharding]:
    """Place a (host or single-device) param pytree onto the mesh with TP
    shardings. Returns (sharded params, the cache sharding to pass when
    placing/donating caches)."""
    tp = mesh.shape[MODEL_AXIS]
    specs = decoder_param_specs(cfg, tp)

    def place(p, s):
        # PartitionSpec is a tuple subclass (a pytree container), so walk
        # the dicts by hand instead of jax.tree.map.
        if isinstance(p, dict):
            return {k: place(v, s[k]) for k, v in p.items()}
        return jax.device_put(p, NamedSharding(mesh, s))

    sharded = place(params, specs)
    return sharded, NamedSharding(mesh, cache_spec(cfg, tp))
