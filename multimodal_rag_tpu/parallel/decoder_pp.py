"""Pipeline-parallel decoding for the on-TPU decoder (models/decoder.py).

The reference has no model parallelism of any kind (SURVEY.md §2.4); its
large-model story is "point Ollama at a bigger model". This module is the
TPU-native answer for models whose weights exceed one chip's HBM even
after int8 + tensor parallelism: split the **layer stack** into S
contiguous stages, one per chip, and stream activations through the ring.

Design (idiomatic TPU, not a torch-pipe translation):

* The decoder's params already stack every per-layer tensor on a leading
  ``L`` axis (one ``lax.scan`` walks them). Pipeline placement is then a
  **reshape + sharding annotation**: every ``(L, ...)`` leaf becomes
  ``(S, L/S, ...)`` with axis 0 sharded over the ``"pipe"`` mesh axis —
  each chip holds exactly its stage's layer slice, 1/S of the weights.
* Compute runs under one ``shard_map``; inter-stage transfer is a single
  cyclic ``lax.ppermute`` of the activation payload per tick — the only
  communication in the whole schedule (plus two tiny broadcast psums).
  Payload size is ``mb·H`` bf16 at decode: ICI-trivial.
* **Prefill** is GPipe-style: the batch splits into M = S microbatches
  that enter stage 0 on consecutive ticks; after ``M + S - 1`` ticks the
  pipeline has drained and every stage holds its layers' KV cache for
  the full batch.
* **Decode** uses a bubble-free ring schedule: with M = S microbatches,
  at tick ``u`` stage ``s`` processes microbatch ``(u - s) mod M`` at
  token step ``(u - s) // M`` — every stage busy every tick, and the
  token sampled by the last stage arrives at stage 0 via the same cyclic
  ppermute exactly when that microbatch's next step begins. M = S is not
  a simplification but the alignment condition: the sample for (m, t)
  leaves stage S-1 one tick before stage 0 starts (m, t+1).
* Sampling (temperature / top-k / top-p, per-row key streams) runs on
  the last stage with the SAME key discipline as the single-device
  ``_generate_loop`` — per-row streams advance once per step — so
  ``pp_generate`` reproduces ``generate_tokens`` exactly (greedy: bit
  equal in f32; sampled: same tokens for the same per-row keys).

What PP buys at serving time: per-chip weight bytes drop by S (the HBM
capacity axis TP alone may not close for 70B-class models), and decode
throughput scales with all stages busy. What it does NOT buy: single-
request latency (a token still visits every stage serially). Compose
with TP for latency, PP for capacity. This module keeps the full token
budget (no early-exit on all-EOS) — batch serving amortizes it, and the
ring schedule would otherwise need a cross-stage consensus psum per
round; noted as an optimization, not a gap.

Verified equal to the single-device forward/generate on an 8-device CPU
mesh in ``tests/test_decoder_pp.py`` and in ``__graft_entry__``'s
multi-chip dryrun.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    _embed_tokens,
    _layer_forward,
    _logits,
    _project_kv,
    _rmsnorm,
    _sample,
    _split_rows,
)
from multimodal_rag_tpu.parallel.decoder_tp import (
    MODEL_AXIS,
    decoder_param_specs,
)

logger = logging.getLogger(__name__)

PIPE_AXIS = "pipe"


def pp_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """A ("pipe",) mesh over the first ``n_devices`` devices — or, with
    ``tp > 1``, a 2-D ("pipe", "model") mesh composing pipeline stages
    with Megatron-style tensor parallelism inside every stage (PP for
    HBM capacity, TP for per-token latency)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp <= 1:
        return Mesh(np.asarray(devices), (PIPE_AXIS,))
    assert n % tp == 0, (n, tp)
    return Mesh(
        np.asarray(devices).reshape(n // tp, tp), (PIPE_AXIS, MODEL_AXIS)
    )


def _tp_layer_spec(key: str, specs: Dict):
    """TP PartitionSpec for a stacked-layer leaf, deriving the int8
    companions: ``X_q`` shards like ``X``; ``X_s`` (scale, in-dim = 1)
    keeps X's out-dim sharding with the in axis unsharded."""
    if key in specs:
        return specs[key]
    if key.endswith("_q"):
        return specs[key[:-2]]
    if key.endswith("_s"):
        base = specs[key[:-2]]
        return P(*base[:-2], None, base[-1])
    raise KeyError(key)


def _stage_layers(layers: Dict, n_stages: int) -> Dict:
    """Reshape every stacked-layer leaf (L, ...) → (S, L/S, ...)."""
    def reshape(a):
        L = a.shape[0]
        assert L % n_stages == 0, (
            f"num_layers={L} must divide n_stages={n_stages}"
        )
        return a.reshape(n_stages, L // n_stages, *a.shape[1:])
    return jax.tree.map(reshape, layers)


def shard_decoder_pp(
    params: Dict, mesh: Mesh, cfg: DecoderConfig
) -> Dict:
    """Place params for pipeline parallelism: layer-stacked leaves get a
    leading stage axis sharded over ``"pipe"``; everything else (embed,
    final norm, logit head) replicates. Accepts f32/bf16 or int8
    (quantize_decoder_params) params — every quantized leaf keeps its
    leading L axis, so the same reshape applies.

    On a 2-D ("pipe", "model") mesh (``pp_mesh(tp=...)``), each leaf
    ADDITIONALLY carries its Megatron TP sharding (decoder_tp.
    decoder_param_specs) over the model axis: stage s's layer slice is
    column/row-split across that stage's TP group."""
    if cfg.kv_lora_rank or cfg.first_k_dense or "dense_layers" in params:
        raise ValueError(
            "pipeline parallelism does not support the DeepSeek MLA "
            "family yet (heterogeneous dense-prefix stack / latent "
            "cache); serve it replicated or data-parallel"
        )
    S = mesh.shape[PIPE_AXIS]
    staged = dict(params)
    staged["layers"] = _stage_layers(params["layers"], S)
    if MODEL_AXIS in mesh.axis_names:
        tp_specs = decoder_param_specs(cfg, mesh.shape[MODEL_AXIS])
        out = {
            k: jax.device_put(v, NamedSharding(mesh, tp_specs[k]))
            for k, v in staged.items() if k != "layers"
        }
        out["layers"] = {
            k: jax.device_put(
                v,
                NamedSharding(
                    mesh,
                    P(PIPE_AXIS, *_tp_layer_spec(k, tp_specs["layers"])),
                ),
            )
            for k, v in staged["layers"].items()
        }
        return out
    pipe = NamedSharding(mesh, P(PIPE_AXIS))
    rep = NamedSharding(mesh, P())
    out = {
        k: jax.device_put(v, rep) for k, v in staged.items() if k != "layers"
    }
    out["layers"] = jax.tree.map(
        lambda a: jax.device_put(a, pipe), staged["layers"]
    )
    return out


def _ring(x, S: int):
    """Cyclic stage→stage+1 rotation of an activation payload pytree."""
    perm = [(i, (i + 1) % S) for i in range(S)]
    return jax.tree.map(
        lambda a: jax.lax.ppermute(a, PIPE_AXIS, perm), x
    )


def _bcast_from_last(x, S: int):
    """Replicate a value held by the last stage to every stage (masked
    psum — the other stages contribute zeros)."""
    stage = jax.lax.axis_index(PIPE_AXIS)
    return jax.tree.map(
        lambda a: jax.lax.psum(
            jnp.where(stage == S - 1, a, jnp.zeros_like(a)), PIPE_AXIS
        ),
        x,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "max_new_tokens", "temperature", "top_k", "eos_id"
    ),
)
def pp_generate(
    params: Dict,
    ids: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    cfg: DecoderConfig,
    mesh: Mesh,
    max_new_tokens: int,
    temperature: float = 0.7,
    top_k: int = 64,
    eos_id: int = -1,
    top_p: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Pipeline-parallel prefill + generate. Same contract as
    ``generate_tokens``: ids/mask (B, P) left-padded; returns (tokens
    (B, max_new_tokens) int32, lengths (B,)). ``params`` must come from
    :func:`shard_decoder_pp` over the same ``mesh``. B must divide into
    S microbatches (B % S == 0).

    On a 2-D ("pipe", "model") mesh the pipe axis stays MANUAL (the ring
    schedule below) while the model axis is left to GSPMD: every stage's
    per-layer matmuls carry their Megatron shardings, so XLA inserts the
    usual two TP all-reduces per block inside each stage — TP×PP without
    a line of TP-specific code in the schedule."""
    S = mesh.shape[PIPE_AXIS]
    B, Pr = ids.shape
    assert B % S == 0, f"batch {B} must be divisible by n_stages {S}"
    mb = B // S
    M = S  # ring alignment condition — see module docstring
    S_max = Pr + max_new_tokens

    def run(lparams, ids, mask, key):
        stage = jax.lax.axis_index(PIPE_AXIS)
        cd = cfg.compute_dtype
        layers = jax.tree.map(lambda a: a[0], lparams["layers"])
        rep = {k: v for k, v in lparams.items() if k != "layers"}
        Ls = next(iter(jax.tree.leaves(layers))).shape[0]

        prompt_len = jnp.sum(mask, axis=1).astype(jnp.int32)  # (B,)
        keys = jax.random.split(key, B) if key.ndim == 0 else key

        # Per-stage KV cache over the FULL batch, local layers only.
        kc = jnp.zeros((Ls, B, cfg.num_kv_heads, S_max, cfg.head_dim), cd)
        vc = jnp.zeros_like(kc)
        h_last = jnp.zeros((B, cfg.hidden_dim), cd)

        # ---------------- prefill: GPipe fill + drain ----------------
        causal = jnp.tril(jnp.ones((Pr, Pr), jnp.bool_))

        def prefill_tick(t, state):
            act, kc, vc, h_last = state
            act = _ring(act, S)
            rel = t - stage
            valid = (rel >= 0) & (rel < M)
            m = jnp.clip(rel, 0, M - 1)
            start = m * mb

            inj_idx = jnp.minimum(t, M - 1) * mb
            ids_m = jax.lax.dynamic_slice_in_dim(ids, inj_idx, mb, axis=0)
            inj = _embed_tokens(rep, ids_m, cfg)  # (mb, P, H)
            act = jnp.where(stage == 0, inj, act)

            mask_m = jax.lax.dynamic_slice_in_dim(mask, start, mb, axis=0)
            positions = jnp.maximum(jnp.cumsum(mask_m, axis=1) - 1, 0)
            visible = causal[None, :, :] & (mask_m[:, None, :] > 0)
            add_mask = jnp.where(visible, 0.0, -1e9).astype(jnp.float32)

            slots = (jnp.arange(Pr), jnp.arange(Pr))

            def body(x, lp):
                h_norm = _rmsnorm(x, lp["ln_attn"], cfg).astype(cd)
                k, v = _project_kv(h_norm, lp, positions, cfg)
                x = _layer_forward(
                    x, lp, k, v, positions, add_mask, cfg, slots
                )
                return x, (k, v)

            act, (k_new, v_new) = jax.lax.scan(body, act, layers)

            # Commit this microbatch's prompt keys/values (guarded: an
            # invalid tick rewrites the existing slice unchanged).
            idx = (0, start, 0, 0, 0)
            sizes = (Ls, mb, cfg.num_kv_heads, Pr, cfg.head_dim)
            kc_cur = jax.lax.dynamic_slice(kc, idx, sizes)
            vc_cur = jax.lax.dynamic_slice(vc, idx, sizes)
            kc = jax.lax.dynamic_update_slice(
                kc, jnp.where(valid, k_new, kc_cur), idx
            )
            vc = jax.lax.dynamic_update_slice(
                vc, jnp.where(valid, v_new, vc_cur), idx
            )

            # Last stage records the final-position hidden state.
            x_last = act[:, -1, :]
            h_cur = jax.lax.dynamic_slice(h_last, (start, 0),
                                          (mb, cfg.hidden_dim))
            h_new = jnp.where(valid & (stage == S - 1), x_last, h_cur)
            h_last = jax.lax.dynamic_update_slice(h_last, h_new, (start, 0))
            return act, kc, vc, h_last

        act0 = jnp.zeros((mb, Pr, cfg.hidden_dim), cd)
        _, kc, vc, h_last = jax.lax.fori_loop(
            0, M + S - 1, prefill_tick, (act0, kc, vc, h_last)
        )

        # First token: sampled on the last stage from the prefill logits,
        # broadcast to all stages (stage 0 embeds it at t == 1).
        hx = _rmsnorm(h_last[:, None, :], rep["final_norm"], cfg)
        logits0 = _logits(rep, hx[:, 0, :], cfg)  # (B, V)
        keys, sub = _split_rows(keys)
        first = _sample(logits0, sub, temperature, top_k, top_p)
        first = _bcast_from_last(first, S)
        done = first == eos_id
        out = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
        out = out.at[:, 0].set(first)

        # ---------------- decode: bubble-free ring ----------------
        key_mask = jnp.concatenate(
            [mask.astype(jnp.int32),
             jnp.zeros((B, max_new_tokens), jnp.int32)], axis=1,
        )
        n_work = (max_new_tokens - 1) * M

        def decode_tick(u, state):
            ph, ptok, kc, vc, key_mask, keys, done, out = state
            ph, ptok = _ring((ph, ptok), S)
            rel = u - stage
            valid = (rel >= 0) & (rel < n_work)
            relc = jnp.clip(rel, 0, max(n_work - 1, 0))
            m = relc % M
            t = relc // M + 1  # token step in [1, max_new_tokens)
            start = m * mb
            pos = Pr + t - 1  # shared cache slot for this step

            # Stage 0: embed the incoming token (the ring delivers the
            # last stage's sample; step 1 reads the broadcast first token).
            first_m = jax.lax.dynamic_slice_in_dim(first, start, mb)
            cur = jnp.where(t == 1, first_m, ptok)
            x0 = _embed_tokens(rep, cur[:, None], cfg)  # (mb, 1, H)
            x = jnp.where(stage == 0, x0, ph)

            # Open this step's cache slot in the stage-local key mask.
            km_m = jax.lax.dynamic_slice(key_mask, (start, 0), (mb, S_max))
            km_open = jax.lax.dynamic_update_slice(
                km_m, jnp.ones((mb, 1), jnp.int32), (0, pos)
            )
            km_m = jnp.where(valid, km_open, km_m)
            key_mask = jax.lax.dynamic_update_slice(
                key_mask, km_m, (start, 0)
            )
            add_mask = jnp.where(km_m > 0, 0.0, -1e9).astype(
                jnp.float32)[:, None, :]
            plen_m = jax.lax.dynamic_slice_in_dim(prompt_len, start, mb)
            pos_q = (plen_m + t - 1)[:, None]  # (mb, 1)

            idx = (0, start, 0, 0, 0)
            sizes = (Ls, mb, cfg.num_kv_heads, S_max, cfg.head_dim)
            kc_m = jax.lax.dynamic_slice(kc, idx, sizes)
            vc_m = jax.lax.dynamic_slice(vc, idx, sizes)

            slots = (jnp.full((1,), pos), jnp.arange(S_max))

            def body(x, scanned):
                lp, kcl, vcl = scanned
                h_norm = _rmsnorm(x, lp["ln_attn"], cfg).astype(cd)
                k, v = _project_kv(h_norm, lp, pos_q, cfg)
                kcl = jax.lax.dynamic_update_slice(kcl, k, (0, 0, pos, 0))
                vcl = jax.lax.dynamic_update_slice(vcl, v, (0, 0, pos, 0))
                x = _layer_forward(
                    x, lp, kcl, vcl, pos_q, add_mask, cfg, slots
                )
                return x, (kcl, vcl)

            x, (kc_new, vc_new) = jax.lax.scan(body, x, (layers, kc_m, vc_m))
            kc = jax.lax.dynamic_update_slice(
                kc, jnp.where(valid, kc_new, kc_m), idx
            )
            vc = jax.lax.dynamic_update_slice(
                vc, jnp.where(valid, vc_new, vc_m), idx
            )

            # Last stage: sample, advance this microbatch's key streams,
            # record the token. Guard every write with (valid & last).
            is_last = stage == S - 1
            xl = _rmsnorm(x, rep["final_norm"], cfg)
            logits = _logits(rep, xl[:, 0, :], cfg)  # (mb, V)
            keys_m = jax.lax.dynamic_slice_in_dim(keys, start, mb)
            keys_m2, sub = _split_rows(keys_m)
            nxt = _sample(logits, sub, temperature, top_k, top_p)
            done_m = jax.lax.dynamic_slice_in_dim(done, start, mb)
            nxt = jnp.where(done_m, eos_id, nxt)

            take = valid & is_last
            keys = jax.lax.dynamic_update_slice_in_dim(
                keys, jnp.where(take, keys_m2, keys_m), start, axis=0
            )
            out_m = jax.lax.dynamic_slice(out, (start, 0),
                                          (mb, max_new_tokens))
            out_cur = jax.lax.dynamic_slice(out_m, (0, t), (mb, 1))
            out_m = jax.lax.dynamic_update_slice(
                out_m, jnp.where(take, nxt[:, None], out_cur), (0, t)
            )
            out = jax.lax.dynamic_update_slice(out, out_m, (start, 0))
            done = jax.lax.dynamic_update_slice_in_dim(
                done,
                jnp.where(take, done_m | (nxt == eos_id), done_m),
                start, axis=0,
            )
            return x, nxt, kc, vc, key_mask, keys, done, out

        if max_new_tokens > 1:
            ph0 = jnp.zeros((mb, 1, cfg.hidden_dim), cd)
            ptok0 = jnp.zeros((mb,), jnp.int32)
            state = (ph0, ptok0, kc, vc, key_mask, keys, done, out)
            n_ticks = n_work + S - 1
            state = jax.lax.fori_loop(0, n_ticks, decode_tick, state)
            out = state[7]

        out = _bcast_from_last(out, S)
        lengths = jnp.sum(
            jnp.cumprod((out != eos_id).astype(jnp.int32), axis=1), axis=1
        )
        return out, lengths

    layer_specs = jax.tree.map(lambda _: P(PIPE_AXIS), params["layers"])
    param_specs = {
        **{k: P() for k in params if k != "layers"},
        "layers": layer_specs,
    }
    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(param_specs, P(), P(), P()),
        out_specs=(P(), P()),
        # Only the pipe axis is manual; a model axis (TP×PP) stays
        # automatic so GSPMD propagates the Megatron shardings.
        axis_names=frozenset({PIPE_AXIS}),
        check_vma=False,
    )
    return fn(params, ids, mask, key)
