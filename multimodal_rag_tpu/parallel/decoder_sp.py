"""Sequence-parallel (ring attention) prefill for the on-TPU decoder.

The reference never scales sequence length — documents are chunked to
1000 chars and prompts stay short (SURVEY.md §5.7) — but this framework
serves RAG prompts whose retrieved context can exceed a single bucket
(top-k chunks at 1000 chars ≈ 1,250+ tokens each answer). Prefill is the
quadratic phase; sequence parallelism splits it across chips.

Design (blockwise ring attention, the TPU-native shape of SP):

* The prompt's sequence axis splits into S contiguous blocks, one per
  chip on a 1-D ``"seq"`` mesh. Weights REPLICATE (SP shards
  activations, the opposite trade from TP); every per-position op
  (norms, projections, MLP) is embarrassingly parallel over the blocks.
* Attention is the only cross-block op. Each chip computes q/k/v for
  its own block, then the (k, v) block pair rotates around the ring
  with one cyclic ``ppermute`` per step — after S steps every chip has
  seen every key — while a running **online softmax** (max, denominator,
  weighted accumulator — the flash/blockwise recurrence) folds each
  visiting block into the local queries' context without ever
  materializing the (P, P) score matrix.
* Causality needs no special-casing: the additive mask is computed from
  GLOBAL positions (query_global >= key_global, key unpadded), so a
  visiting block that is entirely in the future contributes exp(-1e9)=0
  to the accumulator.
* Per-block KV tensors are returned assembled on the sequence axis
  (shard_map out-spec does the concatenation), so decode continues with
  the ordinary single-device/TP loop — :func:`sp_generate` composes
  SP prefill with the standard ``_generate_loop`` for end-to-end parity
  with ``generate_tokens``.

Semantics mirror ``models/decoder.py`` exactly (same _rmsnorm/_rope/
_qmatmul/_moe_mlp helpers, same softcap/scale order as _attn_scores, same
pre/post-norm block structure as _layer_forward) — verified equal on the
8-device CPU mesh in ``tests/test_decoder_sp.py``.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    _act,
    _embed_tokens,
    _generate_loop,
    _logits,
    _moe_mlp,
    _project_kv,
    _qmatmul,
    _rmsnorm,
    _rope,
    _softcap,
)

logger = logging.getLogger(__name__)

SEQ_AXIS = "seq"


def sp_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D ("seq",) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SEQ_AXIS,))


def _ring_attention(q, k_blk, v_blk, q_global, mask, cfg, S, T_loc,
                    window=None):
    """Blockwise-causal ring attention for the local query block.

    q: (B, T_loc, n_kv, g, hd) — already RoPE'd/normed local queries;
    k_blk/v_blk: HEAD-MAJOR (B, n_kv, T_loc, hd) — the LOCAL kv block
    (rotates, decoder._project_kv layout);
    q_global: (T_loc,) global sequence indices of the local queries;
    mask: (B, P) full pad mask (replicated). Returns ctx
    (B, T_loc, n_kv, g, hd) f32 — the softmax-weighted values, identical
    (up to fp rounding) to full attention over the assembled sequence.
    """
    B = q.shape[0]
    n_kv, g, hd = cfg.num_kv_heads, cfg.q_per_kv, cfg.head_dim
    sidx = jax.lax.axis_index(SEQ_AXIS)

    m0 = jnp.full((B, T_loc, n_kv, g), -1e30, jnp.float32)
    l0 = jnp.zeros((B, T_loc, n_kv, g), jnp.float32)
    acc0 = jnp.zeros((B, T_loc, n_kv, g, hd), jnp.float32)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def step(r, carry):
        m, l, acc, k_blk, v_blk = carry
        # After r forward rotations this chip holds block (sidx - r) % S.
        b = (sidx - r) % S
        kv_global = b * T_loc + jnp.arange(T_loc)  # (T_loc,)
        pad = jax.lax.dynamic_slice(
            mask, (0, b * T_loc), (B, T_loc)
        )  # (B, T_loc)
        visible = (
            (kv_global[None, :] <= q_global[:, None])[None, :, :]
            & (pad[:, None, :] > 0)
        )  # (B, T_loc_q, T_loc_kv)
        if window is not None:
            # Gemma3 interleaved attention: this layer sees only the
            # last `window` slots (0 = global). Global slot distance ==
            # semantic distance for real tokens (left pads precede
            # them), same contract as decoder._layer_forward.
            in_win = (window <= 0) | (
                kv_global[None, :] > q_global[:, None] - window
            )
            visible = visible & in_win[None, :, :]
        add_mask = jnp.where(visible, 0.0, -1e9).astype(jnp.float32)

        # Same order as decoder._attn_scores: scale → softcap → mask.
        logits = jnp.einsum(
            "btngh,bnsh->btngs", q, k_blk,
            preferred_element_type=jnp.float32,
        ) * cfg.sm_scale
        logits = _softcap(logits, cfg.attn_logit_softcap)
        logits = logits + add_mask[:, :, None, None, :]

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "btngs,bnsh->btngh", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        k_blk, v_blk = jax.tree.map(
            lambda a: jax.lax.ppermute(a, SEQ_AXIS, perm), (k_blk, v_blk)
        )
        return m_new, l, acc, k_blk, v_blk

    m, l, acc, _, _ = jax.lax.fori_loop(
        0, S, step, (m0, l0, acc0, k_blk, v_blk)
    )
    # Fully-masked rows (left padding) have l == exp(-1e9 - m) sums ≈ S·T
    # tiny-but-positive terms; the division is finite and the rows are
    # never read — same contract as the single-device softmax.
    return acc / jnp.maximum(l[..., None], 1e-30)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def sp_prefill(
    params: Dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg: DecoderConfig,
    mesh: Mesh,
) -> Tuple[jax.Array, Dict]:
    """Sequence-parallel prefill. ids/mask (B, P) left-padded, P must
    divide by the mesh size. Returns (next-token logits (B, vocab), kv
    cache {k, v} of shape (L, B, n_kv, P, hd) — sequence length P, not
    max_seq; :func:`sp_generate` pads it into the decode buffer)."""
    if cfg.kv_lora_rank or cfg.first_k_dense:
        raise ValueError(
            "sequence-parallel prefill does not support the DeepSeek "
            "MLA family yet (latent-cache attention); serve it "
            "replicated or data-parallel"
        )
    S = mesh.devices.size
    B, Pr = ids.shape
    assert Pr % S == 0, f"prompt length {Pr} must divide over {S} chips"
    T_loc = Pr // S

    def run(params, ids, mask):
        sidx = jax.lax.axis_index(SEQ_AXIS)
        cd = cfg.compute_dtype
        n_kv, g, hd = cfg.num_kv_heads, cfg.q_per_kv, cfg.head_dim

        start = sidx * T_loc
        ids_loc = jax.lax.dynamic_slice(ids, (0, start), (B, T_loc))
        # Semantic positions come from the FULL mask (replicated): RoPE
        # positions ignore left padding, exactly as _prefill_core.
        pos_full = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)  # (B, P)
        pos_loc = jax.lax.dynamic_slice(pos_full, (0, start), (B, T_loc))
        q_global = start + jnp.arange(T_loc)  # (T_loc,)

        x = _embed_tokens(params, ids_loc, cfg)  # (B, T_loc, H)

        def layer(x, lp):
            # Mirrors decoder._layer_forward with ring attention in place
            # of the dense _attn_scores (decoder.py:789).
            h = _rmsnorm(x, lp["ln_attn"], cfg).astype(cd)
            q = _qmatmul(h, lp, "wq", cd)
            if cfg.qkv_bias:
                q = q + lp["bq"].astype(cd)
            q = q.reshape(B, T_loc, n_kv * g, hd)
            if cfg.qk_norm:
                q = _rmsnorm(q, lp["ln_q"], cfg).astype(cd)
            q = _rope(q, pos_loc, cfg, lp.get("rope_inv")).reshape(
                B, T_loc, n_kv, g, hd
            )
            k, v = _project_kv(h, lp, pos_loc, cfg)

            ctx = _ring_attention(
                q.astype(jnp.float32), k, v, q_global, mask, cfg, S,
                T_loc, window=lp.get("attn_window"),
            ).astype(cd)
            attn = _qmatmul(
                ctx.reshape(B, T_loc, n_kv * g * hd), lp, "wo", cd
            )
            if cfg.post_norms:
                attn = _rmsnorm(attn, lp["ln_attn_post"], cfg).astype(cd)
            x = x + attn.astype(x.dtype)

            h = _rmsnorm(x, lp["ln_mlp"], cfg).astype(cd)
            if cfg.num_experts:
                down = _moe_mlp(h, lp, cfg, cd)
            else:
                gate = _act(_qmatmul(h, lp, "w_gate", cd), cfg.act)
                up = _qmatmul(h, lp, "w_up", cd)
                down = _qmatmul((gate * up).astype(cd), lp, "w_down", cd)
            if cfg.post_norms:
                down = _rmsnorm(down, lp["ln_mlp_post"], cfg).astype(cd)
            return x + down.astype(x.dtype), (k, v)

        x, (k_new, v_new) = jax.lax.scan(layer, x, params["layers"])

        # Next-token logits live at the LAST global position — the last
        # chip's last local position (left padding guarantees it is the
        # final real token). Other chips contribute zeros to the psum.
        xl = _rmsnorm(x[:, -1:, :], params["final_norm"], cfg)
        logits = _logits(params, xl[:, 0, :], cfg)
        logits = jax.lax.psum(
            jnp.where(sidx == S - 1, logits, jnp.zeros_like(logits)),
            SEQ_AXIS,
        )
        return logits, k_new, v_new

    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(
            P(),
            # (L, B, n_kv, P, hd): seq blocks assemble on axis 3
            P(None, None, None, SEQ_AXIS),
            P(None, None, None, SEQ_AXIS),
        ),
        check_vma=False,
    )
    logits, k, v = fn(params, ids, mask)
    return logits, {"k": k, "v": v}


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "max_new_tokens", "temperature", "top_k", "eos_id"
    ),
)
def sp_generate(
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
    """Sequence-parallel prefill + standard decode loop. Same contract
    (and same outputs, per-row key streams included) as
    ``generate_tokens``; the quadratic phase runs ring-parallel over the
    mesh, the per-token phase runs replicated (decode is weight-streaming
    bound — see decoder_tp for the axis that actually speeds it up)."""
    B, Pr = ids.shape
    S_max = Pr + max_new_tokens
    logits, cache_p = sp_prefill(params, ids, mask, cfg, mesh)
    cache = {
        "k": jnp.zeros(
            (cfg.num_layers, B, cfg.num_kv_heads, S_max, cfg.head_dim),
            cfg.compute_dtype,
        ),
        "v": jnp.zeros(
            (cfg.num_layers, B, cfg.num_kv_heads, S_max, cfg.head_dim),
            cfg.compute_dtype,
        ),
    }
    cache = {
        n: jax.lax.dynamic_update_slice_in_dim(
            cache[n], cache_p[n].astype(cfg.compute_dtype), 0, axis=3
        )
        for n in ("k", "v")
    }
    return _generate_loop(
        params, logits, cache, mask, key, cfg,
        max_new_tokens, temperature, top_k, eos_id, top_p,
    )
