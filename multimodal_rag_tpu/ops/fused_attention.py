"""Fused multi-head attention Pallas kernel for short-sequence encoders.

The encoder families this framework serves (MiniLM-L6, CLIP/SigLIP text
towers, cross-encoder rerankers) run short sequences (S <= 256) with small
heads (head_dim 32-64). The reference's torch path — and a naive XLA einsum
chain — materializes the ``(B, nh, S, S)`` float32 logits and probs in HBM;
at batch 256 that is ~600 MB of HBM traffic per layer, which makes the
embed stage bandwidth-bound instead of MXU-bound (measured ~4.4 ms of a
12.9 ms MiniLM forward at B=256, S=128).

Layout is the key design choice. The projections produce ``(B*S, H)`` with
heads as contiguous lane groups; any host-side transpose to the
"(B, nh, S, hd)" convention costs ~8 full-tensor HBM relayouts per layer
and was measured to ERASE the fusion win. So this kernel consumes the
projection output layout directly:

* q/k/v arrive as ``(B*S, H)`` — exactly what ``x @ W`` produces, reshaped
  for free on leading dims.
* Per head, the kernel takes a static lane slice ``[:, h*hd:(h+1)*hd]``
  (in VMEM), splits the leading dim to ``(bb, S, hd)`` (free), and runs one
  MXU-batched QK^T → bias → softmax → PV chain per head, fully in VMEM.
* The context is written back into the same ``(bb*S, H)`` lane layout, so
  the output projection consumes it with no relayout either.

HBM traffic is exactly one read of q/k/v and one write of the context —
scores never leave VMEM. Flash-style streaming is unnecessary at these
sequence lengths: the whole per-head score block fits in VMEM.

Padding is handled by an additive key bias ``(B, S)`` (0 = real token,
-1e9 = padding), matching ``models.minilm.encoder_forward`` semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_attention_supported(B: int, S: int, hd: int, block_b: int = 8) -> bool:
    """The kernel targets short-sequence encoders: the per-head (block_b,
    S, S) score block must fit VMEM, Pallas only compiles on TPU, and the
    in-VMEM leading-dim split (block_b*S, hd) → (block_b, S, hd) needs a
    sublane-aligned S (multiple of 8) — unaligned towers (e.g. CLIP's
    S=77/50) take the XLA path through the same call sites."""
    return (
        jax.default_backend() == "tpu"
        and B % block_b == 0
        and S % 8 == 0
        and S <= 256
        and hd <= 128
    )


def _attention_kernel(
    q_ref, k_ref, v_ref, bias_ref, *rest, sm_scale, nh, S, hd, bb, has_pos
):
    if has_pos:
        pos_ref, out_ref = rest
    else:
        (out_ref,) = rest
    bias = bias_ref[:][:, None, :]  # (bb, 1, S) broadcasts over query rows
    if has_pos:
        bias = bias + pos_ref[:][None, :, :]  # (S, S): causal / relative
    for h in range(nh):
        lo = h * hd
        q = q_ref[:, lo:lo + hd].reshape(bb, S, hd)
        k = k_ref[:, lo:lo + hd].reshape(bb, S, hd)
        v = v_ref[:, lo:lo + hd].reshape(bb, S, hd)
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, S, S)
        logits = logits * sm_scale + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        ctx = jax.lax.dot_general(
            probs, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, S, hd)
        out_ref[:, lo:lo + hd] = ctx.reshape(bb * S, hd).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "seq_len", "sm_scale", "block_b",
                              "interpret")
)
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: jax.Array,
    sm_scale: float,
    num_heads: int,
    seq_len: int,
    pos_bias: jax.Array | None = None,
    # Blocks larger than 8 are faster standalone (0.34 ms -> 0.13 ms at
    # block 32, B=256/S=128) but SLOWER inside the full encoder: the
    # bigger VMEM working set degrades XLA's scheduling of the
    # surrounding projection matmuls (end-to-end 23.5k chunks/s at 8 vs
    # 20.9k at 32). Keep 8 unless profiling says otherwise.
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention fully fused in VMEM, projection-native layout.

    q, k, v: ``(B*S, H)`` with head h in lanes ``[h*hd, (h+1)*hd)`` (the
    raw projection output). ``key_bias``: ``(B, S)`` float32 additive bias
    on key positions (0 real / -1e9 pad). ``pos_bias``: optional ``(S, S)``
    float32 additive bias shared across the batch (e.g. CLIP's causal
    mask). Returns ``(B*S, H)`` in q's dtype. B must be a multiple of
    ``block_b`` (callers pad the batch bucket)."""
    BS, H = q.shape
    S = seq_len
    B = BS // S
    hd = H // num_heads
    assert B * S == BS and hd * num_heads == H, (q.shape, num_heads, S)
    assert k.shape == v.shape == (BS, H)
    assert key_bias.shape == (B, S), (key_bias.shape, B, S)
    assert B % block_b == 0, (B, block_b)
    has_pos = pos_bias is not None
    if has_pos:
        assert pos_bias.shape == (S, S), pos_bias.shape

    grid = (B // block_b,)
    block = (block_b * S, H)
    in_specs = [
        pl.BlockSpec(block, lambda bi: (bi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(block, lambda bi: (bi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(block, lambda bi: (bi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, S), lambda bi: (bi, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [q, k, v, key_bias]
    if has_pos:
        in_specs.append(
            pl.BlockSpec((S, S), lambda bi: (0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(pos_bias)
    return pl.pallas_call(
        functools.partial(
            _attention_kernel, sm_scale=sm_scale, nh=num_heads, S=S, hd=hd,
            bb=block_b, has_pos=has_pos,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(block, lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BS, H), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * S * S * hd,
            bytes_accessed=4 * BS * H * q.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention_ad(
    q, k, v, key_bias, sm_scale, num_heads, seq_len, pos_bias=None
):
    """Differentiable wrapper: Pallas-fused forward, XLA-recompute backward.

    Training (contrastive / sigmoid fine-tuning, ``training.py``)
    differentiates the encoders; Pallas kernels have no automatic VJP, so
    the backward pass recomputes attention with the XLA formula and
    differentiates that — a standard rematerialization trade (backward
    batches are small)."""
    return fused_attention(
        q, k, v, key_bias, sm_scale, num_heads=num_heads, seq_len=seq_len,
        pos_bias=pos_bias,
    )


def _fa_fwd(q, k, v, key_bias, sm_scale, num_heads, seq_len, pos_bias=None):
    out = fused_attention(
        q, k, v, key_bias, sm_scale, num_heads=num_heads, seq_len=seq_len,
        pos_bias=pos_bias,
    )
    return out, (q, k, v, key_bias, pos_bias)


def _fa_bwd(sm_scale, num_heads, seq_len, res, g):
    q, k, v, key_bias, pos_bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_xla(
            q_, k_, v_, key_bias, sm_scale, num_heads, seq_len, pos_bias
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    dpos = None if pos_bias is None else jnp.zeros_like(pos_bias)
    return dq, dk, dv, jnp.zeros_like(key_bias), dpos


fused_attention_ad.defvjp(_fa_fwd, _fa_bwd)


def fused_attention_supported_padded(
    B: int, S: int, hd: int, has_pos_bias: bool = False, block_b: int = 8
) -> bool:
    """Like :func:`fused_attention_supported` but for towers with
    sublane-unaligned sequence lengths (CLIP text S=77, vision S=50) that
    reach the kernel through :func:`fused_attention_padded`.

    The pad-copy overhead only pays off when the XLA path is expensive:
    measured on v5e at B=128, causal CLIP text (S=77→80) is 3.0x faster
    fused, but mask-free CLIP vision (S=50→56) is 0.89x — so unaligned
    shapes qualify only when a pos_bias is present; aligned shapes always
    qualify (the pad is a no-op)."""
    s_pad = _round_up8(S)
    return (
        jax.default_backend() == "tpu"
        and B % block_b == 0
        and s_pad <= 256
        and hd <= 128
        and (S % 8 == 0 or has_pos_bias)
    )


def _round_up8(x: int) -> int:
    return (x + 7) // 8 * 8


def fused_attention_padded(
    q, k, v, key_bias, sm_scale, num_heads, seq_len, pos_bias=None
):
    """Sequence-padded entry to the VMEM kernel: pads S up to a sublane
    multiple (8), masks the padded key positions via ``key_bias``, and
    slices the pad rows back off — so unaligned towers (CLIP S=77/50) get
    the fused path instead of the (B, nh, S, S) HBM round-trip. The pad
    copy costs 3·B·S_pad·H bytes; the XLA path materializes ~2·B·nh·S²
    f32 logits/probs, so this wins for every CLIP/SigLIP shape.
    Differentiable (wraps ``fused_attention_ad``)."""
    S = seq_len
    s_pad = _round_up8(S)
    if s_pad == S:
        return fused_attention_ad(
            q, k, v, key_bias, sm_scale, num_heads, S, pos_bias
        )
    BS, H = q.shape
    B = BS // S

    def padseq(x):
        x = x.reshape(B, S, H)
        x = jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0)))
        return x.reshape(B * s_pad, H)

    kb = jnp.pad(
        key_bias, ((0, 0), (0, s_pad - S)), constant_values=-1e9
    )
    pb = (
        None
        if pos_bias is None
        else jnp.pad(pos_bias, ((0, s_pad - S), (0, s_pad - S)))
    )
    out = fused_attention_ad(
        padseq(q), padseq(k), padseq(v), kb, sm_scale, num_heads, s_pad, pb
    )
    return out.reshape(B, s_pad, H)[:, :S, :].reshape(BS, H)


def attention_xla(
    q: jax.Array, k: jax.Array, v: jax.Array, key_bias: jax.Array,
    sm_scale: float, num_heads: int, seq_len: int,
    pos_bias: jax.Array | None = None,
) -> jax.Array:
    """XLA fallback with identical semantics and the same (B*S, H) layout
    contract (used off-TPU and as the oracle in tests)."""
    BS, H = q.shape
    S = seq_len
    B = BS // S
    hd = H // num_heads

    def split(x):
        return x.reshape(B, S, num_heads, hd)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", split(q), split(k),
        preferred_element_type=jnp.float32,
    )
    logits = logits * sm_scale + key_bias[:, None, None, :]
    if pos_bias is not None:
        logits = logits + pos_bias[None, None, :, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, split(v),
        preferred_element_type=jnp.float32,
    )
    return ctx.astype(q.dtype).reshape(BS, H)
