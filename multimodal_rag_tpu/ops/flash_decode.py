"""Fused single-token (T=1) GQA decode attention over the STACKED cache.

Why this exists (r4, measured on v5e): after the head-major relayout and
the carry-form layer scan (models/decoder.py `_run_layers`), the
remaining long-context decode cost was the per-layer `dynamic_slice` of
the layer's cache row — XLA materializes the (B, n_kv, S, hd) slice
before the attention dot can read it, ~2.4 ms per GiB of cache per step
against the 1.2 ms/GiB read floor. This kernel removes the materialize:
a scalar-prefetch ``index_map`` (same trick as ops/qmatmul_int4.py)
streams the layer's k/v tiles STRAIGHT out of the stacked
(L, B, n_kv, S, hd) HBM buffer through VMEM with a flash-style online
softmax — the cache is read exactly once per step and no row copy ever
exists.

Semantics mirror decoder._attn_scores for the T=1 case exactly:
``softmax(softcap(q·k * sm_scale) + mask)`` per (batch, kv-head, group)
row, optional GPT-OSS attention SINKS joining the denominator (their
mass dropped), and the caller's additive f32 mask (B, S) carrying pad /
causal / sliding-window / ring validity — so every masking scheme the
XLA path supports works unchanged. Numerics: the online softmax
reassociates the reduction, so logits match the XLA path to bf16/f32
rounding (tests gate on tight allclose + greedy-token equality).

The grid is (S/TS,): each step DMAs one (B, n_kv, TS, hd) tile of k and
v while the previous tile computes; batch and heads stay whole in the
block so per-invocation overhead is paid ~S/TS times per layer, not
B*n_kv*S/TS times.

RAGGED EARLY-EXIT (r4): the caller's mask already says which slots are
live — left-pad of short prompts bucketed long, the unwritten tail
beyond the current decode position, outside-window ring slots. The
wrapper reduces it to the FIRST and LAST tile any batch row can attend
and prefetches both next to the layer index; the k/v/mask index_maps
then walk ``min(first + j, last)`` and the compute body is
``pl.when``-guarded to that span. Pallas elides the DMA whenever the
block index repeats, so dead tiles cost neither HBM reads nor flops —
a request 1300 tokens deep in a 2304-slot bucket streams 1300 slots,
not 2304. Dense masks degenerate to the full walk with zero overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(l_ref, q_ref, msk_ref, k_ref, v_ref, sink_ref, o_ref,
            acc_ref, m_ref, d_ref, *, sm_scale, softcap, n_tiles,
            use_sinks):
    # l_ref: (layer, first_live_tile, last_live_tile) — layer feeds the
    # index_map; first/last bound the live span (ragged early-exit).
    j = pl.program_id(0)
    B, n, g, hd = q_ref.shape
    TS = k_ref.shape[3]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        d_ref[...] = jnp.zeros_like(d_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(l_ref[1] + j <= l_ref[2])
    def _body():
        # Mosaic's matmul supports ONE batch dim — fold (B, n_kv).
        q = q_ref[...].reshape(B * n, g, hd)   # bf16
        k = k_ref[0].reshape(B * n, TS, hd)    # bf16
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale     # (B*n, g, TS)
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        mrow = jnp.broadcast_to(
            msk_ref[...][:, None, :], (B, n, TS)
        ).reshape(B * n, 1, TS)
        s = s + mrow
        m_prev = m_ref[...]                       # (B*n, g)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])         # (B*n, g, TS)
        alpha = jnp.exp(m_prev - m_new)
        d_new = d_ref[...] * alpha + jnp.sum(p, axis=-1)
        ctx = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0].reshape(B * n, TS, hd),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (B*n, g, hd)
        acc_ref[...] = acc_ref[...] * alpha[..., None] + ctx
        m_ref[...] = m_new
        d_ref[...] = d_new

    @pl.when(j == n_tiles - 1)
    def _finalize():
        denom = d_ref[...]
        if use_sinks:
            # GPT-OSS sinks: one extra logit per head in the softmax
            # denominator, its mass dropped (decoder._attn_scores).
            sink = jnp.broadcast_to(
                sink_ref[...][None, :, :], (B, n, g)
            ).reshape(B * n, g)
            denom = denom + jnp.exp(sink - m_ref[...])
        o_ref[...] = (
            acc_ref[...] / jnp.maximum(denom, 1e-30)[..., None]
        ).reshape(B, n, g, hd)


_VMEM_BUDGET = 12 * 2**20  # leave headroom under the 16 MB scoped limit


def _pick_tile(S: int, B: int = 8, n: int = 4, hd: int = 128) -> int:
    """Largest tile that divides S AND keeps the double-buffered k+v
    blocks (4 * B*n*TS*hd bf16 bytes) inside the scoped VMEM budget."""
    for t in (512, 256, 128):
        if S % t == 0 and 4 * B * n * t * hd * 2 <= _VMEM_BUDGET:
            return t
    return 0


def flash_decode_ok(cfg, S: int, batch: int) -> bool:
    """Static gate for the kernel path: TPU backend, a tile that divides
    the cache length within VMEM budget, MXU-friendly head dim, no MLA
    (latent attention has its own math)."""
    return (
        jax.default_backend() == "tpu"
        # GSPMD cannot partition the custom call: TP-sharded caches
        # (multi-device serving) keep the XLA slice+einsum path.
        and jax.device_count() == 1
        and not cfg.kv_lora_rank
        and cfg.head_dim in (64, 128)
        and _pick_tile(S, batch, cfg.num_kv_heads, cfg.head_dim) > 0
    )


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "softcap", "interpret"),
)
def flash_decode(q, k_stack, v_stack, layer, mask, sinks=None, *,
                 sm_scale: float, softcap: float = 0.0,
                 interpret: bool = False):
    """q: (B, n_kv, g, hd); k_stack/v_stack: (L, B, n_kv, S, hd) bf16;
    layer: scalar int32 (may be traced); mask: (B, S) ADDITIVE f32 (0 =
    attendable, -1e9 = not — pad/window/ring already folded in by the
    caller); sinks: optional (n_kv, g) f32. Returns ctx (B, n_kv, g, hd)
    f32 — the probs @ v of decoder._attn_scores for the single query."""
    B, n, g, hd = q.shape
    L, Bk, nk, S, hdk = k_stack.shape
    assert (B, n, hd) == (Bk, nk, hdk), (q.shape, k_stack.shape)
    TS = _pick_tile(S, B, n, hd)
    assert TS, f"cache length {S} not tileable within VMEM budget"
    use_sinks = sinks is not None
    if sinks is None:
        sinks = jnp.zeros((n, g), jnp.float32)

    # Live tile span over ALL batch rows (ragged early-exit): a tile no
    # row can attend is walked with a clamped index — its DMA is elided
    # (block index unchanged) and its compute is pl.when-guarded out.
    n_tiles = S // TS
    live = (
        (mask > -1e8).reshape(B, n_tiles, TS).any(axis=(0, 2))
    )  # (n_tiles,) bool
    ti = jnp.arange(n_tiles, dtype=jnp.int32)
    first = jnp.min(jnp.where(live, ti, n_tiles - 1))
    last = jnp.max(jnp.where(live, ti, 0))

    def _kv_idx(j, l):
        return (l[0], 0, 0, jnp.minimum(l[1] + j, l[2]), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, n, g, hd), lambda j, l: (0, 0, 0, 0)),
            pl.BlockSpec(
                (B, TS), lambda j, l: (0, jnp.minimum(l[1] + j, l[2]))
            ),
            pl.BlockSpec((1, B, n, TS, hd), _kv_idx),
            pl.BlockSpec((1, B, n, TS, hd), _kv_idx),
            pl.BlockSpec((n, g), lambda j, l: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, n, g, hd), lambda j, l: (0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B * n, g, hd), jnp.float32),
            pltpu.VMEM((B * n, g), jnp.float32),
            pltpu.VMEM((B * n, g), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, softcap=softcap, n_tiles=S // TS,
        use_sinks=use_sinks,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n, g, hd), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        jnp.stack([
            jnp.asarray(layer, jnp.int32),
            first.astype(jnp.int32),
            last.astype(jnp.int32),
        ]),
        q.astype(k_stack.dtype),
        mask.astype(jnp.float32),
        k_stack,
        v_stack,
        jnp.asarray(sinks, jnp.float32),
    )


def flash_decode_reference(q, k_stack, v_stack, layer, mask, sinks=None,
                           *, sm_scale: float, softcap: float = 0.0):
    """Oracle: the exact XLA math of decoder._attn_scores for T=1 over
    the sliced layer row (tests verify the kernel against this)."""
    k = jax.lax.dynamic_index_in_dim(k_stack, layer, 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(v_stack, layer, 0, keepdims=False)
    s = jnp.einsum(
        "bngh,bnsh->bngs", q.astype(k.dtype), k,
        preferred_element_type=jnp.float32,
    ) * sm_scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    s = s + mask[:, None, None, :].astype(jnp.float32)
    if sinks is not None:
        B, n, g, S = s.shape
        sink = jnp.broadcast_to(
            jnp.asarray(sinks, jnp.float32)[None, :, :, None],
            (B, n, g, 1),
        )
        probs = jax.nn.softmax(
            jnp.concatenate([s, sink], axis=-1), axis=-1
        )[..., :S]
    else:
        probs = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bngs,bnsh->bngh", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
