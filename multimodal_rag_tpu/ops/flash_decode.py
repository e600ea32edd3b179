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

TENSOR PARALLELISM (r5): the kernel is wrapped in
``jax.experimental.custom_partitioning`` so GSPMD/Shardy can partition
the custom call along the BATCH and KV-HEAD axes — exactly the axes
``parallel/decoder_tp.cache_spec`` shards the cache on. Attention
decomposes per (batch, kv-head) row with no cross-shard reduction
(softmax runs over the UNSHARDED key axis), so the per-shard lowering
is this same kernel on the local shard; each shard computes its own
ragged live span from its local mask. S / layer / head-group / head-dim
axes are forced replicated by the partition rule. This removes r4's
``device_count()==1`` gate: TP-sharded serving now keeps the fused
kernel instead of falling back to the slice+einsum path (~2.4 ms/GiB
vs the kernel's ~1.2).

INT8 KV (r5): with ``k_scale``/``v_scale`` stacks (per-token, per-head
f32 scales), the kernel streams int8 k/v tiles from HBM — HALF the
cache bytes per step of the bf16 stream, which is the long-context
decode bound (BASELINE.md r4: ~1.4 ms/GiB residual read floor) — and
dequantizes in VMEM before the dots. Only the HBM bytes change; the
matmuls stay bf16 on the MXU (the qmatmul_int4 recipe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

NEG = -1e30


def _kernel(l_ref, q_ref, msk_ref, k_ref, v_ref, *rest, sm_scale,
            softcap, n_tiles, use_sinks, quant):
    # l_ref: (layer, first_live_tile, last_live_tile) — layer feeds the
    # index_map; first/last bound the live span (ragged early-exit).
    if quant:
        ks_ref, vs_ref, sink_ref, o_ref, acc_ref, m_ref, d_ref = rest
    else:
        sink_ref, o_ref, acc_ref, m_ref, d_ref = rest
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
        # int8 tiles convert to bf16 for the MXU dots; their per-token
        # scales fold into the SCORES and the PROBS (hd x fewer
        # multiplies than dequantizing the tiles — measured: tile-side
        # dequant cost MORE than the halved HBM bytes saved):
        #   q · (k_i8 * ks) == (q · k_i8) * ks      per key token
        #   p · (v_i8 * vs) == (p * vs) · v_i8      per value token
        k = k_ref[0].reshape(B * n, TS, hd).astype(q.dtype)
        v = v_ref[0].reshape(B * n, TS, hd)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                 # (B*n, g, TS)
        if quant:
            s = s * ks_ref[0].reshape(B * n, 1, TS)
        s = s * sm_scale
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
        if quant:
            pv = (p * vs_ref[0].reshape(B * n, 1, TS)).astype(q.dtype)
        else:
            pv = p.astype(v.dtype)
        ctx = jax.lax.dot_general(
            pv, v.astype(q.dtype) if quant else v,
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


def flash_decode_ok(cfg, S: int, batch: int,
                    allow_interpret: bool = False) -> bool:
    """Static gate for the kernel path: TPU backend (or an explicit
    interpret-mode override for CPU-mesh tests), a tile that divides the
    cache length within VMEM budget, MXU-friendly head dim, no MLA
    (absorbed latent attention has its own kernel — flash_decode_mla).

    The VMEM check uses GLOBAL shapes — conservative under TP, where
    each shard holds n_kv/tp heads and the per-shard lowering re-picks
    a (possibly larger) tile from the local shapes."""
    return (
        (jax.default_backend() == "tpu" or allow_interpret)
        and not cfg.kv_lora_rank
        and cfg.head_dim in (64, 128)
        and _pick_tile(S, batch, cfg.num_kv_heads, cfg.head_dim) > 0
    )


def _flash_impl(*args, sm_scale, softcap, use_sinks, quant, interpret):
    """Single-shard lowering: ragged span from the (local) mask, then
    the pallas_call. Runs on GLOBAL shapes when unpartitioned and on
    LOCAL shards inside GSPMD's per-shard lowering (custom_partitioning
    below) — tile choice and the live span adapt to whatever arrives."""
    if quant:
        q, mask, k_stack, v_stack, k_scale, v_scale, sinks, layer = args
    else:
        q, mask, k_stack, v_stack, sinks, layer = args
    B, n, g, hd = q.shape
    L, Bk, nk, S, hdk = k_stack.shape
    assert (B, n, hd) == (Bk, nk, hdk), (q.shape, k_stack.shape)
    TS = _pick_tile(S, B, n, hd)
    assert TS, f"cache length {S} not tileable within VMEM budget"

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

    def _sc_idx(j, l):
        return (l[0], 0, 0, jnp.minimum(l[1] + j, l[2]))

    in_specs = [
        pl.BlockSpec((B, n, g, hd), lambda j, l: (0, 0, 0, 0)),
        pl.BlockSpec(
            (B, TS), lambda j, l: (0, jnp.minimum(l[1] + j, l[2]))
        ),
        pl.BlockSpec((1, B, n, TS, hd), _kv_idx),
        pl.BlockSpec((1, B, n, TS, hd), _kv_idx),
    ]
    operands = [
        # Float caches: q joins the cache dtype (CPU tests run f32).
        # int8 caches: q goes bf16 and tiles dequantize to bf16 in VMEM.
        q.astype(jnp.bfloat16 if quant else k_stack.dtype),
        mask.astype(jnp.float32),
        k_stack,
        v_stack,
    ]
    if quant:
        in_specs += [
            pl.BlockSpec((1, B, n, TS), _sc_idx),
            pl.BlockSpec((1, B, n, TS), _sc_idx),
        ]
        operands += [
            k_scale.astype(jnp.float32),
            v_scale.astype(jnp.float32),
        ]
    in_specs.append(pl.BlockSpec((n, g), lambda j, l: (0, 0)))
    operands.append(jnp.asarray(sinks, jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, n, g, hd), lambda j, l: (0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B * n, g, hd), jnp.float32),
            pltpu.VMEM((B * n, g), jnp.float32),
            pltpu.VMEM((B * n, g), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, softcap=softcap, n_tiles=n_tiles,
        use_sinks=use_sinks, quant=quant,
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
        *operands,
    )


def _axes(spec, i):
    """Mesh axes a PartitionSpec pins at dim ``i`` (None past its end)."""
    return spec[i] if spec is not None and len(spec) > i else None


@functools.lru_cache(maxsize=None)
def _flash_partitioned(sm_scale, softcap, use_sinks, quant, interpret):
    """custom_partitioning wrapper keyed on the static config.

    Partition rule: batch (factor b) and kv-head (factor n) axes may
    shard — attention is independent per (batch, kv-head) row; the
    softmax reduction runs over the key axis s, which (with layer l,
    group g, head-dim h) is FORCED replicated. The k-stack's sharding
    is the source of truth (parallel/decoder_tp.cache_spec places it);
    q/mask/sinks are resharded to match (tiny at T=1). The per-shard
    lowering is the unpartitioned impl on the local shard, each shard
    computing its own ragged live span from its local mask rows."""
    def impl(*args):
        # A plain positional signature: custom_partitioning resolves
        # arguments by position and rejects functools.partial kwargs.
        return _flash_impl(
            *args, sm_scale=sm_scale, softcap=softcap,
            use_sinks=use_sinks, quant=quant, interpret=interpret,
        )

    fp = custom_partitioning(impl)
    if quant:
        rule = ("b n g h, b s, l b n s h, l b n s h, l b n s, l b n s, "
                "n g, -> b n g h")
    else:
        rule = "b n g h, b s, l b n s h, l b n s h, n g, -> b n g h"

    def _shardings(mesh, arg_shapes):
        spec = arg_shapes[2].sharding.spec  # k_stack (l, b, n, s, h)
        b, n_ax = _axes(spec, 1), _axes(spec, 2)
        out = NamedSharding(mesh, P(b, n_ax, None, None))
        kv = NamedSharding(mesh, P(None, b, n_ax, None, None))
        args = [
            out,                                  # q
            NamedSharding(mesh, P(b, None)),      # mask
            kv, kv,                               # k_stack, v_stack
        ]
        if quant:
            sc = NamedSharding(mesh, P(None, b, n_ax, None))
            args += [sc, sc]
        args += [
            NamedSharding(mesh, P(n_ax, None)),   # sinks
            NamedSharding(mesh, P()),             # layer scalar
        ]
        return out, tuple(args)

    def infer(mesh, arg_shapes, result_shape):
        return _shardings(mesh, arg_shapes)[0]

    def partition(mesh, arg_shapes, result_shape):
        out, args = _shardings(mesh, arg_shapes)
        return mesh, impl, out, args

    fp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return fp


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "softcap", "interpret"),
)
def flash_decode(q, k_stack, v_stack, layer, mask, sinks=None, *,
                 sm_scale: float, softcap: float = 0.0,
                 k_scale=None, v_scale=None, interpret: bool = False):
    """q: (B, n_kv, g, hd); k_stack/v_stack: (L, B, n_kv, S, hd) bf16 —
    or int8 with per-(token, head) f32 ``k_scale``/``v_scale`` stacks
    (L, B, n_kv, S), dequantized in VMEM (int8 KV cache mode); layer:
    scalar int32 (may be traced); mask: (B, S) ADDITIVE f32 (0 =
    attendable, -1e9 = not — pad/window/ring already folded in by the
    caller); sinks: optional (n_kv, g) f32. Returns ctx (B, n_kv, g, hd)
    f32 — the probs @ v of decoder._attn_scores for the single query.

    GSPMD-partitionable on the batch and kv-head axes (TP serving keeps
    the kernel; see module docstring). On non-TPU backends the kernel
    runs in interpret mode — correctness paths only; ``flash_decode_ok``
    gates production use to TPU."""
    B, n, g, hd = q.shape
    use_sinks = sinks is not None
    if sinks is None:
        sinks = jnp.zeros((n, g), jnp.float32)
    quant = k_scale is not None
    if jax.default_backend() != "tpu":
        interpret = True
    fp = _flash_partitioned(
        float(sm_scale), float(softcap), use_sinks, quant, interpret
    )
    args = [q, mask.astype(jnp.float32), k_stack, v_stack]
    if quant:
        args += [k_scale, v_scale]
    args += [jnp.asarray(sinks, jnp.float32), jnp.asarray(layer, jnp.int32)]
    return fp(*args)


# ---------------------------------------------------------------------------
# MLA (DeepSeek absorbed latent attention) variant
# ---------------------------------------------------------------------------
#
# The T=1 MLA decode (models/decoder.py _mla_attn) is, per layer:
#   s   = (q_abs · c + q_rope · k_rope) * sm_scale + mask     (B, n, S)
#   ctx = softmax(s) · c                                      (B, n, r)
# where c is the rank-r latent cache and k_rope the shared dr-dim roped
# key — i.e. a GQA decode with ONE kv head, n query groups, a split
# "key" [c ‖ k_rope] and the value being c itself. The weight-absorbed
# projections (w_kvb folded into query and output) stay OUTSIDE the
# kernel: they are weight matmuls XLA already fuses well; the kernel's
# job is the cache stream. Same scalar-prefetch layer row, same ragged
# early-exit. DeepSeek-V3 at ctx 2560 carries ~1.4 GiB of latent cache
# (61 layers, B=8) — without the kernel each layer's row slice is
# materialized before the dots, the same ~2.4 ms/GiB tax the GQA kernel
# removed.


def _mla_kernel(l_ref, qa_ref, qr_ref, msk_ref, c_ref, kr_ref, o_ref,
                acc_ref, m_ref, d_ref, *, sm_scale, n_tiles):
    j = pl.program_id(0)
    B, n, r = qa_ref.shape
    dr = qr_ref.shape[2]
    TS = c_ref.shape[3]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        d_ref[...] = jnp.zeros_like(d_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(l_ref[1] + j <= l_ref[2])
    def _body():
        c = c_ref[0].reshape(B, TS, r)
        kr = kr_ref[0].reshape(B, TS, dr)
        s = (
            jax.lax.dot_general(
                qa_ref[...], c,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                qr_ref[...], kr,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        ) * sm_scale                              # (B, n, TS)
        s = s + msk_ref[...][:, None, :]
        m_prev = m_ref[...]                       # (B, n)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m_prev - m_new)
        d_new = d_ref[...] * alpha + jnp.sum(p, axis=-1)
        ctx = jax.lax.dot_general(
            p.astype(c.dtype), c,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (B, n, r)
        acc_ref[...] = acc_ref[...] * alpha[..., None] + ctx
        m_ref[...] = m_new
        d_ref[...] = d_new

    @pl.when(j == n_tiles - 1)
    def _finalize():
        o_ref[...] = acc_ref[...] / jnp.maximum(
            d_ref[...], 1e-30
        )[..., None]


def _pick_tile_mla(S: int, B: int, r: int, dr: int) -> int:
    """Largest tile dividing S with double-buffered c+kr blocks
    (2 * B*TS*(r+dr) bf16 bytes) inside the scoped VMEM budget."""
    for t in (512, 256, 128):
        if S % t == 0 and 2 * B * t * (r + dr) * 2 * 2 <= _VMEM_BUDGET:
            return t
    return 0


def flash_decode_mla_ok(cfg, S: int, batch: int,
                        allow_interpret: bool = False) -> bool:
    """Static gate for the MLA kernel path (mirrors flash_decode_ok)."""
    return (
        (jax.default_backend() == "tpu" or allow_interpret)
        and bool(cfg.kv_lora_rank)
        and not cfg.attn_logit_softcap
        and _pick_tile_mla(
            S, batch, cfg.kv_lora_rank, cfg.qk_rope_head_dim
        ) > 0
    )


def _mla_impl(q_abs, q_rope, mask, c_stack, kr_stack, layer, *,
              sm_scale, interpret):
    B, n, r = q_abs.shape
    dr = q_rope.shape[2]
    L, Bk, one, S, rk = c_stack.shape
    assert (B, 1, r) == (Bk, one, rk), (q_abs.shape, c_stack.shape)
    TS = _pick_tile_mla(S, B, r, dr)
    assert TS, f"latent cache length {S} not tileable within VMEM budget"
    n_tiles = S // TS
    live = (mask > -1e8).reshape(B, n_tiles, TS).any(axis=(0, 2))
    ti = jnp.arange(n_tiles, dtype=jnp.int32)
    first = jnp.min(jnp.where(live, ti, n_tiles - 1))
    last = jnp.max(jnp.where(live, ti, 0))

    def _kv_idx(j, l):
        return (l[0], 0, 0, jnp.minimum(l[1] + j, l[2]), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, n, r), lambda j, l: (0, 0, 0)),
            pl.BlockSpec((B, n, dr), lambda j, l: (0, 0, 0)),
            pl.BlockSpec(
                (B, TS), lambda j, l: (0, jnp.minimum(l[1] + j, l[2]))
            ),
            pl.BlockSpec((1, B, 1, TS, r), _kv_idx),
            pl.BlockSpec((1, B, 1, TS, dr), _kv_idx),
        ],
        out_specs=pl.BlockSpec((B, n, r), lambda j, l: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B, n, r), jnp.float32),
            pltpu.VMEM((B, n), jnp.float32),
            pltpu.VMEM((B, n), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _mla_kernel, sm_scale=sm_scale, n_tiles=n_tiles
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n, r), jnp.float32),
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
        q_abs.astype(c_stack.dtype),
        q_rope.astype(c_stack.dtype),
        mask.astype(jnp.float32),
        c_stack,
        kr_stack,
    )


@functools.lru_cache(maxsize=None)
def _mla_partitioned(sm_scale, interpret):
    """MLA partition rule: the latent cache has ONE head — only the
    batch axis and the QUERY-head axis n (carried by q_abs/q_rope and
    the output; DeepSeek TP shards query heads, the latent cache
    replicates) may shard. q_abs's sharding is the source of truth for
    n; the c-stack's for b. The softmax key axis s stays replicated."""

    def impl(*args):
        return _mla_impl(*args, sm_scale=sm_scale, interpret=interpret)

    fp = custom_partitioning(impl)
    rule = "b n r, b n d, b s, l b o s r, l b o s d, -> b n r"

    def _shardings(mesh, arg_shapes):
        n_ax = _axes(arg_shapes[0].sharding.spec, 1)
        b = _axes(arg_shapes[3].sharding.spec, 1)
        out = NamedSharding(mesh, P(b, n_ax, None))
        args = (
            out,                                           # q_abs
            NamedSharding(mesh, P(b, n_ax, None)),         # q_rope
            NamedSharding(mesh, P(b, None)),               # mask
            NamedSharding(mesh, P(None, b, None, None, None)),  # c
            NamedSharding(mesh, P(None, b, None, None, None)),  # kr
            NamedSharding(mesh, P()),                      # layer
        )
        return out, args

    def infer(mesh, arg_shapes, result_shape):
        return _shardings(mesh, arg_shapes)[0]

    def partition(mesh, arg_shapes, result_shape):
        out, args = _shardings(mesh, arg_shapes)
        return mesh, impl, out, args

    fp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return fp


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret")
)
def flash_decode_mla(q_abs, q_rope, c_stack, kr_stack, layer, mask, *,
                     sm_scale: float, interpret: bool = False):
    """Fused T=1 MLA decode attention over the stacked LATENT cache.

    q_abs: (B, n, r) absorbed rank-r queries (qn · w_k per head);
    q_rope: (B, n, dr) roped queries; c_stack: (L, B, 1, S, r) rmsnormed
    latents; kr_stack: (L, B, 1, S, dr) shared roped keys; mask: (B, S)
    additive f32. Returns the latent-space context (B, n, r) f32 — the
    caller applies w_kvb's v-half (models/decoder.py _mla_attn).
    GSPMD-partitionable on batch and query-head axes."""
    if jax.default_backend() != "tpu":
        interpret = True
    fp = _mla_partitioned(float(sm_scale), interpret)
    return fp(
        q_abs, q_rope, mask.astype(jnp.float32), c_stack, kr_stack,
        jnp.asarray(layer, jnp.int32),
    )


def flash_decode_mla_reference(q_abs, q_rope, c_stack, kr_stack, layer,
                               mask, *, sm_scale: float):
    """Oracle: the exact XLA math of decoder._mla_attn's T=1 score/
    context path over the sliced layer row."""
    c = jax.lax.dynamic_index_in_dim(c_stack, layer, 0, keepdims=False)
    kr = jax.lax.dynamic_index_in_dim(kr_stack, layer, 0, keepdims=False)
    c, kr = c[:, 0], kr[:, 0]  # (B, S, r) / (B, S, dr)
    s = (
        jnp.einsum("bnr,bsr->bns", q_abs.astype(c.dtype), c,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bnd,bsd->bns", q_rope.astype(kr.dtype), kr,
                     preferred_element_type=jnp.float32)
    ) * sm_scale
    s = s + mask[:, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bns,bsr->bnr", probs.astype(c.dtype), c,
        preferred_element_type=jnp.float32,
    )


def flash_decode_reference(q, k_stack, v_stack, layer, mask, sinks=None,
                           *, sm_scale: float, softcap: float = 0.0,
                           k_scale=None, v_scale=None):
    """Oracle: the exact XLA math of decoder._attn_scores for T=1 over
    the sliced layer row (tests verify the kernel against this).
    int8 stacks dequantize up front with their f32 scale stacks."""
    k = jax.lax.dynamic_index_in_dim(k_stack, layer, 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(v_stack, layer, 0, keepdims=False)
    if k_scale is not None:
        ks = jax.lax.dynamic_index_in_dim(
            k_scale, layer, 0, keepdims=False
        )
        vs = jax.lax.dynamic_index_in_dim(
            v_scale, layer, 0, keepdims=False
        )
        k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
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
