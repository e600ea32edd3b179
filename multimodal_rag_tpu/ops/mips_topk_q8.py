"""Int8-quantized MIPS top-k: half the HBM traffic of bf16.

The exact kernel in :mod:`multimodal_rag_tpu.ops.mips_topk` is HBM-bound —
at 10M × 384 bf16 rows one pass reads ~7.7 GB (~9.4 ms speed-of-light on
v5e). This module stores the database as **per-row symmetric int8**
(`V_q[i] = round(V[i] / s[i])`, `s[i] = max|V[i]| / 127`) so the stream is
~3.9 GB and the same search beats the < 5 ms north-star target
(BASELINE.md §3) on ONE chip.

Two-stage contract:

1. the kernel streams int8 tiles and harvests a **candidate pool** — a
   running top-3 per *lane class* (128 classes = column-mod-128 with a
   per-group rotation so adjacent rows land in different classes) kept in
   VMEM across tiles — then extracts the top-``kc`` of the pool once, on
   the last tile. Selection cost is ~constant in ``kc`` (≤ 384): the
   per-tile work is one compare-insert sweep, NOT ``kc`` max/argmax
   passes over the tile (measured: the pass-per-k design costs ~0.7 ms
   per extra k at 10M — 17 ms at kc=21 — while the pooled design stays
   ~5.5 ms at any kc).
2. the caller rescores the candidates against the **float32 host mirror**
   (:func:`rescore_exact`) — final scores and ordering are
   full-precision.

Recall contract (the honest framing — same class of trade-off as the IVF
path): a true top-k row is missed only if ≥ 3 rows with higher
*quantized* score fall in its lane class. Quantization noise is
σ ≈ max|v|/254 per component (~5e-4 for unit-norm 384-d rows), so the
"higher-quantized" set is k plus a handful of near-ties spread over 128
classes — miss probability ≈ C(n_near, 3)/128³ per row (≪ 1%; measured
1.0 on random corpora in tests). A miss swaps in a row whose exact score
is within ~2·‖q‖₁·s/2 of the true one. The bf16 kernel remains the
default, strictly-exact path; int8 is the opt-in VECTOR_DTYPE=int8 mode.

The int8 tiles are widened to the query dtype (bf16) in-register —
lossless (|q| ≤ 127 ≪ 2^8) — so the MXU matmul is identical to the bf16
kernel; only the HBM bytes change. Replaces the same reference hot loop
(hnswlib via ``app/utils/embedder.py:595-609``) as the bf16 kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_rag_tpu.ops.mips_topk import (
    LANES,
    NEG_INF,
    _round_up,
)

POOL_SLOTS = 3  # top-3 per lane class → kc ≤ 3·128 = 384
INT_MAX = jnp.iinfo(jnp.int32).max

# Minimum tile count for the pooled Pallas kernel. The dominant candidate
# -miss mechanism is the stage-1 per-(tile, lane-class) fold: a true
# top-k row is dropped if ANY higher-quantized-score row shares its tile
# and class, P ≈ n_better/(n_tiles·128) per row — negligible at the 10M
# target (1,222 tiles) but a few percent at toy corpus sizes (4 tiles).
# Below this threshold callers should use :func:`mips_topk_q8_xla`
# (exact top-k over quantized scores; the (B, N) score matrix is tiny at
# these sizes), which leaves only quantization-ordering noise — covered
# by :func:`rescore_margin`. ≥64 tiles ⇒ per-row miss P ≲ n_better/8192.
Q8_PALLAS_MIN_TILES = 64


def prefer_pallas_q8(n_padded: int, tile_n: int) -> bool:
    """True when the corpus is large enough that the pooled kernel's
    (tile, class) collision probability is negligible."""
    return n_padded // tile_n >= Q8_PALLAS_MIN_TILES


def _sel(pred, a, b):
    """jax.lax.select — not jnp.where, whose inner-jit closed_call wrapper
    trips a lowering-cache KeyError when this kernel is nested under an
    outer jit (observed on jax 0.8 with Mosaic)."""
    return jax.lax.select(pred, a, b)


def _roll_lanes(x, g: int):
    """Static lane rotation via slice+concat (jnp.roll's _roll_static
    inner jit hits the same lowering-cache bug as jnp.where)."""
    g = g % x.shape[1]
    if g == 0:
        return x
    return jax.lax.concatenate([x[:, -g:], x[:, :-g]], 1)


def quantize_rows(vecs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization.

    vecs (N, D) float → (q8 (N, D) int8, scales (1, N) float32) with
    ``q8[i] * scales[0, i] ≈ vecs[i]``. All-zero rows get scale eps and
    quantize to zeros (the store masks them dead anyway).
    """
    vecs = np.asarray(vecs, np.float32)
    amax = np.abs(vecs).max(axis=1)
    scales = np.maximum(amax, 1e-12) / 127.0
    q8 = np.clip(np.rint(vecs / scales[:, None]), -127, 127).astype(np.int8)
    return q8, scales.astype(np.float32)[None, :]


def _extract_topk_by_index(scores, gidx, k: int):
    """k max passes over a candidate pool (B, W) with global indices
    (B, W) i32 → ((B, k) f32, (B, k) i32). Ties break to the SMALLEST
    global index (the kernel/oracle contract) — not the smallest column,
    because pool slots are not index-ordered."""
    vals_cols = []
    idx_cols = []
    imax = jnp.full_like(gidx, INT_MAX)
    ninf = jnp.full_like(scores, NEG_INF)
    for _ in range(k):
        m = jnp.max(scores, axis=1)
        is_m = scores == m[:, None]
        sel = jnp.min(_sel(is_m, gidx, imax), axis=1)
        vals_cols.append(m[:, None])
        idx_cols.append(sel[:, None])
        scores = _sel(is_m & (gidx == sel[:, None]), ninf, scores)
    return jnp.concatenate(vals_cols, axis=1), jnp.concatenate(idx_cols, axis=1)


def _mips_topk_q8_kernel(
    q_ref, v_ref, scale_ref, mask_ref, vals_out, idx_out,
    m1_ref, m2_ref, m3_ref, g1_ref, g2_ref, g3_ref,
    *, k: int, tile_n: int, out_k: int,
):
    ni = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(ni == 0)
    def _():
        for ref in (m1_ref, m2_ref, m3_ref):
            ref[:] = jnp.full_like(ref, NEG_INF)
        for ref in (g1_ref, g2_ref, g3_ref):
            ref[:] = jnp.full_like(ref, -1)

    # Native int8×int8 MXU matmul with int32 accumulation — no widening
    # pass over the (tile_n, D) block (a bf16 cast there costs ~3k VPU
    # vreg-ops per tile and was measured to dominate the kernel once the
    # HBM stream halved). Queries are pre-quantized per-row by the host
    # wrapper; the per-query scale is a positive scalar so it cannot
    # change each query's own candidate ordering and never enters the
    # kernel — candidate scores are (int32 dot) · row_scale, and the
    # caller's exact rescore restores true cosine scores.
    scores = jax.lax.dot_general(
        q_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = scores.astype(jnp.float32) * scale_ref[:] + mask_ref[:]

    B = scores.shape[0]
    base = ni * tile_n
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
    # Stage 1 — per-tile lane maxima: fold the tile's groups of 128 into
    # one (B, 128) max with arg tracking (3 VPU ops per group, the cheap
    # part of selection). Each group is rotated by its index so rows 128
    # apart (adjacent, often same-document chunks) land in different lane
    # classes — class(row) is a cheap hash of row % tile_n, not row % 128.
    # Within a tile only the best row per class survives this fold; a
    # *specific* better row sharing (tile, class) with a true top-k row
    # has probability ~rows_per_class/N, negligible at scale.
    m = None
    gm = None
    for g in range(tile_n // LANES):
        s = _roll_lanes(scores[:, g * LANES : (g + 1) * LANES], g)
        gi = _roll_lanes(lane, g) + (base + g * LANES)
        if m is None:
            m, gm = s, gi
        else:
            b = s > m
            m = _sel(b, s, m)
            gm = _sel(b, gi, gm)
    # Stage 2 — one top-3-per-class insert per tile into the running pool.
    # Strict > keeps the earlier (lower-index) entry on exact ties.
    m1, m2, m3 = m1_ref[:], m2_ref[:], m3_ref[:]
    g1, g2, g3 = g1_ref[:], g2_ref[:], g3_ref[:]
    b1 = m > m1
    b2 = m > m2
    b3 = m > m3
    m3 = _sel(b2, m2, _sel(b3, m, m3))
    g3 = _sel(b2, g2, _sel(b3, gm, g3))
    m2 = _sel(b1, m1, _sel(b2, m, m2))
    g2 = _sel(b1, g1, _sel(b2, gm, g2))
    m1 = _sel(b1, m, m1)
    g1 = _sel(b1, gm, g1)
    m1_ref[:], m2_ref[:], m3_ref[:] = m1, m2, m3
    g1_ref[:], g2_ref[:], g3_ref[:] = g1, g2, g3

    @pl.when(ni == n_tiles - 1)
    def _():
        pool_vals = jnp.concatenate([m1, m2, m3], axis=1)  # (B, 384)
        pool_idx = jnp.concatenate([g1, g2, g3], axis=1)
        vals, idx = _extract_topk_by_index(pool_vals, pool_idx, k)
        pad = out_k - k
        vals_out[:] = jnp.pad(vals, ((0, 0), (0, pad)),
                              constant_values=NEG_INF)
        idx_out[:] = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "tile_b", "interpret")
)
def mips_topk_q8(
    queries: jax.Array,
    db_q8: jax.Array,
    scales: jax.Array,
    mask: jax.Array,
    k: int,
    tile_n: int = 1024,
    tile_b: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Quantized candidate search: queries (B, D) × db_q8 (N, D) int8 with
    per-row scales (1, N) f32 → ((B, k) approx scores f32, (B, k) idx
    i32). k ≤ 384 (the lane-class pool size). Scores carry quantization
    noise — follow with :func:`rescore_exact` for exact final ordering.
    """
    B, D = queries.shape
    N, Dv = db_q8.shape
    assert D == Dv, (D, Dv)
    assert db_q8.dtype == jnp.int8, db_q8.dtype
    assert N % tile_n == 0, f"N={N} must be a multiple of tile_n={tile_n}"
    assert tile_n % LANES == 0, tile_n
    assert scales.shape == (1, N), scales.shape
    assert mask.shape == (1, N), mask.shape

    k_eff = min(k, N)
    assert k_eff <= POOL_SLOTS * LANES, (
        f"k={k_eff} exceeds the {POOL_SLOTS * LANES}-slot candidate pool"
    )
    out_k = _round_up(k_eff, LANES)
    tile_b = min(tile_b, _round_up(B, 8))
    b_pad = _round_up(B, tile_b)
    if b_pad != B:
        queries = jnp.pad(queries, ((0, b_pad - B), (0, 0)))
    # Symmetric per-query int8 quantization (see kernel comment: the
    # positive per-query scale cannot reorder that query's candidates, so
    # it is dropped — returned vals are int32-dot · row_scale, comparable
    # across shards for the same query, and rescored exactly by callers).
    qf = queries.astype(jnp.float32)
    qmax = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-12)
    queries = jnp.clip(
        jnp.rint(qf * (127.0 / qmax)), -127, 127
    ).astype(jnp.int8)

    grid = (b_pad // tile_b, N // tile_n)
    vals, idx = pl.pallas_call(
        functools.partial(
            _mips_topk_q8_kernel, k=k_eff, tile_n=tile_n, out_k=out_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda bi, ni: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda bi, ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda bi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda bi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, out_k), lambda bi, ni: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, out_k), lambda bi, ni: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, out_k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, out_k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, LANES), jnp.float32),
            pltpu.VMEM((tile_b, LANES), jnp.float32),
            pltpu.VMEM((tile_b, LANES), jnp.float32),
            pltpu.VMEM((tile_b, LANES), jnp.int32),
            pltpu.VMEM((tile_b, LANES), jnp.int32),
            pltpu.VMEM((tile_b, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * N * D,
            bytes_accessed=N * D + 8 * N,  # int8 stream + scales + mask
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, db_q8, scales, mask)
    return vals[:B, :k_eff], idx[:B, :k_eff]


def mips_topk_q8_xla(
    queries: jax.Array,
    db_q8: jax.Array,
    scales: jax.Array,
    mask: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """XLA path with the same quantized-score semantics but an EXACT
    top-k over the quantized scores (no lane-class pool; verification and
    non-TPU fallback; materializes the (B, N) score matrix)."""
    scores = jax.lax.dot_general(
        queries.astype(jnp.bfloat16),
        db_q8.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scales + mask
    vals, idx = jax.lax.top_k(scores, min(k, db_q8.shape[0]))
    return vals, idx.astype(jnp.int32)


def rescore_exact(
    queries: np.ndarray,
    vecs: np.ndarray,
    cand_vals: np.ndarray,
    cand_idx: np.ndarray,
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact f32 rescore of quantized candidates against the host mirror.

    queries (B, D) f32; vecs (≥max idx, D) f32; cand_vals/cand_idx (B, kc)
    from the quantized pass (entries with vals ≤ NEG_INF/2 are dead padding
    and dropped). Returns ((B, k) f32, (B, k) i64) sorted by (score desc,
    row asc) — the kernel/oracle tie-break contract; short rows pad with
    NEG_INF / -1.
    """
    queries = np.asarray(queries, np.float32)
    cand_vals = np.asarray(cand_vals)
    cand_idx = np.asarray(cand_idx)
    B = queries.shape[0]
    out_vals = np.full((B, k), NEG_INF, np.float32)
    out_idx = np.full((B, k), -1, np.int64)
    for b in range(B):  # B ≤ top_k cap; inner ops vectorized
        alive = cand_vals[b] > NEG_INF / 2
        rows = np.unique(cand_idx[b][alive].astype(np.int64))
        rows = rows[rows >= 0]
        if rows.size == 0:
            continue
        # Elementwise-multiply + per-row pairwise sum (not BLAS gemv): the
        # reduction order is then identical for identical rows, so exact
        # duplicates tie exactly and lexsort's row-ascending tie-break
        # holds. f64 accumulation also dominates the oracle's precision.
        s = (vecs[rows].astype(np.float64) * queries[b]).sum(axis=1)
        order = np.lexsort((rows, -s))[:k]
        out_vals[b, : order.size] = s[order].astype(np.float32)
        out_idx[b, : order.size] = rows[order]
    return out_vals, out_idx


def rescore_margin(k: int, n_live: int) -> int:
    """Candidate count for the quantized pass: 2k (≥ k+16) capped at the
    live-row count — wide enough that quantization-noise ties cannot push a
    true top-k row out of the candidate set for real corpora. The pooled
    kernel's selection cost is ~independent of the margin."""
    return max(1, min(n_live, max(2 * k, k + 16)))
