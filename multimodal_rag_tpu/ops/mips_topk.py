"""Fused exact-MIPS + top-k Pallas kernel.

This is the kernel that replaces the reference's entire vector-search hot
loop — ChromaDB's bundled C++ hnswlib invoked at ``app/utils/embedder.py
:595-609`` — with an on-device streaming pass (BASELINE.json north star).

Design (TPU-first):

* The database ``V (N, D)`` lives in HBM as bfloat16 and is streamed through
  VMEM in ``(TILE_N, D)`` blocks by the Pallas pipeline (double-buffered DMA
  overlapped with compute automatically).
* Each grid step computes ``scores = Q · tileᵀ`` on the MXU with float32
  accumulation — the full ``(B, N)`` score matrix is **never materialized**;
  HBM traffic is exactly one read of V per query batch.
* A running top-k (values + global indices) persists in VMEM scratch across
  grid steps. Per tile, k max/argmax extraction passes pull tile candidates
  (k ≪ D, so the VPU selection work is a small fraction of the MXU matmul),
  then a 256-lane merge folds them into the running top-k.
* Deleted rows / padding are handled by an additive float mask ``(1, N)``
  (0 for live rows, -1e30 for tombstones/padding) maintained by the vector
  store — deletes never reshape the array (no recompiles).
* Tie-breaking: equal scores resolve to the lower database index, matching
  ``ops.oracle.mips_topk_oracle`` bit-for-bit. The merge concatenates
  ``[running, tile-candidates]`` so earlier (lower-index) tiles win ties,
  and argmax itself takes the first maximum within a tile.

Query batches are tiled on a second grid axis so one kernel serves both the
single-query serving path and batched ingest/query traffic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NEG_INF = -1e30


def default_use_pallas() -> bool:
    """Pallas kernels compile only on TPU; elsewhere use the XLA path."""
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _extract_topk(scores, base_idx, k: int):
    """k max/argmax passes over scores (B, W) → vals (B, k) f32, idx (B, k) i32.

    ``base_idx``: either a scalar offset (Python int or traced scalar) added
    to the argmax column (tile extraction) or an (B, W) int32 array gathered
    via one-hot masked sum (merge phase).
    """
    B, W = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    vals_cols = []
    idx_cols = []
    for _ in range(k):
        m = jnp.max(scores, axis=1)  # (B,)
        # First-max-wins argmax, written as min-index-over-maxes so it lowers
        # to plain VPU reductions and pins the tie-breaking contract.
        a = jnp.min(jnp.where(scores == m[:, None], col, W), axis=1)
        onehot = col == a[:, None]
        if getattr(base_idx, "ndim", 0) == 0:  # scalar offset (int or traced)
            sel = a + base_idx
        else:  # (B, W) index array: one-hot masked-sum gather
            sel = jnp.sum(jnp.where(onehot, base_idx, 0), axis=1)
        vals_cols.append(m[:, None])
        idx_cols.append(sel[:, None])
        scores = jnp.where(onehot, NEG_INF, scores)
    return jnp.concatenate(vals_cols, axis=1), jnp.concatenate(idx_cols, axis=1)


def _mips_topk_kernel(
    q_ref, v_ref, mask_ref, vals_out, idx_out, run_vals, run_idx, *, k: int,
    tile_n: int, out_k: int,
):
    ni = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(ni == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, -1)

    q = q_ref[:]
    v = v_ref[:]
    # (B, TILE_N) = (B, D) · (TILE_N, D)ᵀ on the MXU, f32 accumulation.
    scores = jax.lax.dot_general(
        q, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores + mask_ref[:]  # tombstones / padding → -1e30

    base = ni * tile_n
    cand_vals, cand_idx = _extract_topk(scores, base, k)

    # Merge: running first so lower-index (earlier-tile) entries win ties.
    merged_vals = jnp.concatenate([run_vals[:, :k], cand_vals], axis=1)
    merged_idx = jnp.concatenate([run_idx[:, :k], cand_idx], axis=1)
    new_vals, new_idx = _extract_topk(merged_vals, merged_idx, k)

    pad = run_vals.shape[1] - k
    run_vals[:] = jnp.pad(new_vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
    run_idx[:] = jnp.pad(new_idx, ((0, 0), (0, pad)), constant_values=-1)

    @pl.when(ni == n_tiles - 1)
    def _():
        vals_out[:] = run_vals[:, :out_k]
        idx_out[:] = run_idx[:, :out_k]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "tile_b", "interpret")
)
def mips_topk(
    queries: jax.Array,
    database: jax.Array,
    mask: jax.Array,
    k: int,
    tile_n: int = 1024,
    tile_b: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k MIPS: queries (B, D) × database (N, D) → ((B, k) scores f32,
    (B, k) indices i32).

    Requirements: N % tile_n == 0 (the store keeps capacity aligned);
    ``mask`` is (1, N) float32, 0 for live rows and <= -1e30 for dead ones.
    Use :func:`mips_topk_padded` for arbitrary shapes.
    """
    B, D = queries.shape
    N, Dv = database.shape
    assert D == Dv, (D, Dv)
    assert N % tile_n == 0, f"N={N} must be a multiple of tile_n={tile_n}"
    assert mask.shape == (1, N), mask.shape

    k_eff = min(k, N)
    out_k = _round_up(k_eff, LANES)
    tile_b = min(tile_b, _round_up(B, 8))
    b_pad = _round_up(B, tile_b)
    if b_pad != B:
        queries = jnp.pad(queries, ((0, b_pad - B), (0, 0)))

    cd = database.dtype
    queries = queries.astype(cd)

    grid = (b_pad // tile_b, N // tile_n)
    vals, idx = pl.pallas_call(
        functools.partial(
            _mips_topk_kernel, k=k_eff, tile_n=tile_n, out_k=out_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda bi, ni: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda bi, ni: (ni, 0),
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
            pltpu.VMEM((tile_b, _round_up(k_eff, LANES)), jnp.float32),
            pltpu.VMEM((tile_b, _round_up(k_eff, LANES)), jnp.int32),
        ],
        # Large streaming tiles (8192 rows) double-buffer past the default
        # 16 MB scoped-VMEM budget once dim > 384 (e.g. the 512-d CLIP
        # space); v5e has 128 MB of VMEM, so give the pipeline headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * N * D,
            bytes_accessed=N * D * database.dtype.itemsize + 4 * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, database, mask)
    return vals[:B, :k_eff], idx[:B, :k_eff]


def mips_topk_padded(
    queries: jax.Array,
    database: jax.Array,
    k: int,
    valid: jax.Array | None = None,
    tile_n: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Convenience wrapper for arbitrary N: pads the database to a tile_n
    multiple and builds the additive mask from an optional boolean ``valid``
    vector. Prefer the raw :func:`mips_topk` with a store-maintained mask on
    the hot path (this wrapper re-pads per call)."""
    N, D = database.shape
    n_pad = _round_up(max(N, tile_n), tile_n)
    if valid is None:
        valid = jnp.ones((N,), jnp.bool_)
    mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[None, :]
    if n_pad != N:
        database = jnp.pad(database, ((0, n_pad - N), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, n_pad - N)), constant_values=NEG_INF)
    return mips_topk(
        queries, database, mask, k=min(k, N), tile_n=tile_n, interpret=interpret
    )


def mips_topk_xla(
    queries: jax.Array, database: jax.Array, k: int,
    valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """XLA reference path (materializes the full score matrix; used for
    verification and as a fallback on non-TPU backends)."""
    scores = jnp.dot(
        queries.astype(jnp.float32),
        database.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    if valid is not None:
        scores = jnp.where(valid[None, :], scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores, min(k, database.shape[0]))
    return vals, idx.astype(jnp.int32)
