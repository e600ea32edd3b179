"""Multi-chip exact top-k over a row-sharded database.

Replaces nothing in the reference (it was single-process, SURVEY.md §2.4) —
this is the scale-out path the TPU design adds: the database ``(N, D)`` is
sharded by rows across the mesh's ``data`` axis so each chip streams only its
HBM-resident shard through the fused MIPS kernel; the per-shard top-k
(k values + *global* indices) is then all-gathered over ICI — k·devices tiny
rows, not scores — and every chip selects the final top-k from the gathered
candidates. Communication volume is O(B · k · devices), independent of N.

Tie-breaking stays globally consistent: shards are concatenated in axis
order, shard offsets make indices global before the merge, and
``jax.lax.top_k`` picks the first (= lowest global index) on equal values.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from multimodal_rag_tpu.ops.mips_topk import (
    default_use_pallas,
    mips_topk,
    mips_topk_xla,
)
from multimodal_rag_tpu.ops.mips_topk_q8 import mips_topk_q8, mips_topk_q8_xla
from multimodal_rag_tpu.parallel.sharding import DATA_AXIS


def _local_then_merge(q, v_shard, mask_shard, *, k, tile_n, use_pallas):
    """Runs per shard under shard_map. v_shard (N/dev, D), mask (1, N/dev)."""
    n_local = v_shard.shape[0]
    shard = jax.lax.axis_index(DATA_AXIS)
    if use_pallas:
        vals, idx = mips_topk(q, v_shard, mask_shard, k=k, tile_n=tile_n)
    else:
        valid = mask_shard[0] > -1e29
        vals, idx = mips_topk_xla(q, v_shard, k, valid=valid)
    gidx = idx + shard * n_local

    # (B, k·devices) candidate lists on every chip — tiny; rides ICI.
    all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
    all_idx = jax.lax.all_gather(gidx, DATA_AXIS, axis=1, tiled=True)

    merged_vals, pos = jax.lax.top_k(all_vals, k)
    merged_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return merged_vals, merged_idx


def sharded_mips_topk(
    queries: jax.Array,
    database: jax.Array,
    mask: jax.Array,
    *,
    mesh: Mesh,
    k: int,
    tile_n: int = 1024,
    use_pallas: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a row-sharded database.

    queries (B, D) replicated; database (N, D) sharded on rows; mask (1, N)
    sharded on columns. N must divide evenly by mesh size (the store pads
    capacity to device multiples). Returns replicated ((B, k), (B, k)).
    """
    if use_pallas is None:
        use_pallas = default_use_pallas()
    fn = _build_sharded(mesh, k, tile_n, use_pallas)
    return fn(queries, database, mask)


@functools.lru_cache(maxsize=64)
def _build_sharded(mesh: Mesh, k: int, tile_n: int, use_pallas: bool):
    fn = shard_map(
        functools.partial(
            _local_then_merge, k=k, tile_n=tile_n, use_pallas=use_pallas
        ),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(None, DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _local_then_merge_q8(
    q, v_shard, scale_shard, mask_shard, *, k, tile_n, use_pallas
):
    """Int8 per-shard candidate pass + ICI candidate merge. Same structure
    as :func:`_local_then_merge`; scores carry quantization noise, so the
    caller rescores the merged candidates against the f32 host mirror."""
    n_local = v_shard.shape[0]
    shard = jax.lax.axis_index(DATA_AXIS)
    if use_pallas:
        vals, idx = mips_topk_q8(
            q, v_shard, scale_shard, mask_shard, k=k, tile_n=tile_n
        )
    else:
        vals, idx = mips_topk_q8_xla(q, v_shard, scale_shard, mask_shard, k)
    gidx = idx + shard * n_local

    all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
    all_idx = jax.lax.all_gather(gidx, DATA_AXIS, axis=1, tiled=True)

    merged_vals, pos = jax.lax.top_k(all_vals, k)
    merged_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return merged_vals, merged_idx


def sharded_mips_topk_q8(
    queries: jax.Array,
    db_q8: jax.Array,
    scales: jax.Array,
    mask: jax.Array,
    *,
    mesh: Mesh,
    k: int,
    tile_n: int = 1024,
    use_pallas: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Quantized candidate top-k over a row-sharded int8 database: half the
    per-chip HBM stream of the bf16 path. db_q8 (N, D) int8 sharded on
    rows; scales/mask (1, N) f32 sharded on columns; returns replicated
    ((B, k) approx scores, (B, k) global indices) for exact rescoring."""
    if use_pallas is None:
        use_pallas = default_use_pallas()
    fn = _build_sharded_q8(mesh, k, tile_n, use_pallas)
    return fn(queries, db_q8, scales, mask)


@functools.lru_cache(maxsize=64)
def _build_sharded_q8(mesh: Mesh, k: int, tile_n: int, use_pallas: bool):
    fn = shard_map(
        functools.partial(
            _local_then_merge_q8, k=k, tile_n=tile_n, use_pallas=use_pallas
        ),
        mesh=mesh,
        in_specs=(
            P(),
            P(DATA_AXIS, None),
            P(None, DATA_AXIS),
            P(None, DATA_AXIS),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
