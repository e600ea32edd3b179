"""Multi-chip IVF: per-shard clustered layouts + collectives top-k merge.

The 10M-vector north star (BASELINE.md §3) shards the corpus over a v5e-8's
HBM. Rows are range-partitioned across the mesh ``data`` axis; each chip
builds an independent clustered layout (``ops.ivf``) over its shard, and a
query runs the coarse+fine search *locally on every chip in parallel* under
``shard_map`` — then the per-shard (k values, global row) candidates are
all-gathered (O(B·k·devices) over ICI) and every chip takes the final
top-k, exactly mirroring the exact-search merge
(``parallel.distributed_search``).

Shards pad to a common (max-blocks, rows) shape so the stacked arrays
device-put cleanly; per-shard live-block / live-row counts ride along as a
sharded ``(n_dev, 2)`` int32 array and mask the padding inside the mapped
function.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_rag_tpu.ops.ivf import (
    ClusteredLayout,
    build_clustered_layout,
    fine_scan_xla,
    ivf_fine_search,
    probe_union_arrays,
)
from multimodal_rag_tpu.ops.mips_topk import NEG_INF, default_use_pallas
from multimodal_rag_tpu.parallel.sharding import DATA_AXIS


class ShardedIVFIndex(NamedTuple):
    vectors: jax.Array  # (n_dev, rows_pad, D), sharded on axis 0
    centroids: jax.Array  # (n_dev, max_blocks, D), sharded on axis 0
    meta: jax.Array  # (n_dev, 2) int32 [live_blocks, n_live], sharded
    mask: jax.Array  # (n_dev, rows_pad) additive: 0 live, NEG_INF dead
    row_map: np.ndarray  # (n_dev, rows_pad) → global store row, host-side
    block_rows: int
    mesh: object


def build_sharded_ivf(
    vectors: np.ndarray,
    mesh,
    block_rows: int = 256,
    dtype=jnp.bfloat16,
    **build_kwargs,
) -> ShardedIVFIndex:
    """Range-partition rows over the mesh, build one clustered layout per
    shard, pad to common shapes, and place the stacked arrays sharded."""
    n_dev = mesh.size
    chunks = np.array_split(np.arange(vectors.shape[0]), n_dev)
    layouts = []
    for chunk in chunks:
        layouts.append(
            build_clustered_layout(
                vectors[chunk], block_rows=block_rows, dtype=dtype,
                **build_kwargs,
            )
        )
    max_blocks = max(l.block_centroids.shape[0] for l in layouts)
    rows_pad = max_blocks * block_rows
    d = vectors.shape[1]

    vecs = np.zeros((n_dev, rows_pad, d), np.float32)
    cents = np.zeros((n_dev, max_blocks, d), np.float32)
    meta = np.zeros((n_dev, 2), np.int32)
    mask = np.full((n_dev, rows_pad), NEG_INF, np.float32)
    row_map = np.full((n_dev, rows_pad), -1, np.int64)
    for i, (chunk, layout) in enumerate(zip(chunks, layouts)):
        lv = np.asarray(layout.vectors, np.float32)
        vecs[i, : lv.shape[0]] = lv
        lc = np.asarray(layout.block_centroids)
        cents[i, : lc.shape[0]] = lc
        meta[i] = [lc.shape[0], layout.n_live]
        mask[i, : layout.n_live] = 0.0
        ok = layout.row_to_original >= 0
        mapped = np.full_like(layout.row_to_original, -1)
        mapped[ok] = chunk[layout.row_to_original[ok]]
        row_map[i, : mapped.shape[0]] = mapped

    shard0 = NamedSharding(mesh, P(DATA_AXIS, None, None))
    shard_meta = NamedSharding(mesh, P(DATA_AXIS, None))
    return ShardedIVFIndex(
        vectors=jax.device_put(jnp.asarray(vecs, dtype), shard0),
        centroids=jax.device_put(jnp.asarray(cents), shard0),
        meta=jax.device_put(jnp.asarray(meta), shard_meta),
        mask=jax.device_put(jnp.asarray(mask), shard_meta),
        row_map=row_map,
        block_rows=block_rows,
        mesh=mesh,
    )


def mark_deleted(index: ShardedIVFIndex, virtual_rows: np.ndarray) -> ShardedIVFIndex:
    """Flip mask entries for flat virtual layout rows (dev*rows_pad + row)
    after store-level tombstoning; returns the updated index."""
    host = np.array(index.mask)  # owned copy (np.asarray view is read-only)
    host.reshape(-1)[np.asarray(virtual_rows, np.int64)] = NEG_INF
    shard_meta = NamedSharding(index.mesh, P(DATA_AXIS, None))
    return index._replace(
        mask=jax.device_put(jnp.asarray(host), shard_meta)
    )


def _local_search(q, vecs, cents, meta, mask, *, k, nprobe, block_rows,
                  use_pallas):
    """Per-shard coarse+fine search + cross-shard merge. Runs under
    shard_map: leading device axis is size 1 locally."""
    vecs = vecs[0]
    cents = cents[0]
    # mask arrives as the local (1, rows_pad) block — the fine kernel's shape
    live_blocks = meta[0, 0]
    n_live = meta[0, 1]
    rows_pad = vecs.shape[0]

    # Shared single-chip helpers (ops/ivf.py) keep the probe/dedup and
    # XLA fine-scan semantics provably identical to the unsharded path.
    ids, u = probe_union_arrays(q, cents, nprobe, live_blocks=live_blocks)

    if use_pallas:
        vals, rows = ivf_fine_search(
            q, vecs, n_live, ids, k=k, n_scan=u, block_rows=block_rows,
            mask=mask,
        )
    else:
        vals, rows = fine_scan_xla(
            q, vecs, n_live, ids, u, block_rows, mask, k
        )

    shard = jax.lax.axis_index(DATA_AXIS)
    virtual = rows + shard * rows_pad  # globally unique layout row

    all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
    all_idx = jax.lax.all_gather(virtual, DATA_AXIS, axis=1, tiled=True)
    merged_vals, pos = jax.lax.top_k(all_vals, k)
    merged_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return merged_vals, merged_idx


def sharded_ivf_search(
    queries: jax.Array,
    index: ShardedIVFIndex,
    k: int,
    nprobe: int = 32,
    use_pallas: bool | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ ((B, k) scores, (B, k) *global store rows*; -1 for padding)."""
    if use_pallas is None:
        use_pallas = default_use_pallas()
    fn = _build(index.mesh, k, nprobe, index.block_rows, use_pallas)
    vals, virtual = fn(
        queries, index.vectors, index.centroids, index.meta, index.mask
    )
    vals = np.asarray(vals)
    virtual = np.asarray(virtual)
    rows = index.row_map.reshape(-1)[virtual]
    rows[vals <= NEG_INF / 2] = -1
    return vals, rows


@functools.lru_cache(maxsize=64)
def _build(mesh, k, nprobe, block_rows, use_pallas):
    fn = shard_map(
        functools.partial(
            _local_search, k=k, nprobe=nprobe, block_rows=block_rows,
            use_pallas=use_pallas,
        ),
        mesh=mesh,
        in_specs=(
            P(),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None),
            P(DATA_AXIS, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
