"""IVF-partitioned approximate MIPS (the large-corpus query path).

Replaces hnswlib's graph walk (the reference's ANN engine inside ChromaDB)
with a TPU-shaped two-stage search (BASELINE.json config 4):

1. **Coarse scan** — the database is k-means-clustered and physically
   reordered so each cluster is contiguous, then cut into fixed
   ``block_rows``-row blocks; each block's mean vector is its centroid.
   A query scores *all* block centroids in one small MXU matmul (40k
   centroids for 10M rows at block 256) and keeps the top ``nprobe``
   blocks.
2. **Fine scan** — a Pallas kernel with **scalar-prefetched block ids**:
   the grid walks (query, probe) pairs and the BlockSpec index_map reads
   the prefetched id to DMA exactly the probed ``(block_rows, D)`` slabs
   from HBM — bandwidth scales with ``nprobe``·``block_rows``, not N.
   Exact rescoring + running top-k in VMEM scratch, global indices
   recovered as ``block_id · block_rows + lane``.

Fixed-size blocks keep every shape static (no ragged inverted lists, no
recompiles); clustering only affects *which* rows share a block, i.e.
recall. ``kmeans``/``build_clustered_layout`` run on-device in jnp.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_rag_tpu.ops.mips_topk import NEG_INF, _extract_topk, _round_up


# ---------------------------------------------------------------------------
# Build: k-means + clustered physical layout
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(X: jax.Array, k: int, iters: int = 10, seed: int = 0) -> jax.Array:
    """Spherical k-means (inner-product assignment) → (k, D) centroids.

    X should be unit-norm (the store's embeddings are, reference
    ``embedder.py:402``), making IP assignment == cosine k-means.
    """
    n = X.shape[0]
    key = jax.random.key(seed)
    init_idx = jax.random.choice(key, n, (k,), replace=n < k)
    centroids = X[init_idx]

    def step(centroids, _):
        scores = jnp.dot(
            X, centroids.T, preferred_element_type=jnp.float32
        )
        assign = jnp.argmax(scores, axis=1)
        sums = jax.ops.segment_sum(X, assign, num_segments=k)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), jnp.float32), assign, num_segments=k
        )
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        # Keep empty clusters where they were.
        new_c = jnp.where(counts[:, None] > 0, new_c, centroids)
        norm = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        return new_c / jnp.maximum(norm, 1e-12), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


class ClusteredLayout(NamedTuple):
    """Physically reordered database + block metadata.

    Padding rows are always a suffix (rows >= n_live); the fine kernel
    masks them by index. Store-level deletes *after* a build flip entries
    in ``mask`` (via ``_replace``), which both engines honor in-kernel —
    no post-filter fallback needed until the planner decides to rebuild.
    """

    vectors: jax.Array  # (n_pad, D) reordered, padded with zeros
    block_centroids: jax.Array  # (n_blocks, D) f32
    row_to_original: np.ndarray  # (n_pad,) original row per new row, -1 pad
    mask: jax.Array  # (1, n_pad) additive: 0 live, NEG_INF pad/tombstoned
    n_live: int  # real rows; padding rows are >= n_live
    block_rows: int


def build_clustered_layout(
    vectors: np.ndarray,
    n_clusters: int = 0,
    block_rows: int = 256,
    kmeans_iters: int = 8,
    sample_cap: int = 1 << 17,
    dtype=jnp.bfloat16,
    seed: int = 0,
) -> ClusteredLayout:
    """Cluster, reorder rows so clusters are contiguous, pad to block
    multiples, compute per-block centroids."""
    n, d = vectors.shape
    if n_clusters <= 0:
        n_clusters = max(1, int(np.sqrt(max(n, 1))))
    rng = np.random.default_rng(seed)

    sample = vectors
    if n > sample_cap:
        sample = vectors[rng.choice(n, sample_cap, replace=False)]
    centroids = kmeans(
        jnp.asarray(sample, jnp.float32), k=n_clusters, iters=kmeans_iters,
        seed=seed,
    )

    # Assign every row. One fixed batch shape → a single compile; the last
    # batch is padded rather than shaped differently.
    assign = np.empty((n,), np.int32)
    step = 1 << 16

    @jax.jit
    def _assign(block, cT):
        return jnp.argmax(
            jnp.dot(block, cT, preferred_element_type=jnp.float32), axis=1
        )

    cT = centroids.T
    for lo in range(0, n, step):
        block = vectors[lo : lo + step]
        real = block.shape[0]
        if real < step:
            block = np.concatenate(
                [block, np.zeros((step - real, d), vectors.dtype)]
            )
        assign[lo : lo + real] = np.asarray(
            _assign(jnp.asarray(block, jnp.float32), cT)
        )[:real]

    order = np.argsort(assign, kind="stable")
    n_pad = _round_up(max(n, block_rows), block_rows)
    reordered = np.zeros((n_pad, d), np.float32)
    reordered[:n] = vectors[order]
    row_to_original = np.full((n_pad,), -1, np.int64)
    row_to_original[:n] = order

    mask = np.full((1, n_pad), NEG_INF, np.float32)
    mask[0, :n] = 0.0

    n_blocks = n_pad // block_rows
    blocks = reordered.reshape(n_blocks, block_rows, d)
    counts = (
        (row_to_original.reshape(n_blocks, block_rows) >= 0)
        .sum(axis=1, keepdims=True)
        .astype(np.float32)
    )
    block_centroids = blocks.sum(axis=1) / np.maximum(counts, 1.0)

    return ClusteredLayout(
        vectors=jnp.asarray(reordered, dtype),
        block_centroids=jnp.asarray(block_centroids, jnp.float32),
        row_to_original=row_to_original,
        mask=jnp.asarray(mask),
        n_live=n,
        block_rows=block_rows,
    )


def build_clustered_layout_device(
    vectors: jax.Array,
    n_clusters: int = 0,
    block_rows: int = 256,
    kmeans_iters: int = 8,
    sample_cap: int = 1 << 17,
    assign_chunk: int = 1 << 16,
    seed: int = 0,
) -> ClusteredLayout:
    """On-device layout build: k-means, assignment, stable cluster sort,
    gather-reorder, and block centroids all run on the chip.

    ``vectors`` is a device array (any float dtype; kept as the stored
    dtype). Unlike :func:`build_clustered_layout` (host mirror path), the
    only host traffic is the final ``row_to_original`` index vector — at
    10M rows the host build moves ~15 GB through the host↔device link for
    assignment batches alone, which dominates build time on anything
    slower than local PCIe.
    """
    n, d = vectors.shape
    if n_clusters <= 0:
        n_clusters = max(1, int(np.sqrt(max(n, 1))))
    key = jax.random.key(seed)

    if n > sample_cap:
        idx = jax.random.choice(key, n, (sample_cap,), replace=False)
        sample = jnp.take(vectors, idx, axis=0).astype(jnp.float32)
    else:
        sample = vectors.astype(jnp.float32)
    centroids = kmeans(sample, k=n_clusters, iters=kmeans_iters, seed=seed)

    # Chunked assignment, chunks driven from Python: one small jitted
    # kernel compiled once and dispatched per chunk. (A lax.map loop body
    # here costs minutes of XLA compile; a single flat matmul would
    # materialize an (N, k) score block that OOMs at multi-M rows.)
    n_chunk_pad = _round_up(n, assign_chunk)
    cT = centroids.T.astype(vectors.dtype)

    @jax.jit
    def _assign_chunk(block, cT):
        scores = jnp.dot(block, cT, preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    vecs_pad = (
        jnp.pad(vectors, ((0, n_chunk_pad - n), (0, 0)))
        if n_chunk_pad != n
        else vectors
    )
    parts = [
        _assign_chunk(
            jax.lax.dynamic_slice_in_dim(vecs_pad, lo, assign_chunk, 0), cT
        )
        for lo in range(0, n_chunk_pad, assign_chunk)
    ]
    assign = jnp.concatenate(parts)[:n]

    order = jnp.argsort(assign, stable=True)
    n_pad = _round_up(max(n, block_rows), block_rows)
    reordered = jnp.take(vectors, order, axis=0)
    if n_pad != n:
        reordered = jnp.pad(reordered, ((0, n_pad - n), (0, 0)))

    row_idx = jnp.arange(n_pad)
    mask = jnp.where(row_idx < n, 0.0, NEG_INF).astype(jnp.float32)[None, :]

    n_blocks = n_pad // block_rows
    counts = jnp.clip(
        jnp.minimum(
            jnp.full((n_blocks,), block_rows, jnp.float32),
            n - jnp.arange(n_blocks, dtype=jnp.float32) * block_rows,
        ),
        0.0,
        None,
    )

    # Chunked block sums, groups driven from Python (same compile/memory
    # trade as assignment: small jitted kernel per group keeps the live
    # f32 footprint bounded — XLA does not reliably fuse the f32 convert
    # into the reduction, and a full-size f32 copy OOMs at multi-M rows).
    group = 512
    n_groups = _round_up(n_blocks, group) // group
    rows_grp_pad = n_groups * group * block_rows
    rows = (
        jnp.pad(reordered, ((0, rows_grp_pad - n_pad), (0, 0)))
        if rows_grp_pad != n_pad
        else reordered
    )

    @jax.jit
    def _group_sums(grp):  # (group*block_rows, d) -> (group, d)
        return grp.reshape(group, block_rows, d).astype(jnp.float32).sum(
            axis=1
        )

    sums = jnp.concatenate(
        [
            _group_sums(
                jax.lax.dynamic_slice_in_dim(
                    rows, g * group * block_rows, group * block_rows, 0
                )
            )
            for g in range(n_groups)
        ]
    )[:n_blocks]
    block_centroids = sums / jnp.maximum(counts[:, None], 1.0)

    row_to_original = np.full((n_pad,), -1, np.int64)
    row_to_original[:n] = np.asarray(order, np.int64)

    return ClusteredLayout(
        vectors=reordered,
        block_centroids=block_centroids,
        row_to_original=row_to_original,
        mask=mask,
        n_live=n,
        block_rows=block_rows,
    )


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------


def _ivf_fine_kernel(
    ids_ref,  # (U_pad,) scalar prefetch — deduped probed block ids
    meta_ref,  # (2,) scalar prefetch — [n_scanned_blocks, n_live]
    q_ref,  # (B_pad, D) in VMEM
    v_hbm,  # (n_blocks*block_rows, D) stays in HBM; blocks DMA'd manually
    m_hbm,  # (1, n_blocks*block_rows) additive live mask, stays in HBM
    vals_out,  # (B_pad, out_k)
    idx_out,
    buf,  # (2, block_rows, D) VMEM double buffer
    mbuf,  # (2, 1, block_rows) VMEM mask double buffer
    sems,  # (2,) DMA semaphores
    msems,  # (2,) mask DMA semaphores
    *,
    k: int,
    block_rows: int,
    out_k: int,
):
    """Single grid step: the deduped union of probed blocks streams through
    a manually double-buffered HBM→VMEM pipeline (dynamic block ids defeat
    the automatic pipeline emitter), and *every* block is scored against the
    whole query batch — dense MXU matmuls, one DMA per unique block, and
    per-query running top-k carried through the loop. The additive mask slab
    rides the same pipeline so padding rows *and* rows tombstoned after the
    layout build (VectorStore deletes) are rejected in-kernel."""
    b_pad = q_ref.shape[0]
    u = meta_ref[0]
    n_live = meta_ref[1]
    q = q_ref[:]

    def start_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(ids_ref[i] * block_rows, block_rows), :],
            buf.at[slot],
            sems.at[slot],
        )

    def start_mask_dma(slot, i):
        return pltpu.make_async_copy(
            m_hbm.at[:, pl.ds(ids_ref[i] * block_rows, block_rows)],
            mbuf.at[slot],
            msems.at[slot],
        )

    start_dma(0, 0).start()
    start_mask_dma(0, 0).start()

    col = jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)

    def body(i, carry):
        run_vals, run_idx = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < u)
        def _():
            start_dma(jax.lax.rem(i + 1, 2), i + 1).start()
            start_mask_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        start_dma(slot, i).wait()
        start_mask_dma(slot, i).wait()

        scores = jax.lax.dot_general(
            q, buf[slot],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B_pad, block_rows)
        base = ids_ref[i] * block_rows
        scores = scores + mbuf[slot][0]
        scores = jnp.where(base + col < n_live, scores, NEG_INF)

        cand_vals, cand_idx = _extract_topk(scores, base, k)
        merged_vals = jnp.concatenate([run_vals, cand_vals], axis=1)
        merged_idx = jnp.concatenate([run_idx, cand_idx], axis=1)
        return _extract_topk(merged_vals, merged_idx, k)

    init = (
        jnp.full((b_pad, k), NEG_INF, jnp.float32),
        jnp.full((b_pad, k), -1, jnp.int32),
    )
    final_vals, final_idx = jax.lax.fori_loop(0, u, body, init)

    pad = out_k - k
    vals_out[:] = jnp.pad(
        final_vals, ((0, 0), (0, pad)), constant_values=NEG_INF
    )
    idx_out[:] = jnp.pad(final_idx, ((0, 0), (0, pad)), constant_values=-1)


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "interpret")
)
def ivf_fine_search(
    queries: jax.Array,  # (B, D)
    vectors: jax.Array,  # (n_blocks*block_rows, D)
    n_live: jax.Array,  # () int32 — rows < n_live are real
    block_ids: jax.Array,  # (U_pad,) int32 — deduped union of probed blocks
    k: int,
    n_scan: jax.Array | int | None = None,  # how many of block_ids are real
    block_rows: int = 256,
    mask: jax.Array | None = None,  # (1, n_rows) additive live mask
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact rescore over the union of probed blocks → ((B,k) scores,
    (B,k) *layout-row* indices). Every query is scored against every
    scanned block (recall ≥ the per-query probe lists that produced the
    union). ``mask`` (0 = live, NEG_INF = padding/tombstoned) lets deletes
    made after the layout build stay excluded without a rebuild."""
    B, D = queries.shape
    block_ids = block_ids.reshape(-1)
    U = block_ids.shape[0]
    if n_scan is None:
        n_scan = U
    k_eff = min(k, U * block_rows)
    out_k = _round_up(k_eff, 128)
    b_pad = _round_up(B, 8)
    queries = queries.astype(vectors.dtype)
    if b_pad != B:
        queries = jnp.pad(queries, ((0, b_pad - B), (0, 0)))
    meta = jnp.stack(
        [jnp.asarray(n_scan, jnp.int32), jnp.asarray(n_live, jnp.int32)]
    )
    if mask is None:
        mask = jnp.zeros((1, vectors.shape[0]), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b_pad, D), lambda i, ids, meta: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # vectors stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # mask stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((b_pad, out_k), lambda i, ids, meta: (0, 0)),
            pl.BlockSpec((b_pad, out_k), lambda i, ids, meta: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, D), vectors.dtype),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vals, idx = pl.pallas_call(
        functools.partial(
            _ivf_fine_kernel, k=k_eff, block_rows=block_rows, out_k=out_k
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, out_k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, out_k), jnp.int32),
        ],
        interpret=interpret,
    )(block_ids.astype(jnp.int32), meta, queries, vectors, mask)
    return vals[:B, :k_eff], idx[:B, :k_eff]


_SENTINEL = jnp.int32(1 << 30)


def probe_union_arrays(queries, centroids, nprobe, live_blocks=None):
    """Coarse centroid scan → deduped, ascending union of probed block ids
    (padded with a sentinel) + real count. All on device. Array-level so
    the sharded path (parallel/sharded_ivf.py) shares it verbatim;
    ``live_blocks`` (traced scalar) masks trailing dead centroid slots of
    a fixed-capacity shard."""
    n_blocks = centroids.shape[0]
    nprobe = min(nprobe, n_blocks)
    coarse = jnp.dot(
        queries.astype(jnp.float32),
        centroids.T,
        preferred_element_type=jnp.float32,
    )  # (B, n_blocks)
    if live_blocks is not None:
        iota = jax.lax.broadcasted_iota(jnp.int32, coarse.shape, 1)
        coarse = jnp.where(iota < live_blocks, coarse, NEG_INF)
    _, block_ids = jax.lax.top_k(coarse, nprobe)
    flat = jnp.sort(block_ids.reshape(-1).astype(jnp.int32))
    dup = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), flat[1:] == flat[:-1]]
    )
    u = jnp.sum(~dup).astype(jnp.int32)
    ids = jnp.sort(jnp.where(dup, _SENTINEL, flat))
    return ids, u


def _probe_union(queries, layout, nprobe):
    return probe_union_arrays(queries, layout.block_centroids, nprobe)


def fine_scan_xla(queries, vectors, n_live, ids, u, block_rows, mask, k):
    """XLA fine scan over a probe union (array-level; shared by
    ``ivf_search_xla`` and the sharded path): gather probed blocks,
    mask dead/padded rows, exact top-k."""
    n_blocks = vectors.shape[0] // block_rows
    safe_ids = jnp.minimum(ids, n_blocks - 1)
    U = ids.shape[0]
    blocks = vectors.reshape(n_blocks, block_rows, -1)
    cand = blocks[safe_ids].reshape(U * block_rows, -1)
    scores = jnp.dot(
        queries.astype(jnp.float32), cand.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )  # (B, U*block_rows)
    pos = jnp.arange(U * block_rows)
    rows_global = safe_ids[pos // block_rows] * block_rows + (
        pos % block_rows
    )
    invalid = (pos // block_rows >= u) | (rows_global >= n_live)
    scores = jnp.where(invalid[None, :], NEG_INF, scores)
    scores = scores + jnp.take(mask[0], rows_global)[None, :]
    k_eff = min(k, U * block_rows)
    vals, local = jax.lax.top_k(scores, k_eff)
    rows = rows_global[local]
    return vals, rows.astype(jnp.int32)


def ivf_search(
    queries: jax.Array,
    layout: ClusteredLayout,
    k: int,
    nprobe: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full two-stage search → ((B, k) scores, (B, k) layout-row indices).

    Map layout rows back to store rows with ``layout.row_to_original``.
    """
    ids, u = _probe_union(queries, layout, nprobe)
    return ivf_fine_search(
        queries,
        layout.vectors,
        jnp.int32(layout.n_live),
        ids,
        k=k,
        n_scan=u,
        block_rows=layout.block_rows,
        mask=layout.mask,
        interpret=interpret,
    )


def ivf_search_xla(
    queries: jax.Array,
    layout: ClusteredLayout,
    k: int,
    nprobe: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """XLA reference path over the same probe union (gathers probed blocks;
    for verification and non-TPU backends)."""
    ids, u = _probe_union(queries, layout, nprobe)  # (U,), count
    return fine_scan_xla(
        queries, layout.vectors, jnp.int32(layout.n_live), ids, u,
        layout.block_rows, layout.mask, k,
    )
