"""Headline benchmark: embedding throughput + retrieval latency on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Baseline (BASELINE.md §3): >= 20,000 embed chunks/sec/chip on TPU v5e and
top-5 retrieval over HBM-resident vectors.

Timing methodology (important on relay-tunneled dev chips):
* Work is a jitted dependency-chained ``fori_loop`` so per-iteration cost is
  measured on-device, independent of host-relay round-trip latency — the
  (hi_reps − lo_reps) subtraction cancels all per-dispatch constants.
* BOTH rep-count programs are warmed before timing (reps is a static arg,
  so each count is a separate XLA executable — timing an unwarmed one
  would measure its compile).
* Timed calls use fresh input values: the relay layer may serve repeated
  identical calls with small outputs from a result cache, and
  ``block_until_ready`` alone does not guarantee device execution through
  the tunnel — results are materialized to host via ``np.asarray``.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

EMBED_BASELINE = 20_000.0  # chunks/sec/chip
SEQ = 128  # tokens per chunk (≈600-char chunks after wordpiece)
BATCH = 256
REPS_LO, REPS_HI = 4, 16


def _timed_loop(fn):
    """fn(perturbation, reps) → device array. Returns seconds/rep.

    Best-of-two per rep count: the relay adds per-dispatch jitter that can
    exceed the marginal device time, so a single (hi - lo) pair can come
    out negative. If the subtraction still degenerates, fall back to
    hi/REPS_HI (an upper bound that includes the constant overhead)."""
    np.asarray(fn(0, REPS_LO))  # compile + warm lo
    np.asarray(fn(1, REPS_HI))  # compile + warm hi
    lo, hi = float("inf"), float("inf")
    for attempt in range(2):
        t0 = time.perf_counter()
        np.asarray(fn(2 + 2 * attempt, REPS_LO))
        lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(fn(3 + 2 * attempt, REPS_HI))
        hi = min(hi, time.perf_counter() - t0)
    dt = (hi - lo) / (REPS_HI - REPS_LO)
    if dt <= 0:
        dt = hi / REPS_HI
    return dt


def bench_embed():
    from multimodal_rag_tpu.models.minilm import MINILM_L6, embed, init_params

    params = init_params(jax.random.key(0), MINILM_L6)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(999, 30522, (BATCH, SEQ)), jnp.uint32)
    mask = jnp.ones((BATCH, SEQ), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(params, ids, mask, reps):
        def body(i, carry):
            out = embed(params, ids + carry, mask, MINILM_L6)
            return (jnp.abs(out[0, 0]) * 1e-6).astype(jnp.uint32)
        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    dt = _timed_loop(lambda p, r: loop(params, ids + p, mask, r))
    return BATCH / dt  # chunks per second


def bench_retrieval(n_vectors=1 << 20, k=5, n_queries=8, tile_n=8192):
    from multimodal_rag_tpu.ops.mips_topk import mips_topk

    D = 384
    V = jax.random.normal(jax.random.key(1), (n_vectors, D), jnp.bfloat16)
    Q = jax.random.normal(jax.random.key(2), (n_queries, D), jnp.float32)
    M = jnp.zeros((1, n_vectors), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(Q, V, M, reps):
        def body(i, q):
            vals, idx = mips_topk(q, V, M, k=k, tile_n=tile_n)
            return q + 1e-9 * vals[0:1, 0:1]
        return jax.lax.fori_loop(0, reps, body, Q)

    dt = _timed_loop(lambda p, r: loop(Q + p, V, M, r))
    return dt * 1e3  # ms per query batch


def _median3(once):
    """Median of three timed-loop measurements. The relay adds ±0.5 ms
    run-to-run noise at the 10M scale (BASELINE.md §3 analysis); a single
    sample can land in either tail — the recorded headline should not."""
    samples = sorted(once() for _ in range(3))
    return samples[1], samples[0]  # (median, best)


def bench_retrieval_10m(k=5, n_queries=8, tile_n=8192):
    """Exact top-5 over ~10M device-generated bf16 vectors on one chip
    (BASELINE config 4 scale; HBM speed-of-light is ~9.4 ms for 7.7 GB)."""
    from multimodal_rag_tpu.ops.mips_topk import mips_topk

    D = 384
    n_vectors = 1222 * tile_n  # 10,010,624
    V = jax.random.normal(jax.random.key(1), (n_vectors, D), jnp.bfloat16)
    Q = jax.random.normal(jax.random.key(2), (n_queries, D), jnp.float32)
    M = jnp.zeros((1, n_vectors), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(Q, V, M, reps):
        def body(i, q):
            vals, idx = mips_topk(q, V, M, k=k, tile_n=tile_n)
            return q + 1e-9 * vals[0:1, 0:1]
        return jax.lax.fori_loop(0, reps, body, Q)

    return _median3(
        lambda: _timed_loop(lambda p, r: loop(Q + p, V, M, r)) * 1e3
    )


def bench_retrieval_10m_int8(k=21, n_queries=8, tile_n=8192):
    """Quantized exact path over ~10M int8 rows (VECTOR_DTYPE=int8):
    per-row int8 + f32 scales stream half the bf16 bytes and the matmul
    runs the native int8 MXU pipeline — measured ~1.6x over the bf16
    kernel at this shape. k=21 is the serving candidate margin for top-5
    (rescore_margin); the pooled selection makes the time ~independent
    of k. The database is generated and quantized on device in chunks
    (a host mirror at this scale would be 15 GB)."""
    from multimodal_rag_tpu.ops.mips_topk_q8 import mips_topk_q8

    D = 384
    n_chunks, rows_per = 13, 94 * tile_n  # 13 × 770,048 = 10,010,624
    n_vectors = n_chunks * rows_per

    @jax.jit
    def make_chunk(key):
        v = jax.random.normal(key, (rows_per, D), jnp.bfloat16)
        v = v.astype(jnp.float32)
        amax = jnp.maximum(jnp.abs(v).max(axis=1, keepdims=True), 1e-12)
        q8 = jnp.clip(jnp.rint(v * (127.0 / amax)), -127, 127)
        return q8.astype(jnp.int8), (amax[:, 0] / 127.0)

    chunks = [make_chunk(jax.random.key(i)) for i in range(n_chunks)]
    V = jnp.concatenate([c[0] for c in chunks])
    S = jnp.concatenate([c[1] for c in chunks])[None, :]
    del chunks
    M = jnp.zeros((1, n_vectors), jnp.float32)
    Q = jax.random.normal(jax.random.key(2), (n_queries, D), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(Q, V, S, M, reps):
        def body(i, q):
            vals, idx = mips_topk_q8(q, V, S, M, k=k, tile_n=tile_n)
            return q + 1e-9 * vals[0:1, 0:1]
        return jax.lax.fori_loop(0, reps, body, Q)

    return _median3(
        lambda: _timed_loop(lambda p, r: loop(Q + p, V, S, M, r)) * 1e3
    )


def bench_retrieval_10m_ivf(k=5, n_queries=8, tile_n=8192):
    """On-device IVF at the 10M north-star scale on ONE chip — the
    apples-to-apples comparison with the reference's ANN (hnswlib is
    approximate too): build the clustered layout on-chip, then measure
    probe latency AND recall@5 against an exact scan over the SAME layout
    memory (the layout is a permutation of the corpus, so ground truth
    needs no second 7.6 GB copy and the peak stays in HBM).

    Corpus is synthetic-CLUSTERED (4,096 unit-norm centers + noise — the
    structure real embedding corpora have; uniform random vectors have no
    clusters for ANY ivf/hnsw to exploit). N = 9,961,472 = 76·512·256 =
    1216·8192 so the device build makes no pad copies: peak HBM = source
    + layout ≈ 15.3 GB of the 16 GB chip.

    Returns (search_ms, recall_at_5, nprobe, build_s, n_rows)."""
    from multimodal_rag_tpu.ops.ivf import (
        build_clustered_layout_device,
        ivf_search,
    )
    from multimodal_rag_tpu.ops.mips_topk import mips_topk

    D = 384
    N = 76 * 512 * 256  # 9,961,472
    n_centers = 4096
    n_chunks = 38
    rows_per = N // n_chunks
    centers = jax.random.normal(
        jax.random.key(7), (n_centers, D), jnp.float32
    )
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    @jax.jit
    def make_chunk(key, centers):
        k1, k2 = jax.random.split(key)
        cid = jax.random.randint(k1, (rows_per,), 0, n_centers)
        v = centers[cid] + (0.3 / np.sqrt(D)) * jax.random.normal(
            k2, (rows_per, D), jnp.float32
        )
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        return v.astype(jnp.bfloat16)

    # Fill ONE preallocated buffer with donated in-place updates — a
    # chunks-list + concatenate would briefly hold the corpus twice
    # (15.3 GB) and OOM before the build even starts.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_chunk(buf, chunk, lo):
        return jax.lax.dynamic_update_slice_in_dim(buf, chunk, lo, 0)

    V = jnp.zeros((N, D), jnp.bfloat16)
    for i in range(n_chunks):
        V = write_chunk(
            V, make_chunk(jax.random.key(100 + i), centers), i * rows_per
        )
    t0 = time.time()
    layout = build_clustered_layout_device(V, block_rows=256)
    jax.block_until_ready(layout.vectors)
    build_s = time.time() - t0
    del V  # free the source: only the layout stays resident

    total_q = 64
    qk1, qk2 = jax.random.split(jax.random.key(9))
    cid = jax.random.randint(qk1, (total_q,), 0, n_centers)
    q = centers[cid] + (0.3 / np.sqrt(D)) * jax.random.normal(
        qk2, (total_q, D), jnp.float32
    )
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)

    gt = []
    for lo in range(0, total_q, n_queries):
        _vals, idx = mips_topk(
            q[lo : lo + n_queries], layout.vectors, layout.mask, k=k,
            tile_n=tile_n,
        )
        gt.append(np.asarray(idx))
    gt = np.concatenate(gt)

    def recall_at(nprobe):
        hits = 0
        for lo in range(0, total_q, n_queries):
            _vals, idx = ivf_search(
                q[lo : lo + n_queries], layout, k=k, nprobe=nprobe
            )
            idx = np.asarray(idx)
            for r in range(n_queries):
                hits += len(set(idx[r].tolist()) & set(gt[lo + r].tolist()))
        return hits / (total_q * k)

    # Smallest nprobe on a short ladder meeting the 0.95 recall contract;
    # the last rung is reported regardless (recall labels the number).
    for nprobe in (64, 128):
        recall = recall_at(nprobe)
        if recall >= 0.95 or nprobe == 128:
            # The 7.6 GB layout arrays ride as jit ARGUMENTS — captured
            # as closure constants they would be materialized to host.
            @functools.partial(
                jax.jit, static_argnames=("reps", "nprobe")
            )
            def loop(Q, vectors, cents, mask, reps, nprobe):
                lay = layout._replace(
                    vectors=vectors, block_centroids=cents, mask=mask,
                    row_to_original=None,
                )
                def body(i, qq):
                    vals, _idx = ivf_search(qq, lay, k=k, nprobe=nprobe)
                    return qq + 1e-9 * vals[0:1, 0:1]
                return jax.lax.fori_loop(0, reps, body, Q)

            dt = _timed_loop(
                lambda p, r: loop(
                    q[:n_queries] + p, layout.vectors,
                    layout.block_centroids, layout.mask, r, nprobe,
                )
            )
            return dt * 1e3, recall, nprobe, build_s, N


def bench_decode(B=8, P=128, quantize=False):
    """On-TPU generation (models/decoder.py): ms per decode step for a
    ~0.8B-param Llama-shaped decoder at batch B. Decode is weight-
    streaming bound (~1.57 GB bf16/step), so per-step time is nearly flat
    in B — measured 2.3 ms at B=1 vs 2.45 ms at B=8 on v5e (≈82% of the
    HBM speed-of-light at B=1). ``quantize=True`` measures the
    TPU_LLM_QUANTIZE int8 path (~0.8 GB/step)."""
    from multimodal_rag_tpu.models.decoder import (
        DecoderConfig,
        decode_step,
        init_params,
        prefill,
        quantize_decoder_params,
    )

    cfg = DecoderConfig()
    params = init_params(jax.random.key(0), cfg)
    if quantize:
        params = quantize_decoder_params(params)
    MAXNEW = 64
    S = P + MAXNEW
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), jnp.int32)
    _, cache = prefill(params, ids, mask, cfg, S)
    key_mask = jnp.concatenate(
        [mask, jnp.zeros((B, MAXNEW), jnp.int32)], axis=1
    )

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(params, cache, tok, key_mask, reps):
        def body(t, carry):
            tok, cache, km = carry
            pos = P + t
            km = jax.lax.dynamic_update_slice_in_dim(
                km, jnp.ones((B, 1), jnp.int32), pos, axis=1
            )
            positions = jnp.full((B,), P + t, jnp.int32)
            logits, cache = decode_step(
                params, cache, tok, pos, km, positions, cfg
            )
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, km)

        return jax.lax.fori_loop(0, reps, body, (tok, cache, key_mask))[0]

    tok = jnp.full((B,), 5, jnp.int32)
    dt = _timed_loop(lambda p, r: chain(params, cache, tok + p, key_mask, r))
    return dt * 1e3  # ms per decode step


def main():
    backend = jax.default_backend()
    t_start = time.time()
    embed_cps = bench_embed()
    retr_ms = bench_retrieval()
    try:
        retr10m_ms, retr10m_best = (
            round(x, 3) for x in bench_retrieval_10m()
        )
    except Exception:  # noqa: BLE001 — small-memory backends skip the 10M run
        retr10m_ms = retr10m_best = None
    try:
        retr10m_int8_ms, retr10m_int8_best = (
            round(x, 3) for x in bench_retrieval_10m_int8()
        )
    except Exception:  # noqa: BLE001
        retr10m_int8_ms = retr10m_int8_best = None
    try:
        ivf_ms, ivf_recall, ivf_nprobe, ivf_build_s, ivf_n = (
            bench_retrieval_10m_ivf()
        )
        ivf_ms = round(ivf_ms, 3)
        ivf_recall = round(ivf_recall, 4)
        ivf_build_s = round(ivf_build_s, 1)
    except Exception:  # noqa: BLE001 — small-HBM / CPU backends skip
        ivf_ms = ivf_recall = ivf_nprobe = ivf_build_s = ivf_n = None
    try:
        decode_ms = round(bench_decode(), 3)
    except Exception:  # noqa: BLE001 — small-memory backends skip
        decode_ms = None
    try:
        decode_int8_ms = round(bench_decode(quantize=True), 3)
    except Exception:  # noqa: BLE001
        decode_int8_ms = None
    result = {
        "metric": "embed_chunks_per_sec_per_chip",
        "value": round(embed_cps, 1),
        "unit": "chunks/s",
        "vs_baseline": round(embed_cps / EMBED_BASELINE, 4),
        "extra": {
            "backend": backend,
            "device": str(jax.devices()[0]),
            "seq_len": SEQ,
            "batch": BATCH,
            "retrieval_ms_per_8q_1M_top5": round(retr_ms, 3),
            "retrieval_ms_per_8q_10M_top5": retr10m_ms,
            "retrieval_ms_per_8q_10M_top5_best": retr10m_best,
            "retrieval_ms_per_8q_10M_top5_int8_kc21": retr10m_int8_ms,
            "retrieval_ms_per_8q_10M_top5_int8_kc21_best": retr10m_int8_best,
            "retrieval_ms_per_8q_10M_top5_ivf": ivf_ms,
            "retrieval_10M_ivf_recall_at_5": ivf_recall,
            "retrieval_10M_ivf_nprobe": ivf_nprobe,
            "retrieval_10M_ivf_build_s": ivf_build_s,
            "retrieval_10M_ivf_rows": ivf_n,
            "decode_ms_per_step_0p8B_b8": decode_ms,
            "decode_ms_per_step_0p8B_b8_int8": decode_int8_ms,
            "bench_wall_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
