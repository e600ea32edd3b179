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

    dt = _timed_loop(lambda p, r: loop(Q + p, V, M, r))
    return dt * 1e3


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

    dt = _timed_loop(lambda p, r: loop(Q + p, V, S, M, r))
    return dt * 1e3


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
        retr10m_ms = round(bench_retrieval_10m(), 3)
    except Exception:  # noqa: BLE001 — small-memory backends skip the 10M run
        retr10m_ms = None
    try:
        retr10m_int8_ms = round(bench_retrieval_10m_int8(), 3)
    except Exception:  # noqa: BLE001
        retr10m_int8_ms = None
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
            "retrieval_ms_per_8q_10M_top5_int8_kc21": retr10m_int8_ms,
            "decode_ms_per_step_0p8B_b8": decode_ms,
            "decode_ms_per_step_0p8B_b8_int8": decode_int8_ms,
            "bench_wall_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
