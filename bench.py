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
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

EMBED_BASELINE = 20_000.0  # chunks/sec/chip
SEQ = 128  # tokens per chunk (≈600-char chunks after wordpiece)
BATCH = 256
REPS_LO, REPS_HI = 4, 16


def _timed_loop(fn, reps_lo=REPS_LO, reps_hi=REPS_HI, attempts=2):
    """fn(perturbation, reps) → device array. Returns seconds/rep.

    Best-of-``attempts`` per rep count: the relay adds per-dispatch
    jitter that can exceed the marginal device time, so a single
    (hi - lo) pair can come out negative. If the subtraction still
    degenerates, fall back to hi/reps_hi (an upper bound that includes
    the constant overhead). Decode rungs pass larger rep counts +
    attempts: r4's recorded 2.471 → 2.773 ms/step "regression" at the
    short-ctx rung reproduced as ±13% run-to-run spread (2.00–2.53 ms
    over five identical runs, same executable) at the default 4/16
    reps — amortizing more steps per dispatch is the fix, not a code
    change (BASELINE.md "Measurement noise")."""
    np.asarray(fn(0, reps_lo))  # compile + warm lo
    np.asarray(fn(1, reps_hi))  # compile + warm hi
    lo, hi = float("inf"), float("inf")
    for attempt in range(attempts):
        t0 = time.perf_counter()
        np.asarray(fn(2 + 2 * attempt, reps_lo))
        lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(fn(3 + 2 * attempt, reps_hi))
        hi = min(hi, time.perf_counter() - t0)
    dt = (hi - lo) / (reps_hi - reps_lo)
    if dt <= 0:
        dt = hi / reps_hi
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


def bench_ivf_recall_lowrank(n=1_000_000, k=5, nprobes=(64, 256)):
    """Honest-recall probe (VERDICT r3 §4): recall@5 vs exact scan on a
    NON-clustered corpus — correlated Gaussian with a power-law spectrum
    (eigenvalue_i ∝ 1/i), i.e. realistic covariance decay WITHOUT the
    cluster structure the 10M bench corpus gifts IVF. Full curves across
    three distributions (incl. MiniLM embeddings of real chunked text)
    live in tools/ivf_recall_curves.py + BASELINE.md; this keeps one
    live-measured non-clustered number in every BENCH_r*.json.

    Returns {nprobe: recall@5} for the requested rungs."""
    from multimodal_rag_tpu.ops.ivf import (
        build_clustered_layout_device,
        ivf_search,
    )
    from multimodal_rag_tpu.ops.mips_topk import mips_topk

    D, nq, per = 384, 64, 8
    spec = jnp.asarray(
        1.0 / np.sqrt(np.arange(1, D + 1, dtype=np.float32))
    )
    X = jax.random.normal(jax.random.key(11), (n + nq, D), jnp.float32)
    X = X * spec
    X = X / jnp.linalg.norm(X, axis=1, keepdims=True)
    V, Q = jnp.asarray(X[:n], jnp.bfloat16), X[n:]
    layout = build_clustered_layout_device(V, block_rows=256)
    jax.block_until_ready(layout.vectors)
    n_rows = int(layout.vectors.shape[0])
    tile_n = next(
        t for t in (8192, 4096, 2048, 1024, 512, 256) if n_rows % t == 0
    )
    gt = []
    for lo in range(0, nq, per):
        _v, idx = mips_topk(
            Q[lo:lo + per], layout.vectors, layout.mask, k=k,
            tile_n=tile_n,
        )
        gt.append(np.asarray(idx))
    gt = np.concatenate(gt)
    out = {}
    for nprobe in nprobes:
        hits = 0
        for lo in range(0, nq, per):
            _v, idx = ivf_search(Q[lo:lo + per], layout, k=k,
                                 nprobe=nprobe)
            idx = np.asarray(idx)
            for r in range(per):
                hits += len(set(idx[r].tolist()) & set(gt[lo + r].tolist()))
        out[nprobe] = round(hits / (nq * k), 4)
    return out


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
        params = quantize_decoder_params(
            params, bits=4 if quantize == "int4" else 8
        )
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
    # 16/64 steps per dispatch + best-of-3: the 4/16 default left ±13%
    # run-to-run spread at ~2.4 ms/step (see _timed_loop docstring).
    dt = _timed_loop(
        lambda p, r: chain(params, cache, tok + p, key_mask, r),
        reps_lo=16, reps_hi=64, attempts=3,
    )
    return dt * 1e3  # ms per decode step


#: Gemma3-shaped ~0.85B decoder for the LONG-CONTEXT rung: 24 layers,
#: 4 kv-heads x 128, hidden 1536, 5-local(1024):1-global window
#: interleave — the geometry whose full-length bf16 cache reaches
#: 0.94 GiB at ctx 2560 / B=8 (the regime where cache stream, not the
#: weight stream, bounds the step).
def _gemma3ish_cfg():
    from multimodal_rag_tpu.models.decoder import DecoderConfig

    return DecoderConfig(
        vocab_size=32000,
        hidden_dim=1536,
        num_layers=24,
        num_heads=8,
        num_kv_heads=4,
        head_dim=128,
        ff_dim=6144,
        max_position=8192,
        layer_windows=(1024, 1024, 1024, 1024, 1024, 0) * 4,
    )


def bench_decode_longctx(ctx=2560, B=8, windowed=False, quant=False,
                         flash=True, global_attn=False):
    """ms per decode step at cache depth ``ctx`` (VERDICT r4 #2: the r4
    long-context wins, driver-captured). The cache is built directly at
    full depth (`init_cache` + an attendable-prefix mask) instead of
    paying a ctx-long prefill compile — unwritten slots read zeros,
    which costs identical HBM traffic, and timing is what this rung
    measures (numerics rungs live in tests/). 64 decode steps per
    dispatch; variants: windowed rings, int8 KV, flash kernel on/off."""
    from multimodal_rag_tpu.config import settings
    from multimodal_rag_tpu.models.decoder import (
        decode_step,
        init_cache,
        init_params,
    )

    cfg = _gemma3ish_cfg()
    if global_attn:
        # Every layer attends the full context (Llama-style): the pure
        # cache-stream-bound case — the kernel's ragged early-exit can't
        # window-skip anything, so the int8 byte saving shows in full.
        import dataclasses

        cfg = dataclasses.replace(cfg, layer_windows=None)
    params = init_params(jax.random.key(0), cfg)
    STEPS = 64
    P = ctx - STEPS
    cache = init_cache(cfg, B, ctx, windowed=windowed, quant=quant)
    key_mask = jnp.asarray(
        np.arange(ctx)[None, :].repeat(B, 0) < P, jnp.int32
    )

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(params, cache, tok, key_mask, reps):
        def body(t, carry):
            tok, cache, km = carry
            pos = P + jnp.mod(t, STEPS)  # stay within the cache
            km = jax.lax.dynamic_update_slice_in_dim(
                km, jnp.ones((B, 1), jnp.int32), pos, axis=1
            )
            positions = jnp.full((B,), pos, jnp.int32)
            logits, cache = decode_step(
                params, cache, tok, pos, km, positions, cfg
            )
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, km)

        return jax.lax.fori_loop(0, reps, body, (tok, cache, key_mask))[0]

    tok = jnp.full((B,), 5, jnp.int32)
    prev = settings.TPU_LLM_FLASH_DECODE
    # Flash on/off changes the traced program but not decode_step's jit
    # key (settings are ambient, cfg/avals identical across variants) —
    # clear its trace cache so each variant really traces its own path.
    # The outer ``chain`` is a fresh function object per call, so its
    # executable never crosses variants either.
    settings.TPU_LLM_FLASH_DECODE = bool(flash)
    decode_step.clear_cache()
    try:
        dt = _timed_loop(
            lambda p, r: chain(params, cache, tok + p, key_mask, r),
            reps_lo=8, reps_hi=32, attempts=3,
        )
    finally:
        settings.TPU_LLM_FLASH_DECODE = prev
    return dt * 1e3


def bench_spec_trained(B=8, ctx_len=320, head=32, new=96):
    """Speculative acceptance on a REAL trained model (VERDICT r4 #5).

    Earlier rounds' `spec_accept_rate` rode a random-init decoder — a
    greedy random-init model loops, and the prompt-lookup drafter
    predicts loops perfectly, so the 1.0 was a labeled artifact. This
    rung loads (or trains, ~1 min cold) the ~11M byte-level LM from
    tools/train_tiny.py — trained 50/50 on plain LM + extractive
    quoting over the repo's own docs — and measures, on RAG-quoting
    prompts (context ++ "Quote: " ++ span head, the reference's
    paste-context-above-question shape, ref app/server/api.py:370-375):

    * plain greedy fidelity: fraction of generated bytes matching the
      corpus continuation (how well the model actually quotes);
    * per-row tokens/verify-pass under greedy spec decode (K=7) — the
      honest acceptance stat (the while_loop runs to the slowest row,
      so a batch-shared denominator conflates one hard row with poor
      acceptance everywhere);
    * the same on SHUFFLED contexts (model can't quote shuffled bytes →
      drafter proposals rarely verify): the acceptance floor.
    """
    from multimodal_rag_tpu.models.spec_decode import generate_tokens_spec
    from multimodal_rag_tpu.models.decoder import generate_tokens
    from multimodal_rag_tpu.models.tokenizer import ByteTokenizer
    from multimodal_rag_tpu.tools.train_tiny import (
        QUOTE_SEP,
        build_corpus,
        train_or_load,
    )

    params, cfg, _meta = train_or_load()
    tok = ByteTokenizer()
    data = np.frombuffer(build_corpus(), np.uint8).astype(np.int32)
    data = data + tok._OFFSET
    sep = np.asarray(tok.encode(QUOTE_SEP)[1:], np.int32)
    rng = np.random.default_rng(7)

    def build(shuffle):
        rows, refs = [], []
        for _ in range(B):
            s = int(rng.integers(0, len(data) - ctx_len))
            ctx = data[s:s + ctx_len].copy()
            if shuffle:
                rng.shuffle(ctx)
            p = int(rng.integers(16, ctx_len - head - 150 - 1))
            rows.append(np.concatenate(
                ([tok.bos_id], ctx, sep, ctx[p:p + head])
            ).astype(np.int32))
            refs.append(ctx[p + head:p + head + new])
        P = max(len(r) for r in rows)
        ids = np.zeros((B, P), np.int32)
        mask = np.zeros((B, P), np.int32)
        for i, r in enumerate(rows):
            ids[i, P - len(r):] = r
            mask[i, P - len(r):] = 1
        return jnp.asarray(ids), jnp.asarray(mask), np.stack(refs)

    def run(ids, mask, refs):
        out_p, _ = generate_tokens(
            params, ids, mask, jax.random.key(0), cfg, new, temperature=0.0
        )
        fid = float((np.asarray(out_p)[:, :new] == refs).mean())
        _out, lengths, row_iters = generate_tokens_spec(
            params, ids, mask, jax.random.key(0), cfg, new,
            temperature=0.0,
        )
        per_row = np.asarray(lengths) / np.maximum(np.asarray(row_iters), 1)
        return fid, float(per_row.mean())

    fid_q, tpp_q = run(*build(shuffle=False))
    fid_n, tpp_n = run(*build(shuffle=True))
    return {
        "spec_trained_params_m": round(
            sum(x.size for x in jax.tree.leaves(params)) / 1e6, 1
        ),
        "spec_trained_quote_fidelity": round(fid_q, 4),
        "spec_trained_tokens_per_pass_quote": round(tpp_q, 2),
        "spec_trained_shuffled_fidelity": round(fid_n, 4),
        "spec_trained_tokens_per_pass_shuffled": round(tpp_n, 2),
    }


def bench_spec_trained_serving(
    slots=8, n_requests=16, max_new=64, spec_k=7, chunk_tokens=128
):
    """Speculative acceptance through the CONTINUOUS SERVING path
    (`serving_decode._spec_step_rows`) on the trained tiny LM — the
    number `spec_accept_rate` in the bench output. Requests are
    RAG-quoting prompts over the model's own training corpus (context ++
    "Quote: " ++ span head); the server runs chunked prefill + greedy
    speculative decode exactly as production traffic would. Replaces the
    pre-r5 random-init probe whose 1.0 was a labeled artifact (greedy
    random-init loops draft perfectly)."""
    import asyncio

    from multimodal_rag_tpu.models.decoder import TextDecoder
    from multimodal_rag_tpu.models.tokenizer import ByteTokenizer
    from multimodal_rag_tpu.serving_decode import DecodeServer
    from multimodal_rag_tpu.tools.train_tiny import (
        QUOTE_SEP,
        build_corpus,
        train_or_load,
    )

    params, cfg, _meta = train_or_load()
    decoder = TextDecoder(
        params=params, cfg=cfg, tokenizer=ByteTokenizer(),
        prompt_buckets=(512,), batch_buckets=(1, slots),
    )
    server = DecodeServer(
        decoder, slots=slots, max_new_cap=max_new,
        chunk_tokens=chunk_tokens, spec_k=spec_k,
    )
    corpus_b = build_corpus()
    rng = np.random.default_rng(11)
    prompts = []
    while len(prompts) < n_requests:
        s = int(rng.integers(0, len(corpus_b) - 340))
        win = corpus_b[s:s + 320]
        if not win.isascii():
            # ASCII windows only: the model is byte-level, so the prompt
            # string must round-trip to the exact training byte span
            # (multi-byte slices also overflow the 512 bucket).
            continue
        ctx = win.decode()
        p = int(rng.integers(16, 320 - 32 - 150 - 1))
        prompts.append(ctx + QUOTE_SEP + ctx[p:p + 32])
    no_eos = {int(server.eos_id): -100.0}  # exact token denominators

    async def drive():
        async def batch(ps):
            await asyncio.gather(*[
                server.submit(
                    p, max_new_tokens=max_new, temperature=0.0,
                    logit_bias=no_eos,
                )
                for p in ps
            ])

        await batch(prompts[:2])  # warm executables
        server.spec_passes = 0
        server.spec_row_passes = 0
        server.spec_emitted = 0
        await batch(prompts)
        await server.stop()

    asyncio.run(drive())
    if not server.spec_row_passes:
        return {}
    # Per ROW-pass: spec_emitted sums over live rows per dispatch, so
    # the acceptance denominator must too (each live row gets its own
    # K-token draft + accept test per dispatch).
    return {
        "spec_accept_rate": round(
            server.spec_emitted / (server.spec_row_passes * (spec_k + 1)),
            4,
        ),
        "spec_tokens_per_pass": round(
            server.spec_emitted / server.spec_row_passes, 2
        ),
        "spec_probe_model": "trained_tiny_lm_11M_quote_task",
    }


def bench_vision():
    """Vision-stack performance (BASELINE configs 2-3 / VERDICT r3 §6):
    cross-modal image-embed throughput for the CLIP ViT-B/32 and SigLIP
    B/16 towers (images/s/chip through the device-side forward; host
    decode is covered by native/imgdec.cc and overlaps), plus the
    multimodal generation cost the VLM path adds on top of text serving —
    llava-1.5-shaped vision+projector (CLIP-L/14-336, 576 soft tokens)
    and Gemma3-shaped vision+projector (SigLIP so400m 896px, 4096 patches
    pooled to 256 soft tokens), and the spliced-prefill cost at the
    resulting sequence length. VLM decode steps are the text decoder's
    (bench_decode) — images only lengthen the prefix."""
    from multimodal_rag_tpu.models import clip as clip_mod
    from multimodal_rag_tpu.models import siglip as siglip_mod

    out = {}
    rng = np.random.default_rng(0)

    def img_batch(B, size):
        return jnp.asarray(
            rng.standard_normal((B, size, size, 3)), jnp.float32
        )

    # -- CLIP ViT-B/32 image embed throughput ------------------------------
    B = 128
    cparams = clip_mod.init_params(jax.random.key(0), clip_mod.CLIP_B32)
    pixels = img_batch(B, clip_mod.CLIP_B32.image_size)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def clip_loop(params, px, reps):
        def body(i, carry):
            out = clip_mod.encode_image(
                params, px + carry, clip_mod.CLIP_B32
            )
            return (jnp.abs(out[0, 0]) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = _timed_loop(lambda p, r: clip_loop(cparams, pixels + p, r))
    out["clip_b32_images_per_s"] = round(B / dt, 1)

    # -- SigLIP B/16 image embed throughput --------------------------------
    B = 64
    sparams = siglip_mod.init_params(
        jax.random.key(1), siglip_mod.SIGLIP_B16
    )
    pixels = img_batch(B, siglip_mod.SIGLIP_B16.image_size)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def sig_loop(params, px, reps):
        def body(i, carry):
            out = siglip_mod.encode_image(
                params, px + carry, siglip_mod.SIGLIP_B16
            )
            return (jnp.abs(out[0, 0]) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = _timed_loop(lambda p, r: sig_loop(sparams, pixels + p, r))
    out["siglip_b16_images_per_s"] = round(B / dt, 1)

    # -- llava-1.5-shaped VLM: vision+projector per image + spliced prefill
    from multimodal_rag_tpu.models.decoder import (
        DecoderConfig,
        init_params as init_lm,
        prefill_embeds,
    )
    from multimodal_rag_tpu.models.llava import (
        LlavaConfig,
        encode_images_for_llm,
        init_llava_params,
    )

    lcfg = LlavaConfig(
        text=DecoderConfig(),  # the 0.8B bench decoder
        vision=clip_mod.CLIPConfig(
            image_size=336, patch_size=14, vision_width=1024,
            vision_layers=24, vision_heads=16, embed_dim=768,
        ),
    )
    lparams = init_llava_params(jax.random.key(2), lcfg)
    pixels1 = img_batch(1, 336)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def lv_loop(params, px, reps):
        def body(i, carry):
            emb = encode_images_for_llm(params, px + carry, lcfg)
            return (jnp.abs(emb[0, 0, 0]) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = _timed_loop(lambda p, r: lv_loop(lparams, pixels1 + p, r))
    out["llava_vision_ms_per_image"] = round(dt * 1e3, 3)

    # Spliced prefill: 576 image tokens + 128 text tokens → bucket 768.
    P = 768
    embeds = jnp.asarray(
        rng.standard_normal((1, P, lcfg.text.hidden_dim)) * 0.02,
        jnp.float32,
    )
    pmask = jnp.ones((1, P), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def pf_loop(params, emb, reps):
        def body(i, carry):
            logits, _ = prefill_embeds(
                params, emb + carry, pmask, lcfg.text, P + 64
            )
            return (jnp.abs(logits[0, 0]) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = _timed_loop(lambda p, r: pf_loop(lparams["lm"], embeds + p, r))
    out["llava_prefill_ms_704tok"] = round(dt * 1e3, 3)

    # -- Gemma3-shaped VLM vision+projector (so400m 896px → 256 tokens) ---
    from multimodal_rag_tpu.models.gemma3_vlm import (
        Gemma3VLMConfig,
        encode_images_for_llm as g3_encode,
        init_gemma3_vlm_params,
    )

    gcfg = Gemma3VLMConfig(
        text=DecoderConfig(),
        vision=siglip_mod.SigLIPConfig(
            image_size=896, patch_size=14, vision_width=1152,
            vision_layers=27, vision_heads=16, embed_dim=1152,
        ),
        image_token_id=262144,
    )
    gparams = init_gemma3_vlm_params(jax.random.key(3), gcfg)
    pixels1 = img_batch(1, 896)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def g3_loop(params, px, reps):
        def body(i, carry):
            emb = g3_encode(params, px + carry, gcfg)
            return (jnp.abs(emb[0, 0, 0]) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = _timed_loop(lambda p, r: g3_loop(gparams, pixels1 + p, r))
    out["gemma3_vision_ms_per_image"] = round(dt * 1e3, 3)
    return out


def _bench_pdf(pages=4, lines_per_page=40):
    """Minimal multi-page ISO-32000 PDF with real text streams — drives
    the first-party interpreter (ingest/pdfparse.py) the way a scanned
    report would, without shipping a binary fixture."""
    from multimodal_rag_tpu.tools.train_tiny import build_corpus

    text = build_corpus().decode("utf-8", "ignore")
    text = "".join(c if c.isascii() and c.isprintable() else " "
                   for c in text)
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>", b""]
    kids = []
    n = 3
    off = 0
    for _ in range(pages):
        stream = b""
        for li in range(lines_per_page):
            line = text[off:off + 72].encode()
            off += 72
            line = line.replace(b"\\", b" ").replace(b"(", b"[")
            line = line.replace(b")", b"]")
            stream += b"BT /F1 10 Tf 40 %d Td (%s) Tj ET " % (
                760 - 18 * li, line
            )
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (n + 1, 3 + 2 * pages)
        )
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream"
            % (len(stream), stream)
        )
        kids.append(b"%d 0 R" % n)
        n += 2
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objs[1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        b" ".join(kids), pages
    )
    pdf = b"%PDF-1.4\n"
    for i, o in enumerate(objs, 1):
        pdf += b"%d 0 obj\n%s\nendobj\n" % (i, o)
    return pdf + b"trailer\n<< /Root 1 0 R >>\n%%EOF"


def bench_ingest(n_txt=16, n_pdf=4, doc_kb=32, concurrency=8):
    """E2E HOST ingest throughput (VERDICT r4 #6 / SURVEY §7 hard part
    6): docs/s and chunks/s through the production upload path —
    parse (incl. the first-party PDF interpreter) → chunk → summarize
    (FakeLLMAdapter stands in for the LLM hop, so the number isolates
    THIS framework's host pipeline) → WordPiece tokenize → MiniLM-L6
    embed on-chip → vector store add → gzip'd raw-doc KV. The
    device-only 31.9k chunks/s headline (bench_embed) feeds synthetic
    token ids; this rung answers whether the host side can feed it.
    Inputs: ``n_txt`` ~``doc_kb`` KB text docs from the repo corpus +
    ``n_pdf`` synthesized 4-page PDFs; ``concurrency`` parallel uploads
    (the server's own fan-in shape, tools/bulk_ingest.py default 16).

    Two passes over the same doc set: pass 1 (untimed) flushes every
    (batch, seq)-bucket XLA compile the workload's chunk-length mix can
    reach — measured 6-22 s per stray shape over the dev relay, which
    dominated a single cold pass; pass 2 is the reported steady-state
    window. The embed cache is OFF so pass 2 recomputes every
    embedding (with it on, pass 2 would measure a dict lookup)."""
    import asyncio

    from multimodal_rag_tpu.embedder import EmbeddingManager
    from multimodal_rag_tpu.ingest.parser import DocumentParser
    from multimodal_rag_tpu.ingest.summarizer import ContentSummarizer
    from multimodal_rag_tpu.models.adapters import FakeLLMAdapter
    from multimodal_rag_tpu.storage.retriever import MultiVectorRetriever
    from multimodal_rag_tpu.tools.train_tiny import build_corpus

    text = build_corpus().decode("utf-8", "ignore")
    while len(text) < (n_txt + 1) * doc_kb * 1024:
        text = text + "\n\n" + text
    docs = []
    for i in range(n_txt):
        body = text[i * doc_kb * 1024:(i + 1) * doc_kb * 1024]
        docs.append((f"doc{i:02d}.txt", body.encode()))
    pdf_bytes = _bench_pdf()
    for i in range(n_pdf):
        docs.append((f"rep{i:02d}.pdf", pdf_bytes))

    import tempfile

    from multimodal_rag_tpu.storage.kv import open_kv

    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    parser = DocumentParser(figures_dir=f"{tmp}/figures", enable_ocr=False)
    summarizer = ContentSummarizer(FakeLLMAdapter(), max_concurrent=8)
    # Production encoder+store; cache OFF so the timed pass really
    # recomputes (the parser keeps ITS doc cache — docs get fresh ids).
    embedder = EmbeddingManager(enable_cache=False)
    # Keep the KV snapshot in the bench tempdir, not the default cwd dir.
    retriever = MultiVectorRetriever(kv=open_kv("native", f"{tmp}/kv"))

    async def one(i, name, content, tag):
        doc_id = f"bench_{tag}_{i:03d}"
        parsed = await parser.parse_document(content, name, doc_id=doc_id)
        summaries = await summarizer.summarize_parsed_document(parsed)
        counts = await embedder.embed_and_store(summaries, doc_id)
        await retriever.store_raw_documents(doc_id, summaries, name)
        return sum(counts.values())

    async def run_pass(tag, repeats=1):
        sem = asyncio.Semaphore(concurrency)

        async def bounded(i, name, content):
            async with sem:
                return await one(i, name, content, tag)

        work = [
            (r * len(docs) + i, name, content)
            for r in range(repeats)
            for i, (name, content) in enumerate(docs)
        ]
        t0 = time.perf_counter()
        chunks = await asyncio.gather(*[
            bounded(i, name, content) for i, name, content in work
        ])
        return sum(chunks), time.perf_counter() - t0, len(work)

    async def drive():
        await embedder.initialize()
        await retriever.initialize()
        _c, warm_wall, _n = await run_pass("warm")
        # Repeats stretch the steady-state window: at 3 repeats the
        # timed pass is 2-9 s of host asyncio against a shared relay
        # and consecutive runs measured 285 vs 1269 chunks/s (r5 probe)
        # — per-dispatch RTT spikes, not pipeline throughput. 10
        # repeats (~60-90 s window) amortize them.
        total, wall, n = await run_pass("run", repeats=10)
        return total, wall, warm_wall, n

    total_chunks, wall, warm_wall, n_docs = asyncio.run(drive())
    return {
        "ingest_docs_per_s": round(n_docs / wall, 2),
        "ingest_chunks_per_s_e2e": round(total_chunks / wall, 1),
        "ingest_docs": n_docs,
        "ingest_chunks": total_chunks,
        "ingest_wall_s": round(wall, 2),
        "ingest_cold_pass_wall_s": round(warm_wall, 2),
    }


def make_bench_tokenizer(vocab_size: int):
    """Tokenizer for serving benches: every vocab id decodes to a visible
    ASCII char, so streaming deltas track token emission 1:1. (The plain
    byte fallback drops ids outside the byte range; a random-init model
    samples mostly out-of-range ids, which makes its stream look empty
    until the final flush and breaks TTFT/per-token measurement.)"""
    from multimodal_rag_tpu.models.tokenizer import ByteTokenizer

    class _BenchTokenizer(ByteTokenizer):
        def __init__(self) -> None:
            super().__init__()
            self.vocab_size = vocab_size

        def decode(self, ids):
            return "".join(chr(97 + (int(i) % 26)) for i in ids)

    return _BenchTokenizer()


def bench_serving(
    slots=8,
    n_requests=32,
    waves=4,
    shared_tokens=384,
    unique_tokens=128,
    max_new=48,
    chunk_tokens=128,
    prefix_entries=8,
    spec_k=7,
    quantize=False,
    greedy=True,
    decoder=None,
):
    """The serving layer measured as a SYSTEM (VERDICT r3 §1): a
    ``DecodeServer`` with chunked prefill + prefix cache + speculative
    decoding ON, driven by concurrent OpenAI-style request streams —
    ``waves`` waves of requests sharing a RAG preamble (``shared_tokens``)
    with unique tails, TTFT taken from the stream's first delta.

    Reports BOTH raw wall-clock numbers and the relay-independent
    decomposition: the dev chip sits behind a tunnel that adds ~30 ms per
    dispatch (measured; device step time is ~2.5 ms), so raw TTFT/tok-s
    are dominated by host↔chip RTT a locally-attached chip does not pay.
    ``tokens_per_dispatch`` (scheduling efficiency) and the measured
    speculative acceptance are hardware-independent; local throughput ≈
    tokens_per_dispatch / (device_step_ms + host overhead).

    Spec-acceptance caveat: the bench decoder is random-init, so
    acceptance reflects the drafter mechanism on degenerate (often
    repetitive) output, not real RAG quoting behavior — treat it as a
    lower bound for retrieval-grounded answers that quote their context.
    """
    import asyncio

    from multimodal_rag_tpu.models.decoder import (
        DecoderConfig,
        TextDecoder,
        init_params,
        quantize_decoder_params,
    )
    from multimodal_rag_tpu.serving_decode import DecodeServer

    if decoder is None:
        cfg = DecoderConfig()
        params = init_params(jax.random.key(0), cfg)
        if quantize:
            params = quantize_decoder_params(params)
        decoder = TextDecoder(
            params=params, cfg=cfg,
            tokenizer=make_bench_tokenizer(cfg.vocab_size),
            prompt_buckets=(128, 256, 512, 1024),
        )
    server = DecodeServer(
        decoder,
        slots=slots,
        max_new_cap=max_new,
        chunk_tokens=chunk_tokens,
        prefix_entries=prefix_entries,
        spec_k=spec_k,
    )

    # ByteTokenizer: chars == tokens, so prompts are plain ASCII strings.
    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"abcdefghij klmnopqrstuvwxyz. ", np.uint8)
    shared = bytes(rng.choice(alpha, shared_tokens)).decode()

    def make_prompt(i):
        tail = bytes(rng.choice(alpha, unique_tokens)).decode()
        return shared + f"[q{i:03d}]" + tail

    temperature = 0.0 if greedy else 0.7
    # Suppress EOS so every request emits exactly ``max_new`` tokens
    # (random-init greedy can lock onto EOS and silently shrink the token
    # denominator). The bias is a device-resident (slots, V) add per step
    # — noise next to the weight stream — and exercises the same biased
    # executables OpenAI logit_bias traffic uses.
    no_eos = {int(server.eos_id): -100.0}

    async def one(i, wave, out):
        t_sub = time.perf_counter()
        t_first = None
        async for delta, fin in server.submit_stream(
            make_prompt(i), max_new_tokens=max_new,
            temperature=temperature, logit_bias=no_eos,
        ):
            now = time.perf_counter()
            if t_first is None and delta:
                t_first = now
            if fin is not None:
                out.append((t_sub, t_first or now, now, wave))

    async def drive():
        t0 = time.perf_counter()
        out = []
        per_wave = max(1, n_requests // waves)
        tasks = []
        for w in range(waves):
            tasks += [
                asyncio.create_task(one(w * per_wave + j, w, out))
                for j in range(per_wave)
            ]
            # Stagger waves by a beat so later waves hit the prefix cache
            # stored by the first (realistic multi-turn RAG arrival).
            await asyncio.sleep(0.3)
        await asyncio.gather(*tasks)
        await server.stop()
        return out, time.perf_counter() - t0

    # Warm the executables OUTSIDE the timed window (first compile is
    # tens of seconds and would swamp every percentile). The server is
    # stopped between asyncio.run calls so its loop task re-binds to the
    # fresh event loop.
    async def warm():
        if server.chunk:
            wp = "warmup " + shared[: server.chunk + 9]
        else:
            # Classic-mode admission prefills at the request's prompt
            # bucket — warm the bucket the REAL prompts will use.
            wp = "w" * (shared_tokens + unique_tokens + 7)
        await server.submit(
            wp, max_new_tokens=max(spec_k + 2, 4),
            temperature=temperature, logit_bias=no_eos,
        )
        if prefix_entries:
            # Second warm request shares the first's chunk-aligned prefix
            # → compiles the prefix-hit load path too.
            await server.submit(
                wp + "x", max_new_tokens=2, temperature=temperature,
                logit_bias=no_eos,
            )
        await server.stop()

    asyncio.run(warm())
    server.steps_run = 0
    server.spec_passes = 0
    server.spec_emitted = 0
    server.prefix_hits = 0
    server.prefix_tokens_reused = 0
    done_before = server.requests_done
    records, wall = asyncio.run(drive())
    n_done = server.requests_done - done_before
    total_tokens = max_new * n_done  # EOS suppressed → exact count
    ttfts = sorted((f - s) * 1e3 for s, f, _, _ in records)
    # Wave-1 TTFT: requests that found a free slot immediately — the
    # unsaturated-deployment number. Whole-run TTFT includes queue wait
    # under the (waves-1)x oversubscribed burst.
    ttfts_w1 = sorted(
        (f - s) * 1e3 for s, f, _, w in records if w == 0
    ) or [float("nan")]
    per_tok = sorted(
        (d - f) * 1e3 / max(max_new - 1, 1) for _, f, d, _ in records
    )
    p = lambda xs, q: xs[min(len(xs) - 1, int(q * len(xs)))]  # noqa: E731
    spec_accept = None
    if server.spec_passes:
        spec_accept = server.spec_emitted / (
            server.spec_passes * (spec_k + 1)
        )
    return {
        "serving_tok_s": round(total_tokens / wall, 1),
        "serving_ttft_ms_p50": round(p(ttfts, 0.50), 1),
        "serving_ttft_ms_p95": round(p(ttfts, 0.95), 1),
        "serving_ttft_unqueued_ms_p50": round(p(ttfts_w1, 0.50), 1),
        "serving_per_token_ms_p50": round(p(per_tok, 0.50), 2),
        "serving_requests": n_done,
        "serving_wall_s": round(wall, 2),
        "serving_dispatches": server.steps_run,
        "serving_tokens_per_dispatch": round(
            total_tokens / max(server.steps_run, 1), 2
        ),
        "spec_accept_rate": (
            round(spec_accept, 4) if spec_accept is not None else None
        ),
        "spec_tokens_per_pass": (
            round(server.spec_emitted / server.spec_passes, 2)
            if server.spec_passes else None
        ),
        "prefix_cache_hits": server.prefix_hits,
        "prefix_tokens_reused": server.prefix_tokens_reused,
    }


def bench_serving_mixed(
    slots=8,
    n_short=8,
    n_long=8,
    n_lora=8,
    n_vision=4,
    chunk_tokens=128,
):
    """Mixed-workload serving (VERDICT r4 #8): four request classes
    through ONE continuous-batching ``DecodeServer`` simultaneously —

    * ``short``: 128-token chat prompts, 32 new tokens;
    * ``long``: 1536-token RAG prompts, 128 new tokens (long generation);
    * ``lora``: 384-token prompts routed to an S-LoRA adapter slot
      (served from the shared base weights via stacked side-paths);
    * ``vision``: 576 soft tokens + 64 text tokens admitted through
      ``prefill_embeds`` (the r4 first-class vision path), 48 new tokens.

    Reports per-class TTFT p50 (streamed first delta) and aggregate
    tok/s — the single-class uniform-prompt bench_serving cannot see
    cross-class interference (a long prefill stalling short rows is
    exactly what chunked admission exists to prevent)."""
    import asyncio

    from multimodal_rag_tpu.models.decoder import (
        DecoderConfig,
        TextDecoder,
        init_params,
    )
    from multimodal_rag_tpu.serving_decode import DecodeServer

    cfg = DecoderConfig()
    params = init_params(jax.random.key(0), cfg)

    # Two S-LoRA side-path stacks on q/v (routing + gather cost is what
    # matters here, not adapter quality) — first-party init + PEFT
    # export + stack, the same loop tools/finetune_lora.py produces.
    try:
        import tempfile

        from multimodal_rag_tpu.models.lora import stack_lora_adapters
        from multimodal_rag_tpu.models.lora_train import (
            init_lora_params,
            save_peft_adapter,
        )

        paths = []
        for a in range(2):
            lora = init_lora_params(
                jax.random.key(100 + a), params, r=8,
                targets=("wq", "wv"),
            )
            paths.append(save_peft_adapter(
                lora, tempfile.mkdtemp(prefix=f"bench_lora{a}_"), r=8
            ))
        params = stack_lora_adapters(params, cfg, paths)
        lora_ok = True
    except Exception:  # noqa: BLE001 — safetensors absent: route to base
        lora_ok = False

    decoder = TextDecoder(
        params=params, cfg=cfg,
        tokenizer=make_bench_tokenizer(cfg.vocab_size),
        prompt_buckets=(128, 256, 512, 1024, 2048),
    )
    server = DecodeServer(
        decoder, slots=slots, max_new_cap=128,
        chunk_tokens=chunk_tokens, prefix_entries=0, spec_k=0,
    )
    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"abcdefghij klmnopqrstuvwxyz. ", np.uint8)

    def prompt(n):
        return bytes(rng.choice(alpha, n)).decode()

    no_eos = {int(server.eos_id): -100.0}
    VT, VTXT = 576, 64  # vision soft tokens + trailing text tokens

    def vision_req():
        emb = rng.standard_normal(
            (VT + VTXT, cfg.hidden_dim)
        ).astype(np.float32) * 0.02
        ids = rng.integers(3, 200, VT + VTXT).tolist()
        return emb, ids

    classes = (
        [("short", dict(p=128, new=32))] * n_short
        + [("long", dict(p=1536, new=128))] * n_long
        + [("lora", dict(p=384, new=48,
                         adapter=1 if lora_ok else 0))] * n_lora
        + [("vision", dict(new=48))] * n_vision
    )
    rng.shuffle(classes)

    records = []

    async def one(cls, kw):
        t_sub = time.perf_counter()
        t_first = None
        sub = dict(
            max_new_tokens=kw["new"], temperature=0.0,
            logit_bias=no_eos, adapter_id=kw.get("adapter", 0),
        )
        if cls == "vision":
            emb, ids = vision_req()
            gen = server.submit_stream(
                "", prompt_embeds=emb, prompt_ids=ids, **sub
            )
        else:
            gen = server.submit_stream(prompt(kw["p"]), **sub)
        async for delta, fin in gen:
            now = time.perf_counter()
            if t_first is None and delta:
                t_first = now
            if fin is not None:
                records.append((cls, t_sub, t_first or now, now))

    async def drive():
        # Warm each class's executables outside the window.
        await asyncio.gather(
            one("short", dict(p=128, new=4)),
            one("long", dict(p=1536, new=4)),
            one("vision", dict(new=4)),
        )
        records.clear()
        t0 = time.perf_counter()
        await asyncio.gather(*[
            asyncio.create_task(one(c, kw)) for c, kw in classes
        ])
        wall = time.perf_counter() - t0
        await server.stop()
        return wall

    wall = asyncio.run(drive())
    total_tokens = sum(kw["new"] for _, kw in classes)
    p50 = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out = {
        "serving_mixed_tok_s": round(total_tokens / wall, 1),
        "serving_mixed_requests": len(records),
        "serving_mixed_wall_s": round(wall, 2),
        "serving_mixed_lora_routed": lora_ok,
    }
    for cls in ("short", "long", "lora", "vision"):
        ttfts = [
            (f - s) * 1e3 for c, s, f, _ in records if c == cls
        ]
        if ttfts:
            out[f"serving_mixed_ttft_ms_p50_{cls}"] = round(p50(ttfts), 1)
    return out


def _progress(label, t0):
    """One stderr line per completed rung: lets an operator (or the
    bench driver) see where a long run is instead of a silent 20-40 min
    window — stdout stays reserved for the single JSON result line."""
    print(f"[bench +{time.time() - t0:7.1f}s] {label}", file=sys.stderr,
          flush=True)


def main():
    # Persistent compile cache: repeat bench runs on the same host skip
    # the ~6-22 s/shape relay compiles (timings are unaffected — every
    # rung warms its executable before the timed loop).
    from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    backend = jax.default_backend()
    t_start = time.time()
    embed_cps = bench_embed()
    _progress("embed", t_start)
    retr_ms = bench_retrieval()
    _progress("retrieval_1M", t_start)
    try:
        retr10m_ms, retr10m_best = (
            round(x, 3) for x in bench_retrieval_10m()
        )
    except Exception:  # noqa: BLE001 — small-memory backends skip the 10M run
        retr10m_ms = retr10m_best = None
    _progress("retrieval_10M", t_start)
    try:
        retr10m_int8_ms, retr10m_int8_best = (
            round(x, 3) for x in bench_retrieval_10m_int8()
        )
    except Exception:  # noqa: BLE001
        retr10m_int8_ms = retr10m_int8_best = None
    _progress("retrieval_10M_int8", t_start)
    try:
        ivf_ms, ivf_recall, ivf_nprobe, ivf_build_s, ivf_n = (
            bench_retrieval_10m_ivf()
        )
        ivf_ms = round(ivf_ms, 3)
        ivf_recall = round(ivf_recall, 4)
        ivf_build_s = round(ivf_build_s, 1)
    except Exception:  # noqa: BLE001 — small-HBM / CPU backends skip
        ivf_ms = ivf_recall = ivf_nprobe = ivf_build_s = ivf_n = None
    _progress("retrieval_10M_ivf", t_start)
    try:
        lowrank_recall = bench_ivf_recall_lowrank()
    except Exception:  # noqa: BLE001 — small-HBM / CPU backends skip
        lowrank_recall = {}
    _progress("ivf_recall_lowrank", t_start)
    try:
        decode_ms = round(bench_decode(), 3)
    except Exception:  # noqa: BLE001 — small-memory backends skip
        decode_ms = None
    try:
        decode_int8_ms = round(bench_decode(quantize=True), 3)
    except Exception:  # noqa: BLE001
        decode_int8_ms = None
    try:
        decode_int4_ms = round(bench_decode(quantize="int4"), 3)
    except Exception:  # noqa: BLE001
        decode_int4_ms = None
    _progress("decode_short_ctx", t_start)
    # Long-context decode rung (VERDICT r4 #2): Gemma3-shaped ~0.85B at
    # cache depths where the CACHE stream bounds the step. Matrix:
    # flash-kernel ablation + windowed rings + int8 KV at ctx 2560; the
    # headline + int8 repeated at ctx 5120.
    longctx = {}
    try:
        for key, kw in (
            ("decode_ms_per_step_ctx2560", {}),
            ("decode_ms_per_step_ctx2560_noflash", {"flash": False}),
            ("decode_ms_per_step_ctx2560_windowed", {"windowed": True}),
            ("decode_ms_per_step_ctx2560_int8kv", {"quant": True}),
            (
                "decode_ms_per_step_ctx2560_windowed_int8kv",
                {"windowed": True, "quant": True},
            ),
            ("decode_ms_per_step_ctx5120", {"ctx": 5120}),
            (
                "decode_ms_per_step_ctx5120_int8kv",
                {"ctx": 5120, "quant": True},
            ),
            (
                "decode_ms_per_step_ctx5120_global",
                {"ctx": 5120, "global_attn": True},
            ),
            (
                "decode_ms_per_step_ctx5120_global_int8kv",
                {"ctx": 5120, "global_attn": True, "quant": True},
            ),
        ):
            longctx[key] = round(bench_decode_longctx(**kw), 3)
            _progress(key, t_start)
    except Exception:  # noqa: BLE001 — small-memory backends skip
        pass
    try:
        # ONE decoder shared by the serving rows (weight init + HBM
        # residency identical across configs).
        from multimodal_rag_tpu.models.decoder import (
            DecoderConfig,
            TextDecoder,
            init_params,
        )

        _scfg = DecoderConfig()
        _sdec = TextDecoder(
            params=init_params(jax.random.key(0), _scfg), cfg=_scfg,
            tokenizer=make_bench_tokenizer(_scfg.vocab_size),
            prompt_buckets=(128, 256, 512, 1024),
        )
        # The RECOMMENDED production flag set (DEPLOYMENT.md "Serving
        # configuration"): chunked prefill + prefix cache, spec off.
        serving = bench_serving(spec_k=0, decoder=_sdec)
        _progress("serving", t_start)
    except Exception:  # noqa: BLE001 — small-memory backends skip
        serving = {}
        _sdec = None
    try:
        # Acceptance keys now come from the TRAINED tiny LM through the
        # continuous serving path (VERDICT r4 #5) — the pre-r5 random-init
        # probe's 1.0 was a labeled artifact (greedy loops draft
        # perfectly).
        serving.update(bench_spec_trained_serving())
        _progress("spec_trained_serving", t_start)
    except Exception:  # noqa: BLE001
        pass
    try:
        serving.update(bench_serving_mixed())
        _progress("serving_mixed", t_start)
    except Exception:  # noqa: BLE001 — small-memory backends skip
        pass
    try:
        spec_trained = bench_spec_trained()
        _progress("spec_trained", t_start)
    except Exception:  # noqa: BLE001 — e.g. corpus files absent
        spec_trained = {}
    try:
        ingest = bench_ingest()
        _progress("ingest", t_start)
    except Exception:  # noqa: BLE001 — e.g. corpus files absent
        ingest = {}
    try:
        vision = bench_vision()
        _progress("vision", t_start)
    except Exception:  # noqa: BLE001 — small-memory backends skip
        vision = {}
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
            # Non-clustered (power-law Gaussian) honesty probe — the 10M
            # recall above rides a clustered corpus (IVF's best case).
            "ivf_recall_at_5_lowrank_1M_nprobe64": lowrank_recall.get(64),
            "ivf_recall_at_5_lowrank_1M_nprobe256": lowrank_recall.get(
                256
            ),
            "decode_ms_per_step_0p8B_b8": decode_ms,
            "decode_ms_per_step_0p8B_b8_int8": decode_int8_ms,
            "decode_ms_per_step_0p8B_b8_int4": decode_int4_ms,
            **longctx,
            **spec_trained,
            **ingest,
            **vision,
            **serving,
            "bench_wall_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
