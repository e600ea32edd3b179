"""IVF recall honesty curves (VERDICT r3 §4).

The headline ``recall@5 = 1.0`` in BENCH_r03 was measured on a
synthetic-CLUSTERED corpus whose ground truth rides the same layout —
IVF's best case. This tool measures recall@5 vs ``nprobe`` against an
exact-scan oracle on three HARDER distributions, so the recall the
store's planner promises (`vectorstore/store.py` IVF path, replacing the
reference's hnswlib at `/root/reference/app/utils/embedder.py:595-601`)
rests on evidence:

* ``text``    — MiniLM embeddings of a generated document corpus pushed
  through the REAL ingest chunker (`ingest/chunking.py`) and the real
  encoder (`models/minilm.py`). The encoder is random-init in this
  environment (no checkpoint) — embeddings still inherit the lumpy,
  non-isotropic manifold token statistics induce, which is the
  structure IVF exploits in production. Stated on every number.
* ``lowrank`` — correlated Gaussian with a power-law spectrum
  (eigenvalue_i ∝ i^-1): realistic covariance decay, NO cluster
  structure. The honest "real embeddings without cluster gift" case.
* ``sphere``  — uniform unit-sphere noise: the adversarial floor. No
  structure exists for ANY ANN (IVF or hnswlib) to exploit; recall
  here is dominated by how many rows nprobe covers.

hnswlib/chromadb are NOT importable in the bench image (verified — no
pip installs allowed), so the ANN-vs-ANN recall comparison on identical
vectors remains out of reach here; the exact-scan oracle is the
stronger ground truth anyway (hnswlib's own recall < 1).

Run on the TPU host::

    python -m multimodal_rag_tpu.tools.ivf_recall_curves [--n 1000000]

``--small`` runs a 20k-row CPU sanity pass. Output: one JSON line per
(corpus, nprobe) plus a markdown table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

_WORDS = (
    "learning model vector tensor graph search index retrieval chunk "
    "document table figure image token attention layer cache memory "
    "bandwidth kernel compile mesh shard replica batch stream decode "
    "prefill adapter quantize recall latency throughput cluster probe "
    "market report revenue quarter growth policy climate energy cell "
    "protein neuron physics quantum field theorem proof algebra prime"
).split()


def _gen_texts(n: int, seed: int = 0):
    """n pseudo-document chunks: topic-biased bags of words (each chunk
    draws from a topic-weighted vocabulary slice, so embeddings form the
    soft topical lumps a real corpus has — lumpier than noise, far less
    separable than the synthetic-centers bench corpus)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n_topics = 64
    W = len(_WORDS)
    # Per-topic dirichlet word weights.
    topic_w = rng.dirichlet(np.full(W, 0.15), size=n_topics)
    topics = rng.integers(0, n_topics, n)
    lengths = rng.integers(40, 120, n)
    out = []
    for i in range(n):
        ws = rng.choice(W, size=lengths[i], p=topic_w[topics[i]])
        out.append(" ".join(_WORDS[j] for j in ws))
    return out


def make_corpus(kind: str, n: int, d: int, encoder=None, batch=512):
    """(vectors (n, d) unit-norm f32 np, queries (64, d)) per corpus
    kind. Queries are held-out draws from the same distribution."""
    import numpy as np

    rng = np.random.default_rng(1)
    nq = 64
    if kind == "text":
        texts = _gen_texts(n + nq, seed=2)
        vecs = []
        t0 = time.time()
        for lo in range(0, len(texts), batch):
            vecs.append(encoder.encode(texts[lo:lo + batch]))
            if lo % (batch * 64) == 0 and lo:
                print(f"  embedded {lo}/{len(texts)} "
                      f"({lo/(time.time()-t0):.0f}/s)", file=sys.stderr)
        X = np.concatenate(vecs).astype(np.float32)
    elif kind == "lowrank":
        # Power-law spectrum: lambda_i ~ 1/(i+1); basis irrelevant under
        # rotation-invariant queries, so diagonal is fine.
        spec = 1.0 / np.sqrt(np.arange(1, d + 1))
        X = rng.standard_normal((n + nq, d)).astype(np.float32) * spec
    elif kind == "sphere":
        X = rng.standard_normal((n + nq, d)).astype(np.float32)
    else:
        raise ValueError(kind)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-9)
    return X[:n], X[n:]


def run_curve(kind: str, n: int, d: int, nprobes, k: int = 5,
              encoder=None, block_rows: int = 256):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multimodal_rag_tpu.ops.ivf import (
        build_clustered_layout_device,
        ivf_search,
    )
    from multimodal_rag_tpu.ops.mips_topk import mips_topk

    X, Q = make_corpus(kind, n, d, encoder=encoder)
    V = jnp.asarray(X, jnp.bfloat16)
    t0 = time.time()
    layout = build_clustered_layout_device(V, block_rows=block_rows)
    jax.block_until_ready(layout.vectors)
    build_s = time.time() - t0
    n_blocks = int(layout.block_centroids.shape[0])

    qj = jnp.asarray(Q, jnp.float32)
    nq = Q.shape[0]
    per = 8
    # The layout row count is a block_rows multiple, not necessarily a
    # power-of-two tile multiple — pick the largest dividing tile.
    n_rows = int(layout.vectors.shape[0])
    tile_n = next(
        t for t in (8192, 4096, 2048, 1024, 512, 256, block_rows)
        if n_rows % t == 0
    )
    gt = []
    for lo in range(0, nq, per):
        _v, idx = mips_topk(qj[lo:lo + per], layout.vectors, layout.mask,
                            k=k, tile_n=tile_n)
        gt.append(np.asarray(idx))
    gt = np.concatenate(gt)

    rows = []
    for nprobe in nprobes:
        if nprobe > n_blocks:
            continue
        hits = 0
        for lo in range(0, nq, per):
            _v, idx = ivf_search(qj[lo:lo + per], layout, k=k,
                                 nprobe=nprobe)
            idx = np.asarray(idx)
            for r in range(per):
                hits += len(
                    set(idx[r].tolist()) & set(gt[lo + r].tolist())
                )
        recall = hits / (nq * k)
        frac = nprobe / n_blocks
        rows.append({
            "corpus": kind, "n": n, "nprobe": nprobe,
            "recall_at_5": round(recall, 4),
            "rows_scanned_frac": round(frac, 4),
            "build_s": round(build_s, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--n-text", type=int, default=200_000,
                    help="text corpus rows (host-side embed bound)")
    ap.add_argument("--small", action="store_true",
                    help="20k rows, CPU sanity pass")
    ap.add_argument("--kinds", default="text,lowrank,sphere")
    args = ap.parse_args(argv)

    from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    n, n_text = args.n, args.n_text
    if args.small:
        n = n_text = 20_000
    nprobes = (8, 16, 32, 64, 128, 256)

    encoder = None
    kinds = args.kinds.split(",")
    if "text" in kinds:
        from multimodal_rag_tpu.models.minilm import (
            EncoderConfig,
            TextEncoder,
            init_params,
        )

        cfg = EncoderConfig()
        encoder = TextEncoder(
            params=init_params(jax.random.key(0), cfg), cfg=cfg,
            seq_buckets=(128,), batch_buckets=(512,),
        )

    all_rows = []
    for kind in kinds:
        kn = n_text if kind == "text" else n
        print(f"== {kind} (n={kn}) ==", file=sys.stderr)
        all_rows += run_curve(kind, kn, 384, nprobes, encoder=encoder)

    # Markdown table for BASELINE.md.
    print("\n| corpus | n | nprobe | rows scanned | recall@5 |")
    print("|---|---|---|---|---|")
    for r in all_rows:
        print(f"| {r['corpus']} | {r['n']:,} | {r['nprobe']} "
              f"| {100*r['rows_scanned_frac']:.1f}% "
              f"| {r['recall_at_5']:.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
