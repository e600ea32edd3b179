"""Serving-layer flag ablation on real hardware.

Runs :func:`bench.bench_serving` (the concurrent OpenAI-style workload:
waves of requests sharing a RAG preamble, streamed TTFT) over the four
candidate flag sets of the continuous-batching server
(``serving_decode.DecodeServer``), sharing ONE decoder so weight init and
HBM residency are identical across rows:

* ``classic``              — continuous batching only (blocking B=1
  bucket prefill at admission)
* ``chunked``              — + Sarathi-style chunked prefill
  (``TPU_LLM_CHUNKED_PREFILL``)
* ``chunked+prefix``       — + device prefix cache (``TPU_LLM_PREFIX_CACHE``)
* ``chunked+prefix+spec``  — + prompt-lookup speculative decoding
  (``TPU_LLM_SPECULATIVE``)

The winner (and the measured deltas) back the recommended production
flag set recorded in DEPLOYMENT.md §"Serving configuration". Run from
the repo root on the TPU host::

    python -m multimodal_rag_tpu.tools.serving_ablation [--small]

``--small`` swaps in a tiny decoder for a fast CPU sanity pass.
"""

from __future__ import annotations

import argparse
import json
import sys


CONFIGS = [
    ("classic", dict(chunk_tokens=None, prefix_entries=0, spec_k=0)),
    ("chunked", dict(chunk_tokens=128, prefix_entries=0, spec_k=0)),
    ("chunked+prefix", dict(chunk_tokens=128, prefix_entries=8,
                            spec_k=0)),
    ("chunked+prefix+spec", dict(chunk_tokens=128, prefix_entries=8,
                                 spec_k=7)),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny decoder (CPU sanity pass)")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=48)
    args = ap.parse_args(argv)

    from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from bench import bench_serving, make_bench_tokenizer
    from multimodal_rag_tpu.models.decoder import (
        DecoderConfig,
        TextDecoder,
        init_params,
    )

    if args.small:
        cfg = DecoderConfig(
            vocab_size=512, hidden_dim=128, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=32, ff_dim=256,
        )
    else:
        cfg = DecoderConfig()  # the 0.8B bench model
    dec = TextDecoder(
        params=init_params(jax.random.key(0), cfg), cfg=cfg,
        tokenizer=make_bench_tokenizer(cfg.vocab_size),
        prompt_buckets=(128, 256, 512, 1024),
    )

    rows = {}
    for name, flags in CONFIGS:
        r = bench_serving(
            decoder=dec, n_requests=args.requests,
            max_new=args.max_new, **flags,
        )
        rows[name] = r
        print(json.dumps({"config": name, **r}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
