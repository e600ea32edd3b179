"""Isolate the prefix-cache hit's device cost (VERDICT r4 #7).

The r4 serving ablation measured the prefix cache WORSE over the relay
tunnel (unqueued TTFT 1300 ms vs 347) and DEPLOYMENT.md justified the
default-ON with an EXTRAPOLATED "<1 ms device block copy vs ~25 ms of
prefill passes". This probe turns that into a measurement, on the same
0.8B bench decoder and serving pool shapes the ablation used:

* ``prefix_copy``: `serving_decode._load_prefix` — the device-to-device
  block copy a prefix hit performs at admission (copies all Lp_max
  cache slots of one entry into the batch pool row);
* ``chunk_pass``: one `_decode_verify_impl` chunked-prefill pass over a
  (slots, chunk) token block — the unit of work a hit AVOIDS; a
  ``shared_tokens`` preamble hit avoids ceil(shared/chunk) of them.

Both are timed with bench._timed_loop's dependency-chained fori_loop
(hi−lo rep subtraction cancels per-dispatch relay constants), so the
numbers are device time, not tunnel RTT. Run on an otherwise idle chip:

    python -m multimodal_rag_tpu.tools.prefix_probe

Prints one JSON line; DEPLOYMENT.md "Serving configuration" records the
measured result.
"""

from __future__ import annotations

import functools
import json

import numpy as np

import jax
import jax.numpy as jnp


def main(slots: int = 8, chunk: int = 128, shared_tokens: int = 384):
    from bench import _timed_loop
    from multimodal_rag_tpu.models.decoder import (
        DecoderConfig,
        TextDecoder,
        init_params,
    )
    from multimodal_rag_tpu.serving_decode import (
        DecodeServer,
        _decode_verify_impl,
        _load_prefix,
    )

    cfg = DecoderConfig()
    params = init_params(jax.random.key(0), cfg)
    dec = TextDecoder(
        params=params, cfg=cfg, prompt_buckets=(512,),
        batch_buckets=(1, slots),
    )
    server = DecodeServer(
        dec, slots=slots, chunk_tokens=chunk, prefix_entries=8,
        max_new_cap=48,
    )
    pool, ppool = server.pool, server.prefix_pool
    n_entries = server.prefix_entries

    # --- the block copy a prefix hit performs --------------------------
    @functools.partial(jax.jit, static_argnames=("reps",))
    def copy_chain(pool, ppool, reps):
        def body(i, p):
            return _load_prefix(
                p, ppool, i % n_entries, (i + 1) % slots
            )
        return jax.lax.fori_loop(0, reps, body, pool)

    copy_s = _timed_loop(
        lambda p, r: jax.tree.leaves(copy_chain(pool, ppool, r))[0],
        reps_lo=8, reps_hi=32, attempts=3,
    )

    # --- one chunked-prefill pass (the work a hit avoids) ---------------
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(3, cfg.vocab_size, (slots, chunk)), jnp.int32
    )
    pos0 = jnp.zeros((slots,), jnp.int32)
    key_mask = jnp.zeros((slots, server.pool_seq), jnp.int32)
    key_mask = key_mask.at[:, 0].set(1)
    positions0 = jnp.zeros((slots,), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chunk_chain(params, pool, tokens, reps):
        def body(i, carry):
            toks, cache = carry
            logits, cache = _decode_verify_impl(
                params, cache, toks, pos0, key_mask, positions0, cfg
            )
            bump = (jnp.abs(logits[0, 0, 0]) * 1e-9).astype(jnp.int32)
            return (toks + bump, cache)
        return jax.lax.fori_loop(0, reps, body, (tokens, pool))[0]

    chunk_s = _timed_loop(
        lambda p, r: chunk_chain(params, pool, tokens + p, r),
        reps_lo=4, reps_hi=16, attempts=3,
    )

    passes = -(-shared_tokens // chunk)  # ceil
    out = {
        "prefix_copy_ms": round(copy_s * 1e3, 4),
        "chunk_pass_ms": round(chunk_s * 1e3, 3),
        "chunk_tokens": chunk,
        "shared_tokens": shared_tokens,
        "passes_replaced": passes,
        "device_saving_ms_per_hit": round(
            (passes * chunk_s - copy_s) * 1e3, 3
        ),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
