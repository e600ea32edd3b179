"""Prompt-lookup speculative decoding for the on-TPU decoder.

RAG answers are heavily *extractive*: the model quotes spans of the
retrieved context verbatim (the reference's own answer prompt pastes the
context above the question, ``app/server/api.py:370-375``). That makes
the cheapest possible drafter — matching the last ``ngram`` generated
tokens against the prompt+generation so far and proposing the ``K``
tokens that followed the match ("prompt lookup decoding") — remarkably
accurate, with no draft model to train, load, or stream.

Why this is a TPU-shaped win: decode is weight-streaming bound (the full
weight set crosses HBM every step — BASELINE.md decode numbers), so a
:func:`decoder.decode_verify` pass that scores ``K+1`` tokens costs
barely more than a single-token step. Every accepted draft token is a
decode step that never runs. The verify chunk is a fixed ``(B, K+1)``
shape — one extra executable, no dynamic shapes.

Correctness contract:

* ``temperature == 0`` (greedy): bit-identical output to the sequential
  greedy loop — acceptance is exact token equality, and a mismatch emits
  the model's own argmax (tested in ``tests/test_spec_decode.py``).
* ``temperature > 0``: standard speculative-sampling rejection (accept a
  point-mass draft ``d`` with probability ``p(d)`` under the target
  sampling distribution; on rejection sample from the renormalized
  leftover ``p`` with ``d`` removed) — each emitted token is distributed
  EXACTLY as the sequential sampler's, though the pseudo-random stream
  differs from the non-speculative path (same seed + spec on is
  reproducible; spec on/off are distributionally — not bitwise — equal).
  The target distribution applies temperature → top-k → top-p exactly as
  :func:`decoder._sample`; ``top_k <= 0`` is clamped to 64 here (the
  serving default) because rejection needs the top-k support.

The proposal may be garbage (no n-gram match): verification rejects it
and the loop still emits ≥ 1 correct token per iteration, so the WORST
case is ~one verify pass per token — the plain decode loop's cost plus
the small chunk overhead (measured ~1.15x a single-token step at K=7).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    _sample,
    _split_rows,
    decode_verify,
    prefill,
)

# Serving default for the draft length: at K=7 the verify chunk is 8
# tokens — within the measured "nearly free" regime for weight-streaming
# bound decode, and long enough to cover typical quoted spans.
SPEC_K_DEFAULT = 7


def _row_uniform(keys, n: int):
    """(B,) typed keys → (B, n) independent uniforms."""
    return jax.vmap(lambda kk: jax.random.uniform(kk, (n,)))(keys)


def _row_split_n(keys, n: int):
    """(B,) typed keys → (B, n) typed subkeys."""
    return jax.vmap(lambda kk: jax.random.split(kk, n))(keys)


def _propose_ngram(
    seq: jax.Array,
    match_valid: jax.Array,
    prev: jax.Array,
    cur: jax.Array,
    K: int,
    cur_slot: jax.Array | None = None,
    max_n: int = 4,
) -> jax.Array:
    """Suffix n-gram prompt-lookup: find the position t (within the valid
    region) whose preceding tokens best match the current suffix
    (``..., seq[cur_slot-2], prev, cur``) and propose ``seq[t+1 : t+1+K]``.
    seq: (B, S) slot-aligned token record (prompt + accepted generation);
    match_valid: (B, S) 1 for slots holding real tokens. With no match
    the proposal is arbitrary tokens — harmless, verification rejects
    them (speed-only cost).

    Match ranking (descending): longest suffix match (2..``max_n``
    tokens — byte-level bigrams collide constantly, a 3-4 token query
    disambiguates repeated spans), then matches whose full K-token
    continuation is already written (the RAG-quoting sweet spot is a
    match inside the pasted context, which is complete, while the latest
    match is often the quote's own leading edge near the sequence tail
    whose "continuation" is still unwritten), then latest position.
    Deeper query tokens (beyond prev) are gathered from ``seq`` at
    ``cur_slot - i``; pass ``cur_slot`` to enable them (without it the
    query is the plain bigram). A query slot that is itself invalid
    (history shorter than the query) simply stops the extension — the
    bigram levels still rank.

    CALLER CONTRACT: ``match_valid`` must EXCLUDE ``cur``'s own slot.
    The query bigram (prev, cur) trivially occurs AT the current
    position; if that slot is marked valid the trailing self-match wins
    the argmax and the "continuation" gathered after it is the unwritten
    zero region — every draft becomes pad tokens and acceptance
    collapses to ~0 regardless of how predictable the text is (found
    r5: both callers passed ``key_mask | (slot == cur_slot)``; the
    serving acceptance numbers that looked fine were a random-init
    coincidence). The attendable-history mask (``key_mask``), which by
    construction excludes cur's recompute slot, is exactly right."""
    B, S = seq.shape
    hit = (
        (seq == cur[:, None])
        & (jnp.roll(seq, 1, axis=1) == prev[:, None])
        & (match_valid > 0)
        & (jnp.roll(match_valid, 1, axis=1) > 0)
    )
    hit = hit.at[:, 0].set(False)  # roll wraps; slot 0 has no predecessor
    match_len = jnp.where(hit, 2, 0)
    if cur_slot is not None:
        cum = hit
        for i in range(2, max_n):
            # Query token i steps behind cur, from the live record. An
            # invalid query slot (not enough written history) zeroes
            # ``cond`` row-wide, freezing the extension — shorter levels
            # already accumulated keep ranking.
            qslot = jnp.clip(cur_slot[:, None] - i, 0, S - 1)
            q_i = jnp.take_along_axis(seq, qslot, axis=1)  # (B, 1)
            qv_i = (
                (jnp.take_along_axis(match_valid, qslot, axis=1) > 0)
                & (cur_slot[:, None] - i >= 0)
            )
            cond = (
                (jnp.roll(seq, i, axis=1) == q_i)
                & (jnp.roll(match_valid, i, axis=1) > 0)
                & qv_i
            )
            cond = cond.at[:, :i].set(False)  # roll wraps past slot 0
            cum = cum & cond
            match_len = match_len + cum.astype(jnp.int32)
    pos = jnp.arange(S)[None, :]
    # match_valid[t+K] ⇒ t+1..t+K all written (the mask is contiguous).
    complete = jnp.pad(match_valid, ((0, 0), (0, K)))[:, K:] > 0
    score = jnp.where(
        hit, pos + S * (2 * match_len + complete), -1
    )
    t_star = jnp.max(score, axis=1) % S  # (B,) -1 = no match → S-1, junk
    gather = t_star[:, None] + 1 + jnp.arange(K)[None, :]  # (B, K)
    return jnp.take_along_axis(
        seq, jnp.clip(gather, 0, S - 1), axis=1
    )


def _speculative_accept(
    draft: jax.Array,
    logits: jax.Array,
    k_acc: jax.Array,
    k_rep: jax.Array,
    temperature: float,
    top_k: int,
    top_p,
    eos_id: int,
) -> Tuple[jax.Array, jax.Array]:
    """Accept/reject a point-mass draft against the target sampler.

    draft: (B, K) proposed tokens d_1..d_K; logits: (B, K+1, V) where
    row i is the model's next-token distribution after consuming
    d_0..d_i (d_0 = the current token). Returns (emit (B, K+1) int32,
    n_emit (B,) int32): emit[:, :j] are the accepted drafts, emit[:, j]
    is the correction/bonus sample, entries past n_emit are eos filler.
    """
    B, T, V = logits.shape
    K = T - 1
    arange_T = jnp.arange(T)[None, :]

    if temperature <= 0.0:
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
        acc = draft == g[:, :K]  # (B, K)
        j = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
        corr = jnp.take_along_axis(g, j[:, None], axis=1)[:, 0]
        draft_pad = jnp.concatenate(
            [draft, jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        emit = jnp.where(
            arange_T < j[:, None],
            draft_pad,
            jnp.where(arange_T == j[:, None], corr[:, None], eos_id),
        ).astype(jnp.int32)
        return emit, j + 1

    k_eff = top_k if top_k > 0 else min(64, V)
    l = logits.reshape(B * T, V) / temperature
    vals, idx = jax.lax.top_k(l, k_eff)  # (BT, k) sorted desc
    probs = jax.nn.softmax(vals, axis=-1)
    exclusive = jnp.cumsum(probs, axis=-1) - probs
    fvals = jnp.where(exclusive < top_p, vals, -1e9)  # nucleus filter

    # Draft-token membership in the surviving candidate set. Position K
    # (the bonus sample) has no draft — a -1 sentinel never matches.
    d_pad = jnp.concatenate(
        [draft, jnp.full((B, 1), -1, jnp.int32)], axis=1
    ).reshape(B * T, 1)
    match = idx == d_pad  # (BT, k)
    val_d = jnp.max(jnp.where(match, fvals, -jnp.inf), axis=-1)
    logz = jax.nn.logsumexp(fvals, axis=-1)
    p_d = jnp.exp(val_d - logz).reshape(B, T)  # 0 when d not in support

    u = _row_uniform(k_acc, K)  # (B, K)
    acc = u < p_d[:, :K]
    j = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)

    # Correction samples: position i < K excludes the rejected draft
    # (renormalized leftover); position K is the plain bonus sample.
    ex_vals = jnp.where(match, -1e9, fvals)
    rep_keys = _row_split_n(k_rep, T).reshape(B * T)
    choice = jax.vmap(jax.random.categorical)(rep_keys, ex_vals)
    rep = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    rep = rep.reshape(B, T).astype(jnp.int32)
    corr = jnp.take_along_axis(rep, j[:, None], axis=1)[:, 0]

    draft_pad = jnp.concatenate(
        [draft, jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    emit = jnp.where(
        arange_T < j[:, None],
        draft_pad,
        jnp.where(arange_T == j[:, None], corr[:, None], eos_id),
    ).astype(jnp.int32)
    return emit, j + 1


def _speculative_accept_rows(
    draft: jax.Array,
    logits: jax.Array,
    k_acc: jax.Array,
    k_rep: jax.Array,
    temps: jax.Array,
    top_ps: jax.Array,
    top_k: int,
    eos_id: int,
    force_single=None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-row variant of :func:`_speculative_accept` for the continuous
    decode server: ``temps``/``top_ps`` are TRACED (B,) vectors (greedy
    and sampled rows share one dispatch; a new value never mints a new
    executable). Rows with ``temps <= 0`` take the exact greedy
    acceptance (bit-equal to sequential greedy); others take the
    rejection-sampling path with their own temperature/nucleus.

    ``force_single`` (optional (B,) bool): rows marked True reject every
    draft and emit exactly one token — the position-0 correction sample.
    Used for presence/frequency-penalized rows, whose logit bias is only
    current for the first position (serving_decode._spec_step_rows)."""
    B, T, V = logits.shape
    K = T - 1
    arange_T = jnp.arange(T)[None, :]
    draft_pad = jnp.concatenate(
        [draft, jnp.zeros((B, 1), jnp.int32)], axis=1
    )

    def emit_from(j, corr):
        return jnp.where(
            arange_T < j[:, None],
            draft_pad,
            jnp.where(arange_T == j[:, None], corr[:, None], eos_id),
        ).astype(jnp.int32)

    # Greedy path.
    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    acc_g = draft == g[:, :K]
    j_g = jnp.sum(jnp.cumprod(acc_g.astype(jnp.int32), axis=1), axis=1)
    if force_single is not None:
        j_g = jnp.where(force_single, 0, j_g)
    corr_g = jnp.take_along_axis(g, j_g[:, None], axis=1)[:, 0]

    # Sampled path (per-row temperature + nucleus within top-k).
    k_eff = top_k if top_k > 0 else min(64, V)
    l = (logits / jnp.maximum(temps, 1e-6)[:, None, None]).reshape(
        B * T, V
    )
    vals, idx = jax.lax.top_k(l, k_eff)  # (BT, k) sorted desc
    probs = jax.nn.softmax(vals, axis=-1)
    exclusive = jnp.cumsum(probs, axis=-1) - probs
    tp_bt = jnp.broadcast_to(top_ps[:, None], (B, T)).reshape(B * T, 1)
    fvals = jnp.where(exclusive < tp_bt, vals, -1e9)

    d_bt = draft_pad.at[:, K].set(-1).reshape(B * T, 1)  # no draft at K
    match = idx == d_bt
    val_d = jnp.max(jnp.where(match, fvals, -jnp.inf), axis=-1)
    logz = jax.nn.logsumexp(fvals, axis=-1)
    p_d = jnp.exp(val_d - logz).reshape(B, T)

    u = _row_uniform(k_acc, K)
    acc_s = u < p_d[:, :K]
    j_s = jnp.sum(jnp.cumprod(acc_s.astype(jnp.int32), axis=1), axis=1)
    if force_single is not None:
        j_s = jnp.where(force_single, 0, j_s)
    ex_vals = jnp.where(match, -1e9, fvals)
    rep_keys = _row_split_n(k_rep, T).reshape(B * T)
    choice = jax.vmap(jax.random.categorical)(rep_keys, ex_vals)
    rep = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    rep = rep.reshape(B, T).astype(jnp.int32)
    corr_s = jnp.take_along_axis(rep, j_s[:, None], axis=1)[:, 0]
    if force_single is not None:
        # Forced rows never ran an acceptance test, so their one emitted
        # token must come from the FULL target distribution at position 0
        # — not the rejected-draft leftover the rejection sampler uses.
        choice_full = jax.vmap(jax.random.categorical)(rep_keys, fvals)
        full_tok = jnp.take_along_axis(
            idx, choice_full[:, None], axis=1
        )[:, 0].reshape(B, T).astype(jnp.int32)
        corr_s = jnp.where(force_single, full_tok[:, 0], corr_s)

    greedy = (temps <= 0.0)[:, None]
    emit = jnp.where(greedy, emit_from(j_g, corr_g), emit_from(j_s, corr_s))
    n_emit = jnp.where(temps <= 0.0, j_g, j_s) + 1
    return emit, n_emit


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "top_k", "eos_id", "spec_k"
    ),
)
def generate_tokens_spec(
    params: Dict,
    ids: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    cfg: DecoderConfig,
    max_new_tokens: int,
    temperature: float = 0.7,
    top_k: int = 64,
    eos_id: int = -1,
    top_p: float = 1.0,
    spec_k: int = SPEC_K_DEFAULT,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Speculative counterpart of :func:`decoder.generate_tokens`.

    Same contract — prefill the LEFT-padded prompt, then generate up to
    ``max_new_tokens`` with per-row EOS early exit — plus a third return:
    per-row verify-pass counts (B,) — passes during which the row was
    still live. Acceptance is a PER-ROW stat: the while_loop itself runs
    until the slowest row finishes, so a batch-shared scalar conflates
    one hard row with poor acceptance everywhere (a finished row would
    keep "paying" for its neighbours' passes). Batch device cost is
    ``max(row_iters)``; per-row realized speedup is
    ``lengths / row_iters``.
    """
    B, P = mask.shape
    K = spec_k
    T = K + 1
    S_max = P + max_new_tokens
    prompt_len = jnp.sum(mask, axis=1).astype(jnp.int32)

    logits, cache = prefill(params, ids, mask, cfg, S_max)
    keys = jax.random.split(key, B) if key.ndim == 0 else key
    keys, sub = _split_rows(keys)
    first = _sample(logits, sub, temperature, top_k, top_p)

    out0 = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    out0 = out0.at[:, 0].set(first)
    done0 = (first == eos_id) | (max_new_tokens <= 1)
    key_mask0 = jnp.concatenate(
        [mask.astype(jnp.int32), jnp.zeros((B, max_new_tokens), jnp.int32)],
        axis=1,
    )
    seq0 = jnp.concatenate(
        [ids.astype(jnp.int32), jnp.zeros((B, max_new_tokens), jnp.int32)],
        axis=1,
    )
    seq0 = seq0.at[:, P].set(first)
    prev0 = ids[:, P - 1].astype(jnp.int32)  # last prompt token (left-pad)
    out_len0 = jnp.ones((B,), jnp.int32)
    rows = jnp.arange(B)[:, None]
    arange_T = jnp.arange(T)[None, :]

    def cond(state):
        iters, _, done, *_ = state
        return (~jnp.all(done)) & (iters < max_new_tokens)

    def body(state):
        (iters, row_iters, done, cur, prev, out_len, out, seq, key_mask,
         cache, keys) = state
        row_iters = row_iters + (~done).astype(jnp.int32)
        keys, k_acc = _split_rows(keys)
        keys, k_rep = _split_rows(keys)

        # Valid slots for matching: attendable history ONLY — cur's slot
        # must stay out or the self-match shadows every real occurrence
        # (see _propose_ngram's caller contract).
        cur_slot = P + out_len - 1  # (B,)
        draft = _propose_ngram(seq, key_mask, prev, cur, K, cur_slot=cur_slot)
        tokens = jnp.concatenate([cur[:, None], draft], axis=1)  # (B, T)

        logits, cache2 = decode_verify(
            params, cache, tokens, cur_slot, key_mask,
            prompt_len + out_len - 1, cfg,
        )
        emit, n_emit = _speculative_accept(
            draft, logits, k_acc, k_rep, temperature, top_k, top_p, eos_id
        )
        n_emit = jnp.where(done, 0, n_emit)

        # Keep a prefix: stop after (and including) the first EOS, and
        # never past the per-row budget.
        is_eos = emit == eos_id
        eos_before = jnp.cumsum(
            jnp.pad(is_eos.astype(jnp.int32), ((0, 0), (1, 0)))[:, :-1],
            axis=1,
        )
        keep = (arange_T < n_emit[:, None]) & (eos_before == 0)
        n_keep = jnp.minimum(
            jnp.sum(keep.astype(jnp.int32), axis=1),
            max_new_tokens - out_len,
        )
        keep = arange_T < n_keep[:, None]

        sidx = out_len[:, None] + arange_T
        sidx = jnp.where(keep, sidx, max_new_tokens)  # OOB → dropped
        out = out.at[rows, sidx].set(emit, mode="drop")
        seq = seq.at[rows, P + sidx].set(emit, mode="drop")

        # Attendable KV: cur + accepted-draft slots (the last kept token
        # is the next `cur`; its KV is recomputed as chunk slot 0).
        kv_idx = cur_slot[:, None] + arange_T
        kv_mark = (arange_T < n_keep[:, None]) & (~done[:, None])
        key_mask = key_mask.at[rows, jnp.where(kv_mark, kv_idx, S_max)].set(
            1, mode="drop"
        )

        last_kept = jnp.maximum(n_keep - 1, 0)
        new_cur = jnp.take_along_axis(emit, last_kept[:, None], axis=1)[:, 0]
        # prev = token before new cur: the second-to-last kept this round,
        # or the old cur when only one token was kept.
        prev_kept = jnp.take_along_axis(
            jnp.concatenate([cur[:, None], emit], axis=1),
            last_kept[:, None], axis=1,
        )[:, 0]
        cur = jnp.where(done, cur, new_cur)
        prev = jnp.where(done, prev, prev_kept)
        out_len = out_len + n_keep
        hit_eos = jnp.any(is_eos & keep, axis=1)
        done = done | hit_eos | (out_len >= max_new_tokens)
        return (
            iters + 1, row_iters, done, cur, prev, out_len, out, seq,
            key_mask, cache2, keys,
        )

    state = (
        jnp.int32(0), jnp.zeros((B,), jnp.int32), done0, first, prev0,
        out_len0, out0, seq0, key_mask0, cache, keys,
    )
    _, row_iters, _, _, _, _, out, _, _, _, _ = jax.lax.while_loop(
        cond, body, state
    )
    lengths = jnp.sum(
        jnp.cumprod((out != eos_id).astype(jnp.int32), axis=1), axis=1
    )
    return out, lengths, row_iters
