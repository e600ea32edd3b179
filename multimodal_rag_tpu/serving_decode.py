"""Continuous-batching decode server for the on-TPU LM.

The coalescer in ``adapters/tpu_llm.py`` batches requests that arrive
*before* a generation starts; once a batch is in flight, later arrivals
wait for it to finish. Production decode loops don't wait: decode is
weight-streaming bound, so an extra row is nearly free, and requests
should join the running batch at the next token boundary. This module is
that loop, built on ``decoder.decode_step_rows`` (per-row cache
positions):

* A fixed pool of **slots** (the compiled batch width) holds one request
  each: its cache rows, per-row write position, per-row attention mask,
  per-row semantic position, and sampling temperature.
* ``submit()`` enqueues a request; between decode steps the scheduler
  prefills pending requests one at a time (B=1 executable per prompt
  bucket) and scatters the prefilled cache into a free slot
  (``dynamic_update_slice`` on the batch axis).
* One ``decode_step_rows`` dispatch advances EVERY active slot by one
  token; finished rows (EOS or budget) retire immediately and free their
  slot for the next pending request.
* Sampling temperature rides as a traced (B,) vector (greedy rows mix
  with sampled rows in the same dispatch), so one executable serves all
  presets; ``top_k`` stays global/static.

Wall-clock effect: under concurrent load, latency per request approaches
(own tokens) x (step time) instead of (queue depth) x (batch time).

**Chunked prefill** (``chunk_tokens=C``, Sarathi-style): instead of a
blocking B=1 bucket prefill at admission, prompts are consumed C tokens
per *fused* pass in which decoding rows piggyback one token each — a
long prompt never stalls in-flight generations, and admission needs no
prompt-bucket executables at all (one ``(slots, C)`` chunk executable +
the decode step serve everything). Rows are laid out UNPADDED from cache
slot 0, so equal prompt prefixes land in identical cache slots — which
makes the **prefix cache** (``prefix_entries=N``) a plain device-to-
device block copy: the chunk-aligned longest cached prefix of an
incoming prompt is copied into the row and never recomputed. RAG traffic
(shared system preamble + retrieved context reused across turns) is the
motivating workload. Greedy outputs are identical to the classic path;
sampled outputs are distribution-identical but consume the per-row key
streams in a different order.
"""

from __future__ import annotations

import asyncio
import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    _decode_verify_impl,
    decode_step_rows,
    has_adapter_stack,
    init_cache,
    place_cache,
    prefill,
    prefill_embeds,
    with_adapter_rows,
)

logger = logging.getLogger(__name__)


@partial(jax.jit, donate_argnames=("pool",))
def _insert_row(pool: Dict, row: Dict, slot: jax.Array) -> Dict:
    """Scatter a prefilled (L, 1, S, n, hd) cache into the pool's batch
    axis at ``slot``. Tree-mapped so the windowed layout (per-window-
    class tuples of stacks, decoder.init_cache(windowed=True)) inserts
    identically — every leaf keeps batch on axis 1."""
    return jax.tree.map(
        lambda p, r: jax.lax.dynamic_update_slice_in_dim(
            p, r, slot, axis=1
        ),
        pool, row,
    )


@partial(jax.jit, donate_argnames=("counts",))
def _count_reset(counts, slot):
    """Zero the per-slot output-token count row (request admission)."""
    return counts.at[slot].set(0)


@partial(jax.jit, donate_argnames=("bias",))
def _bias_row_set(bias, slot, row):
    """Write one slot's dense logit_bias row (admission / retire)."""
    return jax.lax.dynamic_update_slice_in_dim(
        bias, row[None], slot, axis=0
    )


@partial(jax.jit, donate_argnames=("counts",))
def _count_admit(counts, slot, tok):
    """Admission bookkeeping for the classic path: zero the slot's count
    row, then record the first sampled token (the prefill sample sees an
    all-zero count row, so it needs no bias)."""
    counts = counts.at[slot].set(0)
    return counts.at[slot, tok].add(1)


def _unpack_mask(bits: jax.Array, vocab: int) -> jax.Array:
    """(B, ceil(V/8)) little-endian packed uint8 grammar bitmask →
    (B, V) bool. The packed form keeps the per-step host→device transfer
    at V/8 bytes per row (16 KB at a 128k vocab) — noise next to weight
    streaming; the unpack is one gather + shift on device."""
    idx = jnp.arange(vocab)
    return ((bits[:, idx >> 3] >> (idx & 7).astype(jnp.uint8)) & 1) > 0


@partial(
    jax.jit, static_argnames=("top_k", "want_lp"),
    donate_argnames=("counts",),
)
def _sample_rows_counted(
    logits, keys, temps, top_k: int, top_ps, counts, pres, freq, emit,
    want_lp: bool = False, allowed_bits=None, bias=None,
):
    """:func:`_sample_rows` with OpenAI presence/frequency penalties:
    subtract the per-row bias over each row's output-token counts, then
    record the sampled token for rows that actually emit it (``emit``
    (B,) int32 — 0 for idle slots). Zero-penalty rows get an exact 0.0
    bias, so mixed batches leave unpenalized rows bit-unchanged.

    ``want_lp`` (STATIC, set when any active row requested OpenAI
    logprobs) additionally returns the chosen-token logprob and
    top-:data:`~..models.decoder.LOGPROBS_K` alternatives of the biased,
    un-temperature-scaled distribution (decoder._lp_top).

    ``allowed_bits`` (None when no row is grammar-constrained — None vs
    array is a pytree-structure change, so unconstrained serving keeps
    its original executable) is the packed per-row grammar mask; masked
    logits drop to -1e9 before sampling AND before the logprob capture
    (logprobs report the constrained sampling distribution)."""
    from multimodal_rag_tpu.models.decoder import _lp_top, _penalty_bias

    biased = logits - _penalty_bias(counts, pres, freq)
    if bias is not None:  # OpenAI logit_bias (device-resident rows)
        biased = biased + bias
    if allowed_bits is not None:
        biased = jnp.where(
            _unpack_mask(allowed_bits, biased.shape[-1]), biased, -1e9
        )
    nxt = _sample_rows(biased, keys, temps, top_k, top_ps)
    counts = counts.at[jnp.arange(nxt.shape[0]), nxt].add(emit)
    if want_lp:
        lp, tv, ti = _lp_top(biased, nxt)
        return nxt, counts, lp, tv, ti
    return nxt, counts


@partial(jax.jit, static_argnames=("top_k",))
def _sample_rows(logits, keys, temps, top_k: int, top_ps=None,
                 allowed=None):
    """Per-row temperature + nucleus + PER-ROW key streams ((B,) typed
    keys): temp<=0 rows take argmax, others sample from the
    top_k-filtered, temperature-scaled distribution with the per-row
    nucleus threshold applied within the top-k candidates. Each row
    samples from its own key, so a request's tokens are reproducible
    regardless of which neighbors share the decode batch.
    ``temps``/``top_ps`` are TRACED (B,) vectors — a new value never
    mints a new executable. ``allowed`` is an optional (B, V) bool
    grammar mask (admission-path callers pass it unpacked; the step
    paths mask before calling)."""
    from multimodal_rag_tpu.models.decoder import _row_categorical

    if allowed is not None:
        logits = jnp.where(allowed, logits, -1e9)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    # top_k <= 0 means "no candidate cap": sort the full vocab so the
    # per-row nucleus threshold still applies (same contract as
    # decoder._sample — review finding r3).
    k = top_k if top_k > 0 else scaled.shape[-1]
    vals, idx = jax.lax.top_k(scaled, k)  # sorted descending
    if top_ps is None:
        top_ps = jnp.ones_like(temps)
    probs = jax.nn.softmax(vals, axis=-1)
    exclusive = jnp.cumsum(probs, axis=-1) - probs
    vals = jnp.where(exclusive < top_ps[:, None], vals, -1e9)
    choice = _row_categorical(keys, vals)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=1)[
        :, 0
    ].astype(jnp.int32)
    return jnp.where(temps <= 0.0, greedy, sampled)


@partial(
    jax.jit, static_argnames=("cfg", "top_k", "want_lp"),
    donate_argnames=("cache", "counts", "keys"),
)
def _fused_decode_step(
    params, cache, cur, pos, key_mask, sem_pos, keys, temps, top_ps,
    counts, pres, freq, emit, cfg: DecoderConfig, top_k: int,
    want_lp: bool = False, allowed_bits=None, bias=None,
):
    """decode_step_rows + per-row key split + counted sampling fused into
    ONE dispatch. A host-driven decode loop pays per-dispatch overhead on
    every hop (sub-ms locally; a full RTT on a relay-tunneled dev chip),
    so the plain decode path is one executable per token, like the
    chunked and speculative paths. Returns
    (nxt, cache, keys, counts[, lp, tv, ti]) — ``keys`` advanced one
    split per row."""
    from multimodal_rag_tpu.models.decoder import _split_rows

    keys, sub = _split_rows(keys)
    logits, cache = decode_step_rows(
        params, cache, cur, pos, key_mask, sem_pos, cfg
    )
    res = _sample_rows_counted(
        logits, sub, temps, top_k, top_ps, counts, pres, freq, emit,
        want_lp=want_lp, allowed_bits=allowed_bits, bias=bias,
    )
    if want_lp:
        nxt, counts, lp, tv, ti = res
        return nxt, cache, keys, counts, lp, tv, ti
    nxt, counts = res
    return nxt, cache, keys, counts


@partial(
    jax.jit, static_argnames=("cfg", "top_k", "want_lp"),
    donate_argnames=("cache", "counts", "keys"),
)
def _fused_chunk_step(
    params, cache, tokens, pos0, key_mask, positions0, gather, keys,
    temps, top_ps, counts, pres, freq, emit, cfg: DecoderConfig,
    top_k: int, want_lp: bool = False, allowed_bits=None, bias=None,
):
    """ONE dispatch that advances a mixed batch (Sarathi-style chunked
    prefill fused with decode): each row's C-token chunk is either the
    next slice of a prompt being prefilled, or ``[cur_tok, pad...]`` for
    a row that is decoding (decode is weight-streaming bound, so the
    extra chunk columns are nearly free). ``gather`` picks the logits row
    that matters per request — ``chunk_len - 1`` for a prompt finishing
    this pass, ``0`` for a decoding row — and sampling runs on it with
    the usual per-row key/temperature/nucleus streams. Pad columns write
    garbage k/v at slots ``[pos0 + real, pos0 + C)``; the caller never
    marks those attendable and later writes overwrite them (the cache
    carries a C-slot scratch tail so the scatter never clamps onto a
    live slot). ``keys`` are the full per-row key streams, split
    in-dispatch (one executable per pass — no separate split hop); the
    advanced keys come back in the result."""
    from multimodal_rag_tpu.models.decoder import _split_rows

    keys, sub = _split_rows(keys)
    logits, cache = _decode_verify_impl(
        params, cache, tokens, pos0, key_mask, positions0, cfg
    )
    row_logits = jnp.take_along_axis(
        logits, gather[:, None, None], axis=1
    )[:, 0]
    from multimodal_rag_tpu.models.decoder import _lp_top, _penalty_bias

    # Presence/frequency penalties: bias over the row's OUTPUT counts;
    # ``emit`` masks the count update to rows whose sample is real this
    # pass (mid-prefill and idle rows sample garbage the host discards).
    biased = row_logits - _penalty_bias(counts, pres, freq)
    if bias is not None:  # OpenAI logit_bias (device-resident rows)
        biased = biased + bias
    if allowed_bits is not None:
        biased = jnp.where(
            _unpack_mask(allowed_bits, biased.shape[-1]), biased, -1e9
        )
    nxt = _sample_rows(biased, sub, temps, top_k, top_ps)
    counts = counts.at[jnp.arange(nxt.shape[0]), nxt].add(emit)
    if want_lp:
        lp, tv, ti = _lp_top(biased, nxt)
        return nxt, cache, keys, counts, lp, tv, ti
    return nxt, cache, keys, counts


@partial(
    jax.jit, static_argnames=("cfg", "top_k", "spec_k", "want_lp"),
    donate_argnames=("cache", "counts", "keys"),
)
def _spec_step_rows(
    params, cache, seq, cur, prev, pos, key_mask, sem_pos,
    keys, temps, top_ps, counts, pres, freq,
    cfg: DecoderConfig, top_k: int, spec_k: int,
    lp_rows=None, want_lp: bool = False,
    allowed_bits=None, grammar_rows=None, bias=None,
):
    """One speculative pass for a decode-only batch: per-row bigram
    prompt-lookup drafts K tokens from ``seq`` (the slot-aligned token
    record — RAG answers quote their context), one ``decode_verify``
    chunk scores [cur, d_1..d_K], and per-row accept/reject emits 1..K+1
    tokens per row per dispatch. Greedy rows are bit-equal to the plain
    sequential step; sampled rows are distribution-identical (rejection
    sampling). Host dispatches drop by the acceptance factor — the
    relay/tunnel-latency lever for continuous batching. ``keys`` are the
    full per-row key streams, split twice in-dispatch (accept + repair);
    the advanced keys come back in the result."""
    from multimodal_rag_tpu.models.decoder import _split_rows
    from multimodal_rag_tpu.models.spec_decode import (
        _propose_ngram,
        _speculative_accept_rows,
    )

    keys, k_acc = _split_rows(keys)
    keys, k_rep = _split_rows(keys)

    # key_mask only: cur's slot (``pos``) must stay out of the match
    # region or the trailing self-match wins with an unwritten
    # continuation (see _propose_ngram's caller contract).
    draft = _propose_ngram(seq, key_mask, prev, cur, spec_k, cur_slot=pos)
    tokens = jnp.concatenate([cur[:, None], draft], axis=1)  # (B, K+1)
    logits, cache = _decode_verify_impl(
        params, cache, tokens, pos, key_mask, sem_pos, cfg
    )
    from multimodal_rag_tpu.models.decoder import _lp_top, _penalty_bias

    # Penalized rows emit exactly ONE token per pass (force_single): the
    # bias below is computed from counts at pass start, which is only
    # exact for the FIRST sampled position — accepting drafts beyond it
    # would sample from stale counts. Zero-penalty rows keep full
    # speculative acceptance (their bias is exactly 0.0). Logprob rows
    # (``lp_rows``) are forced single too: their per-token distribution
    # record is only computed for position 0.
    logits = logits - _penalty_bias(counts, pres, freq)[:, None, :]
    if bias is not None:
        # logit_bias is STATIC per request, so applying it at every
        # draft position keeps speculative acceptance exact — no
        # single-token fallback needed (unlike penalties).
        logits = logits + bias[:, None, :]
    force_single = (pres != 0.0) | (freq != 0.0)
    if lp_rows is not None:
        force_single = force_single | lp_rows
    # Grammar-constrained rows: the host advances the parser one token
    # at a time, so they emit exactly one (masked) token per pass —
    # draft positions can't be grammar-checked ahead of the accept.
    if allowed_bits is not None:
        logits = jnp.where(
            _unpack_mask(allowed_bits, logits.shape[-1])[:, None, :],
            logits, -1e9,
        )
        force_single = force_single | grammar_rows
    emit, n_emit = _speculative_accept_rows(
        draft, logits, k_acc, k_rep, temps, top_ps, top_k, -1,
        force_single,
    )
    rows = jnp.arange(emit.shape[0])
    for i in range(spec_k + 1):
        counts = counts.at[rows, emit[:, i]].add(
            (n_emit > i).astype(jnp.int32)
        )
    if want_lp:
        lp, tv, ti = _lp_top(logits[:, 0], emit[:, 0])
        return emit, n_emit, cache, keys, counts, lp, tv, ti
    return emit, n_emit, cache, keys, counts


@partial(jax.jit, donate_argnames=("pool",))
def _load_prefix(pool: Dict, ppool: Dict, entry: jax.Array,
                 slot: jax.Array) -> Dict:
    """Copy prefix-cache entry ``entry`` (all ``Lp_max`` slots) into the
    batch pool's row ``slot`` at cache slots [0, Lp_max) — device-to-
    device, no host round trip. The caller marks only the matched length
    attendable; trailing slots are stale and stay masked. Tree-mapped:
    every cache leaf — bf16 stacks AND the int8-KV value/scale pair —
    keeps batch on axis 1, so one rule copies them all."""
    def load(p, pp):
        blk = jax.lax.dynamic_slice_in_dim(pp, entry, 1, axis=1)
        start = (0, slot) + (0,) * (p.ndim - 2)
        return jax.lax.dynamic_update_slice(p, blk, start)

    return jax.tree.map(load, pool, ppool)


@partial(jax.jit, donate_argnames=("ppool",))
def _store_prefix(ppool: Dict, pool: Dict, slot: jax.Array,
                  entry: jax.Array) -> Dict:
    """Snapshot row ``slot``'s first Lp_max cache slots into prefix-cache
    entry ``entry`` (called right after a prompt's prefill completes, so
    those slots hold prompt k/v only). Tree-mapped like _load_prefix;
    the cache-slot axis is 3 on every leaf."""
    def store(pp, p):
        sizes = list(p.shape)
        sizes[1] = 1
        sizes[3] = pp.shape[3]
        start = (0, slot) + (0,) * (p.ndim - 2)
        blk = jax.lax.dynamic_slice(p, start, sizes)
        estart = (0, entry) + (0,) * (p.ndim - 2)
        return jax.lax.dynamic_update_slice(pp, blk, estart)

    return jax.tree.map(store, ppool, pool)


@dataclass
class _Request:
    prompt_ids: List[int]
    max_new_tokens: int
    temperature: float
    future: asyncio.Future
    top_p: float = 1.0
    seed: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # OpenAI logprobs: per emitted token, (id, logprob,
    # [(alt_id, alt_logprob)] * LOGPROBS_K) — token strings are decoded
    # at resolve time (loop thread owns the tokenizer).
    logprobs: bool = False
    lps: List[tuple] = field(default_factory=list)
    tokens: List[int] = field(default_factory=list)
    slot: int = -1
    # Chunked-prefill mode: prompt tokens consumed so far. A row is
    # "decoding" once consumed == len(prompt_ids) AND its first token has
    # been sampled (the two happen in the same fused pass).
    consumed: int = 0
    finish: str = "stop"  # "stop" (EOS) | "length" (budget exhausted)
    # Streaming (submit_stream): per-request delta queue, drained by the
    # consumer. Items are (text_delta, finish|None) or an exception.
    stream_q: "Optional[asyncio.Queue]" = None
    streamed_chars: int = 0
    # Set when the streaming consumer went away (SSE client disconnect):
    # the scheduler retires the row instead of decoding for a dead reader.
    cancelled: bool = False
    # Grammar-constrained decoding (OpenAI response_format / forced tool
    # calls): a models.grammar.TokenMasker plus the row's parser state.
    # The host advances the parser on every emitted token and ships the
    # next packed vocab bitmask with the next dispatch.
    masker: object = None
    gstate: int = 0
    # OpenAI logit_bias: sparse id->bias map; densified into the
    # device-resident per-slot bias array at admission.
    logit_bias: Optional[Dict] = None
    # S-LoRA routing: the stacked-adapter slot this request decodes with
    # (0 = base; lora.stack_lora_adapters / decoder.with_adapter_rows).
    adapter_id: int = 0
    # Soft-token (vision) admission: pre-computed input embeddings
    # (T, H) f32 — image tower output spliced between token embeddings
    # (models/llava.py splice_multimodal). When set, ``prompt_ids``
    # holds the EXPANDED id sequence (one placeholder id per image row)
    # of the same length T, used only for host bookkeeping (seq record,
    # budget math) — the model never re-embeds it. ``overlay``: optional
    # (T, T) bool OR-visibility mask (Gemma3's bidirectional image
    # blocks, decoder.prefill_embeds).
    embeds: Optional[np.ndarray] = None
    overlay: Optional[np.ndarray] = None


class DecodeServer:
    """Drives continuous-batched generation over one decoder.

    ``decoder``: a ``TextDecoder`` (supplies params/cfg/tokenizer and the
    prompt buckets). ``slots``: compiled batch width. ``max_new_cap``:
    per-request token budget ceiling; with the largest prompt bucket it
    fixes the cache length (one executable total for decode).
    """

    def __init__(self, decoder, slots: int = 8, max_new_cap: int = 1024,
                 top_k: int = 64, seed: int = 0,
                 chunk_tokens: Optional[int] = None,
                 prefix_entries: int = 0,
                 spec_k: int = 0,
                 cache_sharding=None):
        self.dec = decoder
        self.cfg: DecoderConfig = decoder.cfg
        self.slots = slots
        self.top_k = top_k
        self.max_seq = decoder.prompt_buckets[-1] + max_new_cap
        self.max_new_cap = max_new_cap
        self.eos_id = int(decoder.eos_id)
        self._key = jax.random.key(seed)

        # Chunked-prefill mode (chunk_tokens = C > 0): prompts are
        # consumed C tokens per fused pass (decoding rows piggyback one
        # token each — no admission stall), laid out UNPADDED from cache
        # slot 0 so a shared prefix lands in identical slots for every
        # request — which is what makes the prefix cache a plain block
        # copy. The pool carries a C-slot scratch tail (pad-column writes
        # land there instead of clamping onto live slots).
        self.chunk = int(chunk_tokens) if chunk_tokens else 0
        # Windowed ring caches (decoder.windowed_cache, Gemma3/GPT-OSS):
        # exact + smaller, but incompatible with the chunked/spec/prefix
        # machinery (ring writes cannot rewind rejected drafts, and the
        # chunk scratch-tail trick assumes the full layout) — those modes
        # win the conflict and the pool falls back to full-length caches,
        # where the window is still enforced in the attention mask.
        self.windowed = bool(getattr(decoder, "windowed_cache", False))
        if self.windowed and (self.chunk or spec_k or prefix_entries):
            logger.info(
                "Sliding-window ring caches disabled for this server: "
                "chunked prefill / speculative / prefix cache need the "
                "full cache layout (window stays mask-enforced)"
            )
            self.windowed = False
        if prefix_entries and not self.chunk:
            raise ValueError(
                "prefix_entries requires chunked prefill (chunk_tokens)"
            )
        # Prompt-lookup speculative decoding for decode-only passes
        # (spec_k drafted tokens verified per dispatch). Requires the
        # chunked unpadded layout (the seq record is slot-aligned), and
        # the scratch tail must cover the K+1 chunk.
        self.spec_k = int(spec_k)
        if self.spec_k:
            if not self.chunk:
                raise ValueError(
                    "spec_k requires chunked prefill (chunk_tokens)"
                )
            if self.spec_k + 1 > self.chunk:
                raise ValueError(
                    f"spec_k={self.spec_k} needs chunk_tokens >= "
                    f"{self.spec_k + 1}"
                )
        self.spec_emitted = 0
        self.spec_passes = 0  # speculative DISPATCHES (batch-shared)
        # Row-live pass count: sum over dispatches of live rows — the
        # honest acceptance denominator (spec_emitted sums over rows, so
        # dividing by dispatches alone inflates acceptance by the batch
        # width; found r5 when a probe printed accept_rate = 1.69).
        self.spec_row_passes = 0
        pool_seq = self.max_seq + (self.chunk if self.chunk else 0)
        self.pool_seq = pool_seq
        # int8 KV pool: follows the decoder's posture (TextDecoder reads
        # TPU_LLM_KV_QUANT). All pool surgery — row insert, prefix block
        # copies, chunk scatters — is structure-driven, so the quantized
        # value/scale pair flows through every serving mode.
        self.kv_quant = bool(getattr(decoder, "kv_quant", False))
        self.pool = init_cache(
            self.cfg, slots, pool_seq, windowed=self.windowed,
            quant=self.kv_quant,
        )
        # Tensor-parallel composition: with TP-sharded decoder params
        # (decoder_tp.shard_decoder), place the KV pool with the matching
        # head-axis sharding so every chip holds only its head groups'
        # cache; the jitted steps then run under GSPMD unchanged. The
        # decoder records its own cache sharding when it auto-TPs or is
        # handed pre-sharded params, so by default just follow it.
        if cache_sharding is None:
            cache_sharding = getattr(decoder, "cache_sharding", None)
        self.cache_sharding = cache_sharding
        if cache_sharding is not None:
            self.pool = place_cache(self.pool, cache_sharding)
        self.prefix_entries = int(prefix_entries)
        if self.prefix_entries > 0:
            lp_max = (decoder.prompt_buckets[-1] // self.chunk) * self.chunk
            self.prefix_len_max = max(lp_max, self.chunk)
            self.prefix_pool = init_cache(
                self.cfg, self.prefix_entries, self.prefix_len_max,
                quant=self.kv_quant,
            )
            if cache_sharding is not None:
                self.prefix_pool = place_cache(
                    self.prefix_pool, cache_sharding
                )
            # Per entry: (token tuple, stored_len, adapter_id) or None;
            # parallel last-use tick for LRU eviction.
            self.prefix_meta: List[Optional[tuple]] = (
                [None] * self.prefix_entries
            )
            self._prefix_use = [0] * self.prefix_entries
            self._prefix_tick = 0
        self.prefix_hits = 0
        self.prefix_tokens_reused = 0
        self.chunk_passes = 0
        self.requests: List[Optional[_Request]] = [None] * slots
        # Host-side per-slot state, shipped each step (width matches the
        # pool's cache length, incl. the chunked-mode scratch tail).
        self.key_mask = np.zeros((slots, pool_seq), np.int32)
        self.key_mask[:, 0] = 1  # idle rows attend to slot 0 (no NaN softmax)
        self.pos = np.zeros((slots,), np.int32)
        self.sem_pos = np.zeros((slots,), np.int32)
        self.cur_tok = np.zeros((slots,), np.int32)
        # Speculative mode: slot-aligned token record (prompt + accepted
        # generation) for the n-gram drafter, and the token before cur.
        self.seq = np.zeros((slots, pool_seq), np.int32)
        self.prev_tok = np.zeros((slots,), np.int32)
        self.temps = np.full((slots,), -1.0, np.float32)
        self.top_ps = np.ones((slots,), np.float32)
        # OpenAI presence/frequency penalties: per-slot strengths plus a
        # device-resident (slots, V) output-token count array (the bias
        # input — ~4 MB at a 128k vocab, nothing next to the weights).
        # Idle/retired slots keep stale counts but zero strengths, so
        # their bias is exactly 0; admission zeroes the row.
        self.pres = np.zeros((slots,), np.float32)
        self.freqs = np.zeros((slots,), np.float32)
        self.counts = jnp.zeros((slots, self.cfg.vocab_size), jnp.int32)
        # S-LoRA: per-slot stacked-adapter ids (0 = base). When the
        # decoder params carry a stack AND any live row routes a
        # non-base adapter, dispatches inject the ids as a params leaf
        # (decoder.with_adapter_rows); all-base batches keep the
        # stack-free executables.
        self.adapter_rows = np.zeros((slots,), np.int32)
        self._has_stack = has_adapter_stack(decoder.params)
        # OpenAI logprobs: rows that asked for them. Any active lp row
        # flips the step dispatch to the want_lp executable (compiled
        # once); lp rows take single-token emission in spec mode.
        self.want_lp = np.zeros((slots,), bool)
        # Grammar masks: per-slot (V,) bool, all-True for unconstrained
        # rows; packed to bits and shipped only when >= 1 active row is
        # constrained (None otherwise — keeps the unconstrained
        # executables untouched).
        self.g_masks = np.ones((slots, self.cfg.vocab_size), bool)
        # OpenAI logit_bias: DEVICE-RESIDENT (slots, V) f32 addend —
        # written once per admission (a request's bias is static), never
        # re-shipped per step. Created lazily on the first biased
        # request; steps receive it only while >= 1 biased row is live.
        self.bias: Optional[jax.Array] = None
        self._bias_slots: set = set()
        # Per-slot sampling keys: each row advances its OWN stream.
        self.keys = jax.random.split(jax.random.key(seed), slots)
        self._admitted = 0  # distinct default-key stream per admission

        self.pending: asyncio.Queue = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None
        self.steps_run = 0
        self.requests_done = 0

    def _params(self, rows=None):
        """Decoder params for this dispatch: S-LoRA ids injected when any
        routed row is live (``rows`` overrides the slot table — the
        classic admission path prefills a single row)."""
        ids = self.adapter_rows if rows is None else np.asarray(
            rows, np.int32
        )
        if not self._has_stack or not ids.any():
            return self.dec.params
        return with_adapter_rows(self.dec.params, ids)

    # -- public API -------------------------------------------------------

    def start(self) -> None:
        if self._task is None:
            self._task = asyncio.get_running_loop().create_task(self._run())

    async def stop(self) -> None:
        if self._task is not None:
            task, self._task = self._task, None
            task.cancel()
            try:
                await task
            except (asyncio.CancelledError, Exception):  # noqa: BLE001
                pass
            # Cancellation strands anyone awaiting submit()/submit_stream()
            # (the loop died between their enqueue and their resolve) —
            # fail them out loud instead of hanging their HTTP requests.
            self._fail_all(RuntimeError("decode server stopped"))

    async def submit(
        self,
        prompt: str,
        max_new_tokens: int = 256,
        temperature: float = 0.7,
        return_finish: bool = False,
        top_p: float = 1.0,
        seed: Optional[int] = None,
        presence_penalty: float = 0.0,
        frequency_penalty: float = 0.0,
        logprobs: bool = False,
        grammar=None,
        logit_bias: Optional[Dict] = None,
        adapter_id: int = 0,
        prompt_embeds=None,
        prompt_ids: Optional[Sequence[int]] = None,
        overlay=None,
    ) -> "str | tuple":
        """Generate text for ``prompt``; resolves when the row finishes.
        With ``return_finish=True`` returns ``(text, finish_reason)`` —
        ``"stop"`` (EOS) or ``"length"`` (budget exhausted). With
        ``logprobs=True`` (implies finish) returns ``(text, finish,
        lps)`` — per emitted token a dict ``{"id", "token", "logprob",
        "top": [(id, token, logprob)] * LOGPROBS_K}``; callers slice
        ``top`` to the client's ``top_logprobs``. ``grammar`` is an
        optional :class:`~..models.grammar.TokenMasker` — the row's
        sampler only ever sees tokens that keep the output inside the
        grammar (OpenAI ``response_format`` / forced tool calls).
        ``prompt_embeds`` (+ same-length expanded ``prompt_ids``,
        optional ``overlay`` OR-visibility mask): soft-token admission
        for vision requests — see :meth:`_admit_embeds`; ``prompt`` is
        ignored then."""
        self.start()
        if prompt_embeds is not None:
            ids = self._check_embed_prompt(prompt_embeds, prompt_ids)
        else:
            ids = self._encode_prompt(prompt)
        if max_new_tokens > self.max_new_cap:
            logger.warning(
                "max_new_tokens %d clamped to the server cap %d "
                "(raise max_new_cap to match the coalesced path)",
                max_new_tokens, self.max_new_cap,
            )
        fut = asyncio.get_running_loop().create_future()
        req = _Request(
            prompt_ids=list(ids),
            max_new_tokens=min(int(max_new_tokens), self.max_new_cap),
            temperature=float(temperature),
            future=fut,
            top_p=float(top_p),
            seed=seed,
            presence_penalty=float(presence_penalty),
            frequency_penalty=float(frequency_penalty),
            logprobs=bool(logprobs),
            masker=grammar,
            logit_bias=logit_bias,
            adapter_id=int(adapter_id),
            embeds=prompt_embeds,
            overlay=overlay,
        )
        await self.pending.put(req)
        text, finish, lps = await fut
        if logprobs:
            return text, finish, lps
        return (text, finish) if return_finish else text

    async def submit_stream(
        self,
        prompt: str,
        max_new_tokens: int = 256,
        temperature: float = 0.7,
        top_p: float = 1.0,
        seed: Optional[int] = None,
        presence_penalty: float = 0.0,
        frequency_penalty: float = 0.0,
        grammar=None,
        logit_bias: Optional[Dict] = None,
        adapter_id: int = 0,
        prompt_embeds=None,
        prompt_ids: Optional[Sequence[int]] = None,
        overlay=None,
    ):
        """Per-token streaming variant of :meth:`submit`: an async
        generator of ``(text_delta, finish)`` pairs. ``finish`` is None
        for intermediate deltas and "stop"/"length" on the final one
        (whose delta may be empty). Deltas are flushed after every decode
        step, so a joined row streams while other rows keep decoding.
        ``prompt_embeds``/``prompt_ids``/``overlay``: soft-token (vision)
        admission, as in :meth:`submit`."""
        self.start()
        if prompt_embeds is not None:
            ids = self._check_embed_prompt(prompt_embeds, prompt_ids)
        else:
            ids = self._encode_prompt(prompt)
        req = _Request(
            prompt_ids=list(ids),
            max_new_tokens=min(int(max_new_tokens), self.max_new_cap),
            temperature=float(temperature),
            future=asyncio.get_running_loop().create_future(),
            stream_q=asyncio.Queue(),
            top_p=float(top_p),
            seed=seed,
            presence_penalty=float(presence_penalty),
            frequency_penalty=float(frequency_penalty),
            masker=grammar,
            logit_bias=logit_bias,
            adapter_id=int(adapter_id),
            embeds=prompt_embeds,
            overlay=overlay,
        )
        await self.pending.put(req)
        try:
            while True:
                item = await req.stream_q.get()
                if isinstance(item, BaseException):
                    raise item
                delta, fin = item
                yield delta, fin
                if fin is not None:
                    return
        finally:
            # Consumer gone (client disconnect → GeneratorExit, or normal
            # completion — then the row is already retired): tell the
            # scheduler so an abandoned row stops burning decode steps.
            req.cancelled = True

    def _encode_prompt(self, prompt: str) -> List[int]:
        """Encode + tail-keep to the largest prompt bucket, counting
        truncations on the decoder (same /stats surface as the coalesced
        path)."""
        cap = self.dec.prompt_buckets[-1]
        ids = self.dec.tokenizer.encode(prompt)
        if len(ids) > cap:
            self.dec.truncated_prompts += 1
            logger.warning(
                "prompt exceeded the %d-token ceiling; kept only the "
                "tail — raise TPU_LLM_PROMPT_BUCKETS to keep full "
                "context", cap,
            )
            ids = ids[-cap:]
        return ids

    def _check_embed_prompt(self, embeds, prompt_ids) -> List[int]:
        """Validate a soft-token prompt. Unlike text, an over-long embed
        prompt raises instead of tail-keeping: a blind tail cut would
        silently drop the image rows (they lead the llava layout) and
        turn the request text-only — the ADAPTER owns image-preserving
        truncation (llava.LlavaGenerator middle-cut) and must do it
        before submitting."""
        if prompt_ids is None:
            raise ValueError(
                "prompt_embeds requires prompt_ids (the expanded id "
                "sequence, one placeholder id per image row)"
            )
        ids = list(prompt_ids)
        T = np.asarray(embeds).shape[0]
        if len(ids) != T:
            raise ValueError(
                f"prompt_ids length {len(ids)} != prompt_embeds rows {T}"
            )
        cap = self.dec.prompt_buckets[-1]
        if T > cap:
            self.dec.truncated_prompts += 1
            raise ValueError(
                f"embed prompt ({T} rows) exceeds the {cap}-token "
                "ceiling; truncate image-aware before submitting or "
                "raise the prompt buckets"
            )
        return ids

    def _push_stream(self, req: _Request, final: bool = False) -> None:
        """Loop-thread only: emit the not-yet-streamed text of ``req``.
        Incremental byte-level decodes can end mid-UTF-8-sequence; the
        trailing replacement chars are held back until the next flush."""
        if req.stream_q is None:
            return
        text = self.dec.tokenizer.decode(req.tokens)
        if not final:
            while text.endswith("�"):
                text = text[:-1]
        delta = text[req.streamed_chars:]
        req.streamed_chars = len(text)
        if delta or final:
            req.stream_q.put_nowait((delta, req.finish if final else None))

    def _flush_streams(self) -> None:
        """Loop-thread only: push fresh deltas for every active streaming
        request (finished ones are pushed by ``_resolve``)."""
        for req in self.requests:
            if req is not None and req.stream_q is not None:
                self._push_stream(req)

    # -- scheduler --------------------------------------------------------

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self.requests) if r is None]

    def _admit(self, req: _Request, slot: int) -> List[_Request]:
        """Prefill the request (B=1) and install it into ``slot``.

        Runs in a worker thread; returns any request that finished
        immediately (first token = EOS / budget 1) instead of resolving
        its future here — futures are only touched on the loop thread
        (``set_result`` from another thread is not loop-safe)."""
        if req.embeds is not None:
            return self._admit_embeds(req, slot)
        if self.chunk:
            return self._admit_chunked(req, slot)
        ids = req.prompt_ids
        P = next(
            (b for b in self.dec.prompt_buckets if len(ids) <= b),
            self.dec.prompt_buckets[-1],
        )
        row_ids = np.zeros((1, P), np.int32)
        row_mask = np.zeros((1, P), np.int32)
        row_ids[0, P - len(ids):] = ids
        row_mask[0, P - len(ids):] = 1
        logits, row_cache = prefill(
            self._params(rows=[req.adapter_id]),
            jnp.asarray(row_ids), jnp.asarray(row_mask),
            self.cfg, self.max_seq, windowed=self.windowed,
            quant=self.kv_quant,
        )
        self.pool = _insert_row(self.pool, row_cache, jnp.int32(slot))
        self._admitted += 1
        row_key = (
            jax.random.key(int(req.seed))
            if req.seed is not None
            else jax.random.fold_in(self._key, self._admitted)
        )
        row_key, sub = jax.random.split(row_key)
        allowed = None
        if req.masker is not None:
            req.gstate = req.masker.start
            self.g_masks[slot] = req.masker.mask_bool(req.gstate)
            allowed = jnp.asarray(self.g_masks[slot][None])
        if req.logit_bias:
            logits = logits + jnp.asarray(
                self._dense_bias_row(req.logit_bias)[None]
            )
        first = int(
            _sample_rows(
                logits, sub[None],
                jnp.asarray([req.temperature], jnp.float32), self.top_k,
                jnp.asarray([req.top_p], jnp.float32), allowed,
            )[0]
        )
        req.slot = slot
        self.requests[slot] = req
        self.key_mask[slot] = 0
        self.key_mask[slot, :P] = row_mask[0]
        self.pos[slot] = P
        self.sem_pos[slot] = len(ids)
        self.cur_tok[slot] = first
        self.temps[slot] = req.temperature
        self.top_ps[slot] = req.top_p
        self.pres[slot] = req.presence_penalty
        self.freqs[slot] = req.frequency_penalty
        self.want_lp[slot] = req.logprobs
        self.adapter_rows[slot] = req.adapter_id
        self._admit_bias(slot, req)
        if req.logprobs and first != self.eos_id:
            from multimodal_rag_tpu.models.decoder import _lp_top

            # First token: its penalty bias is an exact 0 (empty output),
            # so the prefill logits ARE the sampling distribution — but a
            # grammar-constrained row sampled from the MASKED logits, and
            # the record must report that same distribution (mirrors
            # _sample_rows_counted's allowed_bits handling).
            lp_logits = (
                jnp.where(allowed, logits, -1e9)
                if allowed is not None else logits
            )
            lp1, tv1, ti1 = (
                np.asarray(x) for x in _lp_top(
                    lp_logits, jnp.asarray([first], jnp.int32)
                )
            )
            req.lps.append((
                first, float(lp1[0]),
                list(zip(ti1[0].tolist(), tv1[0].tolist())),
            ))
        # The prefill sample above saw an all-zero count row for this
        # request (bias 0 is exact for the first token); start the row's
        # output-token counts with it.
        self.counts = _count_admit(
            self.counts, jnp.int32(slot), jnp.int32(first)
        )
        self.keys = self.keys.at[slot].set(row_key)
        if first == self.eos_id or req.max_new_tokens <= 1:
            if first != self.eos_id:
                req.tokens.append(first)
                req.finish = "length"  # budget of 1, spent on a real token
            return [self._retire(slot)]
        req.tokens.append(first)
        if req.masker is not None and not self._grammar_advance(req, first):
            return [self._retire(slot)]
        return []

    def _admit_chunked(self, req: _Request, slot: int) -> List[_Request]:
        """Chunked-mode admission: assign the slot and per-row sampling
        state; the prompt itself is consumed by the fused passes in
        :meth:`_step_chunked` (C tokens per pass), so admission does no
        model work. With a prefix-cache hit, the matched block is copied
        device-to-device into the row and those tokens are never
        recomputed."""
        req.slot = slot
        req.consumed = 0
        self.requests[slot] = req
        self.key_mask[slot] = 0
        self.pos[slot] = 0
        self.sem_pos[slot] = 0
        self.seq[slot] = 0
        ids = req.prompt_ids
        self.seq[slot, :len(ids)] = ids
        self.prev_tok[slot] = ids[-1] if ids else 0
        self.temps[slot] = req.temperature
        self.top_ps[slot] = req.top_p
        self.pres[slot] = req.presence_penalty
        self.freqs[slot] = req.frequency_penalty
        self.want_lp[slot] = req.logprobs
        self.adapter_rows[slot] = req.adapter_id
        if req.masker is not None:
            req.gstate = req.masker.start
            self.g_masks[slot] = req.masker.mask_bool(req.gstate)
        self._admit_bias(slot, req)
        self.counts = _count_reset(self.counts, jnp.int32(slot))
        self._admitted += 1
        row_key = (
            jax.random.key(int(req.seed))
            if req.seed is not None
            else jax.random.fold_in(self._key, self._admitted)
        )
        self.keys = self.keys.at[slot].set(row_key)
        if self.prefix_entries > 0:
            entry, match = self._match_prefix(
                req.prompt_ids, req.adapter_id
            )
            if entry >= 0:
                self.pool = _load_prefix(
                    self.pool, self.prefix_pool,
                    jnp.int32(entry), jnp.int32(slot),
                )
                self.key_mask[slot, :match] = 1
                req.consumed = match
                self._prefix_tick += 1
                self._prefix_use[entry] = self._prefix_tick
                self.prefix_hits += 1
                self.prefix_tokens_reused += match
        return []

    def _admit_embeds(self, req: _Request, slot: int) -> List[_Request]:
        """Soft-token (vision) admission: one B=1 ``prefill_embeds``
        pass fills the row cache from the request's pre-computed input
        embeddings (image tower output spliced between token embeddings)
        and samples the first token; from then on the row is an ORDINARY
        text row — per-token streaming, logprobs, grammar masks,
        penalties, speculative decode and continuous batching all apply
        unchanged. This replaces the reference's serialized multimodal
        hot loop (app/models/mllm_adapter.py:211-241) with rows in the
        shared continuous batch.

        Layout follows the serving mode: chunked pools are UNPADDED from
        cache slot 0 (pad right), classic pools right-align to the
        prompt bucket (pad left) — matching what the fused step
        executables expect. Prefix cache: embed rows neither match nor
        store — two requests with identical expanded ids can carry
        different pixels, so id-keyed reuse would serve one request's
        image to another."""
        ids = req.prompt_ids
        emb = np.asarray(req.embeds, np.float32)
        T = len(ids)
        P = next(
            (b for b in self.dec.prompt_buckets if T <= b),
            self.dec.prompt_buckets[-1],
        )
        emb_p = np.zeros((1, P, emb.shape[1]), np.float32)
        row_mask = np.zeros((1, P), np.int32)
        pad = 0 if self.chunk else P - T
        emb_p[0, pad:pad + T] = emb
        row_mask[0, pad:pad + T] = 1
        overlay = None
        if req.overlay is not None:
            ov = np.zeros((1, P, P), bool)
            ov[0, pad:pad + T, pad:pad + T] = np.asarray(req.overlay, bool)
            overlay = jnp.asarray(ov)
        logits, row_cache = prefill_embeds(
            self._params(rows=[req.adapter_id]),
            jnp.asarray(emb_p), jnp.asarray(row_mask),
            self.cfg, self.pool_seq, overlay,
            windowed=self.windowed, quant=self.kv_quant,
            # Left-aligned chunked layout: the logits row is the last
            # REAL token, not the trailing pad.
            logit_pos=(
                jnp.asarray([T - 1], jnp.int32) if self.chunk else None
            ),
        )
        self.pool = _insert_row(self.pool, row_cache, jnp.int32(slot))
        self._admitted += 1
        row_key = (
            jax.random.key(int(req.seed))
            if req.seed is not None
            else jax.random.fold_in(self._key, self._admitted)
        )
        row_key, sub = jax.random.split(row_key)
        allowed = None
        if req.masker is not None:
            req.gstate = req.masker.start
            self.g_masks[slot] = req.masker.mask_bool(req.gstate)
            allowed = jnp.asarray(self.g_masks[slot][None])
        if req.logit_bias:
            logits = logits + jnp.asarray(
                self._dense_bias_row(req.logit_bias)[None]
            )
        first = int(
            _sample_rows(
                logits, sub[None],
                jnp.asarray([req.temperature], jnp.float32), self.top_k,
                jnp.asarray([req.top_p], jnp.float32), allowed,
            )[0]
        )
        req.slot = slot
        req.consumed = T  # chunked scheduler: nothing left to consume
        self.requests[slot] = req
        self.key_mask[slot] = 0
        self.key_mask[slot, :P] = row_mask[0]
        # Next k/v write lands after the prompt: slot T (unpadded
        # chunked layout) / bucket width P (right-aligned classic).
        self.pos[slot] = T if self.chunk else P
        self.sem_pos[slot] = T
        self.cur_tok[slot] = first
        # Chunked bookkeeping (spec drafter's slot-aligned seq record):
        # image rows carry their placeholder id — generated text never
        # matches it, so drafts simply skip the image region.
        self.seq[slot] = 0
        self.seq[slot, :T] = ids
        self.prev_tok[slot] = ids[-1] if ids else 0
        self.temps[slot] = req.temperature
        self.top_ps[slot] = req.top_p
        self.pres[slot] = req.presence_penalty
        self.freqs[slot] = req.frequency_penalty
        self.want_lp[slot] = req.logprobs
        self.adapter_rows[slot] = req.adapter_id
        self._admit_bias(slot, req)
        if req.logprobs and first != self.eos_id:
            from multimodal_rag_tpu.models.decoder import _lp_top

            lp_logits = (
                jnp.where(allowed, logits, -1e9)
                if allowed is not None else logits
            )
            lp1, tv1, ti1 = (
                np.asarray(x) for x in _lp_top(
                    lp_logits, jnp.asarray([first], jnp.int32)
                )
            )
            req.lps.append((
                first, float(lp1[0]),
                list(zip(ti1[0].tolist(), tv1[0].tolist())),
            ))
        self.counts = _count_admit(
            self.counts, jnp.int32(slot), jnp.int32(first)
        )
        self.keys = self.keys.at[slot].set(row_key)
        if first == self.eos_id or req.max_new_tokens <= 1:
            if first != self.eos_id:
                req.tokens.append(first)
                req.finish = "length"
            return [self._retire(slot)]
        req.tokens.append(first)
        if self.chunk:
            self.seq[slot, T] = first  # cur at its slot
        if req.masker is not None and not self._grammar_advance(req, first):
            return [self._retire(slot)]
        return []

    def _match_prefix(self, ids: List[int], adapter_id: int = 0) -> tuple:
        """Longest cached chunk-aligned prefix of ``ids`` that still
        leaves at least one token to run (the final prompt token must be
        processed to produce first-token logits). Entries are keyed by
        the adapter that computed them: S-LoRA rows change the k/v
        projections, so a prefix prefilled under one adapter is WRONG
        for another. Returns (entry, length) or (-1, 0)."""
        C = self.chunk
        limit = ((len(ids) - 1) // C) * C
        best, best_len = -1, 0
        for e, meta in enumerate(self.prefix_meta):
            if meta is None:
                continue
            toks, stored, owner = meta
            if owner != adapter_id:
                continue
            usable = min(stored, limit)
            # Longest chunk-aligned common prefix (entries diverge from
            # the prompt wherever the question/suffix starts).
            lcp = 0
            for j in range(0, usable, C):
                if tuple(ids[j:j + C]) != toks[j:j + C]:
                    break
                lcp = j + C
            if lcp > best_len:
                best, best_len = e, lcp
        return best, best_len

    def _maybe_store_prefix(self, req: _Request) -> None:
        """Right after ``req``'s prefill completes (cache slots [0, len)
        hold prompt k/v only): snapshot the chunk-aligned prompt prefix
        into the LRU prefix-cache entry, unless an existing entry already
        covers it."""
        ids = req.prompt_ids
        stored = min(
            (len(ids) // self.chunk) * self.chunk, self.prefix_len_max
        )
        if stored < self.chunk:
            return
        key = tuple(ids[:stored])
        for meta in self.prefix_meta:
            if meta is not None and meta[1] >= stored \
                    and meta[0][:stored] == key \
                    and meta[2] == req.adapter_id:
                return
        # Evict the least-recently-used entry (empty entries first).
        entry = min(
            range(self.prefix_entries),
            key=lambda e: (-1 if self.prefix_meta[e] is None
                           else self._prefix_use[e]),
        )
        self.prefix_pool = _store_prefix(
            self.prefix_pool, self.pool,
            jnp.int32(req.slot), jnp.int32(entry),
        )
        self._prefix_tick += 1
        self._prefix_use[entry] = self._prefix_tick
        self.prefix_meta[entry] = (key, stored, req.adapter_id)

    def _retire(self, slot: int) -> _Request:
        req = self.requests[slot]
        self.requests[slot] = None
        self.key_mask[slot] = 0
        self.key_mask[slot, 0] = 1
        self.temps[slot] = -1.0
        self.pres[slot] = 0.0
        self.freqs[slot] = 0.0
        self.want_lp[slot] = False
        self.g_masks[slot] = True
        self.adapter_rows[slot] = 0
        self._clear_bias(slot)
        self.requests_done += 1
        return req

    def _grammar_advance(self, req: _Request, tok: int) -> bool:
        """Advance a constrained row's parser on an emitted token and
        refresh its slot mask for the next dispatch. False means the
        parse died — impossible while masks are correct (the token was
        sampled FROM the mask), kept as a loud guard instead of a hang."""
        nstate = req.masker.advance(req.gstate, int(tok))
        if nstate < 0:
            logger.error(
                "grammar parse died on token %d (engine bug); "
                "finishing the row early", tok,
            )
            return False
        req.gstate = nstate
        self.g_masks[req.slot] = req.masker.mask_bool(nstate)
        return True

    def _mask_bits(self):
        """Packed (slots, ceil(V/8)) grammar bitmask for this dispatch,
        or None when no active row is constrained (None keeps the
        unconstrained executables — pytree-structure gating)."""
        if not any(
            r is not None and r.masker is not None for r in self.requests
        ):
            return None
        return jnp.asarray(
            np.packbits(self.g_masks, axis=1, bitorder="little")
        )

    # -- OpenAI logit_bias (device-resident per-slot rows) ---------------

    def _dense_bias_row(self, d: Dict) -> np.ndarray:
        row = np.zeros((self.cfg.vocab_size,), np.float32)
        for tid, val in (d or {}).items():
            if 0 <= int(tid) < self.cfg.vocab_size:
                row[int(tid)] = float(val)
        return row

    def _admit_bias(self, slot: int, req: _Request) -> None:
        if not req.logit_bias:
            return
        if self.bias is None:
            self.bias = jnp.zeros(
                (self.slots, self.cfg.vocab_size), jnp.float32
            )
        self.bias = _bias_row_set(
            self.bias, jnp.int32(slot),
            jnp.asarray(self._dense_bias_row(req.logit_bias)),
        )
        self._bias_slots.add(slot)

    def _clear_bias(self, slot: int) -> None:
        if slot in self._bias_slots:
            self.bias = _bias_row_set(
                self.bias, jnp.int32(slot),
                jnp.zeros((self.cfg.vocab_size,), jnp.float32),
            )
            self._bias_slots.discard(slot)

    def _bias_arg(self):
        """(slots, V) bias for this dispatch, or None when no live row
        is biased (None keeps the unbiased executables)."""
        return self.bias if self._bias_slots else None

    def _resolve(self, finished: List[_Request]) -> None:
        """Loop-thread only: hand results to the waiters."""
        for req in finished:
            if req.stream_q is not None:
                self._push_stream(req, final=True)
            if not req.future.done():
                lps = None
                if req.logprobs:
                    dec = self.dec.tokenizer.decode
                    lps = [
                        {
                            "id": tid,
                            "token": dec([tid]),
                            "logprob": lp,
                            "top": [
                                (j, dec([j]), v) for j, v in top
                            ],
                        }
                        for tid, lp, top in req.lps
                    ]
                req.future.set_result(
                    (self.dec.tokenizer.decode(req.tokens), req.finish,
                     lps)
                )

    def _step(self) -> List[_Request]:
        """One decode_step_rows dispatch for every active slot. Worker
        thread; returns the requests that finished this step."""
        # Drop rows whose streaming consumer disconnected before spending
        # another dispatch on them (not "finished": nobody is listening).
        for i, r in enumerate(self.requests):
            if r is not None and r.cancelled:
                self._retire(i)
        if self.chunk and any(
            r is not None and r.consumed < len(r.prompt_ids)
            for r in self.requests
        ):
            return self._step_chunked()
        active = [i for i, r in enumerate(self.requests) if r is not None]
        if not active:
            return []
        if self.spec_k:
            return self._step_spec(active)
        for i in active:
            self.key_mask[i, self.pos[i]] = 1
        emitting = np.zeros((self.slots,), np.int32)
        emitting[active] = 1
        want = bool(self.want_lp.any())
        res = _fused_decode_step(
            self._params(),
            self.pool,
            jnp.asarray(self.cur_tok),
            jnp.asarray(self.pos),
            jnp.asarray(self.key_mask),
            jnp.asarray(self.sem_pos),
            self.keys,
            jnp.asarray(self.temps),
            jnp.asarray(self.top_ps),
            self.counts,
            jnp.asarray(self.pres),
            jnp.asarray(self.freqs),
            jnp.asarray(emitting),
            self.cfg, self.top_k, want_lp=want,
            allowed_bits=self._mask_bits(), bias=self._bias_arg(),
        )
        nxt, self.pool, self.keys, self.counts = res[:4]
        lp = tv = ti = None
        if want:
            lp, tv, ti = (np.asarray(x) for x in res[4:])
        nxt = np.asarray(nxt)
        self.steps_run += 1
        finished: List[_Request] = []
        for i in active:
            self.pos[i] += 1
            self.sem_pos[i] += 1
            req = self.requests[i]
            tok = int(nxt[i])
            if tok == self.eos_id:
                finished.append(self._retire(i))
                continue
            req.tokens.append(tok)
            if req.logprobs:
                req.lps.append((
                    tok, float(lp[i]),
                    list(zip(ti[i].tolist(), tv[i].tolist())),
                ))
            self.cur_tok[i] = tok
            if len(req.tokens) >= req.max_new_tokens:
                req.finish = "length"
                finished.append(self._retire(i))
            elif req.masker is not None \
                    and not self._grammar_advance(req, tok):
                finished.append(self._retire(i))
        return finished

    def _step_spec(self, active: List[int]) -> List[_Request]:
        """One speculative pass for a decode-only batch (worker thread):
        every active row drafts ``spec_k`` tokens by prompt lookup and
        emits 1..K+1 verified tokens in a single dispatch. Greedy rows
        reproduce the sequential greedy tokens exactly; sampled rows are
        distribution-identical with per-row key streams."""
        want = bool(self.want_lp.any())
        bits = self._mask_bits()
        g_rows = None
        if bits is not None:
            g_rows = jnp.asarray(np.array([
                r is not None and r.masker is not None
                for r in self.requests
            ]))
        res = _spec_step_rows(
            self._params(), self.pool, jnp.asarray(self.seq),
            jnp.asarray(self.cur_tok), jnp.asarray(self.prev_tok),
            jnp.asarray(self.pos), jnp.asarray(self.key_mask),
            jnp.asarray(self.sem_pos), self.keys,
            jnp.asarray(self.temps), jnp.asarray(self.top_ps),
            self.counts, jnp.asarray(self.pres), jnp.asarray(self.freqs),
            self.cfg, self.top_k, self.spec_k,
            lp_rows=jnp.asarray(self.want_lp), want_lp=want,
            allowed_bits=bits, grammar_rows=g_rows,
            bias=self._bias_arg(),
        )
        emit, n_emit, self.pool, self.keys, self.counts = res[:5]
        lp = tv = ti = None
        if want:
            lp, tv, ti = (np.asarray(x) for x in res[5:])
        emit, n_emit = np.asarray(emit), np.asarray(n_emit)
        self.steps_run += 1
        self.spec_passes += 1
        self.spec_row_passes += len(active)
        finished: List[_Request] = []
        for i in active:
            req = self.requests[i]
            p0 = int(self.pos[i])
            toks: List[int] = []
            fin: Optional[str] = None
            for t in emit[i, : int(n_emit[i])].tolist():
                if t == self.eos_id:
                    fin = "stop"
                    break
                toks.append(int(t))
                if len(req.tokens) + len(toks) >= req.max_new_tokens:
                    fin = "length"
                    break
            if req.logprobs and toks:
                # lp rows are forced single-emission, so the one kept
                # token is position 0 — the only position the lp arrays
                # describe.
                req.lps.append((
                    toks[0], float(lp[i]),
                    list(zip(ti[i].tolist(), tv[i].tolist())),
                ))
            req.tokens.extend(toks)
            self.spec_emitted += len(toks)
            n = len(toks)
            if fin is None and req.masker is not None:
                # Constrained rows are forced single-emission, so toks
                # has <= 1 entry; advance the parser on it.
                for t in toks:
                    if not self._grammar_advance(req, t):
                        fin = "stop"
                        break
            if fin is not None:
                req.finish = fin
                finished.append(self._retire(i))
                continue
            # KV chunk slots [p0, p0+n) hold cur + the accepted drafts;
            # the LAST kept token is the next cur — its slot (p0+n)
            # stays unmarked and is recomputed next pass.
            self.key_mask[i, p0:p0 + n] = 1
            self.seq[i, p0 + 1:p0 + 1 + n] = toks
            self.pos[i] = p0 + n
            self.sem_pos[i] += n
            self.prev_tok[i] = toks[-2] if n >= 2 else self.cur_tok[i]
            self.cur_tok[i] = toks[-1]
        return finished

    def _step_chunked(self) -> List[_Request]:
        """One fused chunked-prefill + decode pass (worker thread): every
        mid-prefill row consumes its next C prompt tokens, every decoding
        row advances one token, in a single (slots, C) dispatch. Returns
        the requests that finished."""
        C = self.chunk
        tokens = np.zeros((self.slots, C), np.int32)
        # Idle rows write their (masked) garbage chunk at scratch slots
        # [1, 1 + C) — slot 0 is their anti-NaN attendable key.
        pos0 = np.ones((self.slots,), np.int32)
        positions0 = np.zeros((self.slots,), np.int32)
        gather = np.zeros((self.slots,), np.int32)
        emitting = np.zeros((self.slots,), np.int32)
        chunk_lens: Dict[int, int] = {}
        decoding: List[int] = []
        for i, req in enumerate(self.requests):
            if req is None:
                continue
            ids = req.prompt_ids
            if req.consumed < len(ids):
                part = ids[req.consumed:req.consumed + C]
                tokens[i, :len(part)] = part
                pos0[i] = req.consumed
                positions0[i] = req.consumed
                chunk_lens[i] = len(part)
                if req.consumed + len(part) == len(ids):
                    gather[i] = len(part) - 1  # first-token logits row
                    emitting[i] = 1
            else:
                tokens[i, 0] = self.cur_tok[i]
                pos0[i] = self.pos[i]
                positions0[i] = self.sem_pos[i]
                decoding.append(i)
                emitting[i] = 1
        want = bool(self.want_lp.any())
        res = _fused_chunk_step(
            self._params(), self.pool, jnp.asarray(tokens),
            jnp.asarray(pos0), jnp.asarray(self.key_mask),
            jnp.asarray(positions0), jnp.asarray(gather), self.keys,
            jnp.asarray(self.temps), jnp.asarray(self.top_ps),
            self.counts, jnp.asarray(self.pres), jnp.asarray(self.freqs),
            jnp.asarray(emitting), self.cfg, self.top_k, want_lp=want,
            allowed_bits=self._mask_bits(), bias=self._bias_arg(),
        )
        nxt, self.pool, self.keys, self.counts = res[:4]
        lp = tv = ti = None
        if want:
            lp, tv, ti = (np.asarray(x) for x in res[4:])

        def lp_entry(i, tok):
            if self.requests[i] is not None and self.requests[i].logprobs:
                self.requests[i].lps.append((
                    tok, float(lp[i]),
                    list(zip(ti[i].tolist(), tv[i].tolist())),
                ))

        nxt = np.asarray(nxt)
        self.steps_run += 1
        self.chunk_passes += 1
        finished: List[_Request] = []
        for i, req in list(enumerate(self.requests)):
            if req is None:
                continue
            if i in chunk_lens:
                n = chunk_lens[i]
                self.key_mask[i, req.consumed:req.consumed + n] = 1
                req.consumed += n
                if req.consumed < len(req.prompt_ids):
                    continue  # more prompt to go; no token yet
                if self.prefix_entries > 0:
                    self._maybe_store_prefix(req)
                self.pos[i] = req.consumed
                self.sem_pos[i] = req.consumed
                tok = int(nxt[i])
                if tok == self.eos_id or req.max_new_tokens <= 1:
                    if tok != self.eos_id:
                        req.tokens.append(tok)
                        lp_entry(i, tok)
                        req.finish = "length"
                    finished.append(self._retire(i))
                    continue
                req.tokens.append(tok)
                lp_entry(i, tok)
                self.cur_tok[i] = tok
                self.seq[i, req.consumed] = tok  # cur at its slot
                if req.masker is not None \
                        and not self._grammar_advance(req, tok):
                    finished.append(self._retire(i))
            elif i in decoding:
                # Same bookkeeping as the plain decode step: the token's
                # k/v landed at slot pos this pass — mark it attendable
                # for the NEXT step, then advance.
                self.key_mask[i, self.pos[i]] = 1
                self.pos[i] += 1
                self.sem_pos[i] += 1
                tok = int(nxt[i])
                if tok == self.eos_id:
                    finished.append(self._retire(i))
                    continue
                req.tokens.append(tok)
                lp_entry(i, tok)
                self.prev_tok[i] = self.cur_tok[i]
                self.cur_tok[i] = tok
                self.seq[i, self.pos[i]] = tok  # new cur at new slot
                if len(req.tokens) >= req.max_new_tokens:
                    req.finish = "length"
                    finished.append(self._retire(i))
                elif req.masker is not None \
                        and not self._grammar_advance(req, tok):
                    finished.append(self._retire(i))
        return finished

    def _fail_all(self, exc: BaseException) -> None:
        """Loop-thread only: fail every in-flight and pending waiter, then
        reset slot state so the loop can keep serving new requests."""
        for i, req in enumerate(self.requests):
            if req is not None:
                if req.stream_q is not None:
                    req.stream_q.put_nowait(exc)
                if not req.future.done():
                    req.future.set_exception(exc)
            self.requests[i] = None
        while not self.pending.empty():
            req = self.pending.get_nowait()
            if req.stream_q is not None:
                req.stream_q.put_nowait(exc)
            if not req.future.done():
                req.future.set_exception(exc)
        self.key_mask[:] = 0
        self.key_mask[:, 0] = 1
        self.temps[:] = -1.0
        self.pres[:] = 0.0
        self.freqs[:] = 0.0
        self.want_lp[:] = False
        self.g_masks[:] = True
        self.adapter_rows[:] = 0
        self.bias = None
        self._bias_slots.clear()

    async def _admit_safe(self, req: _Request) -> None:
        """Admit ``req`` into the first free slot, failing ITS waiter on a
        prefill error — at that moment the request is registered nowhere
        (neither ``self.requests`` nor ``pending``), so the generic
        ``_fail_all`` in the loop would miss it and hang its caller."""
        if req.cancelled:
            if not req.future.done():
                req.future.set_result(("", "stop", None))
            return
        try:
            self._resolve(
                await asyncio.to_thread(
                    self._admit, req, self._free_slots()[0]
                )
            )
        except Exception as e:
            if req.stream_q is not None:
                req.stream_q.put_nowait(e)
            if not req.future.done():
                req.future.set_exception(e)
            raise

    async def _run(self) -> None:
        while True:
            try:
                # Admit as many pending requests as there are free slots;
                # if fully idle, park until a request arrives.
                if (
                    all(r is None for r in self.requests)
                    and self.pending.empty()
                ):
                    await self._admit_safe(await self.pending.get())
                while not self.pending.empty() and self._free_slots():
                    await self._admit_safe(self.pending.get_nowait())
                self._resolve(await asyncio.to_thread(self._step))
                self._flush_streams()
                await asyncio.sleep(0)  # yield to submitters
            except asyncio.CancelledError:
                raise
            except Exception as e:  # noqa: BLE001 — fail waiters, keep serving
                logger.exception("decode loop error; failing in-flight requests")
                self._fail_all(e)

    def get_stats(self) -> Dict:
        stats = {
            "slots": self.slots,
            "active": sum(r is not None for r in self.requests),
            "pending": self.pending.qsize(),
            "steps_run": self.steps_run,
            "requests_done": self.requests_done,
        }
        if self.chunk:
            stats["chunk_tokens"] = self.chunk
            stats["chunk_passes"] = self.chunk_passes
        if self.spec_k:
            stats["spec_k"] = self.spec_k
            stats["spec_passes"] = self.spec_passes
            stats["spec_row_passes"] = self.spec_row_passes
            stats["spec_tokens_emitted"] = self.spec_emitted
        if self.prefix_entries > 0:
            stats["prefix_cache_entries"] = sum(
                m is not None for m in self.prefix_meta
            )
            stats["prefix_cache_hits"] = self.prefix_hits
            stats["prefix_tokens_reused"] = self.prefix_tokens_reused
        return stats
