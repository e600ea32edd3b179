"""Train a small byte-level decoder on the repo's own documents.

Every quality-flavored number in earlier rounds rode a random-init
model (VERDICT r4 #4): speculative acceptance measured 1.0 because a
greedy random-init decoder loops and the n-gram drafter predicts loops
perfectly; grammar tests proved structure but not sense; e2e answer
quality was unmeasurable. This tool produces the missing artifact — a
REAL trained checkpoint, small enough to train in ~a minute on one
chip, big enough (~11M params) for non-degenerate continuations — so
those numbers can be measured honestly (bench.py `bench_spec_trained`,
tests/test_tiny_train.py).

Design (TPU-first, same shape as the serving stack it feeds):

* full-parameter next-token CE on the stacked-scan decoder forward
  (`models/decoder.causal_lm_logits`) — the exact forward serving runs,
  so the trained weights drop straight into `TextDecoder`/`DecodeServer`
  with zero conversion;
* byte-level `ByteTokenizer` vocabulary (259 ids, padded to 384 = 3×128
  lanes for the MXU) — hermetic, no external tokenizer asset;
* one jitted, donated train step; params f32, forward bf16
  (`cfg.compute_dtype`), adamw + cosine schedule, global-norm clip;
* deterministic: seeded init, seeded window sampling, corpus = the
  repo's committed markdown + sample document, so `--steps N --seed S`
  reproduces the checkpoint bit-for-bit on the same backend. The
  checkpoint is NOT committed (≈45 MB of f32 npz); this recipe is the
  committed artifact.

The corpus is ~110 KB of technical prose; 400 steps × 16×512 bytes ≈
30 epochs, i.e. the model substantially memorizes its corpus. That is
the POINT for the speculative-acceptance measurement: a RAG answerer
quotes retrieved context (the reference pastes context above the
question — /root/reference/app/server/api.py:370-375), and a model
that can quote its corpus exercises the prompt-lookup drafter exactly
the way a production quoting model does. bench_spec_trained reports
the quoting number AND a shuffled-novel-prompt lower bound.

Reference point: the reference has no training path at all (models
arrive via Ollama/OpenAI HTTP, SURVEY.md §2.4); this is in-sourced
capability, like `training.py` (contrastive encoder) and
`models/lora_train.py` (LoRA finetune) before it.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    causal_lm_logits,
    init_params,
)
from multimodal_rag_tpu.models.tokenizer import ByteTokenizer

__all__ = [
    "TINY_LM_CFG",
    "build_corpus",
    "lm_loss_full",
    "make_train_step",
    "train_tiny_lm",
    "save_tiny_lm",
    "load_tiny_lm",
    "train_or_load",
]

#: ~11M params: 6 layers, d=384, GQA 6q/2kv, SwiGLU 3d. Vocab padded
#: from the byte tokenizer's 259 to 384 (MXU lane multiple); the pad
#: rows train toward -inf priors and are never sampled greedy.
TINY_LM_CFG = DecoderConfig(
    vocab_size=384,
    hidden_dim=384,
    num_layers=6,
    num_heads=6,
    num_kv_heads=2,
    head_dim=64,
    ff_dim=1152,
    max_position=2048,
    tie_embeddings=True,
)

#: Committed text the tiny LM trains on (repo-root relative). Stable,
#: versioned with the recipe — retraining after a docs edit yields a
#: slightly different checkpoint, which is fine: every consumer
#: measures, none asserts exact weights.
CORPUS_FILES = (
    "data/sample_document.txt",
    "README.md",
    "SURVEY.md",
    "DEPLOYMENT.md",
    "PARITY.md",
    "BASELINE.md",
)


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def build_corpus(root: Optional[str] = None) -> bytes:
    """UTF-8 byte stream of the committed corpus files (missing files
    skipped — the tool also runs from an installed package where only
    the sample document ships)."""
    root = root or _repo_root()
    parts = []
    for rel in CORPUS_FILES:
        path = os.path.join(root, rel)
        if os.path.exists(path):
            with open(path, "rb") as f:
                parts.append(f.read())
    if not parts:
        raise FileNotFoundError(
            f"no corpus files found under {root} ({CORPUS_FILES})"
        )
    return b"\n\n".join(parts)


def lm_loss_full(
    params: Dict, ids: jax.Array, mask: jax.Array, cfg: DecoderConfig
) -> jax.Array:
    """Mean next-token cross-entropy over real positions (the full-param
    twin of `models/lora_train.lm_loss`, which differentiates only the
    LoRA leaves)."""
    logits = causal_lm_logits(params, ids, mask, cfg)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    w = (mask[:, :-1] * mask[:, 1:]).astype(jnp.float32)
    return -(picked * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_train_step(cfg: DecoderConfig, optimizer):
    """Jitted `(params, opt_state, ids, mask) -> (params, opt_state,
    loss)`; params/opt_state donated so the update runs in place. Built
    ONCE per run — a per-step closure would retrace."""
    import optax

    @partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, ids, mask):
        loss, grads = jax.value_and_grad(lm_loss_full)(params, ids, mask, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


#: Framing for the extractive-quoting task (see _quote_row). The same
#: framing is what bench_spec_trained / tests prompt with.
QUOTE_SEP = "\n\nQuote: "


def _quote_row(data: np.ndarray, rng, seq_len: int, tok) -> np.ndarray:
    """One extractive-quoting training row:

        [BOS] context ++ "\\n\\nQuote: " ++ head ++ continuation

    where ``head ++ continuation`` is a verbatim span from INSIDE the
    context. This is the RAG hot behavior — answers quote retrieved
    context (the reference pastes context above the question,
    /root/reference/app/server/api.py:370-375) — and it is exactly what
    prompt-lookup speculation drafts. A plain-LM-only model fails at it:
    repeated text never occurs in the corpus, so copying from earlier
    context (induction) is out-of-distribution (measured: 11/96 bytes
    correct vs 88/96 for fresh continuations). Mixing this task in
    teaches the copy head the honest way — the acceptance number then
    measures a model that CAN quote, not an artifact."""
    sep = np.asarray(tok.encode(QUOTE_SEP)[1:], np.int32)  # drop BOS
    ctx_len = (seq_len * 5) // 8
    head_len = 32
    room = seq_len - 1 - ctx_len - len(sep) - head_len
    s = int(rng.integers(0, len(data) - ctx_len))
    ctx = data[s:s + ctx_len]
    p = int(rng.integers(16, ctx_len - head_len - room - 1))
    quoted = ctx[p:p + head_len + room]
    return np.concatenate((
        [tok.bos_id], ctx, sep, quoted
    )).astype(np.int32)


def _window_batches(
    corpus: bytes,
    seq_len: int,
    batch: int,
    steps: int,
    seed: int,
    quote_frac: float = 0.5,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Seeded fixed-length training rows: plain random windows over the
    byte stream mixed with extractive-quoting rows (``quote_frac`` of
    the batch, see :func:`_quote_row`); ids offset by the tokenizer id
    offset, BOS-prefixed. Fixed (batch, seq_len) shapes: one executable
    for the whole run."""
    tok = ByteTokenizer()
    data = np.frombuffer(corpus, np.uint8).astype(np.int32) + tok._OFFSET
    rng = np.random.default_rng(seed)
    span = seq_len - 1  # room for BOS
    mask = np.ones((batch, seq_len), np.int32)
    n_quote = int(round(batch * quote_frac))
    for _ in range(steps):
        rows = [_quote_row(data, rng, seq_len, tok) for _ in range(n_quote)]
        starts = rng.integers(0, len(data) - span, size=batch - n_quote)
        rows += [
            np.concatenate(([tok.bos_id], data[s:s + span])).astype(np.int32)
            for s in starts
        ]
        yield np.stack(rows), mask


def train_tiny_lm(
    cfg: DecoderConfig = TINY_LM_CFG,
    steps: int = 400,
    batch: int = 16,
    seq_len: int = 512,
    lr: float = 3e-4,
    warmup: int = 20,
    seed: int = 0,
    corpus: Optional[bytes] = None,
    log_every: int = 50,
    quote_frac: float = 0.5,
) -> Tuple[Dict, Dict]:
    """Train from scratch; returns (params, meta). meta records the
    recipe + first/final loss so the checkpoint is self-describing."""
    import optax

    corpus = corpus if corpus is not None else build_corpus()
    params = init_params(jax.random.key(seed), cfg)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(steps, warmup + 1)
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=0.01),
    )
    opt_state = optimizer.init(params)
    step_fn = make_train_step(cfg, optimizer)
    t0 = time.time()
    first_loss = final_loss = None
    for i, (ids, mask) in enumerate(
        _window_batches(corpus, seq_len, batch, steps, seed, quote_frac)
    ):
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(ids), jnp.asarray(mask)
        )
        if i == 0:
            first_loss = float(loss)
        if log_every and (i % log_every == 0 or i == steps - 1):
            final_loss = float(loss)  # sync point only when logging
            # stderr: bench.py embeds this trainer and its stdout is
            # reserved for the single JSON result line.
            print(
                f"step {i:4d}  loss {final_loss:.4f}  "
                f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True,
            )
    if final_loss is None:
        final_loss = float(loss)
    meta = {
        "steps": steps, "batch": batch, "seq_len": seq_len, "lr": lr,
        "warmup": warmup, "seed": seed, "quote_frac": quote_frac,
        "corpus_bytes": len(corpus),
        "first_loss": round(first_loss, 4),
        "final_loss": round(final_loss, 4),
        "train_wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    return params, meta


# ---------------------------------------------------------------------------
# Checkpoint format: flat npz (dict-path keys) + config.json + meta.json.
# Framework-native — loads with zero conversion into TextDecoder(params=...).
# ---------------------------------------------------------------------------


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_tiny_lm(path: str, params: Dict, cfg: DecoderConfig,
                 meta: Optional[Dict] = None) -> str:
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "params.npz"), **_flatten(params))
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["compute_dtype"] = jnp.dtype(cfg.compute_dtype).name
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2)
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    return path


def load_tiny_lm(path: str) -> Tuple[Dict, DecoderConfig, Dict]:
    """(params, cfg, meta) from a `save_tiny_lm` directory."""
    with open(os.path.join(path, "config.json")) as f:
        cfg_dict = json.load(f)
    cfg_dict["compute_dtype"] = jnp.dtype(cfg_dict["compute_dtype"])
    for k in ("rope_factors", "layer_windows"):
        if cfg_dict.get(k) is not None:
            cfg_dict[k] = tuple(cfg_dict[k])
    cfg = DecoderConfig(**cfg_dict)
    with np.load(os.path.join(path, "params.npz")) as z:
        params = _unflatten({k: z[k] for k in z.files})
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, cfg, meta


def train_or_load(
    path: Optional[str] = None, **train_kw
) -> Tuple[Dict, DecoderConfig, Dict]:
    """Load the checkpoint at `path` (default: $MMRAG_TINY_LM_DIR, else
    <repo>/runtime/tiny_lm), training + saving it first if absent —
    bench.py's entry point: ~1 min cold on one chip, instant warm."""
    path = path or os.environ.get(
        "MMRAG_TINY_LM_DIR",
        os.path.join(_repo_root(), "runtime", "tiny_lm"),
    )
    if os.path.exists(os.path.join(path, "params.npz")):
        return load_tiny_lm(path)
    params, meta = train_tiny_lm(**train_kw)
    save_tiny_lm(path, params, TINY_LM_CFG, meta)
    return params, TINY_LM_CFG, meta


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=None, help="checkpoint directory")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--force", action="store_true",
                    help="retrain even if a checkpoint exists")
    args = ap.parse_args()

    from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    out = args.out or os.environ.get(
        "MMRAG_TINY_LM_DIR",
        os.path.join(_repo_root(), "runtime", "tiny_lm"),
    )
    if args.force and os.path.exists(os.path.join(out, "params.npz")):
        os.remove(os.path.join(out, "params.npz"))
    params, cfg, meta = train_or_load(
        out, steps=args.steps, batch=args.batch,
        seq_len=args.seq_len, lr=args.lr, seed=args.seed,
    )
    print(json.dumps({"checkpoint": out, **meta}))


if __name__ == "__main__":
    main()
