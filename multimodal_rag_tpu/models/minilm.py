"""MiniLM-class text encoder, TPU-first.

Replaces the reference's sentence-transformers/torch embedding stage
(``app/utils/embedder.py:17-18, 245-248, 385-403``) with a pure-JAX
BERT-family encoder designed for the MXU:

* All parameters are stored as a pytree; per-layer weights are **stacked on a
  leading layer axis** and the encoder body is a single ``lax.scan`` — one
  traced layer regardless of depth, fast compiles, and clean ``pjit``
  sharding of the stacked weights.
* Matmuls run in ``bfloat16`` with ``preferred_element_type=float32``
  accumulation; layernorm / softmax statistics stay in float32.
* Static shapes only: inputs are padded to (batch, seq) buckets chosen by
  ``bucket_for`` so XLA compiles a handful of shapes once each.
* Mean pooling + L2 normalization exactly mirror the reference contract
  (``embedder.py:397-403``): cosine similarity == dot product downstream.

Real all-MiniLM-L6-v2 weights load from a local safetensors checkpoint via
``load_hf_bert_params`` (HF BERT naming); with no checkpoint available the
encoder runs with seeded deterministic initialization — identical compute
graph, shapes, and FLOPs, which is what the perf path needs.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def find_local_checkpoint(
    hint: str, env_var: Optional[str] = None
) -> Optional[str]:
    """Locate a safetensors checkpoint without touching the network (same
    posture as ``tokenizer.find_local_tokenizer``): explicit env path wins,
    else scan the HF hub cache for a ``model.safetensors`` whose path
    contains ``hint``."""
    if env_var:
        cand = os.environ.get(env_var)
        if cand and os.path.exists(cand):
            return cand
    hub = os.path.expanduser("~/.cache/huggingface/hub")
    if os.path.isdir(hub):
        for root, _dirs, files in os.walk(hub):
            if hint in root:
                for name in files:
                    if name.endswith(".safetensors"):
                        return os.path.join(root, name)
    return None


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden_dim: int = 384
    num_layers: int = 6
    num_heads: int = 12
    ff_dim: int = 1536
    max_position: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12
    compute_dtype: Any = jnp.bfloat16
    # Use the VMEM-fused attention Pallas kernel (ops/fused_attention.py)
    # instead of the einsum chain. On TPU this removes the (B, nh, S, S)
    # logits/probs HBM round-trip, which otherwise dominates at ingest
    # batch sizes (measured: 14k -> 20k+ chunks/s at B=2048).
    fused_attention: bool = True
    # GELU flavor. HF BERT uses the exact erf form, but the TPU VPU has no
    # fast erf — measured 3.7 ms of an 11.7 ms B=256 forward (a full third)
    # goes to the erf polynomial, while tanh has a hardware approximation.
    # "tanh" costs ~0.4 ms and changes the final unit-norm embeddings by
    # cosine < 1e-5 vs exact (tests/test_minilm.py::test_gelu_tanh_cosine),
    # far below retrieval significance. Golden HF-parity tests pin "exact".
    gelu: str = "tanh"  # tanh | exact
    # Sentence pooling: "mean" (MiniLM/E5/GTE) or "cls" (BGE). Family
    # conventions live in models/encoder_families.py; checkpoints shipping
    # a sentence-transformers 1_Pooling/config.json override the family.
    pooling: str = "mean"  # mean | cls

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads


MINILM_L6 = EncoderConfig()


def bucket_for(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n, else the largest bucket."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_to_buckets(
    ids: np.ndarray,
    mask: np.ndarray,
    n: int,
    seq_buckets: Sequence[int],
    batch_buckets: Sequence[int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad ``n`` tokenized rows to the smallest (batch_bucket, seq_bucket)
    that fits — the shared fixed-shape recipe of the rerankers
    (cross_encoder.score, late_interaction.score). ``n`` must not exceed
    the largest batch bucket; callers chunk oversized batches (bucket_for
    CLAMPS to the largest bucket, it does not grow)."""
    bb = bucket_for(n, batch_buckets)
    if n > bb:
        raise ValueError(
            f"batch of {n} exceeds the largest batch bucket {bb}; "
            "chunk the inputs"
        )
    longest = int(mask[:n].sum(axis=1).max())
    sb = bucket_for(longest, seq_buckets)
    ids_p = np.zeros((bb, sb), np.uint32)
    mask_p = np.zeros((bb, sb), np.int32)
    ids_p[:n] = ids[:n, :sb]
    mask_p[:n] = mask[:n, :sb]
    return ids_p, mask_p


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: EncoderConfig = MINILM_L6) -> Dict:
    """Deterministic truncated-normal init (std 0.02, BERT convention).

    Per-layer tensors carry a leading ``num_layers`` axis for lax.scan.
    """
    keys = jax.random.split(rng, 16)
    h, f, L = cfg.hidden_dim, cfg.ff_dim, cfg.num_layers

    def tn(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2.0, 2.0, shape) * std).astype(
            jnp.float32
        )

    return {
        "embed": {
            "word": tn(keys[0], (cfg.vocab_size, h)),
            "position": tn(keys[1], (cfg.max_position, h)),
            "type": tn(keys[2], (cfg.type_vocab, h)),
            "ln_scale": jnp.ones((h,), jnp.float32),
            "ln_bias": jnp.zeros((h,), jnp.float32),
        },
        "layers": {
            "wq": tn(keys[3], (L, h, h)),
            "bq": jnp.zeros((L, h), jnp.float32),
            "wk": tn(keys[4], (L, h, h)),
            "bk": jnp.zeros((L, h), jnp.float32),
            "wv": tn(keys[5], (L, h, h)),
            "bv": jnp.zeros((L, h), jnp.float32),
            "wo": tn(keys[6], (L, h, h)),
            "bo": jnp.zeros((L, h), jnp.float32),
            "ln1_scale": jnp.ones((L, h), jnp.float32),
            "ln1_bias": jnp.zeros((L, h), jnp.float32),
            "w1": tn(keys[7], (L, h, f)),
            "b1": jnp.zeros((L, f), jnp.float32),
            "w2": tn(keys[8], (L, f, h)),
            "b2": jnp.zeros((L, h), jnp.float32),
            "ln2_scale": jnp.ones((L, h), jnp.float32),
            "ln2_bias": jnp.zeros((L, h), jnp.float32),
        },
    }


def load_hf_bert_params(path: str, cfg: EncoderConfig = MINILM_L6) -> Dict:
    """Load a HF BERT-family safetensors checkpoint (e.g. the file inside a
    sentence-transformers/all-MiniLM-L6-v2 snapshot) into the stacked pytree.

    Accepts either a .safetensors file or a directory containing one.
    """
    import os

    from safetensors import safe_open

    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.endswith(".safetensors"):
                path = os.path.join(path, name)
                break

    tensors: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            tensors[key.removeprefix("bert.")] = f.get_tensor(key)

    def t(name):
        return jnp.asarray(tensors[name], jnp.float32)

    def stacked(fmt, transpose=False):
        mats = [np.asarray(tensors[fmt.format(i)]) for i in range(cfg.num_layers)]
        arr = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(arr, jnp.float32)

    # HF Linear stores (out, in); our matmuls use (in, out) → transpose.
    p = "encoder.layer.{}."
    return {
        "embed": {
            "word": t("embeddings.word_embeddings.weight"),
            "position": t("embeddings.position_embeddings.weight"),
            "type": t("embeddings.token_type_embeddings.weight"),
            "ln_scale": t("embeddings.LayerNorm.weight"),
            "ln_bias": t("embeddings.LayerNorm.bias"),
        },
        "layers": {
            "wq": stacked(p + "attention.self.query.weight", True),
            "bq": stacked(p + "attention.self.query.bias"),
            "wk": stacked(p + "attention.self.key.weight", True),
            "bk": stacked(p + "attention.self.key.bias"),
            "wv": stacked(p + "attention.self.value.weight", True),
            "bv": stacked(p + "attention.self.value.bias"),
            "wo": stacked(p + "attention.output.dense.weight", True),
            "bo": stacked(p + "attention.output.dense.bias"),
            "ln1_scale": stacked(p + "attention.output.LayerNorm.weight"),
            "ln1_bias": stacked(p + "attention.output.LayerNorm.bias"),
            "w1": stacked(p + "intermediate.dense.weight", True),
            "b1": stacked(p + "intermediate.dense.bias"),
            "w2": stacked(p + "output.dense.weight", True),
            "b2": stacked(p + "output.dense.bias"),
            "ln2_scale": stacked(p + "output.LayerNorm.weight"),
            "ln2_bias": stacked(p + "output.LayerNorm.bias"),
        },
    }


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def quantize_params(params: Dict) -> Dict:
    """Per-output-channel symmetric int8 quantization of the six matmul
    weights per layer (wq/wk/wv/wo/w1/w2). Embeddings and layernorms stay
    float32; biases stay float32.

    With per-token dynamic activation quantization (see ``_qdot``) the
    embedding cosine vs the bf16 path stays >0.9999 (measured on v5e).
    NOTE measured END-TO-END SLOWER for MiniLM-L6 on v5e (17.7k vs 21.6k
    chunks/s at B=256): at these small dims the per-token absmax/round/
    dequant VPU passes cost more than the int8 MXU rate gains. The path
    exists for (a) halving weight HBM for larger encoder families where
    weights dominate, and (b) backends where XLA fuses the quant chain.
    Returns a params pytree in which each quantized weight ``w`` is
    replaced by ``w_q`` (int8) + ``w_s`` (f32 per-channel scale); the
    float weight is dropped."""
    layers = dict(params["layers"])
    out_layers: Dict[str, jax.Array] = {}
    for name, w in layers.items():
        if name.startswith("w") and w.ndim == 3:  # (L, in, out)
            absmax = jnp.max(jnp.abs(w), axis=1, keepdims=True)  # (L,1,out)
            scale = jnp.maximum(absmax, 1e-8) / 127.0
            w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            out_layers[name + "_q"] = w_q
            out_layers[name + "_s"] = scale.astype(jnp.float32)
        else:
            out_layers[name] = w
    return {"embed": params["embed"], "layers": out_layers}


def _qdot(x: jax.Array, w_q: jax.Array, w_s: jax.Array) -> jax.Array:
    """int8 x int8 matmul with f32 dequant: x (B, in) any float dtype,
    w_q (in, out) int8, w_s (1, out) f32. Per-token dynamic activation
    scales keep the quantization error bounded row-wise."""
    x32 = x.astype(jnp.float32)
    x_max = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)  # (B, 1)
    x_s = jnp.maximum(x_max, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x32 / x_s), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * x_s * w_s


def _layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _layer(x, key_bias, lp, cfg: EncoderConfig):
    """One post-LN transformer block. x: (B,S,H) compute-dtype;
    key_bias: (B,S) f32 additive bias on key positions (0 real / -1e9 pad).

    Accepts either float weights (``wq``...) or int8-quantized weights
    (``wq_q``/``wq_s``, from :func:`quantize_params`) — the six matmuls
    then run on the int8 MXU path (2x the bf16 rate on v5e); attention
    internals stay in the compute dtype either way."""
    cd = cfg.compute_dtype
    B, S, H = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    sm_scale = float(1.0 / np.sqrt(hd))
    quantized = "wq_q" in lp
    x2d = x.reshape(B * S, H)

    def matmul(inp2d, name):
        if quantized:
            return _qdot(inp2d, lp[name + "_q"], lp[name + "_s"][0])
        return jnp.dot(
            inp2d.astype(cd), lp[name].astype(cd),
            preferred_element_type=jnp.float32,
        )

    def proj(name, bias):
        return (matmul(x2d, name) + bias).astype(cd)

    # Keep q/k/v in the projection-native (B*S, H) lane layout — the fused
    # kernel slices heads in VMEM, so no HBM transpose ever happens.
    q = proj("wq", lp["bq"])
    k = proj("wk", lp["bk"])
    v = proj("wv", lp["bv"])

    from multimodal_rag_tpu.ops import fused_attention as fa

    if cfg.fused_attention and fa.fused_attention_supported(B, S, hd):
        ctx = fa.fused_attention_ad(q, k, v, key_bias, sm_scale, nh, S)
    else:
        ctx = fa.attention_xla(
            q, k, v, key_bias, sm_scale, num_heads=nh, seq_len=S
        )
    ctx = ctx.astype(cd)

    attn_out = matmul(ctx, "wo") + lp["bo"]
    x2d = _layernorm(
        x2d.astype(jnp.float32) + attn_out, lp["ln1_scale"], lp["ln1_bias"],
        cfg.ln_eps,
    ).astype(cd)

    h1 = matmul(x2d, "w1") + lp["b1"]
    h1 = jax.nn.gelu(h1, approximate=(cfg.gelu == "tanh")).astype(cd)
    h2 = matmul(h1, "w2") + lp["b2"]
    x2d = _layernorm(
        x2d.astype(jnp.float32) + h2, lp["ln2_scale"], lp["ln2_bias"],
        cfg.ln_eps,
    ).astype(cd)
    return x2d.reshape(B, S, H)


def encoder_forward(
    params: Dict, ids: jax.Array, mask: jax.Array, cfg: EncoderConfig = MINILM_L6
) -> jax.Array:
    """Token ids (B,S) + mask (B,S) → hidden states (B,S,H) float32."""
    B, S = ids.shape
    emb = params["embed"]
    x = (
        emb["word"][ids]
        + emb["position"][:S][None, :, :]
        + emb["type"][0][None, None, :]
    )
    x = _layernorm(x, emb["ln_scale"], emb["ln_bias"], cfg.ln_eps)
    x = x.astype(cfg.compute_dtype)

    # Additive attention bias: 0 for real tokens, -inf-ish for padding.
    key_bias = (1.0 - mask.astype(jnp.float32)) * -1e9

    def body(carry, lp):
        return _layer(carry, key_bias, lp, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x.astype(jnp.float32)


def embed(
    params: Dict, ids: jax.Array, mask: jax.Array, cfg: EncoderConfig = MINILM_L6
) -> jax.Array:
    """Sentence embeddings: pooled + L2 normalized (reference
    ``embedder.py:397-403`` contract: unit-norm vectors, cosine == dot).

    ``cfg.pooling`` picks masked mean pooling (MiniLM/E5/GTE) or the CLS
    token (BGE — position 0 is [CLS] in every supported tokenizer)."""
    hidden = encoder_forward(params, ids, mask, cfg)
    if cfg.pooling == "cls":
        pooled = hidden[:, 0, :]
    else:
        m = mask.astype(jnp.float32)[:, :, None]
        pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1e-9
        )
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# Convenience host-facing encoder with shape bucketing
# ---------------------------------------------------------------------------


class TextEncoder:
    """Tokenize → bucket-pad → jitted TPU forward → np.ndarray embeddings.

    One compiled executable per (batch_bucket, seq_bucket) pair; real rows
    are sliced back out after the fixed-shape forward.
    """

    def __init__(
        self,
        params: Dict | None = None,
        tokenizer=None,
        cfg: EncoderConfig = MINILM_L6,
        seq_buckets: Sequence[int] = (32, 64, 128, 256),
        batch_buckets: Sequence[int] = (8, 32, 128, 256),
        seed: int = 0,
        quantize: bool = False,
        checkpoint_path: str | None = None,
    ) -> None:
        from multimodal_rag_tpu.models.tokenizer import (
            get_tokenizer,
            tokenizer_from_dir,
        )

        self.cfg = cfg
        self.pretrained = params is not None
        if params is None:
            if not checkpoint_path and cfg.vocab_size == 30522:
                # Auto-discover only for real BERT-vocab configs (tiny test
                # configs must stay hermetic).
                checkpoint_path = find_local_checkpoint(
                    "all-MiniLM", env_var="MMRAG_CHECKPOINT_PATH"
                )
            if checkpoint_path:
                try:
                    params = load_hf_bert_params(checkpoint_path, cfg)
                    self.pretrained = True
                    logger.info(
                        "Loaded encoder checkpoint from %s", checkpoint_path
                    )
                except Exception as e:  # noqa: BLE001 — degrade, don't die
                    logger.error(
                        "Failed to load checkpoint %s (%s); "
                        "falling back to random init", checkpoint_path, e,
                    )
        if params is None:
            if cfg.vocab_size == 30522:  # real config, not a test tiny
                logger.warning(
                    "Serving with RANDOM-INIT encoder weights: retrieval "
                    "ranking will be semantically meaningless. Point "
                    "MMRAG_CHECKPOINT_PATH at a local all-MiniLM-L6-v2 "
                    "safetensors snapshot for real embeddings."
                )
            params = init_params(jax.random.key(seed), cfg)
        self.params = params
        if quantize and "wq_q" not in self.params["layers"]:
            self.params = quantize_params(self.params)
        if tokenizer is None and self.pretrained and checkpoint_path:
            # Checkpoint-exact vocab beats the cache-scan chain: BGE/E5/GTE
            # snapshots ship their own tokenizer next to the weights.
            tokenizer = tokenizer_from_dir(checkpoint_path)
        self.tokenizer = tokenizer or get_tokenizer(vocab_size=cfg.vocab_size)
        # Out-of-range ids would silently clamp in the embedding gather.
        assert self.tokenizer.vocab_size <= cfg.vocab_size, (
            self.tokenizer.vocab_size, cfg.vocab_size,
        )
        self.seq_buckets = tuple(seq_buckets)
        self.batch_buckets = tuple(batch_buckets)
        # Stable callable identity: jit (and downstream fused-chain caches,
        # vectorstore.search_fused) key traces on this object.
        self.embed_fn = partial(embed, cfg=cfg)
        self._jit_embed = jax.jit(self.embed_fn)

    @property
    def dim(self) -> int:
        return self.cfg.hidden_dim

    def prepare(self, texts: Sequence[str]):
        """Tokenize + bucket-pad → (ids, mask) np arrays of a compiled
        shape. The inputs ``embed_fn(params, ids, mask)`` expects."""
        ids, mask = self.tokenizer.encode_batch(texts, self.seq_buckets[-1])
        longest = int(mask.sum(axis=1).max())
        sb = bucket_for(longest, self.seq_buckets)
        bb = bucket_for(len(texts), self.batch_buckets)
        ids_p = np.zeros((bb, sb), np.uint32)
        mask_p = np.zeros((bb, sb), np.int32)
        ids_p[: len(texts)] = ids[:, :sb]
        mask_p[: len(texts)] = mask[:, :sb]
        return ids_p, mask_p

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """Texts → (len(texts), hidden_dim) float32 unit-norm embeddings."""
        if not texts:
            return np.zeros((0, self.cfg.hidden_dim), np.float32)
        out = np.empty((len(texts), self.cfg.hidden_dim), np.float32)
        max_bb = self.batch_buckets[-1]
        for start in range(0, len(texts), max_bb):
            block = list(texts[start : start + max_bb])
            out[start : start + len(block)] = self._encode_block(block)
        return out

    def _encode_block(self, texts: Sequence[str]) -> np.ndarray:
        ids_p, mask_p = self.prepare(texts)
        vecs = self._jit_embed(self.params, jnp.asarray(ids_p), jnp.asarray(mask_p))
        return np.asarray(vecs)[: len(texts)]
