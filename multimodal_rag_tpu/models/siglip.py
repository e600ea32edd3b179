"""SigLIP-class dual encoder (ViT-B/16 vision + text tower), pure JAX.

BASELINE.json config 3 calls for SigLIP embeddings on the batch-ingest
path; the reference has no image-text embedding model at all (its
``CLIP_MODEL`` knob is declared but unused, reference config.py:106), so
this and ``models.clip`` are the TPU build's cross-modal capability.

Architectural differences from CLIP (Zhai et al., "Sigmoid Loss for
Language Image Pre-Training", 2023) as implemented here:

* Vision tower: ViT-B/16, **no CLS token** — pooling is a MAP head
  (multihead attention pooling with a learned probe) over patch tokens.
* Text tower: **bidirectional** (no causal mask), fixed 64-token context,
  final-LN then **last-token pooling** followed by a linear head.
* Both MLPs use tanh-approximated GELU (not CLIP's QuickGELU).
* The training objective is the pairwise **sigmoid** loss with learnable
  temperature/bias (:func:`siglip_pair_loss`) instead of softmax InfoNCE —
  every (i, j) pair is an independent binary problem, which removes the
  batch-global softmax and so needs no cross-device logits gather when the
  batch is sharded (each device scores its local block).

Tower internals (stacked weights + ``lax.scan``, bf16 matmuls with f32
accumulation, f32 layernorms) are shared with ``models.clip``.

Weights: ``load_hf_siglip_params`` maps a ``google/siglip-base-patch16-224``
safetensors checkpoint; otherwise seeded deterministic init (same graph and
FLOPs), which is what the perf path needs offline.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rag_tpu.models.clip import (
    _layernorm,
    _tn,
    _tower_params,
)


@dataclass(frozen=True)
class SigLIPConfig:
    # text tower
    vocab_size: int = 32000
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    context_length: int = 64
    # vision tower
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # joint space
    embed_dim: int = 768
    ln_eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16
    # VMEM-fused attention kernel (ops/fused_attention.py) on TPU.
    fused_attention: bool = True

    def __post_init__(self):
        # SigLIP has no vision projection: the MAP-pooled vector IS the
        # joint-space embedding (HF SiglipVisionModel has no
        # visual_projection), so the widths must agree.
        assert self.embed_dim == self.vision_width, (
            self.embed_dim, self.vision_width,
        )

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


SIGLIP_B16 = SigLIPConfig()

PAD = 0  # SigLIP pads with 0 and pools the last position


def init_params(rng: jax.Array, cfg: SigLIPConfig = SIGLIP_B16) -> Dict:
    keys = jax.random.split(rng, 16)
    tw, vw = cfg.text_width, cfg.vision_width
    return {
        "text": {
            "token_embed": _tn(keys[0], (cfg.vocab_size, tw)),
            "pos_embed": _tn(keys[1], (cfg.context_length, tw)),
            "blocks": _tower_params(keys[2], tw, cfg.text_layers, 4 * tw),
            "ln_final_scale": jnp.ones((tw,), jnp.float32),
            "ln_final_bias": jnp.zeros((tw,), jnp.float32),
            "head_w": _tn(keys[3], (tw, cfg.embed_dim)),
            "head_b": jnp.zeros((cfg.embed_dim,), jnp.float32),
        },
        "vision": {
            "patch_embed": _tn(
                keys[4], (3 * cfg.patch_size**2, vw)
            ),
            "patch_bias": jnp.zeros((vw,), jnp.float32),
            "pos_embed": _tn(keys[5], (cfg.n_patches, vw)),
            "blocks": _tower_params(keys[6], vw, cfg.vision_layers, 4 * vw),
            "ln_post_scale": jnp.ones((vw,), jnp.float32),
            "ln_post_bias": jnp.zeros((vw,), jnp.float32),
            "map": {
                "probe": _tn(keys[7], (1, vw)),
                "wq": _tn(keys[8], (vw, vw)),
                "bq": jnp.zeros((vw,), jnp.float32),
                "wk": _tn(keys[9], (vw, vw)),
                "bk": jnp.zeros((vw,), jnp.float32),
                "wv": _tn(keys[10], (vw, vw)),
                "bv": jnp.zeros((vw,), jnp.float32),
                "wo": _tn(keys[11], (vw, vw)),
                "bo": jnp.zeros((vw,), jnp.float32),
                "ln_scale": jnp.ones((vw,), jnp.float32),
                "ln_bias": jnp.zeros((vw,), jnp.float32),
                "w1": _tn(keys[12], (vw, 4 * vw)),
                "b1": jnp.zeros((4 * vw,), jnp.float32),
                "w2": _tn(keys[13], (4 * vw, vw)),
                "b2": jnp.zeros((vw,), jnp.float32),
            },
        },
        # Sigmoid-loss calibration (paper init: t' = log 10, b = -10).
        "logit_scale": jnp.asarray(np.log(10.0), jnp.float32),
        "logit_bias": jnp.asarray(-10.0, jnp.float32),
    }


def _gelu_block(x, pos_bias, lp, heads, cfg):
    """Pre-LN block with tanh GELU (SigLIP MLP convention). ``pos_bias``:
    optional (S, S) f32 additive bias (SigLIP towers are bidirectional, so
    normally None)."""
    cd = cfg.compute_dtype
    B, S, W = x.shape
    hd = W // heads
    sm_scale = float(1.0 / np.sqrt(hd))

    h = _layernorm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.ln_eps).astype(cd)

    def proj(inp, w, b):
        y = jnp.dot(inp, w.astype(cd), preferred_element_type=jnp.float32)
        return (y + b).astype(cd)

    q = proj(h, lp["wq"], lp["bq"]).reshape(B * S, W)
    k = proj(h, lp["wk"], lp["bk"]).reshape(B * S, W)
    v = proj(h, lp["wv"], lp["bv"]).reshape(B * S, W)

    from multimodal_rag_tpu.ops import fused_attention as fa

    key_bias = jnp.zeros((B, S), jnp.float32)
    if getattr(
        cfg, "fused_attention", True
    ) and fa.fused_attention_supported_padded(
        B, S, hd, has_pos_bias=pos_bias is not None
    ):
        # SigLIP's S=196/64 are aligned (no-op pad), but the padded entry
        # also covers retuned causal/context configs that aren't.
        ctx = fa.fused_attention_padded(
            q, k, v, key_bias, sm_scale, heads, S, pos_bias
        )
    else:
        ctx = fa.attention_xla(
            q, k, v, key_bias, sm_scale, num_heads=heads, seq_len=S,
            pos_bias=pos_bias,
        )
    ctx = ctx.astype(cd).reshape(B, S, W)
    attn = (
        jnp.dot(ctx, lp["wo"].astype(cd), preferred_element_type=jnp.float32)
        + lp["bo"]
    )
    x = x.astype(jnp.float32) + attn

    h = _layernorm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.ln_eps).astype(cd)
    h1 = jnp.dot(h, lp["w1"].astype(cd), preferred_element_type=jnp.float32)
    h1 = jax.nn.gelu(h1 + lp["b1"], approximate=True).astype(cd)
    h2 = (
        jnp.dot(h1, lp["w2"].astype(cd), preferred_element_type=jnp.float32)
        + lp["b2"]
    )
    return (x + h2).astype(cd)


def _run_tower(x, mask_bias, blocks, heads, cfg):
    def body(carry, lp):
        return _gelu_block(carry, mask_bias, lp, heads, cfg), None

    x, _ = jax.lax.scan(body, x.astype(cfg.compute_dtype), blocks)
    return x


def _map_pool(tokens: jax.Array, mp: Dict, heads: int, cfg) -> jax.Array:
    """Multihead attention pooling: learned probe attends over tokens.

    tokens (B, S, W) f32 → (B, W) f32."""
    cd = cfg.compute_dtype
    B, S, W = tokens.shape
    hd = W // heads
    t = tokens.astype(cd)
    probe = jnp.broadcast_to(mp["probe"].astype(cd), (B, 1, W))

    def proj(inp, w, b):
        y = jnp.dot(inp, w.astype(cd), preferred_element_type=jnp.float32)
        return (y + b).astype(cd)

    q = proj(probe, mp["wq"], mp["bq"]).reshape(B, 1, heads, hd)
    k = proj(t, mp["wk"], mp["bk"]).reshape(B, S, heads, hd)
    v = proj(t, mp["wv"], mp["bv"]).reshape(B, S, heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / np.sqrt(hd))
    probs = jax.nn.softmax(logits, axis=-1).astype(cd)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(cd).reshape(B, 1, W)
    x = jnp.dot(
        ctx, mp["wo"].astype(cd), preferred_element_type=jnp.float32
    ) + mp["bo"]
    h = _layernorm(x, mp["ln_scale"], mp["ln_bias"], cfg.ln_eps).astype(cd)
    h1 = jnp.dot(h, mp["w1"].astype(cd), preferred_element_type=jnp.float32)
    h1 = jax.nn.gelu(h1 + mp["b1"], approximate=True).astype(cd)
    h2 = jnp.dot(h1, mp["w2"].astype(cd), preferred_element_type=jnp.float32)
    x = x + h2 + mp["b2"]
    return x[:, 0].astype(jnp.float32)


def encode_text(
    params: Dict, ids: jax.Array, cfg: SigLIPConfig = SIGLIP_B16
) -> jax.Array:
    """Token ids (B, context) → unit-norm (B, embed_dim) f32. Bidirectional
    attention; pooled at the LAST position (SigLIP convention: canonical
    padding keeps the final token at index -1)."""
    tp = params["text"]
    B, S = ids.shape
    x = tp["token_embed"][ids] + tp["pos_embed"][:S][None]
    x = _run_tower(x, None, tp["blocks"], cfg.text_heads, cfg)
    x = _layernorm(x, tp["ln_final_scale"], tp["ln_final_bias"], cfg.ln_eps)
    pooled = x[:, -1]
    out = (
        jnp.dot(pooled, tp["head_w"], preferred_element_type=jnp.float32)
        + tp["head_b"]
    )
    return out / jnp.maximum(
        jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
    )


def encode_image(
    params: Dict, pixels: jax.Array, cfg: SigLIPConfig = SIGLIP_B16
) -> jax.Array:
    """Preprocessed pixels (B, H, W, 3) f32 → unit-norm (B, embed_dim).
    Patchify = reshape + matmul; pooling = MAP head (no CLS token)."""
    vp = params["vision"]
    B, H, W, _ = pixels.shape
    P = cfg.patch_size
    gh, gw = H // P, W // P
    patches = pixels.reshape(B, gh, P, gw, P, 3)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, -1)
    x = jnp.dot(
        patches.astype(cfg.compute_dtype),
        vp["patch_embed"].astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    ) + vp["patch_bias"]
    x = x + vp["pos_embed"][None]
    x = _run_tower(x, None, vp["blocks"], cfg.vision_heads, cfg)
    x = _layernorm(x, vp["ln_post_scale"], vp["ln_post_bias"], cfg.ln_eps)
    pooled = _map_pool(x, vp["map"], cfg.vision_heads, cfg)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )


def siglip_pair_loss(
    z_img: jax.Array, z_txt: jax.Array, logit_scale: jax.Array,
    logit_bias: jax.Array,
) -> jax.Array:
    """Pairwise sigmoid loss (SigLIP eq. 1): matched pairs are positives,
    all other in-batch pairs negatives. No batch-global softmax — under a
    sharded batch each device can score its local block independently."""
    logits = (
        z_img @ z_txt.T * jnp.exp(logit_scale) + logit_bias
    )  # (B, B)
    B = logits.shape[0]
    signs = 2.0 * jnp.eye(B, dtype=logits.dtype) - 1.0
    return -jnp.mean(jax.nn.log_sigmoid(signs * logits))


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

IMAGE_MEAN = np.array([0.5, 0.5, 0.5], np.float32)  # SigLIP normalization
IMAGE_STD = np.array([0.5, 0.5, 0.5], np.float32)


class SigLIPTokenizer:
    """Deterministic hashing tokenizer with SigLIP framing (pad 0, fixed
    context, last-position pooling) for offline use; a real SentencePiece
    vocab drops in via the same encode_batch contract."""

    name = "siglip-hash"

    def __init__(self, cfg: SigLIPConfig = SIGLIP_B16):
        from multimodal_rag_tpu.models.tokenizer import HashingTokenizer

        self.cfg = cfg
        self._inner = HashingTokenizer(vocab_size=cfg.vocab_size - 2)
        self.vocab_size = cfg.vocab_size

    def encode_batch(self, texts: Sequence[str], max_len: int = None):
        max_len = max_len or self.cfg.context_length
        eos = self.vocab_size - 1
        ids = np.zeros((len(texts), max_len), np.uint32)  # PAD = 0
        for i, text in enumerate(texts):
            body = [t + 1 for t in self._inner.tokenize_ids(text)]
            row = (body[: max_len - 1] + [eos])
            # Right-align so the pooled last position is always the EOS.
            ids[i, max_len - len(row):] = row
        return ids


def load_siglip_tokenizer(
    checkpoint_path: str, cfg: SigLIPConfig = SIGLIP_B16
):
    """Checkpoint-exact tokenizer discovery: ``spiece.model`` ships in the
    same snapshot dir as ``model.safetensors`` for every google/siglip
    checkpoint. Returns a first-party
    :class:`~multimodal_rag_tpu.models.spm_unigram.SigLIPSPTokenizer`
    when it exists and fits the tower's embedding table, else ``None``
    (caller falls back to the hashing tokenizer)."""
    import logging
    import os

    logger = logging.getLogger(__name__)
    base = (
        checkpoint_path
        if os.path.isdir(checkpoint_path)
        else os.path.dirname(checkpoint_path)
    )
    model_file = os.path.join(base, "spiece.model")
    if not os.path.exists(model_file):
        return None
    try:
        from multimodal_rag_tpu.models.spm_unigram import SigLIPSPTokenizer

        tok = SigLIPSPTokenizer(
            model_file, context_length=cfg.context_length
        )
    except Exception as e:  # noqa: BLE001 — malformed file → fallback
        logger.error("Failed to parse %s (%s)", model_file, e)
        return None
    if tok.vocab_size > cfg.vocab_size:
        logger.error(
            "SigLIP spiece vocab (%d) exceeds the tower's embedding "
            "table (%d); ignoring it", tok.vocab_size, cfg.vocab_size,
        )
        return None
    logger.info("Loaded SigLIP SentencePiece tokenizer from %s", base)
    return tok


class SigLIPEncoder:
    """Host-facing dual encoder: texts and images → shared-space vectors."""

    def __init__(
        self,
        params: Dict | None = None,
        cfg: SigLIPConfig = SIGLIP_B16,
        tokenizer=None,
        seed: int = 0,
        checkpoint_path: str | None = None,
    ):
        import logging

        from multimodal_rag_tpu.models.minilm import find_local_checkpoint

        logger = logging.getLogger(__name__)
        self.cfg = cfg
        self.pretrained = params is not None
        if params is None:
            if not checkpoint_path and cfg.vocab_size == 32000:
                checkpoint_path = find_local_checkpoint(
                    "siglip", env_var="MMRAG_CLIP_CHECKPOINT_PATH"
                )
            if checkpoint_path:
                try:
                    params = load_hf_siglip_params(checkpoint_path, cfg)
                    self.pretrained = True
                    logger.info(
                        "Loaded SigLIP checkpoint from %s", checkpoint_path
                    )
                except Exception as e:  # noqa: BLE001
                    logger.error(
                        "Failed to load SigLIP checkpoint %s (%s); "
                        "falling back to random init", checkpoint_path, e,
                    )
        if params is None:
            if cfg.vocab_size == 32000:
                logger.warning(
                    "Cross-modal search is running with RANDOM-INIT SigLIP "
                    "towers; set MMRAG_CLIP_CHECKPOINT_PATH for real "
                    "text-image retrieval."
                )
            params = init_params(jax.random.key(seed), cfg)
        self.params = params
        if tokenizer is None and checkpoint_path:
            tokenizer = load_siglip_tokenizer(checkpoint_path, cfg)
        self.tokenizer = tokenizer or SigLIPTokenizer(cfg)
        self._jit_text = jax.jit(partial(encode_text, cfg=cfg))
        self._jit_image = jax.jit(partial(encode_image, cfg=cfg))

    @property
    def dim(self) -> int:
        return self.cfg.embed_dim

    # One compiled executable per bucket instead of one per request size.
    BATCH_BUCKETS = (4, 8, 32, 128)

    def _bucket(self, n: int) -> int:
        for b in self.BATCH_BUCKETS:
            if n <= b:
                return b
        return ((n + 127) // 128) * 128

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        ids = self.tokenizer.encode_batch(list(texts))
        bb = self._bucket(len(texts))
        if bb != len(texts):
            ids = np.concatenate(
                [ids, np.repeat(ids[-1:], bb - len(texts), axis=0)]
            )
        out = np.asarray(self._jit_text(self.params, jnp.asarray(ids)))
        return out[: len(texts)]

    def encode_images(
        self, images: Sequence, device_prep: bool = True
    ) -> np.ndarray:
        if not images:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        if device_prep:
            from multimodal_rag_tpu.ops.image_prep import preprocess_batch

            pixels = preprocess_batch(
                images, out_size=self.cfg.image_size,
                mean=IMAGE_MEAN, std=IMAGE_STD,
            )
        else:
            from multimodal_rag_tpu.models.clip import preprocess_image

            arr = np.stack(
                [preprocess_image(img, self.cfg.image_size) for img in images]
            )
            # Re-normalize from CLIP stats to SigLIP's 0.5/0.5.
            from multimodal_rag_tpu.models import clip as _clip

            raw = arr * _clip.IMAGE_STD + _clip.IMAGE_MEAN
            pixels = jnp.asarray((raw - IMAGE_MEAN) / IMAGE_STD)
        bb = self._bucket(len(images))
        if bb != pixels.shape[0]:
            pixels = jnp.concatenate(
                [pixels, jnp.repeat(pixels[-1:], bb - pixels.shape[0], axis=0)]
            )
        out = np.asarray(self._jit_image(self.params, pixels))
        return out[: len(images)]


def _tower_from_tensors(tensors: Dict, prefix: str, layers: int) -> Dict:
    """Stack one SigLIP encoder tower's layers from HF-named tensors."""
    def stacked(fmt, transpose=False):
        mats = [np.asarray(tensors[fmt.format(i)]) for i in range(layers)]
        return jnp.asarray(
            np.stack([m.T if transpose else m for m in mats]),
            jnp.float32,
        )

    p = prefix + ".encoder.layers.{}."
    return {
        "wq": stacked(p + "self_attn.q_proj.weight", True),
        "bq": stacked(p + "self_attn.q_proj.bias"),
        "wk": stacked(p + "self_attn.k_proj.weight", True),
        "bk": stacked(p + "self_attn.k_proj.bias"),
        "wv": stacked(p + "self_attn.v_proj.weight", True),
        "bv": stacked(p + "self_attn.v_proj.bias"),
        "wo": stacked(p + "self_attn.out_proj.weight", True),
        "bo": stacked(p + "self_attn.out_proj.bias"),
        "ln1_scale": stacked(p + "layer_norm1.weight"),
        "ln1_bias": stacked(p + "layer_norm1.bias"),
        "w1": stacked(p + "mlp.fc1.weight", True),
        "b1": stacked(p + "mlp.fc1.bias"),
        "w2": stacked(p + "mlp.fc2.weight", True),
        "b2": stacked(p + "mlp.fc2.bias"),
        "ln2_scale": stacked(p + "layer_norm2.weight"),
        "ln2_bias": stacked(p + "layer_norm2.bias"),
    }


def map_hf_siglip_vision(
    tensors: Dict, cfg: SigLIPConfig, prefix: str = ""
) -> Dict:
    """Vision tower WITHOUT the MAP pooling head, from HF
    ``SiglipVisionModel`` naming under ``prefix`` (e.g. Gemma3's
    ``model.vision_tower.``) — the patch-feature path
    (:func:`encode_image_patches`) that VLM projectors consume."""
    def t(name):
        return jnp.asarray(np.asarray(tensors[prefix + name]), jnp.float32)

    conv = np.asarray(
        tensors[prefix + "vision_model.embeddings.patch_embedding.weight"]
    )
    return {
        "patch_embed": jnp.asarray(
            conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]),
            jnp.float32,
        ),
        "patch_bias": t("vision_model.embeddings.patch_embedding.bias"),
        "pos_embed": t("vision_model.embeddings.position_embedding.weight"),
        "blocks": _tower_from_tensors(
            {k[len(prefix):]: v for k, v in tensors.items()
             if k.startswith(prefix)},
            "vision_model", cfg.vision_layers,
        ),
        "ln_post_scale": t("vision_model.post_layernorm.weight"),
        "ln_post_bias": t("vision_model.post_layernorm.bias"),
    }


def encode_image_patches(
    params: Dict, pixels: jax.Array, cfg: SigLIPConfig = SIGLIP_B16
) -> jax.Array:
    """Preprocessed pixels (B, H, W, 3) f32 → PATCH features
    (B, n_patches, vision_width) f32 — the tower output after the final
    layernorm, before MAP pooling (HF ``last_hidden_state``). The VLM
    feature path: Gemma3's projector pools these."""
    vp = params["vision"] if "vision" in params else params
    B, H, W, _ = pixels.shape
    P = cfg.patch_size
    gh, gw = H // P, W // P
    patches = pixels.reshape(B, gh, P, gw, P, 3)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, -1)
    x = jnp.dot(
        patches.astype(cfg.compute_dtype),
        vp["patch_embed"].astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    ) + vp["patch_bias"]
    x = x + vp["pos_embed"][None]
    x = _run_tower(x, None, vp["blocks"], cfg.vision_heads, cfg)
    return _layernorm(x, vp["ln_post_scale"], vp["ln_post_bias"], cfg.ln_eps)


def load_hf_siglip_params(
    path: str, cfg: SigLIPConfig = SIGLIP_B16
) -> Dict:
    """Map a google/siglip-base-patch16-224 safetensors checkpoint (HF
    ``SiglipModel`` naming) into the stacked pytree."""
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
            tensors[key] = f.get_tensor(key)

    def t(name):
        return jnp.asarray(tensors[name], jnp.float32)

    def tower(prefix, layers):
        return _tower_from_tensors(tensors, prefix, layers)

    conv = np.asarray(
        tensors["vision_model.embeddings.patch_embedding.weight"]
    )
    patch = jnp.asarray(
        conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]), jnp.float32
    )
    mh = "vision_model.head."
    in_proj_w = np.asarray(tensors[mh + "attention.in_proj_weight"])
    in_proj_b = np.asarray(tensors[mh + "attention.in_proj_bias"])
    vw = cfg.vision_width
    wq_, wk_, wv_ = (
        in_proj_w[:vw].T, in_proj_w[vw : 2 * vw].T, in_proj_w[2 * vw :].T
    )
    bq_, bk_, bv_ = in_proj_b[:vw], in_proj_b[vw : 2 * vw], in_proj_b[2 * vw :]
    return {
        "text": {
            "token_embed": t("text_model.embeddings.token_embedding.weight"),
            "pos_embed": t("text_model.embeddings.position_embedding.weight"),
            "blocks": tower("text_model", cfg.text_layers),
            "ln_final_scale": t("text_model.final_layer_norm.weight"),
            "ln_final_bias": t("text_model.final_layer_norm.bias"),
            "head_w": t("text_model.head.weight").T,
            "head_b": t("text_model.head.bias"),
        },
        "vision": {
            "patch_embed": patch,
            "patch_bias": t("vision_model.embeddings.patch_embedding.bias"),
            "pos_embed": t(
                "vision_model.embeddings.position_embedding.weight"
            ),
            "blocks": tower("vision_model", cfg.vision_layers),
            "ln_post_scale": t("vision_model.post_layernorm.weight"),
            "ln_post_bias": t("vision_model.post_layernorm.bias"),
            "map": {
                "probe": jnp.asarray(
                    np.asarray(tensors[mh + "probe"]).reshape(1, -1),
                    jnp.float32,
                ),
                "wq": jnp.asarray(wq_, jnp.float32),
                "bq": jnp.asarray(bq_, jnp.float32),
                "wk": jnp.asarray(wk_, jnp.float32),
                "bk": jnp.asarray(bk_, jnp.float32),
                "wv": jnp.asarray(wv_, jnp.float32),
                "bv": jnp.asarray(bv_, jnp.float32),
                "wo": t(mh + "attention.out_proj.weight").T,
                "bo": t(mh + "attention.out_proj.bias"),
                "ln_scale": t(mh + "layernorm.weight"),
                "ln_bias": t(mh + "layernorm.bias"),
                "w1": t(mh + "mlp.fc1.weight").T,
                "b1": t(mh + "mlp.fc1.bias"),
                "w2": t(mh + "mlp.fc2.weight").T,
                "b2": t(mh + "mlp.fc2.bias"),
            },
        },
        "logit_scale": t("logit_scale").reshape(()),
        "logit_bias": t("logit_bias").reshape(()),
    }
