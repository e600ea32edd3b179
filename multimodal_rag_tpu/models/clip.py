"""CLIP-class dual encoder (ViT-B/32 image tower + text tower), pure JAX.

The reference *declares* ``CLIP_MODEL=ViT-B/32`` but never uses it
(``config.py:106``, SURVEY.md §5.6); this build makes it real
(BASELINE.json config 2): joint text/image embeddings in one space for
cross-modal retrieval over extracted figures.

TPU-first structure mirrors ``models.minilm``: stacked per-layer weights +
``lax.scan`` bodies, bf16 matmuls with f32 accumulation, f32 layernorms,
static shapes. Differences from the BERT-family encoder: pre-LN blocks,
QuickGELU, causal masking + EOT pooling for text, patch-conv (as a single
reshaped matmul — a 32×32 patchify is exactly a (P², D) projection, which
is friendlier to the MXU than a conv lowering) + CLS pooling for vision,
and a learned projection into the shared space.

Weights: ``load_hf_clip_params`` maps an ``openai/clip-vit-base-patch32``
safetensors checkpoint; otherwise seeded deterministic init (same graph
and FLOPs). Text uses the hashing tokenizer with CLIP's special-token
conventions when the real BPE vocab isn't available offline.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CLIPConfig:
    # text tower
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    # vision tower
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # joint space
    embed_dim: int = 512
    ln_eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16
    # VMEM-fused attention kernel (ops/fused_attention.py) on TPU.
    fused_attention: bool = True

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_B32 = CLIPConfig()

SOT = 49406  # start-of-text
EOT = 49407  # end-of-text

# CLIP's image normalization constants.
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _tn(key, shape, std=0.02):
    return (jax.random.truncated_normal(key, -2.0, 2.0, shape) * std).astype(
        jnp.float32
    )


def _tower_params(key, width, layers, ff):
    keys = jax.random.split(key, 8)
    return {
        "wq": _tn(keys[0], (layers, width, width)),
        "bq": jnp.zeros((layers, width), jnp.float32),
        "wk": _tn(keys[1], (layers, width, width)),
        "bk": jnp.zeros((layers, width), jnp.float32),
        "wv": _tn(keys[2], (layers, width, width)),
        "bv": jnp.zeros((layers, width), jnp.float32),
        "wo": _tn(keys[3], (layers, width, width)),
        "bo": jnp.zeros((layers, width), jnp.float32),
        "ln1_scale": jnp.ones((layers, width), jnp.float32),
        "ln1_bias": jnp.zeros((layers, width), jnp.float32),
        "w1": _tn(keys[4], (layers, width, ff)),
        "b1": jnp.zeros((layers, ff), jnp.float32),
        "w2": _tn(keys[5], (layers, ff, width)),
        "b2": jnp.zeros((layers, width), jnp.float32),
        "ln2_scale": jnp.ones((layers, width), jnp.float32),
        "ln2_bias": jnp.zeros((layers, width), jnp.float32),
    }


def init_params(rng: jax.Array, cfg: CLIPConfig = CLIP_B32) -> Dict:
    keys = jax.random.split(rng, 10)
    tw, vw = cfg.text_width, cfg.vision_width
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "text": {
            "token_embed": _tn(keys[0], (cfg.vocab_size, tw)),
            "pos_embed": _tn(keys[1], (cfg.context_length, tw), 0.01),
            "blocks": _tower_params(keys[2], tw, cfg.text_layers, tw * 4),
            "ln_final_scale": jnp.ones((tw,), jnp.float32),
            "ln_final_bias": jnp.zeros((tw,), jnp.float32),
            "projection": _tn(keys[3], (tw, cfg.embed_dim)),
        },
        "vision": {
            "patch_embed": _tn(keys[4], (patch_dim, vw)),
            "class_embed": _tn(keys[5], (vw,)),
            "pos_embed": _tn(keys[6], (cfg.n_patches + 1, vw), 0.01),
            "ln_pre_scale": jnp.ones((vw,), jnp.float32),
            "ln_pre_bias": jnp.zeros((vw,), jnp.float32),
            "blocks": _tower_params(keys[7], vw, cfg.vision_layers, vw * 4),
            "ln_post_scale": jnp.ones((vw,), jnp.float32),
            "ln_post_bias": jnp.zeros((vw,), jnp.float32),
            "projection": _tn(keys[8], (vw, cfg.embed_dim)),
        },
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def _layernorm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _pre_ln_block(x, pos_bias, lp, heads, cfg):
    """Pre-LN transformer block (CLIP convention). ``pos_bias``: optional
    (S, S) f32 additive bias shared across the batch (the causal mask for
    the text tower; None for vision)."""
    cd = cfg.compute_dtype
    B, S, W = x.shape
    hd = W // heads
    sm_scale = float(1.0 / np.sqrt(hd))

    h = _layernorm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.ln_eps).astype(cd)

    def proj(inp, w, b):
        y = jnp.dot(inp, w.astype(cd), preferred_element_type=jnp.float32)
        return (y + b).astype(cd)

    # Projection-native (B*S, W) layout: the fused kernel slices heads in
    # VMEM, so no HBM transpose (see ops/fused_attention.py).
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
        # CLIP's causal text tower (S=77) is sublane-unaligned; the padded
        # entry masks the pad keys and slices pad rows off after the
        # kernel (3x vs XLA at B=128). The mask-free vision tower (S=50)
        # stays on the XLA path, where it's faster.
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
    h1 = _quick_gelu(h1 + lp["b1"]).astype(cd)
    h2 = (
        jnp.dot(h1, lp["w2"].astype(cd), preferred_element_type=jnp.float32)
        + lp["b2"]
    )
    return (x + h2).astype(cd)


def _run_tower(x, mask_bias, blocks, heads, cfg):
    def body(carry, lp):
        return _pre_ln_block(carry, mask_bias, lp, heads, cfg), None

    x, _ = jax.lax.scan(body, x.astype(cfg.compute_dtype), blocks)
    return x


def encode_text(
    params: Dict, ids: jax.Array, cfg: CLIPConfig = CLIP_B32
) -> jax.Array:
    """Token ids (B, context) → unit-norm (B, embed_dim) f32. The sequence
    is causal-masked and pooled at the (argmax = EOT) position."""
    tp = params["text"]
    B, S = ids.shape
    x = tp["token_embed"][ids] + tp["pos_embed"][:S][None]
    causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)
    x = _run_tower(x, causal, tp["blocks"], cfg.text_heads, cfg)
    x = _layernorm(x, tp["ln_final_scale"], tp["ln_final_bias"], cfg.ln_eps)
    eot = jnp.argmax(ids, axis=-1)  # EOT has the highest token id
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    out = jnp.dot(
        pooled, params["text"]["projection"],
        preferred_element_type=jnp.float32,
    )
    return out / jnp.maximum(
        jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
    )


def encode_image(
    params: Dict, pixels: jax.Array, cfg: CLIPConfig = CLIP_B32
) -> jax.Array:
    """Preprocessed pixels (B, H, W, 3) f32 → unit-norm (B, embed_dim).

    Patchify is a reshape + one matmul: (B, n_patches, 3·P²) @ (3·P², W).
    """
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
    )
    cls = jnp.broadcast_to(vp["class_embed"], (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + vp["pos_embed"][None]
    x = _layernorm(x, vp["ln_pre_scale"], vp["ln_pre_bias"], cfg.ln_eps)
    x = _run_tower(x, None, vp["blocks"], cfg.vision_heads, cfg)
    pooled = _layernorm(
        x[:, 0], vp["ln_post_scale"], vp["ln_post_bias"], cfg.ln_eps
    )
    out = jnp.dot(
        pooled, vp["projection"], preferred_element_type=jnp.float32
    )
    return out / jnp.maximum(
        jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
    )


def encode_image_patches(
    params: Dict,
    pixels: jax.Array,
    cfg: CLIPConfig = CLIP_B32,
    feature_layer: int = -2,
    drop_cls: bool = True,
) -> jax.Array:
    """Patch-level hidden states for LLaVA-style multimodal prefixes
    (models/llava.py): run the vision tower up to ``feature_layer`` (HF
    ``hidden_states`` indexing: -2 = output of the penultimate block, the
    LLaVA default) and return (B, n_patches[, +1], vision_width) WITHOUT
    the post-layernorm/CLS pooling that :func:`encode_image` applies —
    matching HF's ``vision_feature_select_strategy`` ("default" drops the
    CLS slot, "full" keeps it)."""
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
    )
    cls = jnp.broadcast_to(vp["class_embed"], (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + vp["pos_embed"][None]
    x = _layernorm(x, vp["ln_pre_scale"], vp["ln_pre_bias"], cfg.ln_eps)
    # hidden_states[-1] is the last block's output → feature_layer=-2 runs
    # all but the last block.
    n_blocks = cfg.vision_layers + 1 + feature_layer
    assert 0 < n_blocks <= cfg.vision_layers, (feature_layer, cfg.vision_layers)
    blocks = jax.tree.map(lambda a: a[:n_blocks], vp["blocks"])
    x = _run_tower(x, None, blocks, cfg.vision_heads, cfg)
    if drop_cls:
        x = x[:, 1:]
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Host-side preprocessing + convenience encoder
# ---------------------------------------------------------------------------


def preprocess_image(img, image_size: int = 224) -> np.ndarray:
    """PIL image / (H, W, 3) array / encoded bytes → (H, W, 3) f32,
    resize-shorter-side + center crop + CLIP normalization."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        # Raw pixel arrays (the llava generate() contract) have no image
        # header — Image.open would raise UnidentifiedImageError.
        img = Image.fromarray(img.astype(np.uint8))
    elif not hasattr(img, "convert"):
        from io import BytesIO

        img = Image.open(BytesIO(img))
    img = img.convert("RGB")
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize(
        (max(image_size, int(round(w * scale))),
         max(image_size, int(round(h * scale)))),
        Image.BICUBIC,
    )
    w, h = img.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGE_MEAN) / IMAGE_STD


class CLIPTokenizer:
    """Deterministic hashing tokenizer with CLIP special-token framing
    (used when the real BPE vocab is unavailable offline)."""

    name = "clip-hash"

    def __init__(self, cfg: CLIPConfig = CLIP_B32):
        from multimodal_rag_tpu.models.tokenizer import HashingTokenizer

        self.cfg = cfg
        # hash into [1, SOT): 0 is CLIP's pad token
        self._inner = HashingTokenizer(vocab_size=SOT)
        self.vocab_size = cfg.vocab_size

    def encode_batch(self, texts: Sequence[str], max_len: int = None):
        max_len = max_len or self.cfg.context_length
        ids = np.zeros((len(texts), max_len), np.uint32)
        for i, text in enumerate(texts):
            body = self._inner.tokenize_ids(text)[: max_len - 2]
            row = [SOT] + body + [EOT]
            ids[i, : len(row)] = row
        return ids


def load_clip_tokenizer(checkpoint_path: str, cfg: CLIPConfig = CLIP_B32):
    """Checkpoint-exact tokenizer discovery: the byte-level BPE files
    (``vocab.json`` + ``merges.txt``) ship in the same snapshot dir as
    ``model.safetensors`` for every openai/clip-vit checkpoint. Returns a
    first-party :class:`~multimodal_rag_tpu.models.clip_bpe.CLIPBPETokenizer`
    when they exist and fit the tower's embedding table, else ``None``
    (caller falls back to the hashing tokenizer)."""
    import logging
    import os

    logger = logging.getLogger(__name__)
    base = (
        checkpoint_path
        if os.path.isdir(checkpoint_path)
        else os.path.dirname(checkpoint_path)
    )
    vocab = os.path.join(base, "vocab.json")
    merges = os.path.join(base, "merges.txt")
    if not (os.path.exists(vocab) and os.path.exists(merges)):
        return None
    try:
        from multimodal_rag_tpu.models.clip_bpe import CLIPBPETokenizer

        tok = CLIPBPETokenizer(
            vocab, merges, context_length=cfg.context_length
        )
    except Exception as e:  # noqa: BLE001 — malformed files → fallback
        logger.error("Failed to load CLIP BPE from %s (%s)", base, e)
        return None
    if tok.vocab_size > cfg.vocab_size:
        logger.error(
            "CLIP BPE vocab (%d) exceeds the tower's embedding table "
            "(%d); ignoring it", tok.vocab_size, cfg.vocab_size,
        )
        return None
    logger.info("Loaded CLIP BPE tokenizer from %s", base)
    return tok


class CLIPEncoder:
    """Host-facing dual encoder: texts and images → shared-space vectors."""

    def __init__(
        self,
        params: Dict | None = None,
        cfg: CLIPConfig = CLIP_B32,
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
            if not checkpoint_path and cfg.vocab_size == 49408:
                checkpoint_path = find_local_checkpoint(
                    "clip-vit", env_var="MMRAG_CLIP_CHECKPOINT_PATH"
                )
            if checkpoint_path:
                try:
                    params = load_hf_clip_params(checkpoint_path, cfg)
                    self.pretrained = True
                    logger.info(
                        "Loaded CLIP checkpoint from %s", checkpoint_path
                    )
                except Exception as e:  # noqa: BLE001
                    logger.error(
                        "Failed to load CLIP checkpoint %s (%s); "
                        "falling back to random init", checkpoint_path, e,
                    )
        if params is None:
            if cfg.vocab_size == 49408:
                logger.warning(
                    "Cross-modal search is running with RANDOM-INIT CLIP "
                    "towers; set MMRAG_CLIP_CHECKPOINT_PATH for real "
                    "text-image retrieval."
                )
            params = init_params(jax.random.key(seed), cfg)
        self.params = params
        if tokenizer is None and checkpoint_path:
            tokenizer = load_clip_tokenizer(checkpoint_path, cfg)
        self.tokenizer = tokenizer or CLIPTokenizer(cfg)
        self._jit_text = jax.jit(partial(encode_text, cfg=cfg))
        self._jit_image = jax.jit(partial(encode_image, cfg=cfg))

    @property
    def dim(self) -> int:
        return self.cfg.embed_dim

    # Batch buckets: one compiled executable per bucket instead of one per
    # distinct request size (remote compiles are expensive).
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
        """images: PIL images or encoded bytes. ``device_prep`` runs the
        resize/normalize on device in one batch (``ops.image_prep``); the
        False path keeps the host-side PIL pipeline for parity checks."""
        if not images:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        if device_prep:
            from multimodal_rag_tpu.ops.image_prep import preprocess_batch

            pixels = preprocess_batch(images, out_size=self.cfg.image_size)
        else:
            pixels = jnp.asarray(
                np.stack(
                    [
                        preprocess_image(img, self.cfg.image_size)
                        for img in images
                    ]
                )
            )
        bb = self._bucket(len(images))
        if bb != pixels.shape[0]:
            pixels = jnp.concatenate(
                [pixels, jnp.repeat(pixels[-1:], bb - pixels.shape[0], axis=0)]
            )
        out = np.asarray(self._jit_image(self.params, pixels))
        return out[: len(images)]


def map_hf_clip_tower(tensors: Dict[str, np.ndarray], prefix: str, layers: int) -> Dict:
    """Stack an HF CLIP encoder tower (``{prefix}.layers.N...``) into the
    scan pytree. Shared by the CLIP loader and the LLaVA vision-tower
    loader (models/llava.py, prefix ``vision_tower.vision_model.encoder``)."""

    def stacked(fmt, transpose=False):
        mats = [np.asarray(tensors[fmt.format(i)]) for i in range(layers)]
        return jnp.asarray(
            np.stack([m.T if transpose else m for m in mats]), jnp.float32
        )

    p = prefix + ".layers.{}."
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


def map_hf_vision_model(
    tensors: Dict[str, np.ndarray], layers: int, prefix: str = "vision_model."
) -> Dict:
    """Map an HF ``CLIPVisionModel`` subtree (embeddings + encoder + pre/
    post layernorms) — everything in the ``vision`` pytree except the
    joint-space ``projection`` (CLIP-only)."""

    def t(name):
        return jnp.asarray(tensors[prefix + name], jnp.float32)

    # HF conv patch embed: (vw, 3, P, P) → our (3·P², vw) with matching
    # patch flatten order (P, P, 3): transpose to (P, P, 3, vw).
    conv = np.asarray(tensors[prefix + "embeddings.patch_embedding.weight"])
    patch = jnp.asarray(
        conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]), jnp.float32
    )
    return {
        "patch_embed": patch,
        "class_embed": t("embeddings.class_embedding"),
        "pos_embed": t("embeddings.position_embedding.weight"),
        "ln_pre_scale": t("pre_layrnorm.weight"),
        "ln_pre_bias": t("pre_layrnorm.bias"),
        "blocks": map_hf_clip_tower(tensors, prefix + "encoder", layers),
        "ln_post_scale": t("post_layernorm.weight"),
        "ln_post_bias": t("post_layernorm.bias"),
    }


def load_hf_clip_params(path: str, cfg: CLIPConfig = CLIP_B32) -> Dict:
    """Map an openai/clip-vit-base-patch32 safetensors checkpoint into the
    stacked pytree (HF ``CLIPModel`` naming)."""
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

    vision = map_hf_vision_model(tensors, cfg.vision_layers)
    vision["projection"] = jnp.asarray(
        np.asarray(tensors["visual_projection.weight"]).T, jnp.float32
    )
    return {
        "text": {
            "token_embed": t(
                "text_model.embeddings.token_embedding.weight"
            ),
            "pos_embed": t(
                "text_model.embeddings.position_embedding.weight"
            ),
            "blocks": map_hf_clip_tower(
                tensors, "text_model.encoder", cfg.text_layers
            ),
            "ln_final_scale": t("text_model.final_layer_norm.weight"),
            "ln_final_bias": t("text_model.final_layer_norm.bias"),
            "projection": jnp.asarray(
                np.asarray(tensors["text_projection.weight"]).T, jnp.float32
            ),
        },
        "vision": vision,
        "logit_scale": t("logit_scale"),
    }
