"""Gemma3 vision-language generation on TPU — vision family #2.

The reference serves vision models only as Ollama HTTP endpoints
(``/root/reference/app/models/mllm_adapter.py:211-263``); this framework
runs them on-chip. ``models/llava.py`` covers the CLIP-tower family;
this module covers Gemma3's SigLIP-tower recipe
(HF ``Gemma3ForConditionalGeneration``):

* the SigLIP vision tower (models/siglip.py — already here for
  cross-modal search) produces patch features
  (``encode_image_patches``, the HF ``last_hidden_state``);
* the multimodal projector average-pools the patch grid down to
  ``mm_tokens_per_image`` soft tokens (kernel = patches_per_side /
  tokens_per_side), applies a zero-centered (1+w) RMSNorm over the
  vision width, and projects with a single (V, H_text) matrix —
  ``Gemma3MultiModalProjector`` exactly;
* soft tokens splice into the token-embedding sequence at the
  ``image_token_id`` placeholders (same host-side ragged splice as
  llava — ``llava.splice_multimodal`` is reused verbatim), and the
  Gemma3 text decoder (models/decoder.py: interleaved sliding/global
  attention) generates over the spliced sequence via
  ``generate_tokens_embeds``.

Weights load from a local HF safetensors snapshot
(:func:`load_hf_gemma3_vlm`); the mapping is golden-tested against the
torch forward in ``tests/test_gemma3_vlm.py``. Pan-and-scan cropping
(an optional HF preprocessing mode for extreme aspect ratios) is not
implemented — images resize to the square tower input, the default
processor path.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    config_from_hf,
    map_hf_causal_lm,
)
from multimodal_rag_tpu.models.siglip import (
    SigLIPConfig,
    encode_image_patches,
    map_hf_siglip_vision,
)

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class Gemma3VLMConfig:
    text: DecoderConfig
    vision: SigLIPConfig
    image_token_id: int
    mm_tokens_per_image: int = 256
    mm_norm_eps: float = 1e-6

    @property
    def n_image_tokens(self) -> int:
        # llava.splice_multimodal duck-types on this name.
        return self.mm_tokens_per_image


def _vision_cfg_from_hf(hf: dict) -> SigLIPConfig:
    # The FF width is read from the checkpoint's tensor shapes at load
    # time (siglip's forward takes it from w1), so SigLIPConfig carries
    # no ff field; embed_dim == vision_width per its post-init contract.
    width = hf.get("hidden_size", 1152)
    return SigLIPConfig(
        image_size=hf.get("image_size", 896),
        patch_size=hf.get("patch_size", 14),
        vision_width=width,
        vision_layers=hf.get("num_hidden_layers", 27),
        vision_heads=hf.get("num_attention_heads", 16),
        embed_dim=width,
        ln_eps=hf.get("layer_norm_eps", 1e-6),
        compute_dtype=jnp.float32,
    )


def config_from_hf_vlm(hf: dict) -> Gemma3VLMConfig:
    """HF ``Gemma3Config`` (multimodal, nested text/vision configs) →
    :class:`Gemma3VLMConfig`."""
    text_hf = dict(hf.get("text_config") or {})
    text_hf.setdefault("model_type", "gemma3_text")
    return Gemma3VLMConfig(
        text=config_from_hf(text_hf),
        vision=_vision_cfg_from_hf(hf.get("vision_config") or {}),
        image_token_id=hf.get(
            "image_token_id", hf.get("image_token_index", 262144)
        ),
        mm_tokens_per_image=hf.get("mm_tokens_per_image", 256),
        mm_norm_eps=(hf.get("vision_config") or {}).get(
            "layer_norm_eps", 1e-6
        ),
    )


def load_hf_gemma3_vlm(path: str) -> Tuple[Dict, Gemma3VLMConfig]:
    """Load a Gemma3 multimodal safetensors snapshot. Returns params
    ``{"lm", "vision", "projector"}`` and the config. HF naming
    (transformers >= 4.52): ``model.vision_tower.*``,
    ``model.multi_modal_projector.*``, ``model.language_model.*`` +
    top-level ``lm_head`` (tied)."""
    from safetensors import safe_open

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    if hf.get("model_type") != "gemma3":
        raise ValueError(
            f"not a Gemma3 multimodal checkpoint: model_type="
            f"{hf.get('model_type')!r}"
        )
    cfg = config_from_hf_vlm(hf)
    files = sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".safetensors")
    )
    tensors: Dict[str, np.ndarray] = {}
    for fp in files:
        with safe_open(fp, framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)

    # Older exports nest the language model one level up
    # ("language_model.model.layers", llava-style); normalize both to
    # the map_hf_causal_lm template ("model.layers.{}").
    lm_tensors = {}
    for k, v in tensors.items():
        if k.startswith("model.language_model."):
            lm_tensors["model." + k[len("model.language_model."):]] = v
        elif k.startswith("language_model.model."):
            lm_tensors["model." + k[len("language_model.model."):]] = v
        elif k == "lm_head.weight" or k == "language_model.lm_head.weight":
            lm_tensors["lm_head.weight"] = v
    lm_params, text_cfg = map_hf_causal_lm(lm_tensors, cfg.text)
    if text_cfg is not cfg.text:
        cfg = Gemma3VLMConfig(**{**cfg.__dict__, "text": text_cfg})

    vis_prefix = (
        "model.vision_tower."
        if "model.vision_tower.vision_model.post_layernorm.weight" in tensors
        else "vision_tower."
    )
    vision = map_hf_siglip_vision(tensors, cfg.vision, vis_prefix)

    proj_prefix = (
        "model.multi_modal_projector."
        if "model.multi_modal_projector.mm_input_projection_weight"
        in tensors
        else "multi_modal_projector."
    )
    projector = {
        # (V, H_text) raw nn.Parameter used as x @ W — no transpose.
        "w": jnp.asarray(
            np.asarray(
                tensors[proj_prefix + "mm_input_projection_weight"],
                np.float32,
            )
        ),
        "norm": jnp.asarray(
            np.asarray(
                tensors[proj_prefix + "mm_soft_emb_norm.weight"], np.float32
            )
        ),
    }
    return {"lm": lm_params, "vision": vision, "projector": projector}, cfg


def init_gemma3_vlm_params(rng: jax.Array, cfg: Gemma3VLMConfig) -> Dict:
    """Seeded random init with the same pytree shape as the loader."""
    from multimodal_rag_tpu.models.decoder import init_params as init_lm
    from multimodal_rag_tpu.models.siglip import init_params as init_sig

    k_lm, k_vis, k_proj = jax.random.split(rng, 3)
    sig = init_sig(k_vis, cfg.vision)
    return {
        "lm": init_lm(k_lm, cfg.text),
        "vision": sig["vision"],
        "projector": {
            "w": jax.random.normal(
                k_proj, (cfg.vision.vision_width, cfg.text.hidden_dim),
                jnp.float32,
            ) * 0.02,
            "norm": jnp.zeros((cfg.vision.vision_width,), jnp.float32),
        },
    }


def project_vision_features(
    feats: jax.Array, pp: Dict, cfg: Gemma3VLMConfig
) -> jax.Array:
    """Patch features (B, n_patches, V) → soft tokens
    (B, mm_tokens_per_image, H_text), HF ``Gemma3MultiModalProjector``:
    avg-pool the patch grid to tokens_per_side², zero-centered (1+w)
    RMSNorm over V, project with the raw (V, H) matrix."""
    B, n_p, V = feats.shape
    pps = int(round(float(np.sqrt(n_p))))  # patches per side
    tps = int(round(float(np.sqrt(cfg.mm_tokens_per_image))))
    assert pps * pps == n_p and tps * tps == cfg.mm_tokens_per_image
    assert pps % tps == 0, (pps, tps)
    k = pps // tps
    x = feats.reshape(B, pps, pps, V)
    x = x.reshape(B, tps, k, tps, k, V).mean(axis=(2, 4))  # avg-pool k×k
    x = x.reshape(B, tps * tps, V).astype(jnp.float32)
    scale = jax.lax.rsqrt(
        jnp.mean(x * x, axis=-1, keepdims=True) + cfg.mm_norm_eps
    )
    x = x * scale * (1.0 + pp["norm"])
    return x @ pp["w"]


def encode_images_for_llm(
    params: Dict, pixels: jax.Array, cfg: Gemma3VLMConfig
) -> jax.Array:
    """Preprocessed pixels (B, H, W, 3) → (B, mm_tokens_per_image,
    H_text) soft tokens ready to splice."""
    feats = encode_image_patches(params["vision"], pixels, cfg.vision)
    return project_vision_features(feats, params["projector"], cfg)


def preprocess_image_siglip(img, image_size: int) -> np.ndarray:
    """PIL image / (H, W, 3) array / encoded bytes → (H, W, 3) f32.
    Gemma3's processor resizes SQUARE to the tower input (no crop,
    unlike CLIP's shorter-side+crop) and normalizes with mean=std=0.5
    (HF Gemma3ImageProcessor defaults, pan-and-scan off)."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img.astype(np.uint8))
    elif not hasattr(img, "convert"):
        from io import BytesIO

        img = Image.open(BytesIO(img))
    img = img.convert("RGB").resize(
        (image_size, image_size), Image.BICUBIC
    )
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - 0.5) / 0.5


def image_block_overlay(
    ids, image_token_id: int, n_tokens: int, n_images: int, P_pad: int
) -> np.ndarray:
    """(1, P_pad, P_pad) bool OR-visibility mask for the LEFT-PADDED
    spliced layout: rows of the same image block see each other
    bidirectionally (HF token_type_ids_mask_function — same group only,
    no attending to future images)."""
    groups = []
    seen = 0
    for tid in ids:
        if tid == image_token_id and seen < n_images:
            groups.extend([seen] * n_tokens)
            seen += 1
        else:
            groups.append(-1)
    g = np.full((P_pad,), -1, np.int64)
    g[P_pad - len(groups):] = groups[-P_pad:] if len(groups) > P_pad \
        else groups
    same = (g[:, None] == g[None, :]) & (g[:, None] >= 0)
    return same[None]


class Gemma3VLMGenerator:
    """Host-facing Gemma3 multimodal generation: tokenize + preprocess +
    project + splice + left-pad to a bucket + jitted generate — the
    SigLIP-tower sibling of ``llava.LlavaGenerator``."""

    def __init__(
        self,
        params: Optional[Dict] = None,
        cfg: Optional[Gemma3VLMConfig] = None,
        tokenizer=None,
        checkpoint_path: Optional[str] = None,
        prompt_buckets=(256, 512, 1024),
        seed: int = 0,
    ) -> None:
        from multimodal_rag_tpu.models.tokenizer import (
            ByteTokenizer,
            load_decoder_tokenizer,
        )

        self.pretrained = False
        if params is None and checkpoint_path:
            try:
                params, cfg = load_hf_gemma3_vlm(checkpoint_path)
                self.pretrained = True
                logger.info(
                    "Loaded Gemma3 VLM checkpoint from %s", checkpoint_path
                )
            except Exception as e:  # noqa: BLE001 — degrade, don't die
                logger.error(
                    "Failed to load Gemma3 VLM checkpoint %s (%s); "
                    "falling back to random init", checkpoint_path, e,
                )
                params = None
        if tokenizer is None and self.pretrained:
            tokenizer = load_decoder_tokenizer(checkpoint_path)
            if tokenizer is None:
                logger.error(
                    "Checkpoint %s has no tokenizer.json; byte-tokenizer "
                    "ids DO NOT match the pretrained vocabulary — output "
                    "will be gibberish.", checkpoint_path,
                )
        if tokenizer is None:
            tokenizer = ByteTokenizer()
        self.tokenizer = tokenizer
        if cfg is None:
            # Offline default: tiny towers, byte vocab — real graph/cost.
            from multimodal_rag_tpu.models.siglip import SigLIPConfig

            cfg = Gemma3VLMConfig(
                text=DecoderConfig(
                    vocab_size=max(512, tokenizer.vocab_size) + 1,
                    hidden_dim=512, num_layers=4, num_heads=8,
                    num_kv_heads=2, head_dim=64, ff_dim=1536,
                    qk_norm=True, post_norms=True,
                    layer_windows=(1024, 0, 1024, 0),
                    rope_local_theta=10000.0,
                    act="gelu_tanh", scale_embeddings=True,
                    rms_one_offset=True,
                ),
                vision=SigLIPConfig(
                    image_size=224, patch_size=16, vision_width=256,
                    vision_layers=4, vision_heads=8, embed_dim=256,
                    compute_dtype=jnp.float32,
                ),
                image_token_id=max(512, tokenizer.vocab_size),
                mm_tokens_per_image=49,
            )
        if params is None:
            logger.warning(
                "Serving with RANDOM-INIT Gemma3 VLM weights: multimodal "
                "output will be gibberish. Point MMRAG_MLLM_CHECKPOINT_PATH "
                "at a local Gemma3 safetensors snapshot."
            )
            params = init_gemma3_vlm_params(jax.random.key(seed), cfg)
        self.cfg = cfg
        self.params = params
        self.prompt_buckets = tuple(prompt_buckets)
        self.eos_id = getattr(tokenizer, "eos_id", 2)

    def _encode_prompt_with_images(self, prompt: str, n_images: int):
        """Gemma3 chat framing with one placeholder id per image."""
        ids = list(self.tokenizer.encode("<start_of_turn>user\n"))
        ids.extend([self.cfg.image_token_id] * n_images)
        tail = self.tokenizer.encode(
            prompt + "<end_of_turn>\n<start_of_turn>model\n"
        )
        ids.extend(
            tail[1:]
            if getattr(self.tokenizer, "bos_id", None) is not None
            else tail
        )
        return ids

    def prompt_rows(self, prompt: str, images=()):
        """Soft-token serving form (serving_decode._admit_embeds):
        ``(expanded_ids, embeds (T, H) f32, overlay (T, T) bool|None)``
        — the llava sibling's contract (llava.LlavaGenerator.prompt_rows)
        plus Gemma3's bidirectional image-block overlay, built UNPADDED
        (the decode server pads it into the row's layout). Over-long
        prompts left-truncate and drop the overlay, matching
        :meth:`generate`'s conservative causal fallback."""
        from multimodal_rag_tpu.models.llava import splice_multimodal

        img_embeds = None
        if images:
            pixels = jnp.asarray(
                np.stack([
                    preprocess_image_siglip(im, self.cfg.vision.image_size)
                    for im in images
                ])
            )
            img_embeds = encode_images_for_llm(self.params, pixels, self.cfg)
        ids = self._encode_prompt_with_images(prompt, len(images))
        embeds = splice_multimodal(self.params, ids, img_embeds, self.cfg)
        exp = []
        seen = 0
        for tid in ids:
            if tid == self.cfg.image_token_id and seen < len(images):
                exp.extend([tid] * self.cfg.n_image_tokens)
                seen += 1
            else:
                exp.append(tid)
        assert len(exp) == embeds.shape[0], (len(exp), embeds.shape)
        cap = self.prompt_buckets[-1]
        overlay = None
        if len(exp) > cap:
            logger.warning(
                "Prompt (%d rows incl. image tokens) exceeds bucket %d; "
                "left-truncating — image context may degrade",
                len(exp), cap,
            )
            embeds = embeds[-cap:]
            exp = exp[-cap:]
        elif images:
            T = len(exp)
            overlay = np.asarray(image_block_overlay(
                ids, self.cfg.image_token_id, self.cfg.n_image_tokens,
                len(images), T,
            ))[0]
        return exp, np.asarray(embeds, np.float32), overlay

    def generate(
        self,
        prompt: str,
        images=(),
        max_new_tokens: int = 256,
        temperature: float = 0.7,
        top_k: int = 64,
        seed: int = 0,
    ) -> str:
        from multimodal_rag_tpu.models.decoder import (
            GEN_BUCKETS,
            bucket_for,
            generate_tokens_embeds,
            snap_temperature,
        )
        from multimodal_rag_tpu.models.llava import splice_multimodal

        img_embeds = None
        if images:
            pixels = jnp.asarray(
                np.stack([
                    preprocess_image_siglip(im, self.cfg.vision.image_size)
                    for im in images
                ])
            )
            img_embeds = encode_images_for_llm(self.params, pixels, self.cfg)
        ids = self._encode_prompt_with_images(prompt, len(images))
        embeds = splice_multimodal(self.params, ids, img_embeds, self.cfg)

        P_pad = bucket_for(embeds.shape[0], self.prompt_buckets)
        overlay = None
        if embeds.shape[0] > P_pad:
            logger.warning(
                "Prompt (%d rows incl. image tokens) exceeds bucket %d; "
                "left-truncating — image context may degrade",
                embeds.shape[0], P_pad,
            )
            embeds = embeds[-P_pad:]
            # Truncation shifted the layout; skip the bidirectional
            # overlay rather than misalign it (plain causal is the
            # conservative fallback).
        elif images:
            overlay = image_block_overlay(
                ids, self.cfg.image_token_id, self.cfg.n_image_tokens,
                len(images), P_pad,
            )
        pad = P_pad - embeds.shape[0]
        emb_p = np.zeros((1, P_pad, embeds.shape[1]), np.float32)
        mask = np.zeros((1, P_pad), np.int32)
        emb_p[0, pad:] = embeds
        mask[0, pad:] = 1

        max_new = bucket_for(max_new_tokens, GEN_BUCKETS)
        toks, lengths = generate_tokens_embeds(
            self.params["lm"],
            jnp.asarray(emb_p),
            jnp.asarray(mask),
            jax.random.key(seed),
            self.cfg.text,
            max_new_tokens=max_new,
            temperature=snap_temperature(temperature),
            top_k=int(top_k),
            eos_id=int(self.eos_id),
            overlay=None if overlay is None else jnp.asarray(overlay),
        )
        n = min(int(np.asarray(lengths)[0]), max_new_tokens)
        return self.tokenizer.decode(np.asarray(toks)[0, :n].tolist())
