"""LLaVA-style multimodal generation on TPU.

The reference's vision path is an HTTP round-trip to an Ollama-hosted
llava model (``app/models/mllm_adapter.py:211-263``: base64 images in the
``/api/generate`` body). This module runs the same architecture natively:
a CLIP vision tower (models/clip.py — already here for cross-modal
search) feeds patch features through a 2-layer MLP projector into the
decoder's embedding space (models/decoder.py), and generation proceeds
over the spliced sequence — the HF ``LlavaForConditionalGeneration``
recipe, TPU-first:

* Vision features come from the penultimate tower block
  (``vision_feature_layer=-2``) with the CLS slot dropped
  (``vision_feature_select_strategy="default"``), matching llava-1.5.
* Splicing happens host-side (ragged by nature), producing fixed-bucket
  left-padded (B, P, H) embeddings for the jitted
  ``generate_tokens_embeds`` — no dynamic shapes ever reach XLA.
* All three stages (tower, projector, decoder prefill+decode) are the
  existing jitted paths; the projector is two matmuls fused by XLA.

Weights load from a local HF llava safetensors snapshot
(``load_hf_llava``); the mapping is golden-tested against the torch
forward in ``tests/test_llava.py``.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rag_tpu.models.clip import (
    CLIPConfig,
    encode_image_patches,
    map_hf_vision_model,
    preprocess_image,
)
from multimodal_rag_tpu.models.decoder import (
    DecoderConfig,
    GEN_BUCKETS,
    _embed_tokens,
    bucket_for,
    config_from_hf,
    generate_tokens_embeds,
    map_hf_causal_lm,
    snap_temperature,
)

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class LlavaConfig:
    text: DecoderConfig
    vision: CLIPConfig
    image_token_id: int = 32000
    vision_feature_layer: int = -2
    drop_cls: bool = True  # "default" select strategy
    projector_act: str = "gelu"

    @property
    def n_image_tokens(self) -> int:
        return self.vision.n_patches + (0 if self.drop_cls else 1)


def _vision_cfg_from_hf(hf: dict) -> CLIPConfig:
    """HF ``vision_config`` → CLIPConfig (text-tower fields unused)."""
    return CLIPConfig(
        image_size=hf.get("image_size", 336),
        patch_size=hf.get("patch_size", 14),
        vision_width=hf.get("hidden_size", 1024),
        vision_layers=hf.get("num_hidden_layers", 24),
        vision_heads=hf.get("num_attention_heads", 16),
        embed_dim=hf.get("projection_dim", 768),
    )


def load_hf_llava(path: str) -> Tuple[Dict, LlavaConfig]:
    """Load an HF llava safetensors snapshot (directory with config.json).

    Key spaces: ``language_model.model.*`` (Llama/Vicuna decoder),
    ``vision_tower.vision_model.*`` (CLIPVisionModel),
    ``multi_modal_projector.linear_{1,2}`` (the MLP projector).
    """
    from safetensors import safe_open

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    assert hf.get("model_type") == "llava", hf.get("model_type")

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

    text_cfg = config_from_hf(hf["text_config"])
    vision_cfg = _vision_cfg_from_hf(hf.get("vision_config", {}))
    lm_params, text_cfg = map_hf_causal_lm(
        tensors, text_cfg, prefix="language_model."
    )
    vision = map_hf_vision_model(
        tensors,
        vision_cfg.vision_layers,
        prefix="vision_tower.vision_model.",
    )

    def t(name):
        return jnp.asarray(tensors[name], jnp.float32)

    params = {
        "lm": lm_params,
        "vision": vision,
        "projector": {
            # HF Linear (out, in) → (in, out).
            "w1": t("multi_modal_projector.linear_1.weight").T,
            "b1": t("multi_modal_projector.linear_1.bias"),
            "w2": t("multi_modal_projector.linear_2.weight").T,
            "b2": t("multi_modal_projector.linear_2.bias"),
        },
    }
    cfg = LlavaConfig(
        text=text_cfg,
        vision=vision_cfg,
        image_token_id=hf.get("image_token_index", 32000),
        vision_feature_layer=hf.get("vision_feature_layer", -2),
        drop_cls=hf.get("vision_feature_select_strategy", "default")
        == "default",
        projector_act=hf.get("projector_hidden_act", "gelu"),
    )
    return params, cfg


def init_llava_params(rng: jax.Array, cfg: LlavaConfig) -> Dict:
    """Seeded random init with the same pytree shape as the loader."""
    from multimodal_rag_tpu.models import clip as clip_mod
    from multimodal_rag_tpu.models.decoder import init_params as init_lm

    k1, k2, k3 = jax.random.split(rng, 3)
    clip_params = clip_mod.init_params(k2, cfg.vision)
    vw, h = cfg.vision.vision_width, cfg.text.hidden_dim

    def tn(key, shape, std=0.02):
        return (
            jax.random.truncated_normal(key, -2.0, 2.0, shape) * std
        ).astype(jnp.float32)

    ka, kb = jax.random.split(k3)
    return {
        "lm": init_lm(k1, cfg.text),
        "vision": clip_params["vision"],
        "projector": {
            "w1": tn(ka, (vw, h)),
            "b1": jnp.zeros((h,), jnp.float32),
            "w2": tn(kb, (h, h)),
            "b2": jnp.zeros((h,), jnp.float32),
        },
    }


@partial(jax.jit, static_argnames=("act",))
def _project(pp: Dict, feats: jax.Array, act: str = "gelu") -> jax.Array:
    h = feats @ pp["w1"] + pp["b1"]
    # Honor the checkpoint's projector_hidden_act: llava-1.5 ships exact
    # "gelu", but variants use the tanh approximation or quick_gelu — a
    # silently-wrong activation degrades grounding with no error.
    if act in ("gelu_new", "gelu_fast", "gelu_pytorch_tanh"):
        h = jax.nn.gelu(h, approximate=True)
    elif act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:  # "gelu" (exact) and unknown values fall back to exact
        h = jax.nn.gelu(h, approximate=False)
    return h @ pp["w2"] + pp["b2"]


def encode_images_for_llm(
    params: Dict, pixels: jax.Array, cfg: LlavaConfig
) -> jax.Array:
    """Preprocessed pixels (N, H, W, 3) → (N, n_image_tokens, text_hidden)
    f32 embeddings ready to splice between token embeddings."""
    feats = encode_image_patches(
        {"vision": params["vision"]},
        pixels,
        cfg.vision,
        feature_layer=cfg.vision_feature_layer,
        drop_cls=cfg.drop_cls,
    )
    return _project(params["projector"], feats, act=cfg.projector_act)


def splice_multimodal(
    params: Dict,
    ids: Sequence[int],
    image_embeds: Optional[jax.Array],
    cfg: LlavaConfig,
) -> np.ndarray:
    """Host-side splice: token ids (with ``image_token_id`` placeholders)
    + per-image embeddings → (T, H) f32 input embeddings. The i-th
    placeholder expands to the i-th image's ``n_image_tokens`` rows."""
    ids_arr = jnp.asarray([list(ids)], jnp.int32)
    tok_embeds = np.asarray(
        _embed_tokens(params["lm"], ids_arr, cfg.text).astype(jnp.float32)
    )[0]
    if image_embeds is None:
        return tok_embeds
    image_embeds = np.asarray(image_embeds, np.float32)
    rows: List[np.ndarray] = []
    img_i = 0
    for pos, tid in enumerate(ids):
        if tid == cfg.image_token_id and img_i < len(image_embeds):
            rows.append(image_embeds[img_i])
            img_i += 1
        else:
            rows.append(tok_embeds[pos: pos + 1])
    return np.concatenate(rows, axis=0)


class LlavaGenerator:
    """Host-facing multimodal generation: tokenize + preprocess images +
    splice + left-pad to a bucket + jitted generate."""

    def __init__(
        self,
        params: Dict | None = None,
        cfg: LlavaConfig | None = None,
        tokenizer=None,
        checkpoint_path: str | None = None,
        prompt_buckets: Sequence[int] = (256, 512, 1024),
        seed: int = 0,
    ) -> None:
        from multimodal_rag_tpu.models.tokenizer import (
            ByteTokenizer,
            load_decoder_tokenizer,
        )

        self.pretrained = False
        if params is None and checkpoint_path:
            try:
                params, cfg = load_hf_llava(checkpoint_path)
                self.pretrained = True
                logger.info("Loaded llava checkpoint from %s", checkpoint_path)
            except Exception as e:  # noqa: BLE001 — degrade, don't die
                logger.error(
                    "Failed to load llava checkpoint %s (%s); "
                    "falling back to random init", checkpoint_path, e,
                )
                params = None
        if tokenizer is None and self.pretrained:
            tokenizer = load_decoder_tokenizer(checkpoint_path)
            if tokenizer is None:
                # Real weights + byte-level fallback = garbage output
                # that health would report as "pretrained=true" — make
                # the mismatch impossible to miss.
                logger.error(
                    "Checkpoint %s has no tokenizer.json; falling back to "
                    "the byte tokenizer, whose ids DO NOT match the "
                    "pretrained vocabulary — output will be gibberish. "
                    "Ship the snapshot's tokenizer.json alongside the "
                    "weights.", checkpoint_path,
                )
        if tokenizer is None:
            tokenizer = ByteTokenizer()
        self.tokenizer = tokenizer
        if cfg is None:
            # Offline default: tiny towers, byte vocab — real graph/cost.
            cfg = LlavaConfig(
                text=DecoderConfig(
                    vocab_size=max(512, tokenizer.vocab_size) + 1,
                    hidden_dim=512, num_layers=4, num_heads=8,
                    num_kv_heads=2, head_dim=64, ff_dim=1536,
                ),
                vision=CLIPConfig(
                    image_size=224, patch_size=32, vision_width=256,
                    vision_layers=4, vision_heads=8,
                ),
                image_token_id=max(512, tokenizer.vocab_size),
            )
        if params is None:
            logger.warning(
                "Serving with RANDOM-INIT llava weights: multimodal output "
                "will be gibberish. Point MMRAG_MLLM_CHECKPOINT_PATH at a "
                "local llava safetensors snapshot."
            )
            params = init_llava_params(jax.random.key(seed), cfg)
        self.cfg = cfg
        self.params = params
        self.prompt_buckets = tuple(prompt_buckets)
        self.eos_id = getattr(tokenizer, "eos_id", 2)

    def _encode_prompt_with_images(self, prompt: str, n_images: int) -> List[int]:
        """LLaVA-1.5 chat framing: one image placeholder per image before
        the user text."""
        ids: List[int] = []
        img_tok = self.cfg.image_token_id
        # Tokenizers with the placeholder in-vocab handle "<image>" inline;
        # otherwise splice the id directly.
        ids.extend(self.tokenizer.encode("USER: "))
        ids.extend([img_tok] * n_images)
        tail = self.tokenizer.encode("\n" + prompt + "\nASSISTANT:")
        # Strip the BOS the tokenizer prepends (the prefix already has it).
        ids.extend(
            tail[1:]
            if getattr(self.tokenizer, "bos_id", None) is not None
            else tail
        )
        return ids

    def prompt_rows(
        self, prompt: str, images: Sequence[Any] = ()
    ) -> Tuple[List[int], np.ndarray, Optional[np.ndarray]]:
        """Soft-token serving form of a multimodal prompt (the
        continuous-batching path, serving_decode._admit_embeds):
        ``(expanded_ids, embeds, overlay)`` — ``embeds`` is the (T, H)
        f32 spliced input, ``expanded_ids`` the same-length id sequence
        with each image's placeholder repeated ``n_image_tokens`` times
        (host bookkeeping only; the model never re-embeds it), and
        ``overlay`` None (llava attention is plain causal; the Gemma3
        sibling returns its bidirectional image-block mask). Applies the
        same image-preserving middle-cut as :meth:`generate` when the
        prompt exceeds the top bucket."""
        img_embeds = None
        if images:
            pixels = jnp.asarray(
                np.stack([
                    preprocess_image(im, self.cfg.vision.image_size)
                    for im in images
                ])
            )
            img_embeds = encode_images_for_llm(self.params, pixels, self.cfg)
        ids = self._encode_prompt_with_images(prompt, len(images))
        embeds = splice_multimodal(self.params, ids, img_embeds, self.cfg)
        exp: List[int] = []
        seen = 0
        for tid in ids:
            if tid == self.cfg.image_token_id and seen < len(images):
                exp.extend([tid] * self.cfg.n_image_tokens)
                seen += 1
            else:
                exp.append(tid)
        assert len(exp) == embeds.shape[0], (len(exp), embeds.shape)
        cap = self.prompt_buckets[-1]
        if len(exp) > cap:
            img_end = (
                self._image_region_end(ids, len(images)) if images else 0
            )
            if 0 < img_end < cap:
                keep_tail = cap - img_end
                logger.warning(
                    "Prompt (%d rows) exceeds bucket %d; keeping the %d "
                    "image rows and truncating middle text",
                    len(exp), cap, img_end,
                )
                embeds = np.concatenate(
                    [embeds[:img_end], embeds[-keep_tail:]], axis=0
                )
                exp = exp[:img_end] + exp[-keep_tail:]
            else:
                if img_end:
                    logger.warning(
                        "Image region (%d rows) alone exceeds the prompt "
                        "bucket %d; image rows are truncated and "
                        "multimodal context is degraded", img_end, cap,
                    )
                embeds = embeds[-cap:]
                exp = exp[-cap:]
        return exp, np.asarray(embeds, np.float32), None

    def generate(
        self,
        prompt: str,
        images: Sequence[Any] = (),
        max_new_tokens: int = 256,
        temperature: float = 0.7,
        top_k: int = 64,
        seed: int = 0,
    ) -> str:
        """``images``: PIL images / (H, W, 3) arrays; preprocessed with
        CLIP normalization at the tower's native resolution."""
        img_embeds = None
        if images:
            pixels = jnp.asarray(
                np.stack(
                    [
                        preprocess_image(im, self.cfg.vision.image_size)
                        for im in images
                    ]
                )
            )
            img_embeds = encode_images_for_llm(self.params, pixels, self.cfg)
        ids = self._encode_prompt_with_images(prompt, len(images))
        embeds = splice_multimodal(self.params, ids, img_embeds, self.cfg)

        P_pad = bucket_for(embeds.shape[0], self.prompt_buckets)
        if embeds.shape[0] > P_pad:
            # Naive left-truncation would silently discard the image
            # rows (they sit at the front of the llava layout) and turn
            # multimodal generation text-only. Keep the image prefix and
            # cut the text MIDDLE instead, preserving the question tail.
            img_end = (
                self._image_region_end(ids, len(images)) if images else 0
            )
            if 0 < img_end < P_pad:
                keep_tail = P_pad - img_end
                logger.warning(
                    "Prompt (%d rows) exceeds bucket %d; keeping the %d "
                    "image rows and truncating middle text",
                    embeds.shape[0], P_pad, img_end,
                )
                embeds = np.concatenate(
                    [embeds[:img_end], embeds[-keep_tail:]], axis=0
                )
            else:
                if img_end:
                    logger.warning(
                        "Image region (%d rows) alone exceeds the prompt "
                        "bucket %d; image rows are truncated and "
                        "multimodal context is degraded — raise "
                        "prompt_buckets or send fewer images",
                        img_end, P_pad,
                    )
                embeds = embeds[-P_pad:]
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
            # temperature is an executable-selecting static: snap to the
            # serving grid (decoder.py TEMP_GRID), same as the text path.
            temperature=snap_temperature(temperature),
            top_k=int(top_k),
            eos_id=int(self.eos_id),
        )
        n = min(int(np.asarray(lengths)[0]), max_new_tokens)
        return self.tokenizer.decode(np.asarray(toks)[0, :n].tolist())

    def _image_region_end(self, ids: Sequence[int], n_images: int) -> int:
        """Row index (in the spliced sequence) one past the last image's
        rows — the prefix [0, end) must survive truncation for the
        generation to stay multimodal."""
        row = 0
        seen = 0
        for tid in ids:
            if tid == self.cfg.image_token_id and seen < n_images:
                row += self.cfg.n_image_tokens
                seen += 1
                if seen == n_images:
                    return row
            else:
                row += 1
        return row if seen else 0
