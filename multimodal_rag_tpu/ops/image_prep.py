"""Image preprocessing split host/device.

The reference's image path was all host-side Pillow (decode + resize +
re-encode, ``parser.py:463-481``). Here the hot path is split (SURVEY.md
§2.4): the host only *decodes* to a fixed staging raster — via the native
C++ stage (``native/imgdec.cc``: libjpeg/libpng directly, no Python image
objects) when built, PIL otherwise — and the per-pixel work — bicubic
resize, center crop, float conversion, CLIP normalization — runs on device
as one jitted batch op in bf16, so N figures cost one dispatch instead of
N PIL passes.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rag_tpu.models.clip import IMAGE_MEAN, IMAGE_STD

STAGE_SIZE = 256  # host staging raster (shorter side ≥ model input)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_IMGLIB: Optional[ctypes.CDLL] = None
_imglib_checked = False


def _native_lib() -> Optional[ctypes.CDLL]:
    """libmmimg.so if built (make -C native), else None → PIL fallback."""
    global _IMGLIB, _imglib_checked
    if _imglib_checked:
        return _IMGLIB
    _imglib_checked = True
    path = os.path.join(_NATIVE_DIR, "libmmimg.so")
    if not os.path.exists(path):
        # Build on demand, same as the native KV store (storage/kv.py).
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libmmimg.so"],
                check=True, capture_output=True,
            )
        except Exception:  # noqa: BLE001
            _IMGLIB = None
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.mmimg_decode_stage.restype = ctypes.c_int
        lib.mmimg_decode_stage.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_char_p,
        ]
        _IMGLIB = lib
    except OSError:
        _IMGLIB = None
    return _IMGLIB


def stage_image(img, stage_size: int = STAGE_SIZE) -> np.ndarray:
    """Decode + nearest-resize to (stage, stage, 3) uint8. Aspect ratio is
    preserved by scaling the shorter side then center-cropping — the cheap
    host half; everything per-pixel-float happens on device.

    Raw JPEG/PNG bytes go through the native C++ decoder when available;
    PIL images and other formats use the PIL path."""
    if isinstance(img, (bytes, bytearray)):
        lib = _native_lib()
        if lib is not None:
            out = np.empty((stage_size, stage_size, 3), np.uint8)
            rc = lib.mmimg_decode_stage(
                bytes(img), len(img), stage_size,
                out.ctypes.data_as(ctypes.c_char_p),
            )
            if rc == 0:
                return out
            # fall through to PIL on unknown formats / decode errors

    from PIL import Image

    if not hasattr(img, "convert"):
        from io import BytesIO

        img = Image.open(BytesIO(img))
    img = img.convert("RGB")
    w, h = img.size
    scale = stage_size / min(w, h)
    img = img.resize(
        (max(stage_size, int(round(w * scale))),
         max(stage_size, int(round(h * scale)))),
        Image.NEAREST,  # cheap; quality resize happens on device
    )
    w, h = img.size
    left, top = (w - stage_size) // 2, (h - stage_size) // 2
    img = img.crop((left, top, left + stage_size, top + stage_size))
    return np.asarray(img, np.uint8)


@functools.partial(jax.jit, static_argnames=("out_size",))
def device_preprocess(
    staged: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    out_size: int = 224,
) -> jax.Array:
    """(B, S, S, 3) uint8 → (B, out, out, 3) f32, normalized by the given
    per-channel stats (CLIP or SigLIP).

    Bicubic resize + normalization fused by XLA into one device pass.
    """
    x = staged.astype(jnp.float32) / 255.0
    B = x.shape[0]
    x = jax.image.resize(
        x, (B, out_size, out_size, 3), method="cubic"
    )
    return (x - mean) / std


def preprocess_batch(
    images: Sequence,
    out_size: int = 224,
    mean: np.ndarray = IMAGE_MEAN,
    std: np.ndarray = IMAGE_STD,
) -> jax.Array:
    """bytes/PIL images → device-preprocessed (B, out, out, 3) f32.
    Defaults to CLIP normalization stats; pass SigLIP's (0.5/0.5) for the
    SigLIP towers."""
    if not images:
        return jnp.zeros((0, out_size, out_size, 3), jnp.float32)
    staged = np.stack([stage_image(img) for img in images])
    return device_preprocess(
        jnp.asarray(staged), jnp.asarray(mean), jnp.asarray(std),
        out_size=out_size,
    )
