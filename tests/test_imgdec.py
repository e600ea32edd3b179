"""Native C++ image decode stage (native/imgdec.cc) vs the PIL path."""

import io

import numpy as np
import pytest

from multimodal_rag_tpu.ops import image_prep


def encode(arr: np.ndarray, fmt: str) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, fmt)
    return buf.getvalue()


def gradient(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 // max(w - 1, 1)), (yy * 255 // max(h - 1, 1)),
         ((xx + yy) % 256)], axis=-1
    ).astype(np.uint8)


native_built = image_prep._native_lib() is not None


@pytest.mark.skipif(not native_built, reason="libmmimg.so not built")
class TestNativeDecode:
    def test_png_shape_and_content(self):
        arr = gradient(320, 240)
        out = image_prep.stage_image(encode(arr, "PNG"), 64)
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8
        # Center crop of a horizontal gradient: left column darker R than
        # right; vertical gradient top G < bottom G.
        assert out[:, 0, 0].mean() < out[:, -1, 0].mean()
        assert out[0, :, 1].mean() < out[-1, :, 1].mean()

    def test_jpeg_roundtrip_close_to_pil(self):
        arr = gradient(200, 160)
        data = encode(arr, "JPEG")
        native = image_prep.stage_image(data, 64).astype(np.int32)

        from PIL import Image

        img = Image.open(io.BytesIO(data))
        lib = image_prep._IMGLIB
        try:
            image_prep._IMGLIB = None  # force PIL path
            pil = image_prep.stage_image(img, 64).astype(np.int32)
        finally:
            image_prep._IMGLIB = lib
        # Same geometry, nearest sampling differences of a few pixels: the
        # rasters must be close on smooth content.
        assert np.abs(native - pil).mean() < 12.0

    def test_square_input_identity_geometry(self):
        arr = gradient(64, 64)
        out = image_prep.stage_image(encode(arr, "PNG"), 64)
        np.testing.assert_array_equal(out, arr)

    def test_garbage_bytes_fall_back_cleanly(self):
        with pytest.raises(Exception):
            image_prep.stage_image(b"\xff\xd8garbage-not-a-jpeg" * 3, 64)

    def test_bmp_falls_back_to_pil(self):
        arr = gradient(80, 80)
        out = image_prep.stage_image(encode(arr, "BMP"), 64)
        assert out.shape == (64, 64, 3)


class TestStagePipeline:
    def test_preprocess_batch_bytes(self):
        arr = gradient(128, 96)
        pixels = image_prep.preprocess_batch(
            [encode(arr, "PNG"), encode(arr, "JPEG")], out_size=64
        )
        assert pixels.shape == (2, 64, 64, 3)
        assert np.isfinite(np.asarray(pixels)).all()
