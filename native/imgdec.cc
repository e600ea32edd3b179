// Native host-side image decode + staging for the TPU image pipeline.
//
// The reference decodes and preprocesses images entirely with Pillow on the
// host (reference app/utils/parser.py:463-481). This framework splits the
// work (SURVEY.md §2.4): the host only decodes the compressed bytes and
// nearest-resizes to a fixed staging raster; the per-pixel float work
// (bicubic resize, normalization) runs on device as one fused XLA pass
// (multimodal_rag_tpu/ops/image_prep.py). This file is the C++ decode
// stage — libjpeg/libpng directly, no Python object churn — exposed via a
// C ABI for ctypes (same pattern as kvstore.cc).
//
// mmimg_decode_stage(data, len, stage, out):
//   decode JPEG/PNG bytes -> RGB8, scale shorter side to `stage` with
//   nearest sampling, center-crop to (stage, stage, 3) into `out`.
//   Returns 0 on success, negative error codes otherwise.

#include <csetjmp>
#include <cstdint>
#include <cstdio>  // jpeglib.h references FILE without including stdio
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode JPEG -> RGB8 vector. Returns false on failure.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Decode PNG (any layout) -> RGB8 via the libpng simplified API.
bool decode_png(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) return false;
  image.format = PNG_FORMAT_RGB;
  rgb->resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgb->data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  *w = image.width;
  *h = image.height;
  return true;
}

}  // namespace

extern "C" {

// 0 ok; -1 unknown format / decode failure; -2 bad args.
int mmimg_decode_stage(const uint8_t* data, size_t len, int stage,
                       uint8_t* out) {
  if (data == nullptr || out == nullptr || stage <= 0 || len < 8) return -2;

  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  bool ok = false;
  if (data[0] == 0xFF && data[1] == 0xD8) {
    ok = decode_jpeg(data, len, &rgb, &w, &h);
  } else if (data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' &&
             data[3] == 'G') {
    ok = decode_png(data, len, &rgb, &w, &h);
  }
  if (!ok || w <= 0 || h <= 0) return -1;

  // Scale shorter side to `stage` (aspect preserved), nearest sampling,
  // then center crop — identical geometry to image_prep.stage_image.
  const double scale = static_cast<double>(stage) / (w < h ? w : h);
  int sw = static_cast<int>(w * scale + 0.5);
  int sh = static_cast<int>(h * scale + 0.5);
  if (sw < stage) sw = stage;
  if (sh < stage) sh = stage;
  const int left = (sw - stage) / 2;
  const int top = (sh - stage) / 2;

  for (int y = 0; y < stage; ++y) {
    // Nearest source row for scaled row (y + top).
    int sy = static_cast<int>((y + top) * (static_cast<double>(h) / sh));
    if (sy >= h) sy = h - 1;
    const uint8_t* src_row = rgb.data() + static_cast<size_t>(sy) * w * 3;
    uint8_t* dst_row = out + static_cast<size_t>(y) * stage * 3;
    for (int x = 0; x < stage; ++x) {
      int sx = static_cast<int>((x + left) * (static_cast<double>(w) / sw));
      if (sx >= w) sx = w - 1;
      std::memcpy(dst_row + x * 3, src_row + sx * 3, 3);
    }
  }
  return 0;
}

// Probe: returns 1 if the bytes look like a decodable format.
int mmimg_probe(const uint8_t* data, size_t len) {
  if (data == nullptr || len < 8) return 0;
  if (data[0] == 0xFF && data[1] == 0xD8) return 1;
  if (data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' && data[3] == 'G')
    return 1;
  return 0;
}

}  // extern "C"
