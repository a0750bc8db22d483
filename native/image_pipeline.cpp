// Native host-side image pipeline: JPEG decode + bicubic resize + crop.
//
// Role: the TPU-side framework keeps all math in XLA/Pallas; the only hot
// host loop left is image decode/augment (the reference spends it in
// torchvision/PIL inside DataLoader worker processes —
// ref: tools/datasets.py:280-335, main.py:286-316). This library provides
// that stage as a small C++ core driven from the Python loader via ctypes:
// no Python-object churn per pixel, releases the GIL for the whole
// decode+resize, and scales with threads instead of fork'd workers.
//
// Exposed C ABI:
//   ppf_decode(data, size, &w, &h, out_rgb)         — JPEG -> RGB8
//   ppf_jpeg_dims(data, size, &w, &h)               — header-only probe
//   ppf_eval_transform(data, size, resize_short, crop, out_f32)
//       — decode -> bicubic shorter-side resize -> center crop -> [0,1]
//         floats (HWC). Mirrors data/transforms.py::build_eval_transform.
//   ppf_train_crop_resize(data, size, x, y, w, h, out_size, flip, out_f32)
//       — decode -> crop box -> bicubic resize to out_size -> optional
//         horizontal flip -> [0,1] floats. The random crop box / flip are
//         sampled in Python (keeps RNG streams identical to the PIL path).
//
// Bicubic uses the Catmull-Rom family kernel with a = -0.5 (the same family
// PIL/torchvision use). All functions return 0 on success.

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG byte buffer to RGB8. If min_dim > 0, use libjpeg's DCT
// scaling to decode directly at the smallest resolution whose shorter side
// is still >= min_dim — large images never materialize at full size.
// Returns 0 on success.
int decode_jpeg(const unsigned char* data, long size, std::vector<uint8_t>* out,
                int* width, int* height, int min_dim = 0) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  if (min_dim > 0) {
    const int short_side =
        std::min(cinfo.image_width, cinfo.image_height);
    // libjpeg supports scale_num/8 for scale_num in 1..16
    int num = 8;
    while (num > 1 && short_side * (num - 1) / 8 >= min_dim) --num;
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  out->resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *width = w;
  *height = h;
  return 0;
}

inline float cubic_kernel(float x) {
  // Catmull-Rom-family bicubic, a = -0.5 (PIL-compatible family)
  constexpr float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

// Precompute antialiased bicubic taps for one axis (PIL-compatible: on
// downscale the kernel support widens by the scale factor).
struct AxisTaps {
  int ntaps;
  std::vector<int> idx;     // out_dim * ntaps source indices
  std::vector<float> wgt;   // out_dim * ntaps weights (normalized)
};

AxisTaps make_taps(int in_dim, int out_dim, int offset) {
  AxisTaps taps;
  const double scale = static_cast<double>(in_dim) / out_dim;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;  // bicubic support = 2
  taps.ntaps = static_cast<int>(std::ceil(support)) * 2 + 1;
  taps.idx.assign(static_cast<size_t>(out_dim) * taps.ntaps, 0);
  taps.wgt.assign(static_cast<size_t>(out_dim) * taps.ntaps, 0.0f);
  for (int o = 0; o < out_dim; ++o) {
    const double center = (o + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    int hi = static_cast<int>(center + support + 0.5);
    lo = std::max(lo, 0);
    hi = std::min(hi, in_dim);
    double wsum = 0.0;
    for (int s = lo; s < hi; ++s) {
      const double w =
          cubic_kernel(static_cast<float>((s - center + 0.5) / filterscale));
      taps.idx[static_cast<size_t>(o) * taps.ntaps + (s - lo)] = s + offset;
      taps.wgt[static_cast<size_t>(o) * taps.ntaps + (s - lo)] =
          static_cast<float>(w);
      wsum += w;
    }
    const int n = hi - lo;
    for (int t = 0; t < n; ++t) {
      taps.wgt[static_cast<size_t>(o) * taps.ntaps + t] /=
          static_cast<float>(wsum);
    }
    for (int t = n; t < taps.ntaps; ++t) {
      taps.idx[static_cast<size_t>(o) * taps.ntaps + t] = offset + lo;
      taps.wgt[static_cast<size_t>(o) * taps.ntaps + t] = 0.0f;
    }
  }
  return taps;
}

// Separable antialiased bicubic resize of an RGB8 crop region to
// (out_w, out_h) floats in [0,255] — PIL-compatible semantics.
void bicubic_resize(const uint8_t* src, int src_w, int src_h,
                    int x0, int y0, int box_w, int box_h,
                    float* dst, int out_w, int out_h) {
  const AxisTaps tx = make_taps(box_w, out_w, x0);
  const AxisTaps ty = make_taps(box_h, out_h, 0);

  // horizontal pass into a temp buffer (box_h rows x out_w cols)
  std::vector<float> tmp(static_cast<size_t>(box_h) * out_w * 3);
  for (int sy_i = 0; sy_i < box_h; ++sy_i) {
    const uint8_t* row = src + static_cast<size_t>(y0 + sy_i) * src_w * 3;
    float* trow = tmp.data() + static_cast<size_t>(sy_i) * out_w * 3;
    for (int ox = 0; ox < out_w; ++ox) {
      float r = 0, g = 0, b = 0;
      const int* ii = &tx.idx[static_cast<size_t>(ox) * tx.ntaps];
      const float* ww = &tx.wgt[static_cast<size_t>(ox) * tx.ntaps];
      for (int t = 0; t < tx.ntaps; ++t) {
        const float w = ww[t];
        const uint8_t* px = row + ii[t] * 3;
        r += w * px[0];
        g += w * px[1];
        b += w * px[2];
      }
      trow[ox * 3 + 0] = r;
      trow[ox * 3 + 1] = g;
      trow[ox * 3 + 2] = b;
    }
  }
  // vertical pass: accumulate whole rows (contiguous, auto-vectorizes)
  const int row_n = out_w * 3;
  for (int oy = 0; oy < out_h; ++oy) {
    const int* ii = &ty.idx[static_cast<size_t>(oy) * ty.ntaps];
    const float* ww = &ty.wgt[static_cast<size_t>(oy) * ty.ntaps];
    float* drow = dst + static_cast<size_t>(oy) * row_n;
    std::fill(drow, drow + row_n, 0.0f);
    for (int t = 0; t < ty.ntaps; ++t) {
      const float w = ww[t];
      if (w == 0.0f) continue;
      const float* srow = tmp.data() + static_cast<size_t>(ii[t]) * row_n;
      for (int x = 0; x < row_n; ++x) drow[x] += w * srow[x];
    }
  }
}

void clamp_scale_inplace(float* p, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    p[i] = std::min(255.0f, std::max(0.0f, p[i])) * (1.0f / 255.0f);
  }
}

void hflip_inplace(float* p, int w, int h) {
  for (int y = 0; y < h; ++y) {
    float* row = p + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w / 2; ++x) {
      for (int c = 0; c < 3; ++c) {
        std::swap(row[x * 3 + c], row[(w - 1 - x) * 3 + c]);
      }
    }
  }
}

}  // namespace

extern "C" {

int ppf_jpeg_dims(const unsigned char* data, long size, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int ppf_decode(const unsigned char* data, long size, int* w, int* h,
               unsigned char* out /* caller-sized w*h*3 via ppf_jpeg_dims */) {
  std::vector<uint8_t> buf;
  int rc = decode_jpeg(data, size, &buf, w, h);
  if (rc) return rc;
  std::memcpy(out, buf.data(), buf.size());
  return 0;
}

int ppf_eval_transform(const unsigned char* data, long size, int resize_short,
                       int crop, float* out /* crop*crop*3 */) {
  std::vector<uint8_t> img;
  int w, h;
  int rc = decode_jpeg(data, size, &img, &w, &h, resize_short);
  if (rc) return rc;
  int nw, nh;
  if (w <= h) {
    nw = resize_short;
    nh = static_cast<int>(std::lround(static_cast<double>(h) * resize_short / w));
  } else {
    nh = resize_short;
    nw = static_cast<int>(std::lround(static_cast<double>(w) * resize_short / h));
  }
  std::vector<float> resized(static_cast<size_t>(nw) * nh * 3);
  bicubic_resize(img.data(), w, h, 0, 0, w, h, resized.data(), nw, nh);
  const int left = (nw - crop) / 2;
  const int top = (nh - crop) / 2;
  for (int y = 0; y < crop; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * crop * 3,
                resized.data() + ((static_cast<size_t>(top + y) * nw) + left) * 3,
                static_cast<size_t>(crop) * 3 * sizeof(float));
  }
  clamp_scale_inplace(out, static_cast<size_t>(crop) * crop * 3);
  return 0;
}

int ppf_train_crop_resize(const unsigned char* data, long size, int x, int y,
                          int cw, int ch, int out_size, int flip,
                          float* out /* out_size*out_size*3 */) {
  std::vector<uint8_t> img;
  int w, h;
  int rc = decode_jpeg(data, size, &img, &w, &h);
  if (rc) return rc;
  if (x < 0 || y < 0 || x + cw > w || y + ch > h || cw <= 0 || ch <= 0) {
    return 3;
  }
  bicubic_resize(img.data(), w, h, x, y, cw, ch, out, out_size, out_size);
  clamp_scale_inplace(out, static_cast<size_t>(out_size) * out_size * 3);
  if (flip) hflip_inplace(out, out_size, out_size);
  return 0;
}

}  // extern "C"
