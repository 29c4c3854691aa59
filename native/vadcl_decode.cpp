// vadcl_tpu native data-path: threaded JPEG decode + resize + normalize.
//
// The reference's input pipeline decodes JPEG frames with cv2 and resizes
// with torchvision on the Python side (dataset/utils_dataset.py:23-38,
// :168-190).  This is the TPU framework's native-runtime equivalent: a small
// C++ library (libjpeg-turbo + a PIL-compatible triangle-filter resampler +
// a std::thread pool) that turns a batch of frame paths into a ready
// (N, H, W, 3) float32 [0,1] tensor without holding the GIL.
//
// Exposed C ABI (consumed by vadcl_tpu/data/native.py via ctypes):
//   int vadcl_decode_resize_batch(const char** paths, int n,
//                                 int out_h, int out_w,
//                                 float* out,       // n*out_h*out_w*3
//                                 int num_threads);
// Returns 0 on success, else the 1-based index of the first failing path.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file to interleaved RGB8.  Returns false on failure.
bool decode_jpeg(const char* path, std::vector<unsigned char>& rgb, int* w,
                 int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb.resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// PIL-compatible separable triangle (bilinear) resampling with antialias:
// when downscaling, the filter support scales with the ratio so output
// pixels average over their whole source footprint — matching
// PIL.Image.resize(..., BILINEAR), which the Python path uses.
struct Weights {
  std::vector<int> bounds;   // first source index per output pixel
  std::vector<float> coefs;  // ksize coefficients per output pixel
  int ksize = 0;
};

Weights precompute_weights(int in_size, int out_size) {
  Weights wt;
  const double scale = double(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // triangle support = 1
  wt.ksize = int(std::ceil(support)) * 2 + 1;
  wt.bounds.resize(out_size);
  wt.coefs.assign(size_t(out_size) * wt.ksize, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    double total = 0.0;
    std::vector<double> k(xmax - xmin);
    for (int x = xmin; x < xmax; ++x) {
      double v = (x - center + 0.5) / filterscale;
      double weight = (std::abs(v) < 1.0) ? 1.0 - std::abs(v) : 0.0;
      k[x - xmin] = weight;
      total += weight;
    }
    wt.bounds[xx] = xmin;
    for (int i = 0; i < xmax - xmin; ++i) {
      wt.coefs[size_t(xx) * wt.ksize + i] =
          total > 0 ? float(k[i] / total) : 0.0f;
    }
  }
  return wt;
}

// Shared horizontal pass: RGB8 (h, w) -> fp32 (h, out_w, 3), 0-255 scale.
void horizontal_pass(const unsigned char* src, int w, int h, int out_w,
                     const Weights& wx, std::vector<float>& tmp) {
  tmp.resize(size_t(h) * out_w * 3);
  for (int y = 0; y < h; ++y) {
    const unsigned char* row = src + size_t(y) * w * 3;
    float* orow = tmp.data() + size_t(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const float* k = wx.coefs.data() + size_t(x) * wx.ksize;
      int x0 = wx.bounds[x];
      float r = 0, g = 0, b = 0;
      for (int i = 0; i < wx.ksize; ++i) {
        int xi = x0 + i;
        if (xi >= w) break;
        float c = k[i];
        r += c * row[xi * 3 + 0];
        g += c * row[xi * 3 + 1];
        b += c * row[xi * 3 + 2];
      }
      orow[x * 3 + 0] = r;
      orow[x * 3 + 1] = g;
      orow[x * 3 + 2] = b;
    }
  }
}

// Resize RGB8 (h, w) -> float32 (out_h, out_w), already /255.
void resize_normalize(const unsigned char* src, int w, int h, int out_w,
                      int out_h, float* dst) {
  Weights wx = precompute_weights(w, out_w);
  Weights wy = precompute_weights(h, out_h);
  std::vector<float> tmp;
  horizontal_pass(src, w, h, out_w, wx, tmp);
  // vertical pass -> dst
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < out_h; ++y) {
    const float* k = wy.coefs.data() + size_t(y) * wy.ksize;
    int y0 = wy.bounds[y];
    float* orow = dst + size_t(y) * out_w * 3;
    std::memset(orow, 0, sizeof(float) * out_w * 3);
    for (int i = 0; i < wy.ksize; ++i) {
      int yi = y0 + i;
      if (yi >= h) break;
      float c = k[i];
      const float* irow = tmp.data() + size_t(yi) * out_w * 3;
      for (int x = 0; x < out_w * 3; ++x) orow[x] += c * irow[x];
    }
    for (int x = 0; x < out_w * 3; ++x) orow[x] *= inv255;
  }
}

// Resize RGB8 (h, w) -> uint8 (out_h, out_w): PIL's quantization point
// (round-half-up + clamp at the end of the vertical pass, like Pillow's
// clip8), so pixels land on the same uint8 grid the reference pipeline's
// PIL resize produces.
void resize_quantize(const unsigned char* src, int w, int h, int out_w,
                     int out_h, unsigned char* dst) {
  Weights wx = precompute_weights(w, out_w);
  Weights wy = precompute_weights(h, out_h);
  std::vector<float> tmp;
  horizontal_pass(src, w, h, out_w, wx, tmp);
  std::vector<float> acc(size_t(out_w) * 3);
  for (int y = 0; y < out_h; ++y) {
    const float* k = wy.coefs.data() + size_t(y) * wy.ksize;
    int y0 = wy.bounds[y];
    std::fill(acc.begin(), acc.end(), 0.0f);
    for (int i = 0; i < wy.ksize; ++i) {
      int yi = y0 + i;
      if (yi >= h) break;
      float c = k[i];
      const float* irow = tmp.data() + size_t(yi) * out_w * 3;
      for (int x = 0; x < out_w * 3; ++x) acc[x] += c * irow[x];
    }
    unsigned char* orow = dst + size_t(y) * out_w * 3;
    for (int x = 0; x < out_w * 3; ++x) {
      float v = acc[x] + 0.5f;
      orow[x] = v <= 0.0f ? 0 : (v >= 255.0f ? 255 : (unsigned char)v);
    }
  }
}

}  // namespace

namespace {

template <typename T, typename ResizeFn>
int run_batch(const char** paths, int n, int out_h, int out_w, T* out,
              int num_threads, ResizeFn resize) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      int w = 0, h = 0;
      if (!decode_jpeg(paths[i], rgb, &w, &h)) {
        int expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
        return;
      }
      resize(rgb.data(), w, h, out_w, out_h,
             out + size_t(i) * out_h * out_w * 3);
    }
  };
  std::vector<std::thread> threads;
  int nthreads = std::min(num_threads, n);
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // namespace

extern "C" int vadcl_decode_resize_batch(const char** paths, int n, int out_h,
                                         int out_w, float* out,
                                         int num_threads) {
  return run_batch(paths, n, out_h, out_w, out, num_threads,
                   resize_normalize);
}

// uint8 output on the PIL quantization grid (see resize_quantize) — feeds
// the uint8-on-the-wire input pipeline without a Python-side rounding pass.
extern "C" int vadcl_decode_resize_batch_u8(const char** paths, int n,
                                            int out_h, int out_w,
                                            unsigned char* out,
                                            int num_threads) {
  return run_batch(paths, n, out_h, out_w, out, num_threads, resize_quantize);
}
