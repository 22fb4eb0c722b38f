// difashion_io — native host-side image pipeline for difashion_tpu.
//
// TPU-native equivalent of the runtime the reference gets from its dependencies
// (torch DataLoader worker processes + PIL decode inside the training step,
// /root/reference/DiFashion/models/difashion.py:139-142 and data_utils.py:15-45):
// JPEG/PNG decode (libjpeg/libpng), white-background alpha compositing,
// pad-to-square, PIL-compatible separable Lanczos-3 resampling, [-1,1]
// normalization, and a pthread-pool prefetching batch loader that keeps the
// accelerator fed without Python in the loop.
//
// C ABI only (consumed via ctypes from difashion_tpu/data/native.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> data;  // interleaved, row-major
};

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  std::vector<uint8_t> line;  // before setjmp: longjmp skips later destructors
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  // CMYK/YCCK (Adobe product imagery): decode as CMYK and convert below —
  // libjpeg has no direct CMYK->RGB path and would error out
  bool cmyk = (cinfo.jpeg_color_space == JCS_CMYK ||
               cinfo.jpeg_color_space == JCS_YCCK);
  cinfo.out_color_space = cmyk ? JCS_CMYK : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  if (cmyk) {
    // Adobe writers store CMYK inverted; libjpeg passes the raw bytes through,
    // so after the standard inversion-aware product, RGB = (c * k) / 255 on the
    // raw values (matches PIL's CMYK->RGB for Adobe JPEGs)
    line.resize(size_t(out->w) * 4);
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* lp = line.data();
      int y = cinfo.output_scanline;
      jpeg_read_scanlines(&cinfo, &lp, 1);
      uint8_t* q = out->data.data() + size_t(y) * out->w * 3;
      for (int x = 0; x < out->w; ++x) {
        const uint8_t* p = &line[size_t(x) * 4];
        int k = p[3];
        q[x * 3 + 0] = uint8_t(int(p[0]) * k / 255);
        q[x * 3 + 1] = uint8_t(int(p[1]) * k / 255);
        q[x * 3 + 2] = uint8_t(int(p[2]) * k / 255);
      }
    }
  } else {
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* row =
          out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PNG decode (RGBA kept so the caller can composite on white)
// ---------------------------------------------------------------------------

bool decode_png(FILE* f, Image* out) {
  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  // declared BEFORE setjmp: a longjmp from png error handling skips the
  // destructors of locals constructed after the jump point (leak per corrupt
  // PNG in a long-lived loader worker); in scope here, it is destroyed on the
  // error return path like any other local
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_set_expand(png);                // palette/gray/low-bit -> 8-bit RGB(A)
  png_set_strip_16(png);
  png_set_gray_to_rgb(png);
  png_set_add_alpha(png, 0xFF, PNG_FILLER_AFTER);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->channels = 4;
  out->data.resize(size_t(out->w) * out->h * 4);
  rows.resize(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 4;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  int c0 = fgetc(f);
  int c1 = fgetc(f);
  rewind(f);
  bool ok = false;
  if (c0 == 0xFF && c1 == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (c0 == 0x89 && c1 == 'P') {
    ok = decode_png(f, out);
  } else {
    ok = decode_jpeg(f, out);  // try jpeg as default
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// White-background composite + pad-to-square (reference README.md:117-160 prep)
// ---------------------------------------------------------------------------

Image composite_white(const Image& in) {
  if (in.channels == 3) return in;
  Image out;
  out.w = in.w;
  out.h = in.h;
  out.channels = 3;
  out.data.resize(size_t(in.w) * in.h * 3);
  for (size_t i = 0, n = size_t(in.w) * in.h; i < n; ++i) {
    const uint8_t* p = &in.data[i * 4];
    float a = p[3] / 255.0f;
    for (int c = 0; c < 3; ++c)
      out.data[i * 3 + c] =
          uint8_t(std::lround(p[c] * a + 255.0f * (1.0f - a)));
  }
  return out;
}

Image pad_square_white(const Image& in) {
  if (in.w == in.h) return in;
  int side = std::max(in.w, in.h);
  Image out;
  out.w = out.h = side;
  out.channels = 3;
  out.data.assign(size_t(side) * side * 3, 255);
  int x0 = (side - in.w) / 2, y0 = (side - in.h) / 2;
  for (int y = 0; y < in.h; ++y)
    std::memcpy(out.data.data() + (size_t(y + y0) * side + x0) * 3,
                in.data.data() + size_t(y) * in.w * 3, size_t(in.w) * 3);
  return out;
}

// ---------------------------------------------------------------------------
// Separable resampling with PIL-compatible filter windows.
// Matches PIL's algorithm: per output pixel, a clamped support window with
// normalized filter weights; Lanczos-3 (support 3.0) and bilinear (support 1.0).
// ---------------------------------------------------------------------------

inline double sinc(double x) {
  if (x == 0.0) return 1.0;
  x *= M_PI;
  return std::sin(x) / x;
}

inline double lanczos3(double x) {
  return (-3.0 <= x && x < 3.0) ? sinc(x) * sinc(x / 3.0) : 0.0;
}

inline double bilinear_f(double x) {
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

struct FilterTable {
  int ksize;
  std::vector<int> bounds;      // [out_size * 2] (xmin, xcount)
  std::vector<double> weights;  // [out_size * ksize]
};

FilterTable build_filter(int in_size, int out_size, bool lanczos) {
  double support = lanczos ? 3.0 : 1.0;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  support *= filterscale;
  int ksize = int(std::ceil(support)) * 2 + 1;
  FilterTable t;
  t.ksize = ksize;
  t.bounds.resize(size_t(out_size) * 2);
  t.weights.resize(size_t(out_size) * ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    int n = xmax - xmin;
    double* w = &t.weights[size_t(xx) * ksize];
    double ss = 0.0;
    for (int x = 0; x < n; ++x) {
      double arg = (x + xmin - center + 0.5) / filterscale;
      double v = lanczos ? lanczos3(arg) : bilinear_f(arg);
      w[x] = v;
      ss += v;
    }
    if (ss != 0.0)
      for (int x = 0; x < n; ++x) w[x] /= ss;
    t.bounds[xx * 2] = xmin;
    t.bounds[xx * 2 + 1] = n;
  }
  return t;
}

Image resample(const Image& in, int out_w, int out_h, bool lanczos) {
  // horizontal pass (uint8 -> float), then vertical pass (float -> uint8)
  FilterTable fx = build_filter(in.w, out_w, lanczos);
  FilterTable fy = build_filter(in.h, out_h, lanczos);
  std::vector<float> tmp(size_t(in.h) * out_w * 3);
  for (int y = 0; y < in.h; ++y) {
    const uint8_t* row = in.data.data() + size_t(y) * in.w * 3;
    for (int x = 0; x < out_w; ++x) {
      int xmin = fx.bounds[x * 2], n = fx.bounds[x * 2 + 1];
      const double* w = &fx.weights[size_t(x) * fx.ksize];
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = row + size_t(xmin + k) * 3;
        acc[0] += p[0] * w[k];
        acc[1] += p[1] * w[k];
        acc[2] += p[2] * w[k];
      }
      float* q = &tmp[(size_t(y) * out_w + x) * 3];
      q[0] = float(acc[0]);
      q[1] = float(acc[1]);
      q[2] = float(acc[2]);
    }
  }
  Image out;
  out.w = out_w;
  out.h = out_h;
  out.channels = 3;
  out.data.resize(size_t(out_w) * out_h * 3);
  for (int y = 0; y < out_h; ++y) {
    int ymin = fy.bounds[y * 2], n = fy.bounds[y * 2 + 1];
    const double* w = &fy.weights[size_t(y) * fy.ksize];
    for (int x = 0; x < out_w; ++x) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const float* p = &tmp[(size_t(ymin + k) * out_w + x) * 3];
        acc[0] += p[0] * w[k];
        acc[1] += p[1] * w[k];
        acc[2] += p[2] * w[k];
      }
      uint8_t* q = &out.data[(size_t(y) * out_w + x) * 3];
      for (int c = 0; c < 3; ++c)
        q[c] = uint8_t(std::clamp(std::lround(acc[c]), 0L, 255L));
    }
  }
  return out;
}

// catalog prep: decode -> composite white -> pad square -> lanczos to size.
// noexcept contract: this is called from pool workers and across the ctypes
// FFI boundary — an escaping exception (e.g. bad_alloc from a corrupt header
// declaring 65535x65535) would std::terminate the process instead of taking
// the white-null / IOError failure path.
bool prepare_catalog(const char* path, int size,
                     float* out /* size*size*3 */) noexcept try {
  Image img;
  if (!decode_file(path, &img)) return false;
  // 100 MPix sanity cap: reject absurd headers before allocating for them
  if (img.w <= 0 || img.h <= 0 || size_t(img.w) * img.h > 100u * 1000 * 1000)
    return false;
  if (img.channels == 4) img = composite_white(img);   // skip no-op copies
  if (img.w != img.h) img = pad_square_white(img);
  if (img.w != size) img = resample(img, size, size, /*lanczos=*/true);
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0, n = size_t(size) * size * 3; i < n; ++i)
    out[i] = 2.0f * (img.data[i] * inv) - 1.0f;  // [0,255] -> [-1,1]
  return true;
} catch (...) {
  return false;
}

// ---------------------------------------------------------------------------
// Threaded prefetching batch loader
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  int size = 512;
  int batch = 0;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::queue<int64_t> work;          // item index into current request
  const int64_t* req_ids = nullptr;  // current request (catalog indices)
  float* req_out = nullptr;
  int64_t req_n = 0;
  int64_t done = 0;                  // guarded by mu (see worker note)
  std::atomic<int64_t> failed{0};
  bool stop = false;
  std::mutex req_mu;                 // serializes whole load() requests

  void worker() {
    for (;;) {
      int64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || !work.empty(); });
        if (stop) return;
        idx = work.front();
        work.pop();
      }
      int64_t item = req_ids[idx];
      float* dst = req_out + idx * int64_t(size) * size * 3;
      bool ok = item >= 0 && item < int64_t(paths.size()) &&
                prepare_catalog(paths[item].c_str(), size, dst);
      if (!ok) {
        // white null image on failure (catalog convention: index 0 is white)
        std::fill(dst, dst + int64_t(size) * size * 3, 1.0f);
        failed.fetch_add(1);
      }
      // the final increment MUST happen under mu: an unguarded atomic bump
      // could land between the waiter's predicate check and its block,
      // losing the only notify (load() would hang forever)
      bool last;
      {
        std::lock_guard<std::mutex> lk(mu);
        last = (++done == req_n);
      }
      if (last) cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// SHA-256 of the .cc this binary was built from, injected by the Makefile.
// data/native.py compares it against the on-disk source so a stale committed
// .so can never silently shadow newer source (round-3 shipped exactly that bug).
#ifndef DFIO_SOURCE_HASH
#define DFIO_SOURCE_HASH "unknown"
#endif
const char* dfio_source_hash(void) { return DFIO_SOURCE_HASH; }

// One-shot synchronous prep of a single image file.
int dfio_prepare_image(const char* path, int size, float* out) {
  return prepare_catalog(path, size, out) ? 1 : 0;
}

// Header-only dimensions probe (no pixel decode).
int dfio_image_size(const char* path, int* w, int* h) noexcept try {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  int c0 = fgetc(f);
  int c1 = fgetc(f);
  rewind(f);
  int ok = 0;
  if (c0 == 0x89 && c1 == 'P') {
    uint8_t sig[8];
    if (fread(sig, 1, 8, f) == 8 && !png_sig_cmp(sig, 0, 8)) {
      png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                               nullptr, nullptr);
      png_infop info = png ? png_create_info_struct(png) : nullptr;
      if (png && info && !setjmp(png_jmpbuf(png))) {
        png_init_io(png, f);
        png_set_sig_bytes(png, 8);
        png_read_info(png, info);
        *w = int(png_get_image_width(png, info));
        *h = int(png_get_image_height(png, info));
        ok = 1;
      }
      if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    }
  } else {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (!setjmp(jerr.jb)) {
      jpeg_create_decompress(&cinfo);
      jpeg_stdio_src(&cinfo, f);
      jpeg_read_header(&cinfo, TRUE);
      *w = int(cinfo.image_width);
      *h = int(cinfo.image_height);
      ok = 1;
    }
    jpeg_destroy_decompress(&cinfo);
  }
  fclose(f);
  return ok;
} catch (...) {
  return 0;
}

void* dfio_loader_create(const char** paths, int64_t n_paths, int size,
                         int n_threads) {
  Loader* L = new Loader();
  L->paths.reserve(n_paths);
  for (int64_t i = 0; i < n_paths; ++i) L->paths.emplace_back(paths[i]);
  L->size = size;
  if (n_threads <= 0) n_threads = std::max(1u, std::thread::hardware_concurrency());
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Synchronous batched load: ids [n] -> out [n, size, size, 3] float32 in [-1,1].
// Work is fanned across the thread pool. Returns the number of failed decodes.
int64_t dfio_loader_load(void* handle, const int64_t* ids, int64_t n,
                         float* out) {
  Loader* L = static_cast<Loader*>(handle);
  // ctypes releases the GIL for the duration of this call, so two Python
  // threads sharing one loader would otherwise overwrite each other's request
  // state mid-flight; whole requests serialize here
  std::lock_guard<std::mutex> req_lk(L->req_mu);
  if (n <= 0) return 0;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->req_ids = ids;
    L->req_out = out;
    L->req_n = n;
    L->done = 0;
    L->failed.store(0);
    for (int64_t i = 0; i < n; ++i) L->work.push(i);
  }
  L->cv_work.notify_all();
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_done.wait(lk, [&] { return L->done == n; });
  }
  return L->failed.load();
}

void dfio_loader_destroy(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_work.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
