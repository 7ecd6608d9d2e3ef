// Native image-decode pipeline for the data loader.
//
// TPU-native rebuild rationale: the reference rides torch's C++ DataLoader
// workers for decode parallelism (ref: scripts/train.py:111-128 constructs
// torch.utils.data.DataLoader with num_workers); this is the equivalent
// native component for the JAX pipeline. Python-side PIL decode holds the
// GIL (measured: zero thread scaling, BENCH_NOTES "host input pipeline"),
// so this library does the whole per-item pipeline in C++ —
//   decode (libpng / libjpeg) -> PIL-equivalent triangle resample ->
//   RGB or PIL-L grayscale -> uint8
// — and releases the GIL around batch calls, so plain Python threads get
// real decode parallelism without process pools (no pickled dataset
// copies, no per-worker caches).
//
// Semantics match unet_zoo_tpu/data/datasets.py (and therefore the
// reference's PIL path, ref: unet_zoo/data/datasets.py:40-49):
//   * images: convert("RGB") then resize((S,S), Image.BILINEAR)
//   * masks:  convert("L")   then resize((S,S), Image.BILINEAR)
// PIL's BILINEAR is NOT naive bilinear interpolation: it is separable
// convolution resampling with a triangle filter whose support scales with
// the downscale ratio (antialiasing). We reproduce that algorithm
// (horizontal pass then vertical, per-pass rounding to uint8, filter
// support 1.0) in float arithmetic; PIL computes the same sums in
// fixed-point, so results agree within +-1 LSB (asserted by
// tests/test_native_io.py).  convert("L") uses PIL's exact integer luma:
// L = (19595*R + 38470*G + 7471*B + 0x8000) >> 16.

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
// libjpeg's header needs stdio types pre-included; keep this order.
#include <jpeglib.h>

namespace {

thread_local std::string g_error;

struct Image8 {
  int w = 0, h = 0, c = 0;  // c == 1 or 3, row-major HWC
  std::vector<uint8_t> px;
};

// ---------------------------------------------------------------------------
// Decoders
// ---------------------------------------------------------------------------

bool decode_png(const char* path, Image8* out) {
  png_image img;
  std::memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&img, path)) {
    g_error = std::string("png: ") + img.message;
    return false;
  }
  // Simplified API handles palette/16-bit/interlaced expansion; always
  // materialize RGB and convert("L") ourselves so the gray formula is
  // PIL's, not libpng's.
  img.format = PNG_FORMAT_RGB;
  out->w = img.width;
  out->h = img.height;
  out->c = 3;
  out->px.resize(size_t(out->w) * out->h * 3);
  if (!png_image_finish_read(&img, nullptr, out->px.data(), 0, nullptr)) {
    g_error = std::string("png: ") + img.message;
    png_image_free(&img);
    return false;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  char msg[JMSG_LENGTH_MAX];
  (*cinfo->err->format_message)(cinfo, msg);
  g_error = std::string("jpeg: ") + msg;
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

bool decode_jpeg(const char* path, Image8* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    g_error = std::string("open failed: ") + path;
    return false;
  }
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // gray/YCbCr/CMYK sources all land RGB
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->px.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->px.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = std::strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; ++i) {
    char a = s[s.size() - n + i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != suf[i]) return false;
  }
  return true;
}

bool decode_any(const char* path, Image8* out) {
  std::string p(path);
  if (has_suffix(p, ".png")) return decode_png(path, out);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg"))
    return decode_jpeg(path, out);
  g_error = std::string("unsupported extension: ") + path;
  return false;
}

// ---------------------------------------------------------------------------
// PIL convert("L"): exact integer luma, truncating shift
// (PIL src/libImaging/Convert.c L24 macro).
// ---------------------------------------------------------------------------

void rgb_to_l(const Image8& in, Image8* out) {
  out->w = in.w;
  out->h = in.h;
  out->c = 1;
  out->px.resize(size_t(in.w) * in.h);
  const uint8_t* s = in.px.data();
  uint8_t* d = out->px.data();
  size_t n = size_t(in.w) * in.h;
  for (size_t i = 0; i < n; ++i, s += 3)
    d[i] = uint8_t(
        (19595u * s[0] + 38470u * s[1] + 7471u * s[2] + 0x8000u) >> 16);
}

// ---------------------------------------------------------------------------
// PIL-style separable triangle resampling (Image.BILINEAR), float math.
// Per output coordinate: center=(i+0.5)*scale, taps in
// [center-support, center+support] with support = filterscale =
// max(in/out, 1), weights (1-|dx|/filterscale) normalized to sum 1.
// Horizontal pass first, each pass rounds back to uint8 (as PIL does).
// ---------------------------------------------------------------------------

struct Taps {
  std::vector<int> xmin, xcount;
  std::vector<float> w;  // bounds.size() rows x kmax
  int kmax = 0;
};

Taps make_taps(int in_size, int out_size) {
  Taps t;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // triangle filter support = 1.0
  t.kmax = int(std::ceil(support)) * 2 + 1;
  t.xmin.resize(out_size);
  t.xcount.resize(out_size);
  t.w.assign(size_t(out_size) * t.kmax, 0.f);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    double sum = 0.0;
    std::vector<double> k(xmax - xmin);
    for (int x = xmin; x < xmax; ++x) {
      double d = std::abs((x + 0.5 - center) / filterscale);
      double v = d < 1.0 ? 1.0 - d : 0.0;  // triangle
      k[x - xmin] = v;
      sum += v;
    }
    t.xmin[xx] = xmin;
    t.xcount[xx] = xmax - xmin;
    for (int i = 0; i < xmax - xmin; ++i)
      if (sum != 0.0) t.w[size_t(xx) * t.kmax + i] = float(k[i] / sum);
  }
  return t;
}

inline uint8_t clip_round(float v) {
  int i = int(v + 0.5f);
  return uint8_t(std::min(255, std::max(0, i)));
}

void resample(const Image8& in, int out_w, int out_h, Image8* out) {
  const int c = in.c;
  // horizontal
  Image8 tmp;
  const Image8* src = &in;
  if (out_w != in.w) {
    Taps tx = make_taps(in.w, out_w);
    tmp.w = out_w;
    tmp.h = in.h;
    tmp.c = c;
    tmp.px.resize(size_t(out_w) * in.h * c);
    for (int y = 0; y < in.h; ++y) {
      const uint8_t* row = in.px.data() + size_t(y) * in.w * c;
      uint8_t* drow = tmp.px.data() + size_t(y) * out_w * c;
      for (int xx = 0; xx < out_w; ++xx) {
        const float* w = &tx.w[size_t(xx) * tx.kmax];
        int x0 = tx.xmin[xx], n = tx.xcount[xx];
        for (int ch = 0; ch < c; ++ch) {
          float acc = 0.f;
          for (int i = 0; i < n; ++i) acc += w[i] * row[(x0 + i) * c + ch];
          drow[xx * c + ch] = clip_round(acc);
        }
      }
    }
    src = &tmp;
  }
  // vertical
  if (out_h != src->h) {
    Taps ty = make_taps(src->h, out_h);
    out->w = src->w;
    out->h = out_h;
    out->c = c;
    out->px.resize(size_t(src->w) * out_h * c);
    for (int yy = 0; yy < out_h; ++yy) {
      const float* w = &ty.w[size_t(yy) * ty.kmax];
      int y0 = ty.xmin[yy], n = ty.xcount[yy];
      uint8_t* drow = out->px.data() + size_t(yy) * src->w * c;
      for (int x = 0; x < src->w * c; ++x) {
        float acc = 0.f;
        for (int i = 0; i < n; ++i)
          acc += w[i] * src->px[size_t(y0 + i) * src->w * c + x];
        drow[x] = clip_round(acc);
      }
    }
  } else {
    *out = *src;
  }
}

// Full per-item pipeline. channels: 3 = convert("RGB"), 1 = convert("L").
bool load_one(const char* path, int out_h, int out_w, int channels,
              uint8_t* dst) {
  Image8 raw;
  if (!decode_any(path, &raw)) return false;
  Image8* stage = &raw;
  Image8 gray;
  if (channels == 1) {
    // PIL converts BEFORE resizing (Image.open(...).convert("L").resize(...))
    rgb_to_l(raw, &gray);
    stage = &gray;
  } else if (channels != 3) {
    g_error = "channels must be 1 or 3";
    return false;
  }
  Image8 res;
  resample(*stage, out_w, out_h, &res);
  std::memcpy(dst, res.px.data(), size_t(out_h) * out_w * channels);
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success; on failure returns 1 and uz_last_error() explains.
int uz_load_image(const char* path, int out_h, int out_w, int channels,
                  uint8_t* dst) {
  return load_one(path, out_h, out_w, channels, dst) ? 0 : 1;
}

// Decode n files in parallel with `threads` std::threads (caller releases
// the GIL). dst is [n, out_h, out_w, channels] uint8, C-contiguous.
// Returns the number of failures; failed slots are zero-filled and the
// first failure message is kept in uz_last_error().
int uz_load_batch(const char** paths, int n, int out_h, int out_w,
                  int channels, int threads, uint8_t* dst) {
  std::atomic<int> next(0), failures(0);
  std::string first_error;
  std::mutex err_mu;
  size_t stride = size_t(out_h) * out_w * channels;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (!load_one(paths[i], out_h, out_w, channels, dst + stride * i)) {
        std::memset(dst + stride * i, 0, stride);
        failures.fetch_add(1);
        std::lock_guard<std::mutex> lk(err_mu);
        if (first_error.empty()) first_error = g_error;
      }
    }
  };
  int nt = std::max(1, std::min(threads, n));
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  if (failures.load() > 0) g_error = first_error;
  return failures.load();
}

const char* uz_last_error() { return g_error.c_str(); }

int uz_version() { return 1; }
}
