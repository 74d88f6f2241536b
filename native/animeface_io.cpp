// animeface_tpu native IO: threaded JPEG/PNG decode + resize + crop +
// normalize, producing ready-to-ship NHWC float32 batches for the TPU host
// transfer. TPU-native counterpart of the reference's torch DataLoader
// worker pool (reference `dataset/_base.py` + torchvision transforms):
// decode and augmentation run in native threads so the Python training
// loop never blocks on PIL.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
//
// Build:  make -C native   (produces native/libanimeface_io.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <atomic>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

// ----------------------------- decode --------------------------------

struct Image {
  std::vector<uint8_t> px;  // HWC, RGB8
  int h = 0, w = 0;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->px.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->px.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* data;
  size_t len, pos;
};

void png_read_cb(png_structp png, png_bytep dst, png_size_t n) {
  auto* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "png: out of data");
  }
  memcpy(dst, s->data + s->pos, n);
  s->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{buf, len, 0};
  png_set_read_fn(png, &st, png_read_cb);
  png_read_info(png, info);

  png_set_expand(png);          // palette/gray-1,2,4/tRNS -> 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->px.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; y++)
    rows[y] = out->px.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* buf, size_t len, Image* out) {
  if (len >= 3 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len, out);
  if (len >= 8 && !png_sig_cmp(buf, 0, 8)) return decode_png(buf, len, out);
  // Fall through: try both.
  return decode_jpeg(buf, len, out) || decode_png(buf, len, out);
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    return false;
  }
  out->resize(n);
  bool ok = fread(out->data(), 1, n, f) == size_t(n);
  fclose(f);
  return ok;
}

// ----------------------------- resample ------------------------------

// Antialiased bilinear (triangle-filter) resampling with support widened by
// the downscale factor — PIL / torchvision T.Resize semantics, so the native
// path produces the same statistics as the reference transform chain.
struct FilterTaps {
  std::vector<float> w;     // [out, taps]
  std::vector<int> first;   // [out]
  int taps = 0;
};

FilterTaps make_taps(int in, int out) {
  FilterTaps ft;
  const double scale = double(in) / out;
  const double fscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * fscale;  // triangle filter support = 1
  ft.taps = int(ceil(support)) * 2 + 1;
  ft.w.assign(size_t(out) * ft.taps, 0.f);
  ft.first.resize(out);
  for (int x = 0; x < out; x++) {
    double center = (x + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in, int(center + support + 0.5));
    ft.first[x] = xmin;
    double total = 0.0;
    for (int i = xmin; i < xmax; i++) {
      double t = fabs((i + 0.5 - center) / fscale);
      double v = t < 1.0 ? 1.0 - t : 0.0;
      ft.w[size_t(x) * ft.taps + (i - xmin)] = float(v);
      total += v;
    }
    if (total > 0)
      for (int i = 0; i < ft.taps; i++)
        ft.w[size_t(x) * ft.taps + i] /= float(total);
  }
  return ft;
}

void resize_bilinear(const Image& src, int oh, int ow, Image* dst) {
  FilterTaps fx = make_taps(src.w, ow), fy = make_taps(src.h, oh);
  // horizontal pass -> [src.h, ow] float
  std::vector<float> tmp(size_t(src.h) * ow * 3);
  for (int y = 0; y < src.h; y++) {
    const uint8_t* row = src.px.data() + size_t(y) * src.w * 3;
    float* orow = tmp.data() + size_t(y) * ow * 3;
    for (int x = 0; x < ow; x++) {
      const float* w = fx.w.data() + size_t(x) * fx.taps;
      int i0 = fx.first[x];
      float acc[3] = {0, 0, 0};
      for (int t = 0; t < fx.taps; t++) {
        int i = i0 + t;
        if (i >= src.w || w[t] == 0.f) continue;
        for (int c = 0; c < 3; c++) acc[c] += w[t] * row[i * 3 + c];
      }
      for (int c = 0; c < 3; c++) orow[x * 3 + c] = acc[c];
    }
  }
  // vertical pass -> [oh, ow] u8
  dst->h = oh;
  dst->w = ow;
  dst->px.resize(size_t(oh) * ow * 3);
  for (int y = 0; y < oh; y++) {
    const float* w = fy.w.data() + size_t(y) * fy.taps;
    int i0 = fy.first[y];
    uint8_t* orow = dst->px.data() + size_t(y) * ow * 3;
    for (int x = 0; x < ow; x++) {
      float acc[3] = {0, 0, 0};
      for (int t = 0; t < fy.taps; t++) {
        int i = i0 + t;
        if (i >= src.h || w[t] == 0.f) continue;
        const float* irow = tmp.data() + (size_t(i) * ow + x) * 3;
        for (int c = 0; c < 3; c++) acc[c] += w[t] * irow[c];
      }
      for (int c = 0; c < 3; c++) {
        float v = acc[c];
        orow[x * 3 + c] = uint8_t(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
      }
    }
  }
}

// ------------------------------ pipeline ------------------------------

// One sample: load -> decode -> resize shorter edge to
// round(size*resize_scale) keeping aspect (torchvision T.Resize semantics,
// reference dataset/_base.py:18) -> center crop size x size -> maybe hflip
// -> normalize to [-1, 1] float32 NHWC slot. resize_scale <= 0 means a
// direct (aspect-distorting) square resize.
bool process_one(const char* path, int size, float resize_scale, bool hflip,
                 float* out) {
  std::vector<uint8_t> buf;
  Image img, rsz;
  if (!read_file(path, &buf) || !decode_any(buf.data(), buf.size(), &img))
    return false;
  const Image* use = &img;
  int ch = img.h, cw = img.w;  // post-resize dims
  if (resize_scale > 0) {
    int edge = int(lroundf(size * resize_scale));
    if (img.w <= img.h) {
      cw = edge;
      ch = std::max(1l, lroundf(float(img.h) * edge / img.w));
    } else {
      ch = edge;
      cw = std::max(1l, lroundf(float(img.w) * edge / img.h));
    }
  } else {
    ch = cw = size;
  }
  if (ch != img.h || cw != img.w) {
    resize_bilinear(img, ch, cw, &rsz);
    use = &rsz;
  }
  // center crop (clamped if the resized image is smaller than `size`)
  int top = std::max(0, (ch - size) / 2), left = std::max(0, (cw - size) / 2);
  const float scale = 2.0f / 255.0f;
  for (int y = 0; y < size; y++) {
    int sy = std::min(ch - 1, top + y);
    const uint8_t* row = use->px.data() + (size_t(sy) * cw + left) * 3;
    float* orow = out + size_t(y) * size * 3;
    if (!hflip) {
      for (int x = 0; x < size; x++) {
        int sx = std::min(cw - 1 - left, x);
        for (int c = 0; c < 3; c++)
          orow[x * 3 + c] = row[sx * 3 + c] * scale - 1.0f;
      }
    } else {
      for (int x = 0; x < size; x++) {
        int sx = std::min(cw - 1 - left, size - 1 - x);
        for (int c = 0; c < 3; c++)
          orow[x * 3 + c] = row[sx * 3 + c] * scale - 1.0f;
      }
    }
  }
  return true;
}

// ----------------------------- thread pool ----------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; i++)
      workers_.emplace_back([this] { loop(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

Pool* pool() {
  static Pool* p = new Pool(std::max(2u, std::thread::hardware_concurrency()));
  return p;
}

struct Latch {
  std::mutex mu;
  std::condition_variable cv;
  int remaining;
  explicit Latch(int n) : remaining(n) {}
  void done() {
    std::lock_guard<std::mutex> lk(mu);
    if (--remaining == 0) cv.notify_all();
  }
  void wait() {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [this] { return remaining == 0; });
  }
};

}  // namespace

extern "C" {

// Decode one image file to size x size x 3 float32 in [-1,1]. Returns 0 on
// success, nonzero on failure.
int af_load_image(const char* path, int size, float resize_scale, int hflip,
                  float* out) {
  return process_one(path, size, resize_scale, hflip != 0, out) ? 0 : 1;
}

// Load a batch of n files in parallel into out[n, size, size, 3] float32
// NHWC in [-1,1]. hflip_mask: per-sample random-flip bits. Failed samples
// are zero-filled and flagged in fail[i]=1 (fail may be null). Returns the
// number of failures.
int af_load_batch(const char** paths, int n, int size, float resize_scale,
                  const uint8_t* hflip_mask, float* out, uint8_t* fail) {
  std::atomic<int> failures(0);
  Latch latch(n);
  const size_t stride = size_t(size) * size * 3;
  for (int i = 0; i < n; i++) {
    pool()->submit([&, i] {
      bool flip = hflip_mask != nullptr && hflip_mask[i] != 0;
      bool ok = process_one(paths[i], size, resize_scale, flip,
                            out + stride * i);
      if (!ok) {
        memset(out + stride * i, 0, stride * sizeof(float));
        failures.fetch_add(1);
      }
      if (fail != nullptr) fail[i] = ok ? 0 : 1;
      latch.done();
    });
  }
  latch.wait();
  return failures.load();
}

// Probe: returns the pool's worker count (also warms up the pool).
int af_num_workers() {
  (void)pool();
  return std::max(2u, std::thread::hardware_concurrency());
}

}  // extern "C"
