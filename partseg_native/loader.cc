// partseg_native: multithreaded image-decode worker pool.
//
// TPU-native replacement for the C++ DataLoader worker pool the
// reference inherits from torch (SURVEY.md §2.2 "DataLoader worker
// pool"): host work is decode + crop + resize ONLY (augmentation runs
// on-device), so this pool does exactly that — JPEG/PNG decode
// (libjpeg/libpng), optional square bbox crop, bilinear resize to the
// model size, f32 RGB in [0,1] — across N threads with a bounded
// result queue. Exposed as a C API consumed via ctypes
// (partseg_tpu/data/native.py); no pybind11 in this image.
//
// Build: ./build.sh  (g++ -O3 -shared, links libjpeg + libpng).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ---------------------------------------------------------------- JPEG decode

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// Decode, optionally at a reduced N/8 scale straight out of the DCT
// domain (libjpeg-turbo honors any scale_num 1..8 over scale_denom 8).
// The scale is chosen as the smallest N/8 that keeps the eventual crop
// at least `out_size` pixels on a side, so the bilinear resize that
// follows only ever downsamples: IDCT-domain scaling is an area-style
// filter, so quality matches (usually beats) full decode + bilinear
// subsample while touching N²/64 of the pixels. `crop_side <= 0` means
// center crop (side = min(w, h)). On return *scale_r holds the applied
// ratio so the caller can rescale explicit crop coordinates.
bool decode_jpeg(const uint8_t* data, size_t len, Image* out,
                 float crop_side, int out_size, bool scaled,
                 float* scale_r) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  *scale_r = 1.0f;
  if (scaled && out_size > 0) {
    const float full_min =
        float(cinfo.image_width < cinfo.image_height ? cinfo.image_width
                                                     : cinfo.image_height);
    float side = crop_side <= 0.f ? full_min
                                  : (crop_side < full_min ? crop_side
                                                          : full_min);
    if (side > float(out_size)) {
      int num = int((8.0 * out_size + side - 1) / side);  // ceil(8*out/side)
      if (num < 1) num = 1;
      if (num < 8) {
        cinfo.scale_num = num;
        cinfo.scale_denom = 8;
        *scale_r = num / 8.0f;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG decode

struct PngReadCtx {
  const uint8_t* data;
  size_t len, pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) {
    png_error(png, "png: read past end");
  }
  memcpy(out, ctx->data + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* data, size_t len, Image* out) {
  if (png_sig_cmp(data, 0, 8)) return false;
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
  PngReadCtx ctx{data, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);

  png_set_expand(png);          // palette/gray/low-bit -> 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ------------------------------------------------------- crop/resize pipeline

// Square crop around (cx, cy) with side `side` (clamped in-image), then
// bilinear resize to out_size², writing uint8 RGB. Results stay uint8
// end-to-end so training can ship 4×-smaller batches host→device and
// normalize on-chip (VERDICT r1: "uint8 host→device + on-device
// normalize"); psn_get converts to f32 [0,1] for legacy callers.
void crop_resize(const Image& img, float cx, float cy, float side,
                 int out_size, uint8_t* out) {
  int w = img.w, h = img.h;
  if (side <= 0.f) {  // center crop
    side = float(w < h ? w : h);
    cx = w * 0.5f;
    cy = h * 0.5f;
  }
  side = std::min(side, float(std::min(w, h)));
  float x0 = cx - side * 0.5f;
  float y0 = cy - side * 0.5f;
  if (x0 < 0) x0 = 0;
  if (y0 < 0) y0 = 0;
  if (x0 + side > w) x0 = w - side;
  if (y0 + side > h) y0 = h - side;

  const float scale = side / out_size;
  const uint8_t* src = img.rgb.data();
  for (int oy = 0; oy < out_size; ++oy) {
    float sy = y0 + (oy + 0.5f) * scale - 0.5f;
    int iy0 = int(sy < 0 ? 0 : sy);
    if (iy0 > h - 1) iy0 = h - 1;
    int iy1 = iy0 + 1 > h - 1 ? h - 1 : iy0 + 1;
    float wy = sy - iy0;
    if (wy < 0) wy = 0;
    for (int ox = 0; ox < out_size; ++ox) {
      float sx = x0 + (ox + 0.5f) * scale - 0.5f;
      int ix0 = int(sx < 0 ? 0 : sx);
      if (ix0 > w - 1) ix0 = w - 1;
      int ix1 = ix0 + 1 > w - 1 ? w - 1 : ix0 + 1;
      float wx = sx - ix0;
      if (wx < 0) wx = 0;
      const uint8_t* p00 = src + (size_t(iy0) * w + ix0) * 3;
      const uint8_t* p01 = src + (size_t(iy0) * w + ix1) * 3;
      const uint8_t* p10 = src + (size_t(iy1) * w + ix0) * 3;
      const uint8_t* p11 = src + (size_t(iy1) * w + ix1) * 3;
      uint8_t* dst = out + (size_t(oy) * out_size + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        float v = top + (bot - top) * wy;
        dst[c] = uint8_t(v + 0.5f);
      }
    }
  }
}

// ------------------------------------------------------------------ the pool

struct Job {
  int64_t idx;
  std::string path;
  float cx, cy, side;
};

struct Result {
  int64_t idx;
  std::vector<uint8_t> pixels;  // out_size*out_size*3, empty on failure
  int ok;
};

struct Pool {
  int out_size;
  bool scaled_decode;
  size_t capacity;
  std::vector<std::thread> threads;
  std::deque<Job> jobs;
  std::deque<Result> results;
  std::mutex mu;
  std::condition_variable cv_job, cv_res, cv_cap;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return stop.load() || !jobs.empty(); });
        if (stop.load() && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      Result res;
      res.idx = job.idx;
      res.ok = 0;

      FILE* f = fopen(job.path.c_str(), "rb");
      if (f) {
        fseek(f, 0, SEEK_END);
        long len = ftell(f);
        fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> buf(len > 0 ? len : 0);
        if (len > 0 && fread(buf.data(), 1, len, f) == size_t(len)) {
          Image img;
          bool ok = false;
          float r = 1.0f;
          if (len > 3 && buf[0] == 0xFF && buf[1] == 0xD8) {
            ok = decode_jpeg(buf.data(), buf.size(), &img, job.side,
                             out_size, scaled_decode, &r);
          } else if (len > 8 && !png_sig_cmp(buf.data(), 0, 8)) {
            ok = decode_png(buf.data(), buf.size(), &img);
          }
          if (ok && img.w > 0 && img.h > 0) {
            res.pixels.resize(size_t(out_size) * out_size * 3);
            // Explicit bbox coordinates arrive in FULL-resolution
            // pixels; map them onto the (possibly N/8-scaled) decode.
            // Center crops (side <= 0) are scale-invariant.
            float cx = job.cx, cy = job.cy, side = job.side;
            if (side > 0.f && r != 1.0f) {
              cx *= r;
              cy *= r;
              side *= r;
            }
            crop_resize(img, cx, cy, side, out_size, res.pixels.data());
            res.ok = 1;
          }
        }
        fclose(f);
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_cap.wait(lk, [&] { return stop.load() || results.size() < capacity; });
        if (stop.load()) return;
        results.push_back(std::move(res));
      }
      cv_res.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* psn_create(int n_threads, int out_size, int capacity,
                 int scaled_decode) {
  auto* p = new Pool;
  p->out_size = out_size;
  p->scaled_decode = scaled_decode != 0;
  p->capacity = capacity > 0 ? capacity : 64;
  for (int i = 0; i < n_threads; ++i)
    p->threads.emplace_back(&Pool::worker, p);
  return p;
}

void psn_submit(void* h, int64_t idx, const char* path, float cx, float cy,
                float side) {
  auto* p = static_cast<Pool*>(h);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs.push_back(Job{idx, path, cx, cy, side});
  }
  p->cv_job.notify_one();
}

namespace {
int pop_result(Pool* p, Result* res) {
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_res.wait(lk, [&] { return p->stop.load() || !p->results.empty(); });
  if (p->results.empty()) return -1;
  *res = std::move(p->results.front());
  p->results.pop_front();
  lk.unlock();
  p->cv_cap.notify_one();
  return res->ok;
}
}  // namespace

// Blocking pop, f32 [0,1] output. Returns 1 on success (idx_out + out
// filled), 0 on decode failure (idx_out still set), -1 if the pool is
// shutting down.
int psn_get(void* h, int64_t* idx_out, float* out) {
  auto* p = static_cast<Pool*>(h);
  Result res;
  int rc = pop_result(p, &res);
  if (rc < 0) return -1;
  *idx_out = res.idx;
  if (rc == 1) {
    const float k = 1.0f / 255.0f;
    for (size_t i = 0; i < res.pixels.size(); ++i) out[i] = res.pixels[i] * k;
  }
  return rc;
}

// Blocking pop, raw uint8 output (the training fast path: 4× smaller
// host→device transfer, normalization runs on-device in the jit step).
int psn_get_u8(void* h, int64_t* idx_out, uint8_t* out) {
  auto* p = static_cast<Pool*>(h);
  Result res;
  int rc = pop_result(p, &res);
  if (rc < 0) return -1;
  *idx_out = res.idx;
  if (rc == 1) memcpy(out, res.pixels.data(), res.pixels.size());
  return rc;
}

int psn_pending(void* h) {
  auto* p = static_cast<Pool*>(h);
  std::lock_guard<std::mutex> lk(p->mu);
  return int(p->jobs.size() + p->results.size());
}

void psn_destroy(void* h) {
  auto* p = static_cast<Pool*>(h);
  p->stop.store(true);
  p->cv_job.notify_all();
  p->cv_res.notify_all();
  p->cv_cap.notify_all();
  for (auto& t : p->threads) t.join();
  delete p;
}

}  // extern "C"
