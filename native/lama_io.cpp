// lama_io — native host-side data-path kernels for lama_tpu.
//
// The reference delegates its host data path to torch's C++ DataLoader
// workers + OpenCV; this library is the equivalent native layer for the
// TPU build: multithreaded JPEG decode (libjpeg) and procedural mask
// rasterisation (the per-item hot ops of the training input pipeline),
// exposed through a plain C ABI consumed via ctypes
// (lama_tpu/data/native.py). Falls back to the cv2 path when unbuilt.
//
// Build: make -C native   (produces native/liblama_io.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ------------------------------------------------------------------ errors
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// ------------------------------------------------------------------ rng
// SplitMix64: tiny, seedable, deterministic across platforms.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed + 0x9E3779B97F4A7C15ULL) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  // uniform integer in [0, n)
  int64_t randint(int64_t n) { return n <= 0 ? 0 : (int64_t)(next() % (uint64_t)n); }
  // uniform integer in [lo, hi)  (empty range -> lo)
  int64_t randint(int64_t lo, int64_t hi) {
    return hi <= lo ? lo : lo + randint(hi - lo);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

inline void stamp_disk(float* mask, int h, int w, int cy, int cx, int radius) {
  const int r2 = radius * radius;
  const int y0 = std::max(0, cy - radius), y1 = std::min(h - 1, cy + radius);
  const int x0 = std::max(0, cx - radius), x1 = std::min(w - 1, cx + radius);
  for (int y = y0; y <= y1; ++y) {
    const int dy = y - cy;
    for (int x = x0; x <= x1; ++x) {
      const int dx = x - cx;
      if (dx * dx + dy * dy <= r2) mask[(size_t)y * w + x] = 1.0f;
    }
  }
}

// round-capped thick segment == disks stamped densely along the line
// (equivalent coverage to cv2.line with `thickness`, which the reference's
// irregular-mask generator uses, masks.py:41)
void thick_line(float* mask, int h, int w, int x0, int y0, int x1, int y1,
                int thickness) {
  const int radius = std::max(1, thickness / 2);
  const float dx = (float)(x1 - x0), dy = (float)(y1 - y0);
  const float len = std::sqrt(dx * dx + dy * dy);
  const int steps = std::max(1, (int)(len));
  for (int i = 0; i <= steps; ++i) {
    const float t = (float)i / steps;
    stamp_disk(mask, h, w, (int)std::lround(y0 + dy * t),
               (int)std::lround(x0 + dx * t), radius);
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- jpeg
// Returns 0 on success; fills (*width, *height).
int lama_jpeg_dims(const uint8_t* data, size_t len, int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  *width = (int)cinfo.image_width;
  *height = (int)cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode into caller-provided RGB8 buffer of exactly width*height*3 bytes.
int lama_jpeg_decode_rgb(const uint8_t* data, size_t len, uint8_t* out,
                         int width, int height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != width || (int)cinfo.output_height != height ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + (size_t)cinfo.output_scanline * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Thread-pooled batch decode. Buffers are caller-allocated per image.
// Returns the number of failed decodes.
int lama_jpeg_decode_batch(const uint8_t** datas, const size_t* lens,
                           uint8_t** outs, const int* widths,
                           const int* heights, int n, int n_threads) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      if (lama_jpeg_decode_rgb(datas[i], lens[i], outs[i], widths[i],
                               heights[i]) != 0)
        failures.fetch_add(1);
    }
  };
  const int nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// ---------------------------------------------------------------- masks
// Irregular brush strokes: same distribution as the reference
// make_random_irregular_mask (masks.py:22-48) — a walk of thick round-capped
// segments with per-segment random angle/length/width.
void lama_draw_irregular(float* mask, int h, int w, int max_angle, int max_len,
                         int max_width, int min_times, int max_times,
                         uint64_t seed) {
  Rng rng(seed);
  const int64_t times = rng.randint(min_times, max_times + 1);
  for (int64_t s = 0; s < times; ++s) {
    int x = (int)rng.randint(w);
    int y = (int)rng.randint(h);
    const int64_t segments = 1 + rng.randint(5);
    for (int64_t j = 0; j < segments; ++j) {
      double angle = 0.01 + rng.randint(max_angle);
      if (s % 2 == 0) angle = 2 * 3.1415926 - angle;
      const int length = 10 + (int)rng.randint(max_len);
      const int brush = 5 + (int)rng.randint(max_width);
      int ex = (int)std::min((double)w, std::max(0.0, x + length * std::sin(angle)));
      int ey = (int)std::min((double)h, std::max(0.0, y + length * std::cos(angle)));
      thick_line(mask, h, w, x, y, ex, ey, brush);
      x = ex;
      y = ey;
    }
  }
}

// Random boxes (reference make_random_rectangle_mask, masks.py:72-84).
void lama_draw_rectangles(float* mask, int h, int w, int margin, int bbox_min,
                          int bbox_max, int min_times, int max_times,
                          uint64_t seed) {
  Rng rng(seed);
  const int limit = std::min(bbox_max, std::min(h - margin * 2, w - margin * 2));
  const int64_t times = rng.randint(min_times, max_times + 1);
  for (int64_t i = 0; i < times; ++i) {
    const int bw = (int)rng.randint(bbox_min, limit);
    const int bh = (int)rng.randint(bbox_min, limit);
    const int x0 = (int)rng.randint(margin, w - margin - bw + 1);
    const int y0 = (int)rng.randint(margin, h - margin - bh + 1);
    for (int y = y0; y < y0 + bh; ++y)
      std::fill(mask + (size_t)y * w + x0, mask + (size_t)y * w + x0 + bw, 1.0f);
  }
}

}  // extern "C"
