// Host-side video preprocessing kernels (C++, multi-threaded).
//
// The reference's host hot path (SURVEY.md §2.8, §7 hard-part 3) is
// cv2/torchvision per-frame resize + crop + normalize inside DataLoader
// workers. This library provides those ops over a whole clip with a
// std::thread pool, exposed through a C ABI consumed via ctypes
// (egovlpv2_tpu/data/native.py; auto-built on first use). Layout:
// channels-last uint8 in, float32 out — what the TPU patchify consumes.
//
// Production wiring (measured on the target host, transforms.py):
//   * clip_normalize_f32 IS the transform tail — in-place, no temporaries,
//     measured 2.1-2.8x over the numpy broadcast.
//   * the resize kernels LOST to cv2's SIMD fixed-point resize (0.82 ms vs
//     3.9 ms for 4x256->224 f32); transforms keep cv2 for resize and this
//     file keeps the float-exact kernels as the no-cv2 fallback + the
//     parity reference for tests.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC -pthread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float lerp(float a, float b, float w) { return a + (b - a) * w; }

// Bilinear sample with half-pixel centers (torch/cv2 INTER_LINEAR,
// align_corners=false semantics).
template <typename SrcT>
void resize_bilinear_frame(const SrcT* src, int h, int w, int c, float* dst,
                           int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(h - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, h - 1);
    const float wy = fy - y0;
    for (int ox = 0; ox < ow; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(w - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, w - 1);
      const float wx = fx - x0;
      const SrcT* p00 = src + (static_cast<int64_t>(y0) * w + x0) * c;
      const SrcT* p01 = src + (static_cast<int64_t>(y0) * w + x1) * c;
      const SrcT* p10 = src + (static_cast<int64_t>(y1) * w + x0) * c;
      const SrcT* p11 = src + (static_cast<int64_t>(y1) * w + x1) * c;
      float* out = dst + (static_cast<int64_t>(oy) * ow + ox) * c;
      for (int ch = 0; ch < c; ++ch) {
        const float top = lerp(static_cast<float>(p00[ch]),
                               static_cast<float>(p01[ch]), wx);
        const float bot = lerp(static_cast<float>(p10[ch]),
                               static_cast<float>(p11[ch]), wx);
        out[ch] = lerp(top, bot, wy);
      }
    }
  }
}

void parallel_for(int n, const std::function<void(int)>& fn) {
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const int workers = static_cast<int>(std::min<unsigned>(hw, n));
  if (workers <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Resize every frame of a clip: uint8 [T, H, W, C] -> float32 [T, OH, OW, C].
void clip_resize_bilinear_u8(const uint8_t* src, int t, int h, int w, int c,
                             float* dst, int oh, int ow) {
  parallel_for(t, [&](int i) {
    resize_bilinear_frame(src + static_cast<int64_t>(i) * h * w * c, h, w, c,
                          dst + static_cast<int64_t>(i) * oh * ow * c, oh, ow);
  });
}

// Same for float32 input (chained resizes in the eval pipeline).
void clip_resize_bilinear_f32(const float* src, int t, int h, int w, int c,
                              float* dst, int oh, int ow) {
  parallel_for(t, [&](int i) {
    resize_bilinear_frame(src + static_cast<int64_t>(i) * h * w * c, h, w, c,
                          dst + static_cast<int64_t>(i) * oh * ow * c, oh, ow);
  });
}

// Fused train-path op on a uint8 clip:
//   crop [top:top+ch, left:left+cw] -> bilinear resize to (size, size)
//   -> optional horizontal flip -> (x*scale - mean[c]) / std[c].
// src: uint8 [T, H, W, C]; dst: float32 [T, size, size, C].
void clip_crop_resize_normalize_u8(const uint8_t* src, int t, int h, int w,
                                   int c, int top, int left, int crop_h,
                                   int crop_w, int size, int hflip,
                                   float scale, const float* mean,
                                   const float* stddev, float* dst) {
  std::vector<float> inv_std(c);
  for (int ch = 0; ch < c; ++ch) inv_std[ch] = 1.0f / stddev[ch];
  parallel_for(t, [&](int i) {
    const uint8_t* frame = src + static_cast<int64_t>(i) * h * w * c;
    float* out = dst + static_cast<int64_t>(i) * size * size * c;
    const float sy = static_cast<float>(crop_h) / size;
    const float sx = static_cast<float>(crop_w) / size;
    for (int oy = 0; oy < size; ++oy) {
      float fy = (oy + 0.5f) * sy - 0.5f;
      fy = std::max(0.0f, std::min(fy, static_cast<float>(crop_h - 1)));
      const int y0 = static_cast<int>(fy);
      const int y1 = std::min(y0 + 1, crop_h - 1);
      const float wy = fy - y0;
      for (int ox = 0; ox < size; ++ox) {
        const int out_x = hflip ? (size - 1 - ox) : ox;
        float fx = (ox + 0.5f) * sx - 0.5f;
        fx = std::max(0.0f, std::min(fx, static_cast<float>(crop_w - 1)));
        const int x0 = static_cast<int>(fx);
        const int x1 = std::min(x0 + 1, crop_w - 1);
        const float wx = fx - x0;
        const uint8_t* p00 =
            frame + (static_cast<int64_t>(top + y0) * w + left + x0) * c;
        const uint8_t* p01 =
            frame + (static_cast<int64_t>(top + y0) * w + left + x1) * c;
        const uint8_t* p10 =
            frame + (static_cast<int64_t>(top + y1) * w + left + x0) * c;
        const uint8_t* p11 =
            frame + (static_cast<int64_t>(top + y1) * w + left + x1) * c;
        float* o = out + (static_cast<int64_t>(oy) * size + out_x) * c;
        for (int ch = 0; ch < c; ++ch) {
          const float topv =
              lerp(static_cast<float>(p00[ch]), static_cast<float>(p01[ch]), wx);
          const float botv =
              lerp(static_cast<float>(p10[ch]), static_cast<float>(p11[ch]), wx);
          const float v = lerp(topv, botv, wy) * scale;
          o[ch] = (v - mean[ch]) * inv_std[ch];
        }
      }
    }
  });
}

// Normalize in place: float32 [N, C-last], x = (x - mean[c]) / std[c].
void clip_normalize_f32(float* data, int64_t n_pixels, int c,
                        const float* mean, const float* stddev) {
  std::vector<float> inv_std(c);
  for (int ch = 0; ch < c; ++ch) inv_std[ch] = 1.0f / stddev[ch];
  const int chunks = 64;
  const int64_t per = (n_pixels + chunks - 1) / chunks;
  parallel_for(chunks, [&](int k) {
    const int64_t lo = k * per;
    const int64_t hi = std::min(n_pixels, lo + per);
    for (int64_t p = lo; p < hi; ++p) {
      float* px = data + p * c;
      for (int ch = 0; ch < c; ++ch) px[ch] = (px[ch] - mean[ch]) * inv_std[ch];
    }
  });
}

// Temporal frame sampling index math (sample_frames, base_dataset.py:180).
// mode: 0 = uniform midpoints, 1 = fixed start offset.
void sample_frame_indices(int num_frames, int vlen, int mode, int fix_start,
                          int64_t* out, int* out_count) {
  const int acc = std::min(num_frames, vlen);
  for (int i = 0; i < acc; ++i) {
    const double lo_d = static_cast<double>(vlen) * i / acc;
    const double hi_d = static_cast<double>(vlen) * (i + 1) / acc;
    const int64_t lo = static_cast<int64_t>(lo_d);
    const int64_t hi = static_cast<int64_t>(hi_d) - 1;
    out[i] = (mode == 1) ? (lo + fix_start) : ((lo + hi) / 2);
  }
  *out_count = acc;
}

}  // extern "C"
