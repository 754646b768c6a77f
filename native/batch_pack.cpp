// Native host-side image batch preprocessing for climategan_tpu.
//
// The reference delegates all native-level work to torch's C++ kernels
// (SURVEY.md §2.3); this framework's host runtime does its hot IO path in
// C++ too: uint8 HWC decode output -> model-ready float32 [-1,1] NHWC
// batches, plus the resize-keep-AR + center-crop used by apply_events'
// preprocessing (apply_events.py:211-241 semantics, bilinear half-pixel).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)
// Python binding: ctypes (climategan_tpu/utils/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// uint8 [0,255] -> float32 [-1,1]; n elements. Multi-threaded memcpy-speed.
void pack_uint8_to_m11(const uint8_t* src, float* dst, int64_t n,
                       int n_threads) {
  static float lut[256];
  static bool lut_init = false;
  if (!lut_init) {
    for (int i = 0; i < 256; ++i) lut[i] = static_cast<float>(i) / 127.5f - 1.0f;
    lut_init = true;
  }
  n_threads = std::max(1, n_threads);
  if (n_threads == 1 || n < (1 << 16)) {
    for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) dst[i] = lut[src[i]];
    });
  }
  for (auto& t : ts) t.join();
}

// float32 [-1,1] (or [0,1]) -> uint8 with min-max normalize per image.
// src: (h*w*c) one image; matches ops/image.unit_range_to_uint8 semantics.
void unit_to_uint8_minmax(const float* src, uint8_t* dst, int64_t n) {
  float lo = src[0], hi = src[0];
  for (int64_t i = 1; i < n; ++i) {
    lo = std::min(lo, src[i]);
    hi = std::max(hi, src[i]);
  }
  float scale = (hi > lo) ? 255.0f / (hi - lo) : 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float v = (src[i] - lo) * scale;
    dst[i] = static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v)));
  }
}

// Bilinear (half-pixel, cv2/torch align_corners=False) resize of an
// interleaved uint8 HWC image.
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  const float scale_h = static_cast<float>(sh) / dh;
  const float scale_w = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * scale_h - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * scale_w - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      int x0 = static_cast<int>(fx);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      for (int k = 0; k < c; ++k) {
        float v00 = src[(y0 * sw + x0) * c + k];
        float v01 = src[(y0 * sw + x1) * c + k];
        float v10 = src[(y1 * sw + x0) * c + k];
        float v11 = src[(y1 * sw + x1) * c + k];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                  wy * ((1 - wx) * v10 + wx * v11);
        dst[(y * dw + x) * c + k] =
            static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v + 0.5f)));
      }
    }
  }
}

// resize keeping aspect ratio so the smallest side == target, then
// center-crop target^2, then pack to float32 [-1,1]. Returns 0 on success.
int prepare_inference_u8(const uint8_t* src, int sh, int sw, int c,
                         float* dst, int target) {
  if (c <= 0 || sh <= 0 || sw <= 0) return -1;
  int nh, nw;
  if (sh < sw) {
    nh = target;
    nw = static_cast<int>(std::lround(static_cast<double>(sw) * target / sh));
  } else {
    nw = target;
    nh = static_cast<int>(std::lround(static_cast<double>(sh) * target / sw));
  }
  std::vector<uint8_t> tmp(static_cast<size_t>(nh) * nw * c);
  resize_bilinear_u8(src, sh, sw, c, tmp.data(), nh, nw);
  int top = (nh - target) / 2, left = (nw - target) / 2;
  for (int y = 0; y < target; ++y) {
    const uint8_t* row = tmp.data() + ((top + y) * nw + left) * c;
    float* out = dst + static_cast<int64_t>(y) * target * c;
    for (int i = 0; i < target * c; ++i)
      out[i] = static_cast<float>(row[i]) / 127.5f - 1.0f;
  }
  return 0;
}

}  // extern "C"
