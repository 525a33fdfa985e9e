// Native host-side media preprocessing: batched bilinear resize (short side)
// + center crop + mean/std normalize, multi-threaded.
//
// TPU-native replacement for the reference's per-item torchvision CPU
// pipeline (reference: vitron/model/multimodal_encoder/languagebind/
// image/processing_image.py:40-55 and video/processing_video.py:26-69),
// which is the host hot loop feeding the accelerators (SURVEY §3.1). The
// device-side jnp path (vitron_tpu/media/preprocess.py) handles on-device
// preprocessing; this library handles bulk host-side preparation where
// frames arrive faster than a single Python thread can transform them
// (video tracking at 5fps x batch, dataloader workers).
//
// C ABI only — loaded via ctypes (no pybind11 in this image).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float sample_bilinear(const uint8_t* img, int h, int w, int c,
                             float y, float x, int ch) {
  // half-pixel convention, clamped borders
  float fy = y - 0.5f;
  float fx = x - 0.5f;
  int y0 = (int)std::floor(fy);
  int x0 = (int)std::floor(fx);
  float wy = fy - y0;
  float wx = fx - x0;
  int y1 = std::min(y0 + 1, h - 1);
  int x1 = std::min(x0 + 1, w - 1);
  y0 = std::max(y0, 0);
  x0 = std::max(x0, 0);
  const float v00 = img[(y0 * w + x0) * c + ch];
  const float v01 = img[(y0 * w + x1) * c + ch];
  const float v10 = img[(y1 * w + x0) * c + ch];
  const float v11 = img[(y1 * w + x1) * c + ch];
  return v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
         v10 * wy * (1 - wx) + v11 * wy * wx;
}

void process_one(const uint8_t* src, int h, int w, float* dst, int out_size,
                 const float* mean, const float* stdv) {
  // short-side scale factor, then center crop out_size x out_size
  const float scale = (h <= w) ? (float)h / out_size : (float)w / out_size;
  const float nh = h / scale;
  const float nw = w / scale;
  const float off_y = (nh - out_size) * 0.5f;
  const float off_x = (nw - out_size) * 0.5f;
  for (int oy = 0; oy < out_size; ++oy) {
    const float sy = (oy + off_y + 0.5f) * scale;
    for (int ox = 0; ox < out_size; ++ox) {
      const float sx = (ox + off_x + 0.5f) * scale;
      float* out = dst + (oy * out_size + ox) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        const float v = sample_bilinear(src, h, w, 3, sy, sx, ch) / 255.0f;
        out[ch] = (v - mean[ch]) / stdv[ch];
      }
    }
  }
}

}  // namespace

extern "C" {

// src: n images, each h*w*3 uint8 (contiguous); dst: n*out*out*3 float32.
// Returns 0 on success.
int vitron_resize_normalize_batch(const uint8_t* src, int n, int h, int w,
                                  float* dst, int out_size, const float* mean,
                                  const float* stdv, int n_threads) {
  if (n <= 0 || h <= 0 || w <= 0 || out_size <= 0) return 1;
  const size_t in_stride = (size_t)h * w * 3;
  const size_t out_stride = (size_t)out_size * out_size * 3;
  if (n_threads <= 1 || n == 1) {
    for (int i = 0; i < n; ++i)
      process_one(src + i * in_stride, h, w, dst + i * out_stride, out_size,
                  mean, stdv);
    return 0;
  }
  n_threads = std::min(n_threads, n);
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([=]() {
      for (int i = t; i < n; i += n_threads)
        process_one(src + i * in_stride, h, w, dst + i * out_stride, out_size,
                    mean, stdv);
    });
  }
  for (auto& th : threads) th.join();
  return 0;
}

// Uniform frame index sampling (reference np.linspace semantics,
// processing_video.py:93). idx must hold num_out ints.
void vitron_uniform_indices(int num_total, int num_out, int* idx) {
  if (num_out == 1) {
    idx[0] = 0;
    return;
  }
  const double step = (double)(num_total - 1) / (num_out - 1);
  for (int i = 0; i < num_out; ++i) idx[i] = (int)(step * i);
}

}  // extern "C"
