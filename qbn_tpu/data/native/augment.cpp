// Native host-side image pipeline: threaded augmentation and distortion
// kernels feeding the TPU input queue.
//
// The reference delegates this work to torch's native DataLoader workers
// and torchvision transforms (reference: src/data.py:138-232,
// num_workers=16 at :182-184). Here the same operations are a small C++
// library driven through ctypes: per-image work is parallelised over a
// std::thread pool, operating on float32 NHWC images in [0, 1].
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        augment.cpp -o libqbn_augment.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// run fn(i) for i in [0, n) over a thread pool
template <typename F>
void parallel_for(int n, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int workers = static_cast<int>(hw ? hw : 4);
  workers = std::min(workers, n);
  if (workers <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([=]() {
      for (int i = t; i < n; i += workers) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Random crop (pad 4, zero fill) + horizontal flip. ys/xs in [0, 8],
// flip in {0, 1}, one per image (sampled by the caller so RNG stays in
// Python's seeded stream).
void qbn_cifar_augment(const float* in, float* out, int n, int h, int w,
                       int c, const int32_t* ys, const int32_t* xs,
                       const uint8_t* flip) {
  const int pad = 4;
  const int stride_img = h * w * c;
  parallel_for(n, [=](int i) {
    const float* src = in + (size_t)i * stride_img;
    float* dst = out + (size_t)i * stride_img;
    const int oy = ys[i] - pad;  // source row offset of the crop window
    const int ox = xs[i] - pad;
    const bool fl = flip[i] != 0;
    for (int y = 0; y < h; ++y) {
      const int sy = y + oy;
      for (int x = 0; x < w; ++x) {
        const int sx = x + ox;
        float* px = dst + ((size_t)y * w + x) * c;
        if (sy < 0 || sy >= h || sx < 0 || sx >= w) {
          std::memset(px, 0, sizeof(float) * c);
        } else {
          const int rx = fl ? (w - 1 - sx) : sx;
          std::memcpy(px, src + ((size_t)sy * w + rx) * c,
                      sizeof(float) * c);
        }
      }
    }
  });
}

// Fixed-angle rotation about the image centre, nearest neighbour, zero
// fill (positive angle = counter-clockwise; torchvision affine semantics).
void qbn_rotate(const float* in, float* out, int n, int h, int w, int c,
                float degrees) {
  // double intermediates + round-half-even to match the numpy reference
  // path bitwise (np.deg2rad/cos/sin are float64 and np.round is
  // half-even; at e.g. 45 deg the source coordinates land exactly on
  // .5 ties and float32/half-away rounding picks different pixels)
  const double th = (double)degrees * 3.14159265358979323846 / 180.0;
  const double ct = std::cos(th), st = std::sin(th);
  const double cy = (h - 1) * 0.5, cx = (w - 1) * 0.5;
  const int stride_img = h * w * c;
  parallel_for(n, [=](int i) {
    const float* src = in + (size_t)i * stride_img;
    float* dst = out + (size_t)i * stride_img;
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        const double fx = ct * (x - cx) + st * (y - cy) + cx;
        const double fy = -st * (x - cx) + ct * (y - cy) + cy;
        const int sx = (int)std::nearbyint(fx);
        const int sy = (int)std::nearbyint(fy);
        float* px = dst + ((size_t)y * w + x) * c;
        if (sx < 0 || sx >= w || sy < 0 || sy >= h) {
          std::memset(px, 0, sizeof(float) * c);
        } else {
          std::memcpy(px, src + ((size_t)sy * w + sx) * c,
                      sizeof(float) * c);
        }
      }
    }
  });
}

// Horizontal translate right by tx pixels, zero fill.
void qbn_hshift(const float* in, float* out, int n, int h, int w, int c,
                int tx) {
  const int stride_img = h * w * c;
  parallel_for(n, [=](int i) {
    const float* src = in + (size_t)i * stride_img;
    float* dst = out + (size_t)i * stride_img;
    std::memset(dst, 0, sizeof(float) * stride_img);
    if (tx >= w) return;
    for (int y = 0; y < h; ++y) {
      std::memcpy(dst + ((size_t)y * w + tx) * c,
                  src + (size_t)y * w * c, sizeof(float) * (w - tx) * c);
    }
  });
}

// Brightness: multiply by factor, clamp to [0, 1].
// PIL ImageEnhance.Brightness semantics on uint8-derived [0,1] floats:
// CLIP8((int)(float(v) * factor)) — float32 multiply then TRUNCATION —
// applied to v = round(x * 255), result rescaled to [0,1]. Matches the
// numpy brighten (data/distortions.py) bit for bit.
void qbn_brighten(const float* in, float* out, int n, int h, int w, int c,
                  float factor) {
  const size_t total = (size_t)n * h * w * c;
  const int chunks = 64;
  parallel_for(chunks, [=](int k) {
    const size_t lo = total * k / chunks;
    const size_t hi = total * (k + 1) / chunks;
    for (size_t j = lo; j < hi; ++j) {
      float v = std::nearbyintf(in[j] * 255.0f) * factor;
      v = std::truncf(v);
      v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
      out[j] = v / 255.0f;
    }
  });
}

// Normalize: (x - mean[c]) / std[c], per channel.
void qbn_normalize(const float* in, float* out, int n, int h, int w, int c,
                   const float* mean, const float* stddev) {
  const int stride_img = h * w * c;
  parallel_for(n, [=](int i) {
    const float* src = in + (size_t)i * stride_img;
    float* dst = out + (size_t)i * stride_img;
    for (int p = 0; p < h * w; ++p) {
      for (int ch = 0; ch < c; ++ch) {
        dst[(size_t)p * c + ch] =
            (src[(size_t)p * c + ch] - mean[ch]) / stddev[ch];
      }
    }
  });
}

}  // extern "C"
