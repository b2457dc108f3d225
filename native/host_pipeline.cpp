// Native host-side sample assembly for the input pipeline.
//
// The reference consumes a custom C++/CUDA operator library for its native
// compute (the Paddle fork's affinity_propagate); on TPU that role is filled
// by the Pallas kernels.  The native layer here instead accelerates the
// *host* runtime: the per-sample tensor assembly that follows the PIL
// geometric transforms -- ImageNet normalization, depth scaling, Bernoulli
// sparse-depth sampling (both NYU total-pixel and KITTI valid-pixel
// denominators, nyu_dataset_loader.py:141 / kitti_dataset_loader.py:138) and
// RGBD packing -- done in one multithreaded fused pass instead of several
// numpy temporaries.
//
// Exposed as a plain C API consumed via ctypes (cspn_tpu/data/native.py).
//
// Build: make -C native   (g++ -O3 -shared; no external dependencies)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// splitmix64 -- deterministic, seedable, threadable PRNG
static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d65a6b49087a25ULL;
  return z ^ (z >> 31);
}

static inline float uniform01(uint64_t& s) {
  return (float)(splitmix64(s) >> 40) * (1.0f / 16777216.0f);
}

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

void pack_rows(const uint8_t* rgb, const float* depth, int h, int w,
               int row_begin, int row_end, float inv_scale, float p_sample,
               uint64_t seed, float* out_rgbd, float* out_depth) {
  const float inv255 = 1.0f / 255.0f;
  for (int i = row_begin; i < row_end; ++i) {
    uint64_t s = seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(i + 1));
    const uint8_t* rrow = rgb + (size_t)i * w * 3;
    const float* drow = depth + (size_t)i * w;
    float* orow = out_rgbd + (size_t)i * w * 4;
    float* odrow = out_depth + (size_t)i * w;
    for (int j = 0; j < w; ++j) {
      for (int c = 0; c < 3; ++c) {
        orow[j * 4 + c] =
            ((float)rrow[j * 3 + c] * inv255 - kMean[c]) / kStd[c];
      }
      float d = drow[j] * inv_scale;
      odrow[j] = d;
      float mask = uniform01(s) < p_sample ? 1.0f : 0.0f;
      orow[j * 4 + 3] = d * mask;
    }
  }
}

}  // namespace

extern "C" {

// Count depth values > threshold (valid-pixel denominator for KITTI).
int64_t cspn_count_valid(const float* depth, int64_t n, float threshold) {
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) count += depth[i] > threshold;
  return count;
}

// Fused normalize + depth-scale + Bernoulli sparse sample + RGBD pack.
//   rgb:       [h, w, 3] uint8 (post geometric transforms)
//   depth:     [h, w] float32
//   inv_scale: depth is multiplied by this (reference's depth /= s)
//   p_sample:  Bernoulli probability for the sparse mask
//   seed:      sampling seed (deterministic per (seed, row))
//   out_rgbd:  [h, w, 4] float32, out_depth: [h, w] float32
void cspn_pack_sample(const uint8_t* rgb, const float* depth, int h, int w,
                      float inv_scale, float p_sample, uint64_t seed,
                      float* out_rgbd, float* out_depth, int num_threads) {
  if (num_threads <= 1 || h < 64) {
    pack_rows(rgb, depth, h, w, 0, h, inv_scale, p_sample, seed, out_rgbd,
              out_depth);
    return;
  }
  std::vector<std::thread> threads;
  int chunk = (h + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int b = t * chunk, e = std::min(h, b + chunk);
    if (b >= e) break;
    threads.emplace_back(pack_rows, rgb, depth, h, w, b, e, inv_scale,
                         p_sample, seed, out_rgbd, out_depth);
  }
  for (auto& th : threads) th.join();
}

// Batch variant: B samples with contiguous layouts, one thread per sample.
void cspn_pack_batch(const uint8_t* rgb, const float* depth, int b, int h,
                     int w, const float* inv_scales, const float* p_samples,
                     const uint64_t* seeds, float* out_rgbd, float* out_depth,
                     int num_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= b) return;
      pack_rows(rgb + (size_t)i * h * w * 3, depth + (size_t)i * h * w, h, w,
                0, h, inv_scales[i], p_samples[i], seeds[i],
                out_rgbd + (size_t)i * h * w * 4, out_depth + (size_t)i * h * w);
    }
  };
  int nt = std::max(1, std::min(num_threads, b));
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
