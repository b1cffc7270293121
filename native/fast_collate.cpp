// Native batch assembler for the host input pipeline.
//
// The TPU step consumes fixed-shape f32/i32 batches; assembling them from
// RAM-preloaded uint8 slices in Python costs one interpreter round-trip per
// item (crop -> cast -> normalize -> stack). This kernel fuses
// crop+cast+scale for a whole batch across a thread pool, writing directly
// into the output buffers the loader hands to jax.device_put.
//
// (The reference framework is pure Python; this is the runtime-tier native
// component of the TPU rebuild's data loader.)
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastcollate.so fast_collate.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// images/labels: array of n pointers to [in_h, in_w] uint8 slices.
// ys/xs: per-item crop origins. out_img: [n, out_h, out_w] f32 in [0,1];
// out_lab: [n, out_h, out_w] int32 (labels may be null -> skipped).
void collate_crop_u8(const uint8_t** images, const uint8_t** labels, int n,
                     int in_h, int in_w, const int* ys, const int* xs,
                     int out_h, int out_w, float* out_img, int32_t* out_lab,
                     int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next{0};
  auto worker = [&]() {
    constexpr float kScale = 1.0f / 255.0f;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      const uint8_t* img = images[i];
      const uint8_t* lab = labels ? labels[i] : nullptr;
      const int y0 = ys[i];
      const int x0 = xs[i];
      float* oi = out_img + static_cast<int64_t>(i) * out_h * out_w;
      int32_t* ol = out_lab ? out_lab + static_cast<int64_t>(i) * out_h * out_w
                            : nullptr;
      for (int r = 0; r < out_h; ++r) {
        const uint8_t* src = img + static_cast<int64_t>(y0 + r) * in_w + x0;
        float* dst = oi + static_cast<int64_t>(r) * out_w;
        for (int c = 0; c < out_w; ++c) dst[c] = src[c] * kScale;
        if (lab && ol) {
          const uint8_t* lsrc = lab + static_cast<int64_t>(y0 + r) * in_w + x0;
          int32_t* ldst = ol + static_cast<int64_t>(r) * out_w;
          for (int c = 0; c < out_w; ++c) ldst[c] = lsrc[c];
        }
      }
    }
  };
  std::vector<std::thread> pool;
  const int workers = std::min(num_threads, n > 0 ? n : 1);
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
