// vitax native host runtime: batch assembly for the input pipeline.
//
// The TPU compute path is JAX/XLA/Pallas; this is the host-side native
// layer standing in for the reference's C++ (torch DataLoader workers +
// torchvision transforms, src/data_loaders.py:32-124). One call assembles a
// training batch from an in-memory uint8 dataset: gather rows by index,
// optional horizontal flip, bilinear resize, and ToTensor+Normalize(0.5,0.5)
// into float32 NHWC — multithreaded across samples, zero Python-loop
// overhead.
//
// Exposed as a plain C ABI consumed via ctypes (vitax/native/__init__.py);
// no pybind11 dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread batchops.cpp -o libvitaxnative.so

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Bilinear resize with half-pixel centers (matches PIL/torchvision geometry
// for upscaling, where the triangle filter support stays <= 1 px).
// Separable two-pass with precomputed per-axis (index, weight) tables —
// 2 taps per sample instead of 4, vectorizable inner loops.

struct AxisTable {
  std::vector<int> i0;
  std::vector<float> w;  // weight of i0+1; (1-w) goes to i0
};

inline AxisTable make_axis_table(int src_n, int dst_n) {
  AxisTable t;
  t.i0.resize(dst_n);
  t.w.resize(dst_n);
  const float s = static_cast<float>(src_n) / dst_n;
  for (int i = 0; i < dst_n; ++i) {
    float f = (i + 0.5f) * s - 0.5f;
    if (f < 0) f = 0;
    if (f > src_n - 1) f = static_cast<float>(src_n - 1);
    int i0 = static_cast<int>(f);
    if (i0 > src_n - 2) i0 = src_n - 2;
    t.i0[i] = i0;
    t.w[i] = f - i0;  // clamp BEFORE deriving weight: keeps w in [0,1]
  }
  return t;
}

// src uint8 [sh,sw,3] → dst uint8 [dh,dw,3]
inline void resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                               uint8_t* dst, int dh, int dw, int ch,
                               const AxisTable& tx, const AxisTable& ty,
                               std::vector<float>& hbuf) {
  // pass 1: horizontal, uint8 [sh,sw,ch] → float [sh,dw,ch]
  hbuf.resize(static_cast<size_t>(sh) * dw * ch);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * ch;
    float* orow = hbuf.data() + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* a = row + tx.i0[x] * ch;
      const float w = tx.w[x];
      const float iw = 1.0f - w;
      for (int c = 0; c < ch; ++c)
        orow[x * ch + c] = iw * a[c] + w * a[ch + c];
    }
  }
  // pass 2: vertical, float [sh,dw,ch] → uint8 [dh,dw,ch]
  const int rowlen = dw * ch;
  for (int y = 0; y < dh; ++y) {
    const float* r0 = hbuf.data() + static_cast<size_t>(ty.i0[y]) * rowlen;
    const float* r1 = r0 + rowlen;
    const float w = ty.w[y];
    const float iw = 1.0f - w;
    uint8_t* out = dst + static_cast<size_t>(y) * rowlen;
    for (int x = 0; x < rowlen; ++x)
      out[x] = static_cast<uint8_t>(iw * r0[x] + w * r1[x] + 0.5f);
  }
}

inline void hflip_u8(uint8_t* img, int h, int w, int ch) {
  std::vector<uint8_t> tmp(ch);
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img + y * w * ch;
    for (int x = 0; x < w / 2; ++x) {
      uint8_t* a = row + x * ch;
      uint8_t* b = row + (w - 1 - x) * ch;
      std::memcpy(tmp.data(), a, ch);
      std::memcpy(a, b, ch);
      std::memcpy(b, tmp.data(), ch);
    }
  }
}

// uint8 [0,255] -> float32 in [-1,1]: (x/255 - 0.5) / 0.5
inline void normalize_f32(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kScale = 2.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * kScale - 1.0f;
}

}  // namespace

extern "C" {

// Assemble a batch.
//   data:    [num_items, sh, sw, 3] uint8 source dataset (contiguous)
//   indices: [count] int64 row indices into data
//   flips:   [count] uint8 (1 = horizontal flip) or nullptr
//   out:     [batch, dh, dw, 3] float32 (rows >= count are padded with row 0)
// Returns 0 on success.
int vitax_assemble_batch(const uint8_t* data, int64_t num_items, int sh,
                         int sw, const int64_t* indices, const uint8_t* flips,
                         int count, int batch, int dh, int dw, float* out,
                         int num_threads) {
  if (count <= 0 || batch < count) return 1;
  const int ch = 3;
  const int64_t out_px = static_cast<int64_t>(dh) * dw * ch;
  if (num_threads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    num_threads = hc ? static_cast<int>(hc) : 4;
  }
  if (num_threads > count) num_threads = count;

  const bool needs_resize = (sh != dh || sw != dw);
  const AxisTable tx = needs_resize ? make_axis_table(sw, dw) : AxisTable{};
  const AxisTable ty = needs_resize ? make_axis_table(sh, dh) : AxisTable{};

  std::atomic<int> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    std::vector<uint8_t> scratch;   // flip buffer
    std::vector<uint8_t> resized;   // resize buffer
    std::vector<float> hbuf;        // separable-resize intermediate
    for (;;) {
      int j = next.fetch_add(1);
      if (j >= count) break;
      int64_t idx = indices[j];
      if (idx < 0 || idx >= num_items) { err.store(1); break; }
      const uint8_t* src = data + idx * (int64_t)sh * sw * ch;
      const uint8_t* img = src;
      if (flips && flips[j]) {
        scratch.assign(src, src + (int64_t)sh * sw * ch);
        hflip_u8(scratch.data(), sh, sw, ch);
        img = scratch.data();
      }
      if (needs_resize) {
        resized.resize(out_px);
        resize_bilinear_u8(img, sh, sw, resized.data(), dh, dw, ch,
                           tx, ty, hbuf);
        img = resized.data();
      }
      normalize_f32(img, out + j * out_px, out_px);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  if (err.load()) return 2;

  // pad remaining rows with row 0 (weight-masked by the caller)
  for (int j = count; j < batch; ++j)
    std::memcpy(out + j * out_px, out, out_px * sizeof(float));
  return 0;
}

// Standalone fused normalize (uint8 HWC -> float32), for path-backed
// datasets where decode happens in Python but normalize dominates.
void vitax_normalize(const uint8_t* src, float* dst, int64_t n) {
  normalize_f32(src, dst, n);
}

int vitax_version() { return 1; }

}  // extern "C"
