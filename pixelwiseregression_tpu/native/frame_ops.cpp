// Native host-side frame decoding for the data loader.
//
// The reference leans on OpenCV's C++ internals for its host pixel work;
// our device pipeline replaced those, and this small library covers the
// remaining host-side hot path: decoding raw depth frames into the batch
// buffer without holding the Python GIL and with a real thread pool.
//
//   * msra_decode_batch: MSRA .bin tiles (6x int32 header + f32 payload,
//     reference: utils.py:253-260) embedded into zeroed 320x240 canvases,
//     plus the center-of-mass fallback (reference: datasets.py:208-211)
//     computed in the same pass over the pixels.
//   * nyu_pack_batch: NYU RGB-packed PNG planes -> depth in mm with the
//     reference's float32 rounding semantics ((g/255*256 + b/255)*255,
//     reference: datasets.py:809-810).
//
// Exposed with a C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -march=native -shared -fPIC -o libframe_ops.so frame_ops.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct MsraResult {
  int status;  // 0 ok, nonzero errno-ish
};

void decode_one_msra(const char* path, int frame_h, int frame_w, float* out_frame,
                     double* out_com, int* status) {
  std::memset(out_frame, 0, sizeof(float) * frame_h * frame_w);
  *status = 1;
  FILE* f = std::fopen(path, "rb");
  if (!f) return;
  int32_t hdr[6];
  if (std::fread(hdr, sizeof(int32_t), 6, f) != 6) {
    std::fclose(f);
    return;
  }
  const int left = hdr[2], top = hdr[3], right = hdr[4], bottom = hdr[5];
  const int th = bottom - top, tw = right - left;
  if (th <= 0 || tw <= 0 || top < 0 || left < 0 || bottom > frame_h || right > frame_w) {
    std::fclose(f);
    return;
  }
  std::vector<float> tile((size_t)th * tw);
  if (std::fread(tile.data(), sizeof(float), tile.size(), f) != tile.size()) {
    std::fclose(f);
    return;
  }
  std::fclose(f);

  // embed + center-of-mass over positive support in one pass
  double sum_r = 0.0, sum_c = 0.0, sum_v = 0.0;
  int64_t count = 0;
  for (int r = 0; r < th; ++r) {
    float* dst = out_frame + (size_t)(top + r) * frame_w + left;
    const float* src = tile.data() + (size_t)r * tw;
    for (int c = 0; c < tw; ++c) {
      const float v = src[c];
      dst[c] = v;
      if (v > 0.0f) {
        sum_r += (double)(top + r);
        sum_c += (double)(left + c);
        sum_v += (double)v;
        ++count;
      }
    }
  }
  if (count == 0) return;
  out_com[0] = sum_c / (double)count;  // u
  out_com[1] = sum_r / (double)count;  // v
  out_com[2] = sum_v / (double)count;  // mean depth
  *status = 0;
}

template <typename Fn>
void parallel_for(int n, int num_threads, Fn&& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      fn(i);
    }
  };
  std::vector<std::thread> pool;
  const int t = std::min(num_threads, n);
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// paths: n C strings; out_frames: [n, frame_h, frame_w] f32;
// out_coms: [n, 3] f64; out_status: [n] i32 (0 = ok).
void msra_decode_batch(const char** paths, int n, int frame_h, int frame_w,
                       float* out_frames, double* out_coms, int* out_status,
                       int num_threads) {
  parallel_for(n, num_threads, [&](int i) {
    decode_one_msra(paths[i], frame_h, frame_w,
                    out_frames + (size_t)i * frame_h * frame_w,
                    out_coms + (size_t)i * 3, out_status + i);
  });
}

// rgb: [n, h, w, 3] u8 (decoded PNG planes); out: [n, h, w] f32.
// Replicates (g/255*256 + b/255)*255 in float32 exactly.
void nyu_pack_batch(const uint8_t* rgb, int n, int h, int w, float* out,
                    int num_threads) {
  const size_t px = (size_t)h * w;
  parallel_for(n, num_threads, [&](int i) {
    const uint8_t* src = rgb + (size_t)i * px * 3;
    float* dst = out + (size_t)i * px;
    for (size_t p = 0; p < px; ++p) {
      const float g = (float)src[p * 3 + 1] / 255.0f;
      const float b = (float)src[p * 3 + 2] / 255.0f;
      dst[p] = (g * 256.0f + b) * 255.0f;
    }
  });
}

// raw16: [n, h, w] u16 (decoded 16-bit PNG); out: [n, h, w] f32.
// Replicates plt.imread*65535 float32 rounding: (x/65535)*65535 in f32.
void png16_scale_batch(const uint16_t* raw16, int n, int h, int w, float* out,
                       int num_threads) {
  const size_t px = (size_t)h * w;
  parallel_for(n, num_threads, [&](int i) {
    const uint16_t* src = raw16 + (size_t)i * px;
    float* dst = out + (size_t)i * px;
    for (size_t p = 0; p < px; ++p) {
      dst[p] = ((float)src[p] / 65535.0f) * 65535.0f;
    }
  });
}

}  // extern "C"
