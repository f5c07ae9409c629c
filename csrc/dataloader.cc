// Native host-side data-loading kernels for unibev_tpu.
//
// The reference delegates its host data path to torch DataLoader's C++
// workers; this library provides the equivalent native layer for the TPU
// input pipeline (single-process, thread-pooled by the caller): point-cloud
// .bin IO, sweep transforms, range filter + pad, and multi-view image
// normalization/padding.  Exposed via ctypes (see
// unibev_tpu/data/native.py) with pure-numpy fallbacks.
//
// Build: make -C csrc   (produces libunibev_data.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <random>

extern "C" {

// Load a float32 .bin point cloud with `dim` columns.
// Returns number of points read (capped at max_points), or -1 on IO error.
int64_t load_points_bin(const char* path, float* out, int64_t max_points,
                        int64_t dim) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t n = fread(out, sizeof(float) * dim, max_points, f);
  fclose(f);
  return n;
}

// points[:, :3] = points[:, :3] @ R^T + t  (row-major R[9], t[3]) in place.
void transform_points(float* points, int64_t n, int64_t dim, const float* R,
                      const float* t) {
  for (int64_t i = 0; i < n; ++i) {
    float* p = points + i * dim;
    const float x = p[0], y = p[1], z = p[2];
    p[0] = R[0] * x + R[1] * y + R[2] * z + t[0];
    p[1] = R[3] * x + R[4] * y + R[5] * z + t[1];
    p[2] = R[6] * x + R[7] * y + R[8] * z + t[2];
  }
}

// Filter to pc_range, optionally shuffle (Fisher-Yates, seeded), write into
// a fixed-size (max_out, dim) buffer + mask. Returns kept count.
int64_t range_filter_shuffle_pad(const float* points, int64_t n, int64_t dim,
                                 const float* pc_range, int shuffle,
                                 uint64_t seed, float* out, uint8_t* mask,
                                 int64_t max_out) {
  int64_t kept = 0;
  for (int64_t i = 0; i < n && kept < max_out; ++i) {
    const float* p = points + i * dim;
    if (p[0] >= pc_range[0] && p[0] <= pc_range[3] &&
        p[1] >= pc_range[1] && p[1] <= pc_range[4] &&
        p[2] >= pc_range[2] && p[2] <= pc_range[5]) {
      memcpy(out + kept * dim, p, sizeof(float) * dim);
      ++kept;
    }
  }
  if (shuffle && kept > 1) {
    std::mt19937_64 rng(seed);
    for (int64_t i = kept - 1; i > 0; --i) {
      const int64_t j = rng() % (i + 1);
      for (int64_t d = 0; d < dim; ++d) {
        const float tmp = out[i * dim + d];
        out[i * dim + d] = out[j * dim + d];
        out[j * dim + d] = tmp;
      }
    }
  }
  memset(out + kept * dim, 0, sizeof(float) * (max_out - kept) * dim);
  for (int64_t i = 0; i < max_out; ++i) mask[i] = i < kept;
  return kept;
}

// (H, W, 3) uint8 BGR -> normalized float32, padded to (outH, outW, 3).
void normalize_pad_image_u8(const uint8_t* src, int64_t H, int64_t W,
                            const float* mean, const float* stdinv,
                            int to_rgb, float* dst, int64_t outH,
                            int64_t outW) {
  memset(dst, 0, sizeof(float) * outH * outW * 3);
  for (int64_t y = 0; y < H; ++y) {
    const uint8_t* srow = src + y * W * 3;
    float* drow = dst + y * outW * 3;
    for (int64_t x = 0; x < W; ++x) {
      float b = srow[x * 3 + 0], g = srow[x * 3 + 1], r = srow[x * 3 + 2];
      if (to_rgb) { const float t = b; b = r; r = t; }
      drow[x * 3 + 0] = (b - mean[0]) * stdinv[0];
      drow[x * 3 + 1] = (g - mean[1]) * stdinv[1];
      drow[x * 3 + 2] = (r - mean[2]) * stdinv[2];
    }
  }
}

// float32 variant (post photometric distortion).
void normalize_pad_image_f32(const float* src, int64_t H, int64_t W,
                             const float* mean, const float* stdinv,
                             float* dst, int64_t outH, int64_t outW) {
  memset(dst, 0, sizeof(float) * outH * outW * 3);
  for (int64_t y = 0; y < H; ++y) {
    const float* srow = src + y * W * 3;
    float* drow = dst + y * outW * 3;
    for (int64_t x = 0; x < W * 3; ++x) {
      const int64_t c = x % 3;
      drow[x] = (srow[x] - mean[c]) * stdinv[c];
    }
  }
}

}  // extern "C"
