// Native data codec for c3dgs_tpu: hot host-side IO paths that are
// per-element Python loops in the reference (scene/colmap_loader.py:125
// read_points3D_binary iterates 5M+ points in Python) or bit-twiddling
// (Morton encode, scene/gaussian_model.py:1417).
//
// Exposed via ctypes (no pybind11 in this environment); the Python side
// (c3dgs_tpu/native/__init__.py) compiles this lazily with g++ and falls
// back to numpy implementations when a compiler is unavailable.
//
// This is the runtime/data-loader layer; all device compute stays in
// JAX/XLA/Pallas.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- COLMAP
// points3D.bin layout per point:
//   uint64 id; double xyz[3]; uint8 rgb[3]; double error;
//   uint64 track_len; { int32 image_id; int32 point2D_idx; } * track_len
// Returns number of points parsed, or -1 on error. Caller supplies
// capacity-sized buffers (query count first with n_points_only=1).
long long colmap_points3d_parse(const char* path, double* xyz, uint8_t* rgb,
                                double* err, long long capacity,
                                int n_points_only) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) {
    fclose(f);
    return -1;
  }
  if (n_points_only) {
    fclose(f);
    return (long long)n;
  }
  if ((long long)n > capacity) n = (uint64_t)capacity;

  // read the remainder of the file in one go and walk it
  long long data_start = ftell(f);
  fseek(f, 0, SEEK_END);
  long long fsize = ftell(f);
  fseek(f, data_start, SEEK_SET);
  std::vector<unsigned char> buf((size_t)(fsize - data_start));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    return -1;
  }
  fclose(f);

  const unsigned char* p = buf.data();
  const unsigned char* end = buf.data() + buf.size();
  for (uint64_t i = 0; i < n; i++) {
    if (p + 8 + 24 + 3 + 8 + 8 > end) return (long long)i;
    p += 8;  // id
    memcpy(xyz + 3 * i, p, 24);
    p += 24;
    memcpy(rgb + 3 * i, p, 3);
    p += 3;
    memcpy(err + i, p, 8);
    p += 8;
    uint64_t track;
    memcpy(&track, p, 8);
    p += 8;
    p += track * 8;  // skip (image_id, point2D_idx) pairs
  }
  return (long long)n;
}

// ---------------------------------------------------------------- Morton
static inline uint64_t split_by_3(uint64_t a) {
  uint64_t x = a & 0x1FFFFF;
  x = (x | x << 32) & 0x1F00000000FFFFull;
  x = (x | x << 16) & 0x1F0000FF0000FFull;
  x = (x | x << 8) & 0x100F00F00F00F00Full;
  x = (x | x << 4) & 0x10C30C30C30C30C3ull;
  x = (x | x << 2) & 0x1249249249249249ull;
  return x;
}

// Morton reorder permutation, matching scene/gaussian_model.py:997-1023:
// 21-bit quantization over the bbox, axes permuted by ascending extent,
// stable argsort of the interleaved codes.
void morton_order_f32(const float* xyz, long long n, int* perm_out) {
  if (n <= 0) return;
  double mn[3] = {xyz[0], xyz[1], xyz[2]};
  double mx[3] = {xyz[0], xyz[1], xyz[2]};
  for (long long i = 0; i < n; i++) {
    for (int d = 0; d < 3; d++) {
      double v = xyz[3 * i + d];
      if (v < mn[d]) mn[d] = v;
      if (v > mx[d]) mx[d] = v;
    }
  }
  double ext[3], denom[3];
  int order[3] = {0, 1, 2};
  for (int d = 0; d < 3; d++) {
    ext[d] = mx[d] - mn[d];
    denom[d] = ext[d] > 0 ? ext[d] : 1.0;
  }
  std::sort(order, order + 3, [&](int a, int b) { return ext[a] < ext[b]; });

  std::vector<std::pair<uint64_t, int>> keyed((size_t)n);
  const double scale = (double)((1 << 21) - 1);
  for (long long i = 0; i < n; i++) {
    uint64_t q[3];
    for (int d = 0; d < 3; d++) {
      double v = (xyz[3 * i + d] - mn[d]) / denom[d] * scale;
      if (v < 0) v = 0;
      if (v > scale) v = scale;
      q[d] = (uint64_t)v;
    }
    uint64_t code = split_by_3(q[order[0]]) | (split_by_3(q[order[1]]) << 1) |
                    (split_by_3(q[order[2]]) << 2);
    keyed[(size_t)i] = {code, (int)i};
  }
  std::stable_sort(keyed.begin(), keyed.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  for (long long i = 0; i < n; i++) perm_out[i] = keyed[(size_t)i].second;
}

// ------------------------------------------------------------- PLY codec
// De-interleave a binary-little-endian vertex blob of float32 properties
// into separate column arrays (the numpy structured-dtype path copies
// column-by-column; this walks the blob once).
void ply_deinterleave_f32(const unsigned char* blob, long long n_vertices,
                          int n_props, float* out /* (n_props, n) */) {
  const float* src = (const float*)blob;
  for (long long v = 0; v < n_vertices; v++)
    for (int p = 0; p < n_props; p++)
      out[(long long)p * n_vertices + v] = src[v * n_props + p];
}

}  // extern "C"
