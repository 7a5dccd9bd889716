// Native host-side kernels for trajectory_optimization_tpu.
//
// The reference delegates cloud downsampling to PCL's C++ VoxelGrid nodelet
// (launch/voxels_filtering.launch); this is the equivalent native component
// for the scene-bus filter node, exposed via a C ABI and loaded with ctypes
// (no pybind11 in this environment). Build: `make` in this directory.
//
// All functions are thread-safe (no global state) and operate on row-major
// float32 buffers owned by the caller.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct VoxelKey {
  int64_t x, y, z;
  bool operator==(const VoxelKey &o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct VoxelKeyHash {
  size_t operator()(const VoxelKey &k) const {
    // large-prime mix, same family as the device-side hash
    uint64_t h = static_cast<uint64_t>(k.x) * 73856093ULL;
    h ^= static_cast<uint64_t>(k.y) * 19349663ULL;
    h ^= static_cast<uint64_t>(k.z) * 83492791ULL;
    return static_cast<size_t>(h);
  }
};

struct Accum {
  double sum[8] = {0, 0, 0, 0, 0, 0, 0, 0};
  int64_t count = 0;
};

}  // namespace

extern "C" {

// Centroid voxel-grid downsample (PCL VoxelGrid semantics).
//   pts:      n x dim float32 (dim in [3, 8]; extra columns averaged too)
//   leaf:     voxel edge length
//   use_z/zmin/zmax: optional z pass-through filter
//   out:      caller buffer, capacity max_out x dim
// Returns the number of output points (<= max_out), or -1 on bad args.
int64_t voxel_downsample(const float *pts, int64_t n, int32_t dim, float leaf,
                         int32_t use_z, float zmin, float zmax, float *out,
                         int64_t max_out) {
  if (dim < 3 || dim > 8 || leaf <= 0.0f || n < 0) return -1;
  std::unordered_map<VoxelKey, Accum, VoxelKeyHash> grid;
  grid.reserve(static_cast<size_t>(n / 4 + 16));
  const double inv_leaf = 1.0 / static_cast<double>(leaf);

  for (int64_t i = 0; i < n; ++i) {
    const float *p = pts + i * dim;
    if (use_z && (p[2] < zmin || p[2] > zmax)) continue;
    if (!std::isfinite(p[0]) || !std::isfinite(p[1]) || !std::isfinite(p[2]))
      continue;
    VoxelKey key{static_cast<int64_t>(std::floor(p[0] * inv_leaf)),
                 static_cast<int64_t>(std::floor(p[1] * inv_leaf)),
                 static_cast<int64_t>(std::floor(p[2] * inv_leaf))};
    Accum &a = grid[key];
    for (int32_t c = 0; c < dim; ++c) a.sum[c] += p[c];
    a.count += 1;
  }

  int64_t m = 0;
  for (const auto &kv : grid) {
    if (m >= max_out) break;
    const Accum &a = kv.second;
    float *o = out + m * dim;
    for (int32_t c = 0; c < dim; ++c)
      o[c] = static_cast<float>(a.sum[c] / static_cast<double>(a.count));
    ++m;
  }
  return m;
}

// Hard frustum cull: camera-frame points -> 0/1 mask.
// Semantics match ops.geometry.frustum_cull / reference src/tools.py:176-187.
void frustum_cull_mask(const float *pts, int64_t n, const float *K3x3,
                       float img_w, float img_h, float min_dist, float max_dist,
                       uint8_t *mask_out) {
  const float fx = K3x3[0], cx = K3x3[2], fy = K3x3[4], cy = K3x3[5];
  for (int64_t i = 0; i < n; ++i) {
    const float *p = pts + i * 3;
    const float z = p[2];
    bool ok = (z > min_dist) && (z < max_dist);
    if (ok) {
      const float u = (fx * p[0] + cx * z) / z;
      const float v = (fy * p[1] + cy * z) / z;
      ok = (u > 1.0f) && (u < img_w - 1.0f) && (v > 1.0f) && (v < img_h - 1.0f);
    }
    mask_out[i] = ok ? 1 : 0;
  }
}

// Binary occupancy grid (pc_to_voxel parity, src/pointcloud_utils.py:279-288).
// grid_out must hold dx*dy*dz uint8, zero-initialized by this function.
void occupancy_grid(const float *pts, int64_t n, float resolution, float x0,
                    float x1, float y0, float y1, float z0, float z1,
                    uint8_t *grid_out) {
  const int64_t dx = static_cast<int64_t>((x1 - x0) / resolution);
  const int64_t dy = static_cast<int64_t>((y1 - y0) / resolution);
  const int64_t dz = static_cast<int64_t>(std::lround((z1 - z0) / resolution));
  std::memset(grid_out, 0, static_cast<size_t>(dx * dy * dz));
  for (int64_t i = 0; i < n; ++i) {
    const float *p = pts + i * 3;
    if (p[0] < x0 || p[0] >= x1 || p[1] < y0 || p[1] >= y1 || p[2] < z0 ||
        p[2] >= z1)
      continue;
    const int64_t ix = static_cast<int64_t>((p[0] - x0) / resolution);
    const int64_t iy = static_cast<int64_t>((p[1] - y0) / resolution);
    const int64_t iz = static_cast<int64_t>((p[2] - z0) / resolution);
    if (ix < dx && iy < dy && iz < dz) grid_out[(ix * dy + iy) * dz + iz] = 1;
  }
}

// LZ4 *block* decoder (format per the public LZ4 block spec): sequences of
// [token][literals][2-byte LE match offset][ext match len]. Written from the
// spec for decoding lz4-compressed rosbag chunks (the reference's session
// bag is lz4, launch/rosbag_info.txt); decompression only — the bag writer
// emits spec-valid stored blocks and needs no encoder. Decodes into dst AT
// dst_pos so block-DEPENDENT frames (matches reaching into prior blocks'
// output) work by construction. Returns the new dst_pos, or -1 on malformed
// input / insufficient dst capacity.
int64_t lz4_block_decode(const uint8_t *src, int64_t src_len, uint8_t *dst,
                         int64_t dst_pos, int64_t dst_cap) {
  int64_t ip = 0, op = dst_pos;
  while (ip < src_len) {
    const uint8_t token = src[ip++];
    // literal run
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (ip >= src_len) return -1;
        b = src[ip++];
        lit += b;
      } while (b == 255);
    }
    if (ip + lit > src_len || op + lit > dst_cap) return -1;
    std::memcpy(dst + op, src + ip, static_cast<size_t>(lit));
    ip += lit;
    op += lit;
    if (ip == src_len) break;  // last sequence carries literals only
    // match
    if (ip + 2 > src_len) return -1;
    const int64_t offset = src[ip] | (src[ip + 1] << 8);
    ip += 2;
    if (offset == 0 || offset > op) return -1;
    int64_t mlen = (token & 0x0F);
    if (mlen == 15) {
      uint8_t b;
      do {
        if (ip >= src_len) return -1;
        b = src[ip++];
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    if (op + mlen > dst_cap) return -1;
    const uint8_t *m = dst + op - offset;
    if (offset >= mlen) {  // disjoint: bulk copy
      std::memcpy(dst + op, m, static_cast<size_t>(mlen));
    } else {  // overlapping match replicates a pattern byte-by-byte
      for (int64_t k = 0; k < mlen; ++k) dst[op + k] = m[k];
    }
    op += mlen;
  }
  return op;
}

}  // extern "C"
