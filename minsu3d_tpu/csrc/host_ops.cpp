// Host-runtime native ops for the TPU input pipeline.
//
// The reference keeps its hot non-NN paths in C++ (the COMMON_OPS extension);
// in this framework the device compute is XLA/Pallas, so the native surface
// is the host input pipeline: voxelization (the ME.utils.sparse_quantize
// replacement used per scene per step at train time) and batch packing.
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: python -m minsu3d_tpu.csrc.build

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Quantized-grid dedup: grid (n,3) int64 (already floored), outputs:
//   p2v (n): voxel id per point, first_idx (n capacity): first point of each
//   voxel in input order. Returns the voxel count. Voxel ids are assigned in
//   first-occurrence order.
int64_t ms3d_sparse_quantize(const int64_t* grid, int64_t n,
                             int32_t* p2v, int32_t* first_idx) {
  std::unordered_map<uint64_t, int32_t> table;
  table.reserve(static_cast<size_t>(n) * 2);
  int32_t next_id = 0;
  for (int64_t i = 0; i < n; ++i) {
    // pack 3x21-bit signed coords into one key (coords are bounded ~2^20
    // by the 1024-voxel extents upstream; offset keeps them non-negative)
    const uint64_t kx = static_cast<uint64_t>(grid[i * 3 + 0] + (1 << 20));
    const uint64_t ky = static_cast<uint64_t>(grid[i * 3 + 1] + (1 << 20));
    const uint64_t kz = static_cast<uint64_t>(grid[i * 3 + 2] + (1 << 20));
    const uint64_t key = (kx << 42) | (ky << 21) | kz;
    auto it = table.find(key);
    if (it == table.end()) {
      table.emplace(key, next_id);
      first_idx[next_id] = static_cast<int32_t>(i);
      p2v[i] = next_id;
      ++next_id;
    } else {
      p2v[i] = it->second;
    }
  }
  return next_id;
}

}  // extern "C"
