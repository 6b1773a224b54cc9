// Host-runtime native ops for the TPU input pipeline.
//
// The reference keeps its hot non-NN paths in C++ (the COMMON_OPS extension);
// in this framework the device compute is XLA/Pallas, so the native surface
// is the host input pipeline: voxelization (the ME.utils.sparse_quantize
// replacement used per scene per step at train time) and batch packing.
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: python -m minsu3d_tpu.csrc.build

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <utility>
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

// ---------------------------------------------------------------------------
// Host grid-plan builder — the native counterpart of ops/sparse.py::build_plan
// (the ME CoordinateManager replacement). Building the plan on the host while
// the device runs the previous batch removes ~0.3 s/scene of device sort time
// (see BENCH_NOTES.md); outputs are bit-identical to the device builder so
// the two paths are interchangeable (tests/test_sparse.py compares them).

static inline uint64_t plan_key(int32_t batch, int32_t x, int32_t y, int32_t z) {
  // khi = batch, klo = x<<20|y<<10|z, paired into one 62-bit key
  const uint64_t klo = (static_cast<uint64_t>(x) << 20) |
                       (static_cast<uint64_t>(y) << 10) | static_cast<uint64_t>(z);
  return (static_cast<uint64_t>(static_cast<uint32_t>(batch)) << 30) | klo;
}

static inline int32_t clip_coord(int32_t c) {
  return c < 0 ? 0 : (c > 1023 ? 1023 : c);
}

extern "C" {

// Level table build (mirror of ops/sparse.py::build_base): sort valid rows by
// (batch, packed coords), dedup (first input row is the representative),
// emit the sorted fixed-capacity table. Returns the valid-voxel count.
//   row2voxel (n_rows): input row -> table index (cap = invalid/dropped)
//   feat_src  (cap):    table index -> representative input row (-1 = pad)
int32_t ms3d_plan_base(const int32_t* vbatch, const int32_t* vcoords,
                       const uint8_t* vvalid, int64_t n_rows, int32_t cap,
                       int32_t* khi, int32_t* klo, int32_t* coords_out,
                       int32_t* batch_out, uint8_t* valid_out,
                       int32_t* row2voxel, int32_t* feat_src,
                       int32_t* n_dropped) {
  const int32_t kSentinel = 0x7fffffff;
  std::vector<std::pair<uint64_t, int32_t>> rows;
  rows.reserve(static_cast<size_t>(n_rows));
  for (int64_t i = 0; i < n_rows; ++i) {
    row2voxel[i] = cap;
    if (!vvalid[i]) continue;
    const int32_t x = clip_coord(vcoords[i * 3 + 0]);
    const int32_t y = clip_coord(vcoords[i * 3 + 1]);
    const int32_t z = clip_coord(vcoords[i * 3 + 2]);
    rows.emplace_back(plan_key(vbatch[i], x, y, z), static_cast<int32_t>(i));
  }
  std::sort(rows.begin(), rows.end());

  for (int32_t v = 0; v < cap; ++v) {
    khi[v] = kSentinel;
    klo[v] = kSentinel;
    coords_out[v * 3] = coords_out[v * 3 + 1] = coords_out[v * 3 + 2] = 0;
    batch_out[v] = 0;
    valid_out[v] = 0;
    feat_src[v] = -1;
  }

  int32_t n_unique = 0;
  uint64_t prev = ~uint64_t{0};
  for (const auto& [key, row] : rows) {
    if (key != prev) {
      prev = key;
      if (n_unique < cap) {
        khi[n_unique] = static_cast<int32_t>(key >> 30);
        klo[n_unique] = static_cast<int32_t>(key & ((uint64_t{1} << 30) - 1));
        coords_out[n_unique * 3 + 0] = static_cast<int32_t>((key >> 20) & 1023);
        coords_out[n_unique * 3 + 1] = static_cast<int32_t>((key >> 10) & 1023);
        coords_out[n_unique * 3 + 2] = static_cast<int32_t>(key & 1023);
        batch_out[n_unique] = static_cast<int32_t>(key >> 30);
        valid_out[n_unique] = 1;
        feat_src[n_unique] = row;
      }
      ++n_unique;
    }
    row2voxel[row] = (n_unique - 1) < cap ? (n_unique - 1) : cap;
  }
  *n_dropped = n_unique > cap ? n_unique - cap : 0;
  return n_unique < cap ? n_unique : cap;
}

// 3^3 kernel map (mirror of ops/sparse.py::add_neighbors): per valid voxel,
// the table index of each of the 27 adjacent coordinates (cap = missing).
// Offsets in (dx,dy,dz) lexicographic order, center (k=13) = self.
//
// The table is sorted by key, and an offset's query sequence is the key
// sequence plus a CONSTANT delta — still strictly increasing — so each
// offset resolves with one linear merge over two sorted sequences
// (sequential memory, no hash probes: 26 merges beat 3.8M cache-missing
// unordered_map lookups ~20x; same idea the device path gets from sorts).
void ms3d_plan_neighbors(const int32_t* khi, const int32_t* klo,
                         const int32_t* coords, const int32_t* batch,
                         int32_t count, int32_t cap, int32_t* nbr_out) {
  (void)khi; (void)klo;
  for (int64_t i = 0; i < static_cast<int64_t>(cap) * 27; ++i) nbr_out[i] = cap;

  std::vector<uint64_t> keys(static_cast<size_t>(count));
  for (int32_t v = 0; v < count; ++v)
    keys[v] = plan_key(batch[v], coords[v * 3], coords[v * 3 + 1], coords[v * 3 + 2]);

  int32_t k = 0;
  for (int32_t dx = -1; dx <= 1; ++dx)
    for (int32_t dy = -1; dy <= 1; ++dy)
      for (int32_t dz = -1; dz <= 1; ++dz, ++k) {
        if (dx == 0 && dy == 0 && dz == 0) {
          for (int32_t v = 0; v < count; ++v) nbr_out[v * 27 + k] = v;
          continue;
        }
        // delta in packed space; field borrows produce integer keys that can
        // only false-match wrapped coordinates, rejected by the range check
        // SUM, not OR: negative field deltas sign-extend and would corrupt
        // the packed arithmetic under bitwise OR
        const int64_t delta = (static_cast<int64_t>(dx) << 20) +
                              (static_cast<int64_t>(dy) << 10) +
                              static_cast<int64_t>(dz);
        int32_t t = 0;
        for (int32_t v = 0; v < count; ++v) {
          const int32_t qx = coords[v * 3] + dx, qy = coords[v * 3 + 1] + dy,
                        qz = coords[v * 3 + 2] + dz;
          if (qx < 0 || qx > 1023 || qy < 0 || qy > 1023 || qz < 0 || qz > 1023)
            continue;
          const uint64_t q = static_cast<uint64_t>(static_cast<int64_t>(keys[v]) + delta);
          while (t < count && keys[t] < q) ++t;
          if (t >= count) break;
          if (keys[t] == q) nbr_out[v * 27 + k] = t;
        }
      }
}

}  // extern "C"
