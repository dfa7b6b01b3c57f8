// meshkit: native host-side mesh topology kernels.
//
// The reference leans on deal.II's C++ mesh runtime (GridIn, triangulation,
// DoF distribution; ref: src/NavierStokes2D.cpp:8-93).  Here the device code
// is pure XLA, but the *setup* path (edge extraction for P2 nodes, boundary
// facet matching, inversion of cell->DoF maps into gather-sum plans) is
// combinatorial host work.  These kernels replace the numpy sort/unique
// pipeline with O(N) hash/counting passes for large meshes.
//
// Plain C ABI (int64/int32/double buffers), consumed via ctypes from
// navierstokes_project_nm4pde_tpu.mesh.native.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {
inline uint64_t pack_pair(int64_t a, int64_t b) {
  if (a > b) {
    int64_t t = a;
    a = b;
    b = t;
  }
  return (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
}
}  // namespace

extern "C" {

// Unique-edge extraction for P2 node construction.
// cells: [n_cells, nv] vertex ids; loc_edges: [n_le, 2] local pairs.
// Outputs: edge_ids [n_cells, n_le] (unique edge index per cell slot),
// edges [cap, 2] unique (sorted) vertex pairs in first-seen order.
// Returns the number of unique edges (or -1 if cap too small).
int64_t meshkit_build_edges(const int32_t* cells, int64_t n_cells, int32_t nv,
                            const int32_t* loc_edges, int32_t n_le,
                            int64_t cap, int32_t* edge_ids, int32_t* edges) {
  std::unordered_map<uint64_t, int32_t> seen;
  seen.reserve(static_cast<size_t>(n_cells) * n_le);
  int64_t n_edges = 0;
  for (int64_t c = 0; c < n_cells; ++c) {
    const int32_t* cell = cells + c * nv;
    for (int32_t e = 0; e < n_le; ++e) {
      int64_t a = cell[loc_edges[2 * e]];
      int64_t b = cell[loc_edges[2 * e + 1]];
      uint64_t key = pack_pair(a, b);
      auto it = seen.find(key);
      int32_t id;
      if (it == seen.end()) {
        if (n_edges >= cap) return -1;
        id = static_cast<int32_t>(n_edges);
        seen.emplace(key, id);
        int64_t lo = a < b ? a : b, hi = a < b ? b : a;
        edges[2 * n_edges] = static_cast<int32_t>(lo);
        edges[2 * n_edges + 1] = static_cast<int32_t>(hi);
        ++n_edges;
      } else {
        id = it->second;
      }
      edge_ids[c * n_le + e] = id;
    }
  }
  return n_edges;
}

// Invert a flat index map (the core of gather-sum plan construction):
// for each row r, list the positions p with flat[p] == r.
// counts[n_rows] must be zero-initialised; pass 1: counts; pass 2: fill
// slots[r*K + k] (padded with pad_value) where K = max valence (returned).
int64_t meshkit_invert_map(const int32_t* flat, int64_t n, int64_t n_rows,
                           int64_t* counts) {
  int64_t kmax = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t c = ++counts[flat[i]];
    if (c > kmax) kmax = c;
  }
  return kmax;
}

void meshkit_fill_slots(const int32_t* flat, int64_t n, int64_t n_rows,
                        int64_t K, int32_t pad_value, int64_t* cursor,
                        int32_t* slots) {
  // cursor[n_rows] zero-initialised; slots [n_rows, K] pre-filled with pad.
  (void)n_rows;
  (void)pad_value;
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = flat[i];
    slots[r * K + cursor[r]++] = static_cast<int32_t>(i);
  }
}

// Boundary facet matching: find the (cell, local facet) owning each tagged
// boundary facet.  facets are the sorted vertex tuples of each cell facet.
// Returns 0 on success, -1 if a facet is missing.
int64_t meshkit_match_facets(const int32_t* cells, int64_t n_cells, int32_t nv,
                             const int32_t* bfaces, int64_t n_bf, int32_t fv,
                             int32_t* bcell, int32_t* blocal) {
  // hash each cell facet (facet k = all vertices but k)
  std::unordered_map<uint64_t, int64_t> map;  // key -> (cell<<3)|local
  map.reserve(static_cast<size_t>(n_cells) * nv);
  std::vector<int64_t> tmp(nv);
  for (int64_t c = 0; c < n_cells; ++c) {
    const int32_t* cell = cells + c * nv;
    for (int32_t k = 0; k < nv; ++k) {
      int64_t vs[4];
      int32_t m = 0;
      for (int32_t j = 0; j < nv; ++j)
        if (j != k) vs[m++] = cell[j];
      // sort up to 3 values
      for (int32_t x = 1; x < m; ++x)
        for (int32_t y = x; y > 0 && vs[y - 1] > vs[y]; --y) {
          int64_t t = vs[y];
          vs[y] = vs[y - 1];
          vs[y - 1] = t;
        }
      uint64_t key = 1469598103934665603ull;
      for (int32_t x = 0; x < m; ++x) {
        key ^= static_cast<uint64_t>(vs[x]) + 0x9e3779b97f4a7c15ull;
        key *= 1099511628211ull;
      }
      map[key] = (c << 3) | k;
    }
  }
  for (int64_t f = 0; f < n_bf; ++f) {
    int64_t vs[4];
    for (int32_t j = 0; j < fv; ++j) vs[j] = bfaces[f * fv + j];
    for (int32_t x = 1; x < fv; ++x)
      for (int32_t y = x; y > 0 && vs[y - 1] > vs[y]; --y) {
        int64_t t = vs[y];
        vs[y] = vs[y - 1];
        vs[y - 1] = t;
      }
    uint64_t key = 1469598103934665603ull;
    for (int32_t x = 0; x < fv; ++x) {
      key ^= static_cast<uint64_t>(vs[x]) + 0x9e3779b97f4a7c15ull;
      key *= 1099511628211ull;
    }
    auto it = map.find(key);
    if (it == map.end()) return -1;
    bcell[f] = static_cast<int32_t>(it->second >> 3);
    blocal[f] = static_cast<int32_t>(it->second & 7);
  }
  return 0;
}

}  // extern "C"
