// fmhr_native: host-side mesh-topology preprocessing in C++.
//
// TPU-native counterpart of the reference's C++ torch extension
// (/root/reference/models/csrc/normal_consistency.cpp — the edge-opposite
// vertex pairing of the mesh normal-consistency loss) plus the hot
// topology precomputes the rebuild runs at startup for the x3-subdivided
// meshes (~100k vertices / ~200k faces per hand pair): unique-edge
// extraction and Loop-subdivision index construction. All functions are
// plain C ABI on raw buffers, loaded from Python via ctypes
// (fmhr_tpu/utils/native.py); NumPy fallbacks exist for every entry
// point.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Edge {
  int64_t key;   // lo * V + hi
  int32_t lo, hi;
  int32_t opp;   // opposite vertex in the owning face
  int32_t face;
};

inline int64_t edge_key(int64_t v, int32_t a, int32_t b) {
  int64_t lo = a < b ? a : b;
  int64_t hi = a < b ? b : a;
  return lo * v + hi;
}

}  // namespace

extern "C" {

// Unique undirected edges, lexicographic by (lo, hi).
// faces: [F*3] int32; out_edges: [max_edges*2] int32.
// Returns E, or -1 if max_edges is too small.
int64_t unique_edges(const int32_t* faces, int64_t num_faces,
                     int64_t num_vertices, int32_t* out_edges,
                     int64_t max_edges) {
  std::vector<int64_t> keys;
  keys.reserve(num_faces * 3);
  for (int64_t f = 0; f < num_faces; ++f) {
    const int32_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
    keys.push_back(edge_key(num_vertices, a, b));
    keys.push_back(edge_key(num_vertices, b, c));
    keys.push_back(edge_key(num_vertices, c, a));
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  if ((int64_t)keys.size() > max_edges) return -1;
  for (size_t i = 0; i < keys.size(); ++i) {
    out_edges[i * 2] = (int32_t)(keys[i] / num_vertices);
    out_edges[i * 2 + 1] = (int32_t)(keys[i] % num_vertices);
  }
  return (int64_t)keys.size();
}

// Normal-consistency vertex pairs: for every edge shared by k faces, all
// C(k,2) pairs of opposite vertices (role of MeshNormalConsistency's
// find_verts). out_rows: [max_rows*4] int32 rows (e_lo, e_hi, opp_a,
// opp_b). Returns row count or -1 on overflow.
int64_t normal_consistency_pairs(const int32_t* faces, int64_t num_faces,
                                 int64_t num_vertices, int32_t* out_rows,
                                 int64_t max_rows) {
  std::vector<Edge> edges;
  edges.reserve(num_faces * 3);
  for (int64_t f = 0; f < num_faces; ++f) {
    const int32_t v[3] = {faces[f * 3], faces[f * 3 + 1], faces[f * 3 + 2]};
    for (int k = 0; k < 3; ++k) {
      const int32_t a = v[k], b = v[(k + 1) % 3], o = v[(k + 2) % 3];
      Edge e;
      e.key = edge_key(num_vertices, a, b);
      e.lo = a < b ? a : b;
      e.hi = a < b ? b : a;
      e.opp = o;
      e.face = (int32_t)f;
      edges.push_back(e);
    }
  }
  std::sort(edges.begin(), edges.end(),
            [](const Edge& x, const Edge& y) {
              if (x.key != y.key) return x.key < y.key;
              return x.face < y.face;  // deterministic within an edge
            });
  int64_t rows = 0;
  size_t i = 0;
  while (i < edges.size()) {
    size_t j = i + 1;
    while (j < edges.size() && edges[j].key == edges[i].key) ++j;
    for (size_t p = i; p < j; ++p) {
      for (size_t q = p + 1; q < j; ++q) {
        if (rows >= max_rows) return -1;
        out_rows[rows * 4] = edges[i].lo;
        out_rows[rows * 4 + 1] = edges[i].hi;
        out_rows[rows * 4 + 2] = edges[p].opp;
        out_rows[rows * 4 + 3] = edges[q].opp;
        ++rows;
      }
    }
    i = j;
  }
  return rows;
}

// Loop-subdivision face topology: midpoint ids follow the lexicographic
// unique-edge order (offset by num_vertices); emits the 4-group face
// layout the skinning-weight subdivision depends on.
// out_faces: [F*4*3] int32. Returns number of unique edges, or -1.
int64_t loop_subdivide_faces(const int32_t* faces, int64_t num_faces,
                             int64_t num_vertices, int32_t* out_faces,
                             int32_t* out_edges, int64_t max_edges) {
  const int64_t E = unique_edges(faces, num_faces, num_vertices, out_edges,
                                 max_edges);
  if (E < 0) return -1;
  // key -> midpoint index via binary search over sorted edge keys
  std::vector<int64_t> keys((size_t)E);
  for (int64_t i = 0; i < E; ++i)
    keys[(size_t)i] =
        (int64_t)out_edges[i * 2] * num_vertices + out_edges[i * 2 + 1];
  auto mid = [&](int32_t a, int32_t b) -> int32_t {
    const int64_t k = edge_key(num_vertices, a, b);
    const auto it = std::lower_bound(keys.begin(), keys.end(), k);
    return (int32_t)(num_vertices + (it - keys.begin()));
  };
  for (int64_t f = 0; f < num_faces; ++f) {
    const int32_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
    const int32_t mab = mid(a, b), mbc = mid(b, c), mca = mid(c, a);
    int32_t* o = out_faces + f * 12;
    o[0] = a;   o[1] = mab; o[2] = mca;
    o[3] = mab; o[4] = b;   o[5] = mbc;
    o[6] = mca; o[7] = mbc; o[8] = c;
    o[9] = mab; o[10] = mbc; o[11] = mca;
  }
  return E;
}

}  // extern "C"
