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
#include <cmath>
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

// ---------------------------------------------------------------------------
// Marching tetrahedra (the SAP isosurface hot loop: runs on the host at
// EVERY Shape-As-Points optimization step via pure_callback — see
// fmhr_tpu/recon/marching.py, which defines the semantics and carries the
// NumPy fallback; this is a drop-in producing the identical mesh).
// ---------------------------------------------------------------------------

namespace {

// same cube decomposition / case table as recon/marching.py
const int kCorner[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                           {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
const int kTets[6][4] = {{0, 1, 2, 6}, {0, 2, 3, 6}, {0, 3, 7, 6},
                         {0, 7, 4, 6}, {0, 4, 5, 6}, {0, 5, 1, 6}};
// per case: up to 2 triangles of 3 edges (a, b); -1 = none
const int kTriTable[16][2][3][2] = {
#define N {-1, -1}
#define TN {N, N, N}
    {TN, TN},
    {{{0, 1}, {0, 2}, {0, 3}}, TN},
    {{{1, 0}, {1, 2}, {1, 3}}, TN},
    {{{0, 2}, {0, 3}, {1, 3}}, {{0, 2}, {1, 3}, {1, 2}}},
    {{{2, 0}, {2, 1}, {2, 3}}, TN},
    {{{0, 1}, {0, 3}, {2, 3}}, {{0, 1}, {2, 3}, {2, 1}}},
    {{{1, 0}, {1, 3}, {2, 3}}, {{1, 0}, {2, 3}, {2, 0}}},
    {{{3, 0}, {3, 1}, {3, 2}}, TN},
    {{{3, 0}, {3, 1}, {3, 2}}, TN},
    {{{1, 0}, {1, 3}, {2, 3}}, {{1, 0}, {2, 3}, {2, 0}}},
    {{{0, 1}, {0, 3}, {2, 3}}, {{0, 1}, {2, 3}, {2, 1}}},
    {{{2, 0}, {2, 1}, {2, 3}}, TN},
    {{{0, 2}, {0, 3}, {1, 3}}, {{0, 2}, {1, 3}, {1, 2}}},
    {{{1, 0}, {1, 2}, {1, 3}}, TN},
    {{{0, 1}, {0, 2}, {0, 3}}, TN},
    {TN, TN},
#undef TN
#undef N
};

struct MtVert {
  int64_t key;    // lo * nvox + hi
  int64_t lo, hi;
};

// central-difference gradient of grid (np.gradient semantics) trilinearly
// interpolated at index-space point p
inline void grid_grad_at(const double* g, int64_t r0, int64_t r1, int64_t r2,
                         const double p[3], double out[3]) {
  int64_t i0[3];
  const int64_t res[3] = {r0, r1, r2};
  double f[3];
  for (int d = 0; d < 3; ++d) {
    int64_t v = (int64_t)std::floor(p[d]);
    if (v < 0) v = 0;
    if (v > res[d] - 2) v = res[d] - 2;
    i0[d] = v;
    f[d] = p[d] - (double)v;
  }
  auto grad1 = [&](int64_t x, int64_t y, int64_t z, int d) -> double {
    const int64_t idx[3] = {x, y, z};
    const int64_t s[3] = {r1 * r2, r2, 1};
    const int64_t i = x * r1 * r2 + y * r2 + z;
    if (idx[d] == 0) return g[i + s[d]] - g[i];
    if (idx[d] == res[d] - 1) return g[i] - g[i - s[d]];
    return 0.5 * (g[i + s[d]] - g[i - s[d]]);
  };
  out[0] = out[1] = out[2] = 0.0;
  for (int cx = 0; cx < 2; ++cx)
    for (int cy = 0; cy < 2; ++cy)
      for (int cz = 0; cz < 2; ++cz) {
        const double w = (cx ? f[0] : 1 - f[0]) * (cy ? f[1] : 1 - f[1]) *
                         (cz ? f[2] : 1 - f[2]);
        for (int d = 0; d < 3; ++d)
          out[d] += w * grad1(i0[0] + cx, i0[1] + cy, i0[2] + cz, d);
      }
}

}  // namespace

extern "C" {

// grid: [r0*r1*r2] float64 row-major. Writes verts ([*counts0, 3] f32 in
// the [0,1) cube), faces ([counts1, 3] i32, winding agreeing with the
// gradient-ascent normals), normals ([counts0, 3] f32). counts = {nv, nf}.
// Returns 0, or -1 if max_v/max_f would be exceeded.
int64_t marching_tets(const double* grid, int64_t r0, int64_t r1, int64_t r2,
                      double level, float* out_verts, int32_t* out_faces,
                      float* out_normals, int64_t max_v, int64_t max_f,
                      int64_t* counts) {
  const int64_t nvox = r0 * r1 * r2;
  std::vector<int64_t> face_keys;  // 3 per face, edge-keyed
  face_keys.reserve(1 << 16);
  for (int64_t cx = 0; cx + 1 < r0; ++cx)
    for (int64_t cy = 0; cy + 1 < r1; ++cy)
      for (int64_t cz = 0; cz + 1 < r2; ++cz) {
        int64_t cid[8];
        double val[8];
        for (int k = 0; k < 8; ++k) {
          cid[k] = (cx + kCorner[k][0]) * r1 * r2 +
                   (cy + kCorner[k][1]) * r2 + (cz + kCorner[k][2]);
          val[k] = grid[cid[k]];
        }
        for (int t = 0; t < 6; ++t) {
          int c = 0;
          for (int k = 0; k < 4; ++k)
            if (val[kTets[t][k]] > level) c |= 1 << k;
          for (int j = 0; j < 2; ++j) {
            if (kTriTable[c][j][0][0] < 0) continue;
            for (int e = 0; e < 3; ++e) {
              const int64_t ga = cid[kTets[t][kTriTable[c][j][e][0]]];
              const int64_t gb = cid[kTets[t][kTriTable[c][j][e][1]]];
              const int64_t lo = ga < gb ? ga : gb;
              const int64_t hi = ga < gb ? gb : ga;
              face_keys.push_back(lo * nvox + hi);
            }
          }
        }
      }
  const int64_t nf = (int64_t)face_keys.size() / 3;
  if (nf > max_f) return -1;

  // unique sorted keys -> same vertex order as np.unique in the fallback
  std::vector<int64_t> uniq(face_keys);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  const int64_t nv = (int64_t)uniq.size();
  if (nv > max_v) return -1;

  std::vector<double> vidx((size_t)nv * 3);
  for (int64_t i = 0; i < nv; ++i) {
    const int64_t lo = uniq[(size_t)i] / nvox, hi = uniq[(size_t)i] % nvox;
    const double va = grid[lo], vb = grid[hi];
    double t = (level - va) / (vb == va ? 1.0 : vb - va);
    if (t < 0) t = 0;
    if (t > 1) t = 1;
    const double pa[3] = {(double)(lo / (r1 * r2)), (double)((lo / r2) % r1),
                          (double)(lo % r2)};
    const double pb[3] = {(double)(hi / (r1 * r2)), (double)((hi / r2) % r1),
                          (double)(hi % r2)};
    for (int d = 0; d < 3; ++d)
      vidx[(size_t)(i * 3 + d)] = pa[d] + t * (pb[d] - pa[d]);
    double gdir[3];
    grid_grad_at(grid, r0, r1, r2, &vidx[(size_t)(i * 3)], gdir);
    const double n =
        std::max(std::sqrt(gdir[0] * gdir[0] + gdir[1] * gdir[1] +
                           gdir[2] * gdir[2]),
                 1e-20);
    for (int d = 0; d < 3; ++d)
      out_normals[i * 3 + d] = (float)(gdir[d] / n);
    out_verts[i * 3 + 0] = (float)(vidx[(size_t)(i * 3 + 0)] / (double)r0);
    out_verts[i * 3 + 1] = (float)(vidx[(size_t)(i * 3 + 1)] / (double)r1);
    out_verts[i * 3 + 2] = (float)(vidx[(size_t)(i * 3 + 2)] / (double)r2);
  }

  for (int64_t f = 0; f < nf; ++f) {
    int32_t vi[3];
    for (int e = 0; e < 3; ++e) {
      const auto it = std::lower_bound(uniq.begin(), uniq.end(),
                                       face_keys[(size_t)(f * 3 + e)]);
      vi[e] = (int32_t)(it - uniq.begin());
    }
    // winding: face normal must agree with the summed vertex normals
    double e1[3], e2[3], fn[3], ns[3] = {0, 0, 0};
    for (int d = 0; d < 3; ++d) {
      e1[d] = vidx[(size_t)(vi[1] * 3 + d)] - vidx[(size_t)(vi[0] * 3 + d)];
      e2[d] = vidx[(size_t)(vi[2] * 3 + d)] - vidx[(size_t)(vi[0] * 3 + d)];
      ns[d] = (double)out_normals[vi[0] * 3 + d] +
              (double)out_normals[vi[1] * 3 + d] +
              (double)out_normals[vi[2] * 3 + d];
    }
    fn[0] = e1[1] * e2[2] - e1[2] * e2[1];
    fn[1] = e1[2] * e2[0] - e1[0] * e2[2];
    fn[2] = e1[0] * e2[1] - e1[1] * e2[0];
    const bool flip = fn[0] * ns[0] + fn[1] * ns[1] + fn[2] * ns[2] < 0;
    out_faces[f * 3 + 0] = vi[0];
    out_faces[f * 3 + 1] = flip ? vi[2] : vi[1];
    out_faces[f * 3 + 2] = flip ? vi[1] : vi[2];
  }
  counts[0] = nv;
  counts[1] = nf;
  return 0;
}

}  // extern "C"
