// Native mesh-topology builder for manifold_flow_tpu.
//
// Host-side preprocessing that must run once per surface before any device
// compute: vertex->vertex / vertex->(cell, corner-slot) incidence tables,
// unique-edge extraction with per-edge incident cells, and boundary-vertex
// detection. The Python reference implementation (geometry/mesh.py
// _vertex_adjacency/_edges_and_boundary) walks every triangle in interpreted
// loops; this library produces bit-identical tables (same orderings: sorted
// neighbor lists, appearance-ordered cells, lexicographically sorted edges)
// at C++ speed for large subdivided surfaces.
//
// C ABI (ctypes-friendly), three-phase: build -> query sizes -> fill.

#include <algorithm>
#include <cstdint>
#include <map>
#include <utility>
#include <vector>

namespace {

struct Topology {
  int32_t n_vertices = 0;
  int32_t n_triangles = 0;
  std::vector<std::vector<int32_t>> neighbors;   // sorted unique per vertex
  std::vector<std::vector<int32_t>> cells;       // appearance order
  std::vector<std::vector<int32_t>> slots;       // corner slot per cell entry
  // Lexicographically sorted unique edges with up to 2 incident cells.
  std::vector<std::pair<int32_t, int32_t>> edges;
  std::vector<std::pair<int32_t, int32_t>> edge_cells;
  std::vector<uint8_t> boundary;
  int32_t max_degree = 1;
  int32_t max_cells = 1;
};

}  // namespace

extern "C" {

void* mesh_topology_build(int32_t n_vertices, int32_t n_triangles,
                          const int32_t* triangles) {
  auto* topo = new Topology();
  topo->n_vertices = n_vertices;
  topo->n_triangles = n_triangles;
  topo->neighbors.resize(n_vertices);
  topo->cells.resize(n_vertices);
  topo->slots.resize(n_vertices);
  topo->boundary.assign(n_vertices, 0);

  std::map<std::pair<int32_t, int32_t>, std::vector<int32_t>> edge_map;

  for (int32_t m = 0; m < n_triangles; ++m) {
    const int32_t a = triangles[3 * m + 0];
    const int32_t b = triangles[3 * m + 1];
    const int32_t c = triangles[3 * m + 2];
    const int32_t tri[3] = {a, b, c};
    for (int32_t s = 0; s < 3; ++s) {
      const int32_t v = tri[s];
      topo->cells[v].push_back(m);
      topo->slots[v].push_back(s);
      topo->neighbors[v].push_back(tri[(s + 1) % 3]);
      topo->neighbors[v].push_back(tri[(s + 2) % 3]);
    }
    for (int32_t s = 0; s < 3; ++s) {
      const int32_t u = tri[s];
      const int32_t v = tri[(s + 1) % 3];
      edge_map[{std::min(u, v), std::max(u, v)}].push_back(m);
    }
  }

  for (int32_t i = 0; i < n_vertices; ++i) {
    auto& nb = topo->neighbors[i];
    std::sort(nb.begin(), nb.end());
    nb.erase(std::unique(nb.begin(), nb.end()), nb.end());
    topo->max_degree =
        std::max<int32_t>(topo->max_degree, (int32_t)nb.size());
    topo->max_cells =
        std::max<int32_t>(topo->max_cells, (int32_t)topo->cells[i].size());
  }

  topo->edges.reserve(edge_map.size());
  topo->edge_cells.reserve(edge_map.size());
  for (const auto& kv : edge_map) {  // std::map iterates in sorted key order
    topo->edges.push_back(kv.first);
    const auto& cs = kv.second;
    topo->edge_cells.push_back(
        {cs.empty() ? -1 : cs[0], cs.size() > 1 ? cs[1] : -1});
    if (cs.size() == 1) {
      topo->boundary[kv.first.first] = 1;
      topo->boundary[kv.first.second] = 1;
    }
  }
  return topo;
}

// out_sizes: [max_degree, max_cells, n_edges]
void mesh_topology_sizes(void* handle, int32_t* out_sizes) {
  const auto* topo = static_cast<Topology*>(handle);
  out_sizes[0] = topo->max_degree;
  out_sizes[1] = topo->max_cells;
  out_sizes[2] = (int32_t)topo->edges.size();
}

// Caller allocates:
//   vn (N, max_degree), vc/vs (N, max_cells), deg/ncell (N,),
//   edges/edge_cells (n_edges, 2), boundary (N,) uint8. Pad value -1.
void mesh_topology_fill(void* handle, int32_t max_degree, int32_t max_cells,
                        int32_t* vn, int32_t* vc, int32_t* vs, int32_t* deg,
                        int32_t* ncell, int32_t* edges, int32_t* edge_cells,
                        uint8_t* boundary) {
  const auto* topo = static_cast<Topology*>(handle);
  const int32_t n = topo->n_vertices;
  std::fill(vn, vn + (size_t)n * max_degree, -1);
  std::fill(vc, vc + (size_t)n * max_cells, -1);
  std::fill(vs, vs + (size_t)n * max_cells, -1);
  for (int32_t i = 0; i < n; ++i) {
    const auto& nb = topo->neighbors[i];
    deg[i] = (int32_t)nb.size();
    std::copy(nb.begin(), nb.end(), vn + (size_t)i * max_degree);
    const auto& cs = topo->cells[i];
    ncell[i] = (int32_t)cs.size();
    std::copy(cs.begin(), cs.end(), vc + (size_t)i * max_cells);
    const auto& sl = topo->slots[i];
    std::copy(sl.begin(), sl.end(), vs + (size_t)i * max_cells);
    boundary[i] = topo->boundary[i];
  }
  for (size_t e = 0; e < topo->edges.size(); ++e) {
    edges[2 * e + 0] = topo->edges[e].first;
    edges[2 * e + 1] = topo->edges[e].second;
    edge_cells[2 * e + 0] = topo->edge_cells[e].first;
    edge_cells[2 * e + 1] = topo->edge_cells[e].second;
  }
}

void mesh_topology_free(void* handle) {
  delete static_cast<Topology*>(handle);
}

}  // extern "C"
