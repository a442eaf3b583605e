// Native batch packer: disjoint-union + dst-sort + padding in one pass.
//
// Host-side hot loop of the data pipeline (the role PyG's C++ collate /
// torch_scatter layer plays for the reference — SURVEY.md §2.3). Takes
// concatenated per-graph arrays and emits the padded GraphBatch layout of
// gt_pyg_tpu/data/graph.py: nodes/edges packed front-aligned, edges
// counting-sorted by destination within each graph (globally
// non-decreasing dst), padding edges pointing at the trash node slot Np
// and padding nodes at the trash graph slot Bp.
//
// Build: make -C native   (produces ../gt_pyg_tpu/native/libgtpacker.so)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns 0 on success, negative on error.
//  B: graphs, F: node feat dim, D: edge feat dim
//  n_nodes/n_edges: [B] per-graph counts
//  xs:        [tot_nodes, F] float32, concatenated per graph
//  edge_src_in/edge_dst_in: [tot_edges] int64, graph-local indices
//  eattr_in:  [tot_edges, D] float32
//  y_in/ymask_in: [B, T] float32 (may be null when T == 0)
//  Np/Ep/Bp:  padded sizes (Np >= tot_nodes etc.)
// Outputs (caller-allocated, will be fully overwritten):
//  node_x [Np,F], edge_attr [Ep,D], edge_src/edge_dst [Ep] int32,
//  node_graph [Np] int32, node_mask [Np], edge_mask [Ep],
//  graph_mask [Bp], y_out/ymask_out [Bp,T]
int pack_batch(
    int32_t B, int32_t F, int32_t D, int32_t T,
    const int32_t* n_nodes, const int32_t* n_edges,
    const float* xs,
    const int64_t* edge_src_in, const int64_t* edge_dst_in,
    const float* eattr_in,
    const float* y_in, const float* ymask_in,
    int32_t Np, int32_t Ep, int32_t Bp,
    float* node_x, float* edge_attr,
    int32_t* edge_src, int32_t* edge_dst, int32_t* node_graph,
    float* node_mask, float* edge_mask, float* graph_mask,
    float* y_out, float* ymask_out) {
  int64_t tot_nodes = 0, tot_edges = 0;
  for (int32_t g = 0; g < B; ++g) {
    if (n_nodes[g] < 0 || n_edges[g] < 0) return -2;
    tot_nodes += n_nodes[g];
    tot_edges += n_edges[g];
  }
  if (tot_nodes > Np || tot_edges > Ep || B > Bp) return -1;

  // validate graph-local edge indices up front: an out-of-range dst would
  // corrupt the counting-sort heap writes below
  {
    int64_t e_chk = 0;
    for (int32_t g = 0; g < B; ++g) {
      const int64_t n = n_nodes[g];
      for (int32_t k = 0; k < n_edges[g]; ++k, ++e_chk) {
        const int64_t s = edge_src_in[e_chk], d = edge_dst_in[e_chk];
        if (s < 0 || s >= n || d < 0 || d >= n) return -3;
      }
    }
  }

  // node features: straight copy then zero padding
  std::memcpy(node_x, xs, sizeof(float) * tot_nodes * F);
  std::memset(node_x + tot_nodes * F, 0, sizeof(float) * (Np - tot_nodes) * F);

  for (int64_t i = 0; i < tot_nodes; ++i) node_mask[i] = 1.0f;
  for (int64_t i = tot_nodes; i < Np; ++i) node_mask[i] = 0.0f;
  for (int64_t i = 0; i < tot_edges; ++i) edge_mask[i] = 1.0f;
  for (int64_t i = tot_edges; i < Ep; ++i) edge_mask[i] = 0.0f;

  // per-graph: counting sort of edges by destination
  std::vector<int32_t> counts;
  int64_t n_off = 0, e_off = 0, out_e = 0;
  for (int32_t g = 0; g < B; ++g) {
    const int32_t n = n_nodes[g];
    const int32_t e = n_edges[g];
    for (int32_t i = 0; i < n; ++i) node_graph[n_off + i] = g;
    if (e > 0) {
      counts.assign(n + 1, 0);
      const int64_t* src = edge_src_in + e_off;
      const int64_t* dst = edge_dst_in + e_off;
      for (int32_t k = 0; k < e; ++k) counts[dst[k] + 1]++;
      for (int32_t i = 0; i < n; ++i) counts[i + 1] += counts[i];
      // stable counting sort: preserves source order within a dst
      for (int32_t k = 0; k < e; ++k) {
        const int32_t pos = counts[dst[k]]++;
        const int64_t o = out_e + pos;
        edge_src[o] = static_cast<int32_t>(src[k] + n_off);
        edge_dst[o] = static_cast<int32_t>(dst[k] + n_off);
        std::memcpy(edge_attr + o * D, eattr_in + (e_off + k) * D,
                    sizeof(float) * D);
      }
    }
    n_off += n;
    e_off += e;
    out_e += e;
  }
  // padding rows: trash slots
  for (int64_t i = tot_nodes; i < Np; ++i) node_graph[i] = Bp;
  for (int64_t i = tot_edges; i < Ep; ++i) {
    edge_src[i] = Np;
    edge_dst[i] = Np;
  }
  std::memset(edge_attr + tot_edges * D, 0,
              sizeof(float) * (Ep - tot_edges) * D);

  for (int32_t g = 0; g < Bp; ++g) graph_mask[g] = (g < B) ? 1.0f : 0.0f;
  if (T > 0 && y_in && ymask_in) {
    std::memcpy(y_out, y_in, sizeof(float) * B * T);
    std::memcpy(ymask_out, ymask_in, sizeof(float) * B * T);
    std::memset(y_out + B * T, 0, sizeof(float) * (Bp - B) * T);
    std::memset(ymask_out + B * T, 0, sizeof(float) * (Bp - B) * T);
  }
  return 0;
}

}  // extern "C"
