// pfem_native: C++ core for host-side mesh preprocessing.
//
// Native counterparts of the reference's C++ components (SURVEY §2.3):
//   * box->6-tet structured mesh generation (genTetra/genTetranovtk)
//   * mesh partitioning: coordinate RCB + greedy dual-graph k-way
//     (meshpartitioncpp.cpp's METIS calls, re-implemented METIS-free)
//   * legacy-VTK partition/solution writer (writervtk.F / meshpartitionfort.F)
//
// Exposed as a C ABI for ctypes (libpfemnative.so) and wrapped by thin CLI
// mains (pfem_gentet.cpp, pfem_partition.cpp).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Recursive coordinate bisection.  centroids: n x dim row-major.  Splits at
// the median of the longest axis; supports non-power-of-two nparts by
// proportional splits.  Writes part ids into out[n].
// ---------------------------------------------------------------------------
static void rcb_rec(const double* c, int dim, std::vector<int64_t>& idx,
                    int64_t lo, int64_t hi, int k, int first, int32_t* out) {
  if (k == 1) {
    for (int64_t i = lo; i < hi; ++i) out[idx[i]] = first;
    return;
  }
  int k_left = k / 2;
  // longest axis over [lo, hi)
  int axis = 0;
  double best = -1.0;
  for (int d = 0; d < dim; ++d) {
    double mn = 1e300, mx = -1e300;
    for (int64_t i = lo; i < hi; ++i) {
      double v = c[idx[i] * dim + d];
      mn = std::min(mn, v);
      mx = std::max(mx, v);
    }
    if (mx - mn > best) { best = mx - mn; axis = d; }
  }
  int64_t n = hi - lo;
  int64_t n_left = (int64_t)((double)k_left / k * n + 0.5);
  std::nth_element(idx.begin() + lo, idx.begin() + lo + n_left,
                   idx.begin() + hi, [&](int64_t a, int64_t b) {
                     return c[a * dim + axis] < c[b * dim + axis];
                   });
  rcb_rec(c, dim, idx, lo, lo + n_left, k_left, first, out);
  rcb_rec(c, dim, idx, lo + n_left, hi, k - k_left, first + k_left, out);
}

void pfem_rcb_partition(const double* centroids, int64_t n, int dim,
                        int nparts, int32_t* out) {
  std::vector<int64_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  rcb_rec(centroids, dim, idx, 0, n, nparts, 0, out);
}

// ---------------------------------------------------------------------------
// Dual graph (elements adjacent iff sharing >= ncommon nodes) + greedy BFS
// k-way growth.  conn: n_elem x npe row-major, 0-based.
// ---------------------------------------------------------------------------
void pfem_greedy_partition(const int32_t* conn, int64_t n_elem, int npe,
                           int64_t n_node, int ncommon, int nparts,
                           int32_t* out) {
  // node -> elements CSR
  std::vector<int64_t> cnt(n_node + 1, 0);
  for (int64_t i = 0; i < n_elem * npe; ++i) cnt[conn[i] + 1]++;
  for (int64_t i = 0; i < n_node; ++i) cnt[i + 1] += cnt[i];
  std::vector<int32_t> node_elems(n_elem * npe);
  {
    std::vector<int64_t> pos(cnt.begin(), cnt.end() - 1);
    for (int64_t e = 0; e < n_elem; ++e)
      for (int p = 0; p < npe; ++p)
        node_elems[pos[conn[e * npe + p]]++] = (int32_t)e;
  }
  // adjacency via shared-node counting per element
  std::vector<std::vector<int32_t>> adj(n_elem);
  std::vector<int16_t> shared(n_elem, 0);
  std::vector<int32_t> touched;
  for (int64_t e = 0; e < n_elem; ++e) {
    touched.clear();
    for (int p = 0; p < npe; ++p) {
      int32_t nd = conn[e * npe + p];
      for (int64_t k = cnt[nd]; k < cnt[nd + 1]; ++k) {
        int32_t o = node_elems[k];
        if (o == (int32_t)e) continue;
        if (shared[o]++ == 0) touched.push_back(o);
      }
    }
    for (int32_t o : touched) {
      if (shared[o] >= ncommon) adj[e].push_back(o);
      shared[o] = 0;
    }
  }
  // greedy BFS growth; when a part's frontier dries up before reaching its
  // target size, reseed from the next unassigned element so parts stay
  // balanced even across disconnected pockets.
  int64_t target = (n_elem + nparts - 1) / nparts;
  std::fill(out, out + n_elem, -1);
  int64_t seed_scan = 0;
  for (int p = 0; p < nparts; ++p) {
    std::queue<int32_t> q;
    int64_t size = 0;
    while (size < target) {
      if (q.empty()) {
        while (seed_scan < n_elem && out[seed_scan] != -1) ++seed_scan;
        if (seed_scan >= n_elem) break;
        q.push((int32_t)seed_scan);
      }
      int32_t e = q.front();
      q.pop();
      if (out[e] != -1) continue;
      out[e] = p;
      ++size;
      for (int32_t o : adj[e])
        if (out[o] == -1) q.push(o);
    }
  }
  for (int64_t e = 0; e < n_elem; ++e)
    if (out[e] == -1) out[e] = nparts - 1;
}

// Edge-cut of an element partition (quality metric, like METIS's objval).
int64_t pfem_edge_cut(const int32_t* conn, int64_t n_elem, int npe,
                      int64_t n_node, int ncommon, const int32_t* part) {
  std::vector<int64_t> cnt(n_node + 1, 0);
  for (int64_t i = 0; i < n_elem * npe; ++i) cnt[conn[i] + 1]++;
  for (int64_t i = 0; i < n_node; ++i) cnt[i + 1] += cnt[i];
  std::vector<int32_t> node_elems(n_elem * npe);
  {
    std::vector<int64_t> pos(cnt.begin(), cnt.end() - 1);
    for (int64_t e = 0; e < n_elem; ++e)
      for (int p = 0; p < npe; ++p)
        node_elems[pos[conn[e * npe + p]]++] = (int32_t)e;
  }
  std::vector<int16_t> shared(n_elem, 0);
  std::vector<int32_t> touched;
  int64_t cut = 0;
  for (int64_t e = 0; e < n_elem; ++e) {
    touched.clear();
    for (int p = 0; p < npe; ++p) {
      int32_t nd = conn[e * npe + p];
      for (int64_t k = cnt[nd]; k < cnt[nd + 1]; ++k) {
        int32_t o = node_elems[k];
        if (o <= (int32_t)e) continue;
        if (shared[o]++ == 0) touched.push_back(o);
      }
    }
    for (int32_t o : touched) {
      if (shared[o] >= ncommon && part[e] != part[o]) ++cut;
      shared[o] = 0;
    }
  }
  return cut;
}

// ---------------------------------------------------------------------------
// Box -> 6-tet mesh generation (same lattice, split and boundary-BC field as
// the reference generator; values u = x^2+y^2+z^2 from real coordinates).
// Writes <prefix>-nodes.dat / -elems.dat / -DirichBC.dat (1-based).
// Returns 0 on success.
// ---------------------------------------------------------------------------
int pfem_gen_tet_mesh(double x0, double x1, int64_t nex, double y0, double y1,
                      int64_t ney, double z0, double z1, int64_t nez,
                      const char* prefix) {
  const int64_t nnx = nex + 1, nny = ney + 1, nnz = nez + 1;
  const double dx = (x1 - x0) / nex, dy = (y1 - y0) / ney,
               dz = (z1 - z0) / nez;
  char path[4096];

  snprintf(path, sizeof path, "%s-nodes.dat", prefix);
  FILE* f = fopen(path, "w");
  if (!f) return 1;
  int64_t ind = 1;
  for (int64_t k = 0; k < nnz; ++k)
    for (int64_t j = 0; j < nny; ++j)
      for (int64_t i = 0; i < nnx; ++i)
        fprintf(f, "%lld\t%.8f\t%.8f\t%.8f\n", (long long)ind++, x0 + i * dx,
                y0 + j * dy, z0 + k * dz);
  fclose(f);

  snprintf(path, sizeof path, "%s-elems.dat", prefix);
  f = fopen(path, "w");
  if (!f) return 1;
  const int split[6][4] = {{0, 1, 3, 5}, {0, 3, 2, 5}, {2, 3, 7, 5},
                           {4, 6, 7, 2}, {4, 7, 5, 2}, {0, 4, 5, 2}};
  int64_t cell = 1;
  for (int64_t k = 0; k < nez; ++k)
    for (int64_t j = 0; j < ney; ++j)
      for (int64_t i = 0; i < nex; ++i) {
        int64_t base = k * nnx * nny + j * nnx + i;
        int64_t pts[8] = {base,
                          base + 1,
                          base + nnx,
                          base + nnx + 1,
                          base + nnx * nny,
                          base + nnx * nny + 1,
                          base + nnx * nny + nnx,
                          base + nnx * nny + nnx + 1};
        for (int t = 0; t < 6; ++t)
          fprintf(f, "%lld\t%lld\t%lld\t%lld\t%lld\n", (long long)cell++,
                  (long long)(pts[split[t][0]] + 1),
                  (long long)(pts[split[t][1]] + 1),
                  (long long)(pts[split[t][2]] + 1),
                  (long long)(pts[split[t][3]] + 1));
      }
  fclose(f);

  snprintf(path, sizeof path, "%s-DirichBC.dat", prefix);
  f = fopen(path, "w");
  if (!f) return 1;
  for (int64_t k = 0; k < nnz; ++k)
    for (int64_t j = 0; j < nny; ++j)
      for (int64_t i = 0; i < nnx; ++i) {
        if (i != 0 && i != nex && j != 0 && j != ney && k != 0 && k != nez)
          continue;
        double x = x0 + i * dx, y = y0 + j * dy, z = z0 + k * dz;
        int64_t node = k * nnx * nny + j * nnx + i + 1;
        fprintf(f, "%lld\t1\t%.8f\n", (long long)node,
                x * x + y * y + z * z);
      }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Legacy-VTK writer (layout of writervtk.F): cells + procid + nodal solution.
// coords: n_node x 3 (z = 0 for 2D), conn: n_elem x npe 0-based, soln may be
// null.  vtk_type per writervtk.F:100-166.
// ---------------------------------------------------------------------------
int pfem_write_vtk(const char* path, int64_t n_node, const double* coords,
                   int64_t n_elem, int npe, const int32_t* conn, int vtk_type,
                   const int32_t* procid, int ndof, const double* soln) {
  FILE* f = fopen(path, "w");
  if (!f) return 1;
  fprintf(f, "# vtk DataFile Version 4.0\n");
  fprintf(f, "pfemfort_tpu native output\n");
  fprintf(f, " ASCII\n");
  fprintf(f, "DATASET UNSTRUCTURED_GRID\n");
  fprintf(f, "POINTS %10lld float\n", (long long)n_node);
  for (int64_t i = 0; i < n_node; ++i)
    fprintf(f, "%12.6f%12.6f%12.6f\n", coords[i * 3], coords[i * 3 + 1],
            coords[i * 3 + 2]);
  fprintf(f, "CELLS %10lld%10lld\n", (long long)n_elem,
          (long long)(n_elem * (npe + 1)));
  for (int64_t e = 0; e < n_elem; ++e) {
    fprintf(f, "%10d", npe);
    for (int p = 0; p < npe; ++p) fprintf(f, "%10d", conn[e * npe + p]);
    fprintf(f, "\n");
  }
  fprintf(f, "CELL_TYPES%10lld\n", (long long)n_elem);
  for (int64_t e = 0; e < n_elem; ++e) fprintf(f, "%3d\n", vtk_type);
  fprintf(f, "CELL_DATA%10lld\n", (long long)n_elem);
  fprintf(f, "SCALARS procid int 1\nLOOKUP_TABLE default\n");
  for (int64_t e = 0; e < n_elem; ++e)
    fprintf(f, "%3d\n", procid ? procid[e] : 0);
  if (soln) {
    fprintf(f, "POINT_DATA%10lld\n", (long long)n_node);
    if (ndof == 1) {
      fprintf(f, "SCALARS solution float 1\nLOOKUP_TABLE default\n");
      for (int64_t i = 0; i < n_node; ++i) fprintf(f, "%12.6f\n", soln[i]);
    } else {
      fprintf(f, "VECTORS solution float\n");
      for (int64_t i = 0; i < n_node; ++i) {
        double v[3] = {0, 0, 0};
        for (int d = 0; d < ndof && d < 3; ++d) v[d] = soln[i * ndof + d];
        fprintf(f, "%12.6f%12.6f%12.6f\n", v[0], v[1], v[2]);
      }
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"
