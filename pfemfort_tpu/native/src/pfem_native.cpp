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
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <queue>
#include <thread>
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
// ELL sparsity pattern + sorted scatter plan from element DOF rows.
//
// Native counterpart of the reference's MatSetValues sparsity pre-pass
// (triapoissonparallelimpl1.F:814-825): dedupe the E*ns*ns element entry
// (row, col) pairs into CSR + padded ELL, and emit the stable sorted
// scatter permutation/segment ids the device segment-sum assembly uses.
// Row-bucket counting sort over packed (col << 32 | entry) keys replaces
// the earlier 3-pass LSD radix: ONE histogram stream over elem_dof + ONE
// bucketed scatter + per-row local sorts (rows hold ~K entries, cache
// resident).  On this 2-core box the radix spent 3 full scattered passes
// over 12 B/entry; this does one pass over 8 B/entry (80 s -> ~25 s at
// the 393M-entry 24.6M-element stage).  Entry index within the packed
// key makes plain sort() reproduce the stable order exactly (ties in
// (row, col) keep ascending entry order, byte-identical to numpy's
// kind="stable" argsort of row*n+col keys).
//
// Entry t = (i*ns + j)*n_elem + e matches the (ns, ns, E) element-minor Ke
// flattening (assembly/pattern.py:_entry_arrays).  Invalid entries (either
// DOF eliminated, sentinel -1) land in a final bucket in entry order and
// map to segment n_rows*K.
//
// Outputs (caller-allocated): mat_perm[n_ent] i32, mat_segids[n_ent] i32
// (non-decreasing), indptr[n_rows+1] i64, indices[>=nnz] i32, k_out = ELL
// slot count.  Returns nnz, or -1 when int32 ranges would overflow
// (callers fall back to the numpy builder).
// ---------------------------------------------------------------------------
int64_t pfem_ell_pattern(const int32_t* elem_dof, int64_t n_elem, int32_t ns,
                         int64_t n_rows, int32_t lane_pad, int32_t* mat_perm,
                         int32_t* mat_segids, int64_t* indptr,
                         int32_t* indices, int32_t* k_out) {
  const int64_t n_ent = n_elem * (int64_t)ns * ns;
  if (n_ent >= (int64_t)INT32_MAX) return -1;
  if (n_rows >= (int64_t)INT32_MAX) return -1;

  // pass 1: per-row entry counts (bucket n_rows = invalid), 2 threads on
  // disjoint (i, j) halves with private histograms
  std::vector<int64_t> h0(n_rows + 1, 0), h1(n_rows + 1, 0);
  auto count = [&](std::vector<int64_t>& h, int32_t p0, int32_t p1) {
    for (int32_t p = p0; p < p1; ++p) {
      const int32_t i = p / ns, j = p % ns;
      for (int64_t e = 0; e < n_elem; ++e) {
        const int32_t r = elem_dof[e * ns + i];
        const int32_t c = elem_dof[e * ns + j];
        h[(r >= 0 && c >= 0) ? r : n_rows]++;
      }
    }
  };
  {
    const int32_t np = ns * ns;
    std::thread th(count, std::ref(h0), 0, np / 2);
    count(h1, np / 2, np);
    th.join();
  }
  std::vector<int64_t> startv(n_rows + 2);
  startv[0] = 0;
  for (int64_t r = 0; r <= n_rows; ++r)
    startv[r + 1] = startv[r] + h0[r] + h1[r];

  // pass 2: bucketed scatter of packed (col << 32 | t) keys, SINGLE
  // thread (cursor array is shared; entry order within a bucket must be
  // ascending t for stability)
  std::vector<uint64_t> pk(n_ent);
  std::vector<int64_t> cur(startv.begin(), startv.begin() + n_rows + 2);
  for (int32_t p = 0; p < ns * ns; ++p) {
    const int32_t i = p / ns, j = p % ns;
    const int64_t tbase = (int64_t)p * n_elem;
    for (int64_t e = 0; e < n_elem; ++e) {
      const int32_t r = elem_dof[e * ns + i];
      const int32_t c = elem_dof[e * ns + j];
      const int64_t row = (r >= 0 && c >= 0) ? r : n_rows;
      const uint32_t col = (row == n_rows) ? 0xFFFFFFFFu : (uint32_t)c;
      pk[cur[row]++] = ((uint64_t)col << 32) | (uint32_t)(tbase + e);
    }
  }

  // pass 3: per-row sorts (plain sort: the entry id in the low bits makes
  // equal-(row,col) runs keep ascending entry order), 2 threads on row
  // halves; the invalid bucket stays in entry order (all "keys" equal)
  {
    auto sort_rows = [&](int64_t r0, int64_t r1) {
      for (int64_t r = r0; r < r1; ++r)
        std::sort(pk.begin() + startv[r], pk.begin() + startv[r + 1]);
    };
    const int64_t rh = n_rows / 2;
    std::thread th(sort_rows, 0, rh);
    sort_rows(rh, n_rows);
    th.join();
  }

  const int64_t nvalid = startv[n_rows];

  // pass 4: unique (row, col) -> indices + per-row degrees
  std::memset(indptr, 0, sizeof(int64_t) * (n_rows + 1));
  int64_t nnz = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    uint32_t prev = 0xFFFFFFFFu;
    bool first = true;
    for (int64_t t = startv[r]; t < startv[r + 1]; ++t) {
      const uint32_t c = (uint32_t)(pk[t] >> 32);
      if (first || c != prev) {
        first = false;
        prev = c;
        indptr[r + 1]++;
        indices[nnz++] = (int32_t)c;
      }
    }
  }
  int64_t max_deg = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    max_deg = std::max(max_deg, indptr[r + 1]);
    indptr[r + 1] += indptr[r];
  }
  const int64_t K =
      ((std::max(max_deg, (int64_t)1)) + lane_pad - 1) / lane_pad * lane_pad;
  if (n_rows * K + 1 >= (int64_t)INT32_MAX) return -1;
  *k_out = (int32_t)K;

  // pass 5: sorted segment ids (ELL-flat, monotone) + permutation
  const int32_t dropped = (int32_t)(n_rows * K);
  {
    int64_t t = 0;
    for (int64_t r = 0; r < n_rows; ++r) {
      uint32_t prev = 0xFFFFFFFFu;
      bool first = true;
      int64_t within = -1;
      for (int64_t q = startv[r]; q < startv[r + 1]; ++q, ++t) {
        const uint32_t c = (uint32_t)(pk[q] >> 32);
        if (first || c != prev) {
          first = false;
          prev = c;
          ++within;
        }
        mat_segids[t] = (int32_t)(r * K + within);
        mat_perm[t] = (int32_t)(uint32_t)pk[q];
      }
    }
    for (int64_t q = nvalid; q < n_ent; ++q, ++t) {
      mat_segids[t] = dropped;
      mat_perm[t] = (int32_t)(uint32_t)pk[q];
    }
  }
  return nnz;
}

// ---------------------------------------------------------------------------
// Smoothed-aggregation greedy root aggregation (solve/amg.py host setup):
// pass 1 roots with fully-unaggregated strong neighborhoods, pass 2 attach
// leftovers to a neighboring aggregate, pass 3 singletons.  Semantics match
// the python fallback exactly.  Returns n_agg.
// ---------------------------------------------------------------------------
int64_t pfem_samg_aggregate(int64_t n, const int64_t* sp, const int32_t* si,
                            int64_t* agg) {
  std::fill(agg, agg + n, (int64_t)-1);
  int64_t n_agg = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    bool free_nb = true;
    for (int64_t p = sp[i]; p < sp[i + 1]; ++p)
      if (agg[si[p]] >= 0) {
        free_nb = false;
        break;
      }
    if (!free_nb) continue;
    agg[i] = n_agg;
    for (int64_t p = sp[i]; p < sp[i + 1]; ++p) agg[si[p]] = n_agg;
    ++n_agg;
  }
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    for (int64_t p = sp[i]; p < sp[i + 1]; ++p)
      if (agg[si[p]] >= 0) {
        agg[i] = agg[si[p]];
        break;
      }
  }
  for (int64_t i = 0; i < n; ++i)
    if (agg[i] < 0) agg[i] = n_agg++;
  return n_agg;
}

// ---------------------------------------------------------------------------
// IC(0): incomplete Cholesky on the lower-triangular pattern, in place.
//
// The reference's serial drivers default to PC=ILU
// (triapoissonserialimpl1.F:696); for the SPD FEM systems here the
// symmetric variant IC(0) is the natural equivalent.  The factor is
// computed host-side ONCE per sparsity+values; the device applies it as a
// truncated-Neumann product G^T G (solve/ic0.py) — no sequential
// triangular solves ever run on the TPU.
//
// lp/li/lv: CSR of the LOWER triangle including the diagonal, columns
// ascending per row (so the diagonal is each row's LAST entry).  lv is
// overwritten with the factor.  Rows with non-positive pivots get a small
// positive substitute (breakdown guard; preconditioner stays SPD).
// Returns the number of pivot substitutions.
// ---------------------------------------------------------------------------
int64_t pfem_ic0(int64_t n, const int64_t* lp, const int32_t* li,
                 double* lv) {
  int64_t fixups = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t r0 = lp[i], r1 = lp[i + 1];
    double dsum = 0.0;
    for (int64_t p = r0; p < r1; ++p) {
      const int32_t k = li[p];
      if (k < i) {
        // sparse dot of row i's prefix [r0, p) with row k's strict prefix
        double s = 0.0;
        int64_t a = r0, b = lp[k];
        const int64_t bdiag = lp[k + 1] - 1;
        while (a < p && b < bdiag) {
          const int32_t ca = li[a], cb = li[b];
          if (ca == cb) {
            s += lv[a] * lv[b];
            ++a;
            ++b;
          } else if (ca < cb) {
            ++a;
          } else {
            ++b;
          }
        }
        lv[p] = (lv[p] - s) / lv[bdiag];
        dsum += lv[p] * lv[p];
      } else {
        double d = lv[p] - dsum;
        if (!(d > 0.0)) {
          d = (lv[p] > 0.0) ? lv[p] : 1.0;  // breakdown guard
          ++fixups;
        }
        lv[p] = std::sqrt(d);
      }
    }
  }
  return fixups;
}

// ---------------------------------------------------------------------------
// Slot-gather plan construction (sparse/slotgather.py:build_slotgather_plan
// steps B-G): re-pack a sorted padded-ELL pattern into the (tile, virtual
// row, lane) staging layout of the Pallas slot-gather SpMV kernel.
//
// The numpy construction is a chain of global sorts/cumsums over all nnz;
// here each 128-row tile is processed locally (collect -> small sort ->
// dedupe (b, j) virtual rows -> 8-row window groups), which is cache-
// resident and ~10x faster.  Semantics match the numpy builder exactly
// (tests compare the two bit-for-bit).
//
// cols: (N, K) int64, permuted + per-row ascending with sentinel >= n_cols;
// src:  (N, K) int64, flat index into the ELL value stream for each slot.
// Two-phase API (V and G are data-dependent): build -> dims -> fill -> free.
// ---------------------------------------------------------------------------
namespace {

struct SGEntry {
  int64_t b;
  int32_t j, lane, eps;
  int64_t src;
};

struct SGHandle {
  int64_t N, n_cols;
  int32_t K, sub;
  int64_t T, V, G;
  std::vector<std::vector<SGEntry>> tiles;
};

// Walk one tile's virtual-row windows; count groups (fill = null) or write
// qsel/vstart/rsel (fill != null).  win must hold V entries.
static int64_t sg_tile_groups(const std::vector<SGEntry>& ents, int64_t V,
                              int64_t* win, int32_t* qsel, int32_t* vstart,
                              uint32_t* rsel) {
  int64_t nv = 0, pb = -1;
  int32_t pj = -1;
  for (const SGEntry& e : ents) {
    if (e.b != pb || e.j != pj) {
      win[nv++] = e.b;
      pb = e.b;
      pj = e.j;
    }
  }
  for (int64_t v = nv; v < V; ++v) win[v] = v ? win[v - 1] : 0;
  int64_t g = 0, p = 0, prevq = -1;
  for (int64_t v = 0; v < V; ++v) {
    const int64_t q = win[v] >> 3;
    if (v == 0 || q != prevq) {
      p = 0;
      prevq = q;
    } else {
      ++p;
    }
    if ((p & 7) == 0) {
      ++g;
      if (qsel) {
        qsel[g - 1] = (int32_t)q;
        vstart[g - 1] = (int32_t)v;
      }
    }
    if (rsel) rsel[g - 1] |= (uint32_t)(win[v] & 7) << (4 * (p & 7));
  }
  return g;
}

}  // namespace

void* pfem_sg_build(const int64_t* cols, const int64_t* src, int64_t N,
                    int32_t K, int64_t n_cols, int32_t sub, int64_t* tvg) {
  SGHandle* h = new SGHandle;
  h->N = N;
  h->n_cols = n_cols;
  h->K = K;
  h->sub = sub;
  const int64_t n_tiles = (N + 127) / 128;
  h->T = (n_tiles + (int64_t)128 * sub / 128 - 1);  // placeholder, set below
  h->T = ((N + (int64_t)128 * sub - 1) / ((int64_t)128 * sub)) * sub;
  h->tiles.resize(h->T);
  int64_t max_nv = 1;
  for (int64_t t = 0; t < h->T; ++t) {
    std::vector<SGEntry>& ents = h->tiles[t];
    const int64_t r0 = t * 128, r1 = std::min(N, r0 + 128);
    for (int64_t r = r0; r < r1; ++r) {
      int64_t pb = -1;
      int32_t j = 0;
      const int64_t* crow = cols + r * K;
      const int64_t* srow = src + r * K;
      for (int32_t k = 0; k < K; ++k) {
        const int64_t c = crow[k];
        if (c >= n_cols) break;  // per-row ascending; sentinel tail
        const int64_t b = c >> 7;
        j = (b == pb) ? j + 1 : 0;
        pb = b;
        ents.push_back(SGEntry{b, j, (int32_t)(r - r0), (int32_t)(c & 127),
                               srow[k]});
      }
    }
    std::sort(ents.begin(), ents.end(),
              [](const SGEntry& a, const SGEntry& b) {
                if (a.b != b.b) return a.b < b.b;
                if (a.j != b.j) return a.j < b.j;
                return a.lane < b.lane;
              });
    int64_t nv = 0, pb = -1;
    int32_t pj = -1;
    for (const SGEntry& e : ents)
      if (e.b != pb || e.j != pj) {
        ++nv;
        pb = e.b;
        pj = e.j;
      }
    max_nv = std::max(max_nv, nv);
  }
  h->V = (max_nv + 7) / 8 * 8;
  std::vector<int64_t> win(h->V);
  int64_t max_g = 1;
  for (int64_t t = 0; t < h->T; ++t)
    max_g = std::max(max_g, sg_tile_groups(h->tiles[t], h->V, win.data(),
                                           nullptr, nullptr, nullptr));
  h->G = max_g;
  tvg[0] = h->T;
  tvg[1] = h->V;
  tvg[2] = h->G;
  return h;
}

int pfem_sg_fill(void* handle, int32_t* qsel, int32_t* vstart, int32_t* rsel,
                 int32_t* eps, int64_t* src_out) {
  SGHandle* h = (SGHandle*)handle;
  const int64_t T = h->T, V = h->V, G = h->G;
  std::fill(eps, eps + T * V * 128, 0);
  std::fill(src_out, src_out + T * V * 128, (int64_t)-1);
  std::vector<int64_t> win(V);
  for (int64_t t = 0; t < T; ++t) {
    const std::vector<SGEntry>& ents = h->tiles[t];
    // virtual-row assignment in sorted (b, j) order
    int64_t nv = -1, pb = -1;
    int32_t pj = -1;
    for (const SGEntry& e : ents) {
      if (e.b != pb || e.j != pj) {
        ++nv;
        pb = e.b;
        pj = e.j;
      }
      eps[(t * V + nv) * 128 + e.lane] = e.eps;
      src_out[(t * V + nv) * 128 + e.lane] = e.src;
    }
    int32_t* qs = qsel + t * G;
    int32_t* vs = vstart + t * G;
    uint32_t* rs = (uint32_t*)rsel + t * G;
    std::fill(qs, qs + G, 0);
    std::fill(rs, rs + G, 0u);
    for (int64_t g = 0; g < G; ++g) vs[g] = (int32_t)V;  // pad groups
    sg_tile_groups(ents, V, win.data(), qs, vs, rs);
  }
  return 0;
}

void pfem_sg_free(void* handle) { delete (SGHandle*)handle; }

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
