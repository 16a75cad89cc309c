// Exact linear-assignment (minibatch optimal transport) solver.
//
// Native runtime component of the flow-matching trainer: the exact OT
// coupling with uniform marginals reduces to a linear assignment problem
// (SURVEY.md §3.2 — the reference solves it with POT's ot.emd network
// simplex on the host, train_flow_matching.py:85-93).  This implements the
// classic O(n^3) Hungarian algorithm with row/column potentials (the
// shortest-augmenting-path formulation, e.g. Jonker-Volgenant), exposed via
// a C ABI for ctypes binding (pnpflow_tpu/ops/ot.py).
//
// Build: make -C csrc   (produces liblap.so)

#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

}  // namespace

extern "C" {

// cost: row-major n x n float64; out_col[i] = assigned column of row i.
// Returns 0 on success.  Potentials-based Hungarian: for each row, grow a
// shortest augmenting path over reduced costs, updating dual potentials so
// every matched edge stays tight.  Optimality is certified by the duals.
int lap_solve(int n, const double* cost, int32_t* out_col) {
  // 1-indexed working arrays; index 0 is the virtual start column.
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, 0);    // p[j] = row matched to column j
  std::vector<int> way(n + 1, 0);  // predecessor column on the path

  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, kInf);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0];
      int j1 = 0;
      double delta = kInf;
      const double* row = cost + static_cast<int64_t>(i0 - 1) * n;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = row[j - 1] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      if (j1 == 0) return 1;  // infeasible (cannot happen for dense finite)
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    // augment along the path
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }

  for (int j = 1; j <= n; ++j) {
    if (p[j] < 1 || p[j] > n) return 1;
    out_col[p[j] - 1] = j - 1;
  }
  return 0;
}

// Squared-euclidean cost matrix: a (n x d), b (n x d) row-major float32.
void sq_dist_matrix(int n, int d, const float* a, const float* b,
                    double* out) {
  for (int i = 0; i < n; ++i) {
    const float* ai = a + static_cast<int64_t>(i) * d;
    for (int j = 0; j < n; ++j) {
      const float* bj = b + static_cast<int64_t>(j) * d;
      double acc = 0.0;
      for (int k = 0; k < d; ++k) {
        double diff = static_cast<double>(ai[k]) - static_cast<double>(bj[k]);
        acc += diff * diff;
      }
      out[static_cast<int64_t>(i) * n + j] = acc;
    }
  }
}

}  // extern "C"
