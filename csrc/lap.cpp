// Exact linear-assignment (minibatch optimal transport) solver.
//
// Native runtime component of the flow-matching trainer: the exact OT
// coupling with uniform marginals reduces to a linear assignment problem
// (SURVEY.md §3.2 — the reference solves it with POT's ot.emd network
// simplex on the host, train_flow_matching.py:85-93).  This implements the
// Jonker-Volgenant shortest-augmenting-path algorithm (O(n^3)), exposed via
// a C ABI for ctypes binding (pnpflow_tpu/ops/ot.py).
//
// Build: make -C csrc   (produces liblap.so)

#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Shortest augmenting path for row `cur_row`; returns the sink column.
// Maintains dual potentials u (rows, implicit) and v (cols).
int augment(int n, const double* cost, int cur_row,
            std::vector<int>& col_to_row, std::vector<double>& v,
            std::vector<int>& pred) {
  std::vector<double> min_to(n, kInf);
  std::vector<char> scanned(n, 0);
  int sink = -1;
  int i = cur_row;
  int j0 = -1;
  double delta = 0.0;

  while (sink == -1) {
    double lo = kInf;
    int j_lo = -1;
    const double* row = cost + static_cast<int64_t>(i) * n;
    for (int j = 0; j < n; ++j) {
      if (scanned[j]) continue;
      double red = row[j] - v[j] + delta -
                   (j0 == -1 ? 0.0 : 0.0);  // reduced cost relative path
      // path length to j through i
      double len = delta + row[j] - v[j];
      if (len < min_to[j]) {
        min_to[j] = len;
        pred[j] = i;
      }
      if (min_to[j] < lo) {
        lo = min_to[j];
        j_lo = j;
      }
      (void)red;
    }
    if (j_lo == -1) return -1;  // infeasible (shouldn't happen, dense)
    scanned[j_lo] = 1;
    delta = lo;
    if (col_to_row[j_lo] == -1) {
      sink = j_lo;
    } else {
      i = col_to_row[j_lo];
    }
  }

  // price update
  for (int j = 0; j < n; ++j) {
    if (scanned[j]) v[j] += min_to[j] - delta;
  }
  return sink;
}

}  // namespace

extern "C" {

// cost: row-major n x n float64; out_col[i] = assigned column of row i.
// Returns 0 on success.
int lap_solve(int n, const double* cost, int32_t* out_col) {
  std::vector<int> col_to_row(n, -1);
  std::vector<int> row_to_col(n, -1);
  std::vector<double> v(n, 0.0);
  std::vector<int> pred(n, -1);

  for (int r = 0; r < n; ++r) {
    int sink = augment(n, cost, r, col_to_row, v, pred);
    if (sink < 0) return 1;
    // backtrack augmenting path
    int j = sink;
    while (true) {
      int i = pred[j];
      col_to_row[j] = i;
      int j_prev = row_to_col[i];
      row_to_col[i] = j;
      if (i == r) break;
      j = j_prev;
    }
  }
  for (int r = 0; r < n; ++r) out_col[r] = row_to_col[r];
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
