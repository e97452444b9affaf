// TM-score / RMSD / GDT structural similarity metrics (native module).
//
// Replaces the external zhanggroup TMscore binary the reference shells out to
// (/root/reference/structure_tokenizer/data/tools/tm_score.py:29-87 parses its
// stdout).  Same metric semantics for the 1:1-correspondence case used in
// reconstruction evaluation: Kabsch superposition, the Zhang–Skolnick
// iterative fragment-seeded TM-score search, GDT_TS/GDT_HA and MaxSub.
//
// Exposed as a C ABI for ctypes (see metrics.py).  Build: `make native`.
#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

// Kabsch: optimal rotation R and translation t minimizing RMS of R*a+t vs b
// over the index subset `idx`.  Classic covariance + eigen decomposition of
// a symmetric 3x3 (Jacobi), with proper-rotation (det>0) correction.
void kabsch(const double* a, const double* b, const std::vector<int>& idx,
            double R[3][3], double t[3]) {
  const double n = static_cast<double>(idx.size());
  double ca[3] = {0, 0, 0}, cb[3] = {0, 0, 0};
  for (int i : idx) {
    for (int d = 0; d < 3; ++d) {
      ca[d] += a[3 * i + d];
      cb[d] += b[3 * i + d];
    }
  }
  for (int d = 0; d < 3; ++d) {
    ca[d] /= n;
    cb[d] /= n;
  }

  // Covariance H = sum (a-ca)(b-cb)^T
  double H[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  for (int i : idx) {
    double da[3], db[3];
    for (int d = 0; d < 3; ++d) {
      da[d] = a[3 * i + d] - ca[d];
      db[d] = b[3 * i + d] - cb[d];
    }
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) H[r][c] += da[r] * db[c];
  }

  // SVD of H via eigen decomposition of H^T H (Jacobi on symmetric 3x3).
  double HtH[3][3];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      HtH[r][c] = 0;
      for (int k = 0; k < 3; ++k) HtH[r][c] += H[k][r] * H[k][c];
    }

  // Jacobi eigenvalue iteration.
  double V[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  double A[3][3];
  std::memcpy(A, HtH, sizeof(A));
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::abs(A[0][1]) + std::abs(A[0][2]) + std::abs(A[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(A[p][q]) < 1e-18) continue;
        double theta = (A[q][q] - A[p][p]) / (2 * A[p][q]);
        double sign = theta >= 0 ? 1.0 : -1.0;
        double tau = sign / (std::abs(theta) + std::sqrt(1 + theta * theta));
        double c = 1 / std::sqrt(1 + tau * tau), s = tau * c;
        for (int k = 0; k < 3; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = c * vkp - s * vkq;
          V[k][q] = s * vkp + c * vkq;
        }
      }
  }

  // Sort eigenpairs descending.
  int order[3] = {0, 1, 2};
  double evals[3] = {A[0][0], A[1][1], A[2][2]};
  std::sort(order, order + 3, [&](int i, int j) { return evals[i] > evals[j]; });

  double v[3][3], u[3][3];
  for (int c = 0; c < 3; ++c)
    for (int r = 0; r < 3; ++r) v[r][c] = V[r][order[c]];
  // u_c = H v_c / sigma_c
  for (int c = 0; c < 3; ++c) {
    double sigma = std::sqrt(std::max(evals[order[c]], 0.0));
    double col[3] = {0, 0, 0};
    for (int r = 0; r < 3; ++r)
      for (int k = 0; k < 3; ++k) col[r] += H[r][k] * v[k][c];
    if (sigma > 1e-12) {
      for (int r = 0; r < 3; ++r) u[r][c] = col[r] / sigma;
    } else {
      // Degenerate direction: complete with a cross product.
      u[0][c] = u[1][c] = u[2][c] = 0;
    }
  }
  // Rebuild degenerate third column as cross(u0, u1).
  auto fix_col = [&](int c) {
    int c1 = (c + 1) % 3, c2 = (c + 2) % 3;
    u[0][c] = u[1][c1] * u[2][c2] - u[2][c1] * u[1][c2];
    u[1][c] = u[2][c1] * u[0][c2] - u[0][c1] * u[2][c2];
    u[2][c] = u[0][c1] * u[1][c2] - u[1][c1] * u[0][c2];
  };
  double norm2 = u[0][2] * u[0][2] + u[1][2] * u[1][2] + u[2][2] * u[2][2];
  if (norm2 < 0.5) fix_col(2);

  // H = U S V^T with H = sum a b^T, so the rotation mapping a onto b is
  // R = V U^T (times the reflection fix on the smallest singular direction).
  auto build_R = [&](double sign) {
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        R[r][c] = 0;
        for (int k = 0; k < 2; ++k) R[r][c] += v[r][k] * u[c][k];
        R[r][c] += sign * v[r][2] * u[c][2];
      }
  };
  build_R(1.0);
  double det = R[0][0] * (R[1][1] * R[2][2] - R[1][2] * R[2][1]) -
               R[0][1] * (R[1][0] * R[2][2] - R[1][2] * R[2][0]) +
               R[0][2] * (R[1][0] * R[2][1] - R[1][1] * R[2][0]);
  if (det < 0) build_R(-1.0);

  // t = cb - R*ca  (R maps a onto b)
  for (int r = 0; r < 3; ++r) {
    t[r] = cb[r];
    for (int k = 0; k < 3; ++k) t[r] -= R[r][k] * ca[k];
  }
}

void apply_transform(const double* a, int n, const double R[3][3], const double t[3],
                     std::vector<double>* out) {
  out->resize(3 * n);
  for (int i = 0; i < n; ++i)
    for (int r = 0; r < 3; ++r) {
      double v = t[r];
      for (int k = 0; k < 3; ++k) v += R[r][k] * a[3 * i + k];
      (*out)[3 * i + r] = v;
    }
}

double sq_dist(const double* a, const double* b, int i) {
  double dx = a[3 * i] - b[3 * i];
  double dy = a[3 * i + 1] - b[3 * i + 1];
  double dz = a[3 * i + 2] - b[3 * i + 2];
  return dx * dx + dy * dy + dz * dz;
}

struct SearchResult {
  double tm = 0, maxsub = 0;
  std::vector<double> best_sq;  // squared distances under the best-TM transform
};

// Zhang–Skolnick search: seed superpositions from sliding fragments, then
// iteratively re-superpose on residues within a shrinking cutoff.
SearchResult tm_search(const double* model, const double* native_, int n, double d0) {
  SearchResult best;
  best.best_sq.assign(n, 1e18);
  const double d0_sq = d0 * d0;
  const double maxsub_d = 3.5;

  std::vector<int> seed_lens;
  for (int len = n; len >= 4; len /= 2) seed_lens.push_back(std::max(len, 4));
  if (seed_lens.empty()) seed_lens.push_back(n);

  double R[3][3], t[3];
  std::vector<double> moved;
  std::vector<int> idx, next_idx;

  auto score_of = [&](const std::vector<double>& m, double* maxsub_out) {
    double s = 0, ms = 0;
    for (int i = 0; i < n; ++i) {
      double dd = sq_dist(m.data(), native_, i);
      s += 1.0 / (1.0 + dd / d0_sq);
      if (dd < maxsub_d * maxsub_d) ms += 1.0 / (1.0 + dd / (maxsub_d * maxsub_d));
    }
    *maxsub_out = ms / n;
    return s / n;
  };

  for (int len : seed_lens) {
    for (int start = 0; start + len <= n; start += std::max(1, len / 2)) {
      idx.clear();
      for (int i = start; i < start + len; ++i) idx.push_back(i);

      // Iterative refinement with cutoff schedule.
      for (int iter = 0; iter < 20; ++iter) {
        if (idx.size() < 4) break;
        kabsch(model, native_, idx, R, t);
        apply_transform(model, n, R, t, &moved);

        double ms;
        double tm = score_of(moved, &ms);
        if (tm > best.tm) {
          best.tm = tm;
          for (int i = 0; i < n; ++i) best.best_sq[i] = sq_dist(moved.data(), native_, i);
        }
        if (ms > best.maxsub) best.maxsub = ms;

        double d_cut = std::max(d0 + 1.0 - 0.5 * iter, 3.0);
        next_idx.clear();
        for (int i = 0; i < n; ++i)
          if (sq_dist(moved.data(), native_, i) < d_cut * d_cut) next_idx.push_back(i);
        if (next_idx.size() < 4) break;
        if (next_idx == idx) break;
        idx.swap(next_idx);
      }
    }
  }
  return best;
}

}  // namespace

extern "C" {

// xyz arrays are row-major (n, 3) doubles with 1:1 residue correspondence.
// out: [tm, rmsd, maxsub, gdt_ts, gdt_ha, d0]
int pst_tm_score(const double* model, const double* native_, int n, double* out) {
  if (n < 3) return -1;

  double d0;
  if (n > 21) {
    d0 = 1.24 * std::cbrt(static_cast<double>(n) - 15.0) - 1.8;
  } else {
    d0 = 0.5;
  }
  d0 = std::max(d0, 0.5);

  // Global-superposition RMSD over all residues.
  std::vector<int> all(n);
  for (int i = 0; i < n; ++i) all[i] = i;
  double R[3][3], t[3];
  kabsch(model, native_, all, R, t);
  std::vector<double> moved;
  apply_transform(model, n, R, t, &moved);
  double ss = 0;
  for (int i = 0; i < n; ++i) ss += sq_dist(moved.data(), native_, i);
  double rmsd = std::sqrt(ss / n);

  SearchResult sr = tm_search(model, native_, n, d0);
  // Also score the global superposition (helps tiny/degenerate cases).
  {
    double ms, tm_glob = 0;
    const double d0_sq = d0 * d0;
    ms = 0;
    for (int i = 0; i < n; ++i) {
      double dd = sq_dist(moved.data(), native_, i);
      tm_glob += 1.0 / (1.0 + dd / d0_sq);
      if (dd < 3.5 * 3.5) ms += 1.0 / (1.0 + dd / (3.5 * 3.5));
    }
    tm_glob /= n;
    ms /= n;
    if (tm_glob > sr.tm) {
      sr.tm = tm_glob;
      for (int i = 0; i < n; ++i) sr.best_sq[i] = sq_dist(moved.data(), native_, i);
    }
    if (ms > sr.maxsub) sr.maxsub = ms;
  }

  // GDT from the best-TM superposition distances.
  auto frac_within = [&](double cut) {
    int c = 0;
    for (int i = 0; i < n; ++i)
      if (sr.best_sq[i] < cut * cut) ++c;
    return static_cast<double>(c) / n;
  };
  double gdt_ts =
      (frac_within(1) + frac_within(2) + frac_within(4) + frac_within(8)) / 4.0;
  double gdt_ha =
      (frac_within(0.5) + frac_within(1) + frac_within(2) + frac_within(4)) / 4.0;

  out[0] = sr.tm;
  out[1] = rmsd;
  out[2] = sr.maxsub;
  out[3] = gdt_ts;
  out[4] = gdt_ha;
  out[5] = d0;
  return 0;
}

// Kabsch-superposed RMSD only (fast path).
int pst_rmsd(const double* model, const double* native_, int n, double* out) {
  if (n < 3) return -1;
  std::vector<int> all(n);
  for (int i = 0; i < n; ++i) all[i] = i;
  double R[3][3], t[3];
  kabsch(model, native_, all, R, t);
  std::vector<double> moved;
  apply_transform(model, n, R, t, &moved);
  double ss = 0;
  for (int i = 0; i < n; ++i) ss += sq_dist(moved.data(), native_, i);
  out[0] = std::sqrt(ss / n);
  return 0;
}

}  // extern "C"
