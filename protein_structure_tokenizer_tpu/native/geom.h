// Shared rigid-body geometry for the native metric modules
// (tmscore.cc, tmalign.cc).  Header-only, C++17.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace pst {

// Kabsch: optimal rotation R and translation t minimizing RMS of R*a+t vs b
// over the index pairs (ia[i] in a, ib[i] in b).  Covariance + Jacobi eigen
// decomposition of a symmetric 3x3, with proper-rotation (det>0) correction.
inline void kabsch_pairs(const double* a, const double* b, const std::vector<int>& ia,
                         const std::vector<int>& ib, double R[3][3], double t[3]) {
  const double n = static_cast<double>(ia.size());
  double ca[3] = {0, 0, 0}, cb[3] = {0, 0, 0};
  for (size_t i = 0; i < ia.size(); ++i) {
    for (int d = 0; d < 3; ++d) {
      ca[d] += a[3 * ia[i] + d];
      cb[d] += b[3 * ib[i] + d];
    }
  }
  for (int d = 0; d < 3; ++d) {
    ca[d] /= n;
    cb[d] /= n;
  }

  // Covariance H = sum (a-ca)(b-cb)^T
  double H[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  for (size_t i = 0; i < ia.size(); ++i) {
    double da[3], db[3];
    for (int d = 0; d < 3; ++d) {
      da[d] = a[3 * ia[i] + d] - ca[d];
      db[d] = b[3 * ib[i] + d] - cb[d];
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

// Same-index convenience overload (1:1 correspondence subsets).
inline void kabsch(const double* a, const double* b, const std::vector<int>& idx,
                   double R[3][3], double t[3]) {
  kabsch_pairs(a, b, idx, idx, R, t);
}

inline void apply_transform(const double* a, int n, const double R[3][3],
                            const double t[3], std::vector<double>* out) {
  out->resize(3 * n);
  for (int i = 0; i < n; ++i)
    for (int r = 0; r < 3; ++r) {
      double v = t[r];
      for (int k = 0; k < 3; ++k) v += R[r][k] * a[3 * i + k];
      (*out)[3 * i + r] = v;
    }
}

inline double sq_dist(const double* a, const double* b, int i) {
  double dx = a[3 * i] - b[3 * i];
  double dy = a[3 * i + 1] - b[3 * i + 1];
  double dz = a[3 * i + 2] - b[3 * i + 2];
  return dx * dx + dy * dy + dz * dz;
}

inline double sq_dist2(const double* a, int i, const double* b, int j) {
  double dx = a[3 * i] - b[3 * j];
  double dy = a[3 * i + 1] - b[3 * j + 1];
  double dz = a[3 * i + 2] - b[3 * j + 2];
  return dx * dx + dy * dy + dz * dz;
}

// Zhang–Skolnick TM-score length normalization constant.
inline double tm_d0(int n) {
  double d0 = n > 21 ? 1.24 * std::cbrt(static_cast<double>(n) - 15.0) - 1.8 : 0.5;
  return std::max(d0, 0.5);
}

}  // namespace pst
