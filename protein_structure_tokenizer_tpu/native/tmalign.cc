// Sequence-independent structural alignment (TM-align-style, native module).
//
// Replaces the external zhanggroup TMalign binary the reference shells out to
// for directory-vs-directory comparison
// (/root/reference/structure_tokenizer/utils/utils.py:84-128 regex-parses its
// stdout).  Same algorithmic skeleton as the published TM-align method
// (Zhang & Skolnick 2005): seed superpositions from gapless threading, then
// alternate (a) TM-score rotation search over the current aligned pairs with
// (b) Needleman–Wunsch dynamic programming over the TM-score matrix, until
// the alignment converges.  Reports TM normalized by both chain lengths,
// aligned length, RMSD over aligned pairs, and the residue mapping.
//
// C ABI for ctypes (see native/__init__.py).  Build: `make native`.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#include "geom.h"

namespace {

using pst::apply_transform;
using pst::kabsch_pairs;
using pst::sq_dist2;
using pst::tm_d0;

constexpr double kGapOpen = -0.6;  // TM-align's DP gap penalty (no extension)

struct Alignment {
  std::vector<int> ia, ib;  // aligned index pairs, strictly increasing
};

// Needleman–Wunsch with a fixed gap penalty over score matrix s(na, nb).
Alignment needleman_wunsch(const std::vector<double>& s, int na, int nb) {
  const int W = nb + 1;
  std::vector<double> val((na + 1) * W, 0.0);
  // 0 = diagonal (match), 1 = up (gap in b), 2 = left (gap in a)
  std::vector<uint8_t> path((na + 1) * W, 0);
  // Free end gaps (glocal alignment, as TM-align): first row/col stay 0.
  for (int i = 1; i <= na; ++i) {
    for (int j = 1; j <= nb; ++j) {
      double diag = val[(i - 1) * W + (j - 1)] + s[(i - 1) * nb + (j - 1)];
      double up = val[(i - 1) * W + j] + (j == nb ? 0.0 : kGapOpen);
      double left = val[i * W + (j - 1)] + (i == na ? 0.0 : kGapOpen);
      double best = diag;
      uint8_t dir = 0;
      if (up > best) {
        best = up;
        dir = 1;
      }
      if (left > best) {
        best = left;
        dir = 2;
      }
      val[i * W + j] = best;
      path[i * W + j] = dir;
    }
  }
  Alignment ali;
  int i = na, j = nb;
  while (i > 0 && j > 0) {
    switch (path[i * W + j]) {
      case 0:
        ali.ia.push_back(i - 1);
        ali.ib.push_back(j - 1);
        --i;
        --j;
        break;
      case 1:
        --i;
        break;
      default:
        --j;
        break;
    }
  }
  std::reverse(ali.ia.begin(), ali.ia.end());
  std::reverse(ali.ib.begin(), ali.ib.end());
  return ali;
}

// TM-score rotation search restricted to the aligned pairs: iteratively
// re-superpose on the subset of pairs within a shrinking distance cutoff,
// keeping the transform that maximizes TM (normalized by `norm_len`).
// Returns the best TM; fills `moved` with chain A under the best transform.
double tm_rotation_search(const double* xa, int na, const double* xb,
                          const Alignment& ali, double d0, int norm_len,
                          std::vector<double>* best_moved) {
  const double d0_sq = d0 * d0;
  const int n_ali = static_cast<int>(ali.ia.size());
  if (n_ali < 4) return 0.0;

  double best_tm = 0.0;
  std::vector<double> moved;
  double R[3][3], t[3];

  // Seed from sliding windows over the aligned pairs (full, half, quarter).
  for (int len = n_ali; len >= 4; len /= 2) {
    for (int start = 0; start + len <= n_ali; start += std::max(1, len / 2)) {
      std::vector<int> sa, sb;
      for (int k = start; k < start + len; ++k) {
        sa.push_back(ali.ia[k]);
        sb.push_back(ali.ib[k]);
      }
      for (int iter = 0; iter < 20; ++iter) {
        if (sa.size() < 4) break;
        kabsch_pairs(xa, xb, sa, sb, R, t);
        apply_transform(xa, na, R, t, &moved);

        double tm = 0;
        for (int k = 0; k < n_ali; ++k)
          tm += 1.0 / (1.0 + sq_dist2(moved.data(), ali.ia[k], xb, ali.ib[k]) / d0_sq);
        tm /= norm_len;
        if (tm > best_tm) {
          best_tm = tm;
          *best_moved = moved;
        }

        double d_cut = std::max(d0 + 1.0 - 0.5 * iter, 3.0);
        std::vector<int> nsa, nsb;
        for (int k = 0; k < n_ali; ++k)
          if (sq_dist2(moved.data(), ali.ia[k], xb, ali.ib[k]) < d_cut * d_cut) {
            nsa.push_back(ali.ia[k]);
            nsb.push_back(ali.ib[k]);
          }
        if (nsa.size() < 4 || nsa == sa) break;
        sa.swap(nsa);
        sb.swap(nsb);
      }
    }
    if (len == 4) break;
  }
  return best_tm;
}

// Score matrix s[i*nb+j] = 1/(1+d_ij^2/d0^2) for moved chain A vs chain B.
void fill_score_matrix(const std::vector<double>& moved, int na, const double* xb,
                       int nb, double d0, std::vector<double>* s) {
  const double d0_sq = d0 * d0;
  s->resize(static_cast<size_t>(na) * nb);
  for (int i = 0; i < na; ++i)
    for (int j = 0; j < nb; ++j)
      (*s)[static_cast<size_t>(i) * nb + j] =
          1.0 / (1.0 + sq_dist2(moved.data(), i, xb, j) / d0_sq);
}

}  // namespace

extern "C" {

// Structural alignment of chain A (na, 3) onto chain B (nb, 3), row-major
// doubles, no residue correspondence assumed.
//   out: [tm_norm_a, tm_norm_b, rmsd_aligned, n_aligned, d0_a, d0_b]
//   ali_out (optional, length na): for each residue of A, the aligned residue
//     index in B or -1.  Pass nullptr to skip.
int pst_tm_align(const double* xa, int na, const double* xb, int nb, double* out,
                 int32_t* ali_out) {
  if (na < 4 || nb < 4) return -1;
  const double d0a = tm_d0(na);
  const double d0b = tm_d0(nb);
  // DP/search runs with the smaller-chain normalization (TM-align convention:
  // d0 of min(na, nb) drives the alignment search).
  const int nmin = std::min(na, nb);
  const double d0 = tm_d0(nmin);

  Alignment best_ali;
  double best_tm = -1.0;
  std::vector<double> best_moved;

  // --- initial alignments: gapless threading over all offsets -------------
  std::vector<Alignment> seeds;
  for (int off = -(na - 4); off <= nb - 4; ++off) {
    Alignment a;
    for (int i = std::max(0, -off); i < na && i + off < nb; ++i) {
      a.ia.push_back(i);
      a.ib.push_back(i + off);
    }
    if (static_cast<int>(a.ia.size()) >= 4) seeds.push_back(std::move(a));
  }

  // Rank threading seeds cheaply (superpose once, score) and keep the best
  // few for full refinement — full DP refinement of every offset is O(n^3).
  std::vector<std::pair<double, size_t>> ranked;
  {
    std::vector<double> moved;
    double R[3][3], t[3];
    for (size_t k = 0; k < seeds.size(); ++k) {
      kabsch_pairs(xa, xb, seeds[k].ia, seeds[k].ib, R, t);
      apply_transform(xa, na, R, t, &moved);
      double tm = 0;
      const double d0_sq = d0 * d0;
      for (size_t p = 0; p < seeds[k].ia.size(); ++p)
        tm += 1.0 / (1.0 + sq_dist2(moved.data(), seeds[k].ia[p], xb, seeds[k].ib[p]) / d0_sq);
      ranked.push_back({tm / nmin, k});
    }
    std::sort(ranked.begin(), ranked.end(), std::greater<>());
  }
  const size_t keep = std::min<size_t>(5, ranked.size());

  // --- iterative refinement: rotation search <-> DP re-alignment ----------
  std::vector<double> smat;
  for (size_t r = 0; r < keep; ++r) {
    Alignment ali = seeds[ranked[r].second];
    for (int round = 0; round < 8; ++round) {
      std::vector<double> moved;
      double tm = tm_rotation_search(xa, na, xb, ali, d0, nmin, &moved);
      if (moved.empty()) break;
      if (tm > best_tm) {
        best_tm = tm;
        best_ali = ali;
        best_moved = moved;
      }
      fill_score_matrix(moved, na, xb, nb, d0, &smat);
      Alignment next = needleman_wunsch(smat, na, nb);
      if (next.ia == ali.ia && next.ib == ali.ib) break;
      ali = std::move(next);
    }
  }
  if (best_tm < 0 || best_ali.ia.size() < 4) return -2;

  // --- final metrics under the best transform ------------------------------
  const int n_ali = static_cast<int>(best_ali.ia.size());
  double tm_a = 0, tm_b = 0, ss = 0;
  for (int k = 0; k < n_ali; ++k) {
    double dd = sq_dist2(best_moved.data(), best_ali.ia[k], xb, best_ali.ib[k]);
    tm_a += 1.0 / (1.0 + dd / (d0a * d0a));
    tm_b += 1.0 / (1.0 + dd / (d0b * d0b));
    ss += dd;
  }
  // Re-run the rotation search under each chain's own normalization so each
  // reported TM is itself maximized (TM-align reports both normalizations).
  {
    std::vector<double> moved;
    double t_a = tm_rotation_search(xa, na, xb, best_ali, d0a, na, &moved);
    double t_b = tm_rotation_search(xa, na, xb, best_ali, d0b, nb, &moved);
    tm_a = std::max(tm_a / na, t_a);
    tm_b = std::max(tm_b / nb, t_b);
  }

  out[0] = tm_a;
  out[1] = tm_b;
  out[2] = std::sqrt(ss / n_ali);
  out[3] = static_cast<double>(n_ali);
  out[4] = d0a;
  out[5] = d0b;
  if (ali_out != nullptr) {
    for (int i = 0; i < na; ++i) ali_out[i] = -1;
    for (int k = 0; k < n_ali; ++k) ali_out[best_ali.ia[k]] = best_ali.ib[k];
  }
  return 0;
}

}  // extern "C"
