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
#include <vector>

#include "geom.h"

namespace {

using pst::apply_transform;
using pst::kabsch;
using pst::sq_dist;

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

  double d0 = pst::tm_d0(n);

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
