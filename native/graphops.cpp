// Host-side covisibility-graph edge scheduler.
//
// Native implementation of the proximity/NMS edge-selection loops that the
// reference runs in Python per keyframe (~60 ms,
// /root/reference/dbaf/covisible_graph.py:357-441 and
// dbaf_frontend.py:232 latency note).  The distance matrix comes from the
// device; this code is pure index logic: distance-ranked greedy selection
// with Chebyshev-ball non-maximal suppression, forced radius edges, and the
// opportunistic best skip edge.
//
// Exposed through a C ABI for ctypes (no pybind dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Ctx {
  double* d;  // candidate distances, mutated in place
  int t0, t1, t, nms;
};

// suppress candidates in a Chebyshev ball around (i, j); radius shrinks for
// short-baseline pairs (covisible_graph.py:386-393)
inline void suppress(Ctx& c, long i, long j) {
  int r = std::max(std::min(static_cast<int>(std::labs(i - j)) - 2, c.nms), 0);
  for (int di = -c.nms; di <= c.nms; ++di) {
    for (int dj = -c.nms; dj <= c.nms; ++dj) {
      if (std::abs(di) + std::abs(dj) <= r) {
        long i1 = i + di;
        long j1 = j + dj;
        if (c.t0 <= i1 && i1 < c.t && c.t1 <= j1 && j1 < c.t) {
          c.d[(i1 - c.t0) * (c.t - c.t1) + (j1 - c.t1)] = kInf;
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns the number of selected edges written to out_ii/out_jj.
// d: (n_cand) candidate distances for pairs (ii, jj); the first cc entries
//    are the dense (t0..t, t1..t) grid, the rest are skip-edge candidates.
// exist_*: currently active + bad + inactive edges (for NMS seeding).
int select_proximity_edges(
    double* d, const long* ii, const long* jj, int n_cand, int cc,
    const long* exist_ii, const long* exist_jj, int n_exist,
    int t0, int t1, int t, int rad, int nms, double thresh, int max_factors,
    long* out_ii, long* out_jj, int max_out) {
  Ctx ctx{d, t0, t1, t, nms};

  // invalidate too-new and too-far pairs (covisible_graph.py:380-381)
  for (int k = 0; k < n_cand; ++k) {
    if (ii[k] - rad < jj[k]) d[k] = kInf;
    if (d[k] > 100.0) d[k] = kInf;
  }

  // NMS seeds from existing edges (covisible_graph.py:383-393)
  for (int e = 0; e < n_exist; ++e) suppress(ctx, exist_ii[e], exist_jj[e]);

  int n_out = 0;
  auto emit = [&](long a, long b) {
    if (n_out < max_out) {
      out_ii[n_out] = a;
      out_jj[n_out] = b;
      ++n_out;
    }
  };

  // forced radius edges (covisible_graph.py:396-405)
  for (long i = t0; i < t; ++i) {
    for (long j = std::max<long>(i - rad - 1, 0); j < i; ++j) {
      emit(i, j);
      emit(j, i);
      long idx = (i - t0) * (t - t1) + (j - t1);
      if (idx >= 0 && idx < cc) d[idx] = kInf;
    }
  }

  // distance-ranked greedy selection (covisible_graph.py:407-432)
  std::vector<int> order(n_cand);
  for (int k = 0; k < n_cand; ++k) order[k] = k;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return d[a] < d[b]; });

  for (int k : order) {
    if (k >= cc) continue;
    if (!(d[k] <= thresh)) continue;
    if (n_out > max_factors) break;
    emit(ii[k], jj[k]);
    emit(jj[k], ii[k]);
    suppress(ctx, ii[k], jj[k]);
  }

  // opportunistic best skip edge (covisible_graph.py:434-438)
  if (n_cand > cc) {
    int best = -1;
    double bd = kInf;
    for (int k = cc; k < n_cand; ++k) {
      if (d[k] < bd) {
        bd = d[k];
        best = k;
      }
    }
    if (best >= 0 && bd < thresh && bd > 0) {
      emit(ii[best], jj[best]);
      emit(jj[best], ii[best]);
    }
  }
  return n_out;
}

// Deduplicate candidate edges against an existing set and themselves.
// Returns number kept; writes kept indices into out_idx.
int dedup_edges(const long* ii, const long* jj, int n,
                const long* exist_ii, const long* exist_jj, int n_exist,
                int* out_idx) {
  // hash set over (i << 20) ^ j for frame indices < ~1M
  std::vector<int64_t> keys;
  keys.reserve(n_exist);
  for (int e = 0; e < n_exist; ++e) {
    keys.push_back((exist_ii[e] << 20) ^ exist_jj[e]);
  }
  std::sort(keys.begin(), keys.end());
  auto exists = [&](int64_t k) {
    return std::binary_search(keys.begin(), keys.end(), k);
  };

  std::vector<int64_t> seen;
  int n_out = 0;
  for (int k = 0; k < n; ++k) {
    int64_t key = (ii[k] << 20) ^ jj[k];
    if (exists(key)) continue;
    bool dup = false;
    for (int64_t s : seen) {
      if (s == key) {
        dup = true;
        break;
      }
    }
    if (dup) continue;
    seen.push_back(key);
    out_idx[n_out++] = k;
  }
  return n_out;
}

}  // extern "C"
