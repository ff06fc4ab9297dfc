// Host-side structure-discovery kernels (freeze-time only).
//
// Native-code analog of the reference's setup phases: Hessian block-coord
// sort/unique (hessian.hpp:48-85, 178-208) and the Schur pair discovery /
// MulOp grouping (schur.hpp:397-476, 484-585). Those run as thrust GPU
// passes + host loops in the reference; here they are plain C++ replacing
// the NumPy hot loops in graphite_tpu/{hessian,schur}.py, which dominate
// freeze time at Venice-Final scale (5M observations, 17M Schur pairs).
//
// Exposed through ctypes (see structure.py); every entry point has a
// NumPy fallback so the framework works without a compiler.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Worker-thread count for the embarrassingly-parallel passes. Defaults to
// the host's hardware concurrency (the deployment shape has dozens of
// cores; the CI container exposes one, where everything below degrades to
// the serial path with zero thread overhead).
int num_threads() {
  static int n = [] {
    if (const char *env = std::getenv("GRAPHITE_TPU_NATIVE_THREADS")) {
      int v = std::atoi(env);
      if (v > 0) return v;
    }
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? static_cast<int>(hw) : 1;
  }();
  return n;
}

// Run fn(t) on nt threads (t = 0..nt-1); serial when nt == 1.
template <typename F>
void parallel_for_threads(int nt, F fn) {
  if (nt <= 1) {
    fn(0);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(static_cast<size_t>(nt) - 1);
  for (int t = 1; t < nt; ++t) ts.emplace_back(fn, t);
  fn(0);
  for (auto &th : ts) th.join();
}

// LSD radix sort on non-negative int64 keys (11-bit digits), sorting only
// the digits needed for the maximum key. Payload-free.
void radix_sort(int64_t *keys, int64_t n, std::vector<int64_t> &tmp) {
  if (n <= 1) return;
  int64_t mx = 0;
  for (int64_t i = 0; i < n; ++i)
    if (keys[i] > mx) mx = keys[i];
  tmp.resize(static_cast<size_t>(n));
  int64_t *src = keys;
  int64_t *dst = tmp.data();
  constexpr int kBits = 11;
  constexpr int kBuckets = 1 << kBits;
  int64_t count[kBuckets];
  for (int shift = 0; shift < 63 && (mx >> shift) != 0; shift += kBits) {
    std::memset(count, 0, sizeof(count));
    for (int64_t i = 0; i < n; ++i)
      ++count[(src[i] >> shift) & (kBuckets - 1)];
    int64_t sum = 0;
    for (int b = 0; b < kBuckets; ++b) {
      int64_t c = count[b];
      count[b] = sum;
      sum += c;
    }
    for (int64_t i = 0; i < n; ++i)
      dst[count[(src[i] >> shift) & (kBuckets - 1)]++] = src[i];
    std::swap(src, dst);
  }
  if (src != keys) std::memcpy(keys, src, static_cast<size_t>(n) * 8);
}

// Parallel sort of non-negative int64 keys: per-chunk radix sorts on
// worker threads, then log2(chunks) rounds of pairwise merges (each round
// merges disjoint run pairs in parallel). Falls back to the serial radix
// sort for one thread / small n.
void parallel_radix_sort(int64_t *keys, int64_t n) {
  constexpr int64_t kMinChunk = int64_t(1) << 19;
  int nt = num_threads();
  if (n < 2 * kMinChunk) nt = 1;
  if (nt > 1 && n / nt < kMinChunk) nt = static_cast<int>(n / kMinChunk);
  if (nt <= 1) {
    std::vector<int64_t> tmp;
    radix_sort(keys, n, tmp);
    return;
  }
  const int64_t chunk = (n + nt - 1) / nt;
  std::vector<std::pair<int64_t, int64_t>> runs;
  for (int64_t lo = 0; lo < n; lo += chunk)
    runs.emplace_back(lo, std::min(lo + chunk, n));
  parallel_for_threads(static_cast<int>(runs.size()), [&](int t) {
    std::vector<int64_t> tmp;
    radix_sort(keys + runs[t].first, runs[t].second - runs[t].first, tmp);
  });
  std::vector<int64_t> buf(static_cast<size_t>(n));
  int64_t *src = keys;
  int64_t *dst = buf.data();
  while (runs.size() > 1) {
    std::vector<std::pair<int64_t, int64_t>> next;
    for (size_t i = 0; i < runs.size(); i += 2) {
      if (i + 1 < runs.size())
        next.emplace_back(runs[i].first, runs[i + 1].second);
      else
        next.emplace_back(runs[i]);
    }
    parallel_for_threads(static_cast<int>(next.size()), [&](int t) {
      const size_t i = static_cast<size_t>(t) * 2;
      if (i + 1 < runs.size()) {
        std::merge(src + runs[i].first, src + runs[i].second,
                   src + runs[i + 1].first, src + runs[i + 1].second,
                   dst + runs[i].first);
      } else {
        std::memcpy(dst + runs[i].first, src + runs[i].first,
                    static_cast<size_t>(runs[i].second - runs[i].first) * 8);
      }
    });
    runs.swap(next);
    std::swap(src, dst);
  }
  if (src != keys) std::memcpy(keys, src, static_cast<size_t>(n) * 8);
}

}  // namespace

extern "C" {

// Sorted unique of `codes` (non-negative) into `out` (capacity n).
// Returns the number of unique values.
int64_t gx_sort_unique(const int64_t *codes, int64_t n, int64_t *out) {
  if (n == 0) return 0;
  std::memcpy(out, codes, static_cast<size_t>(n) * 8);
  parallel_radix_sort(out, n);
  int64_t ns = 1;
  for (int64_t i = 1; i < n; ++i)
    if (out[i] != out[ns - 1]) out[ns++] = out[i];
  return ns;
}

// np.searchsorted(sorted, q, side='left') for each query.
void gx_searchsorted(const int64_t *sorted, int64_t n, const int64_t *q,
                     int64_t m, int64_t *pos) {
  int nt = num_threads();
  if (m < (int64_t(1) << 20)) nt = 1;
  const int64_t chunk = (m + nt - 1) / nt;
  parallel_for_threads(nt, [&](int t) {
    const int64_t lo = t * chunk, hi = std::min(lo + chunk, m);
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t *it = std::lower_bound(sorted, sorted + n, q[i]);
      pos[i] = it - sorted;
    }
  });
}

// Stable sort of the Hpl attach list by (lm, pose): counting sort over lm
// segments, then an in-segment sort by pose (stable, preserving input
// order for equal poses, matching np.lexsort((pose, lm))).
// Outputs: order (K, indices into the input arrays), counts (n_lm).
// Returns total pair count = sum c*(c+1)/2.
int64_t gx_attach_sort(const int64_t *att_lm, const int64_t *att_pose,
                       int64_t K, int64_t n_lm, int64_t *order,
                       int64_t *counts) {
  std::memset(counts, 0, static_cast<size_t>(n_lm) * 8);
  for (int64_t i = 0; i < K; ++i) ++counts[att_lm[i]];
  std::vector<int64_t> off(static_cast<size_t>(n_lm) + 1, 0);
  for (int64_t l = 0; l < n_lm; ++l) off[l + 1] = off[l] + counts[l];
  std::vector<int64_t> cursor(off.begin(), off.end() - 1);
  for (int64_t i = 0; i < K; ++i) order[cursor[att_lm[i]]++] = i;
  // In-segment sorts are independent per landmark: partition landmarks
  // into contiguous ranges of ~equal ELEMENT count per worker thread.
  int nt = num_threads();
  if (K < (int64_t(1) << 20)) nt = 1;
  std::vector<int64_t> bounds(static_cast<size_t>(nt) + 1, n_lm);
  bounds[0] = 0;
  for (int t = 1; t < nt; ++t) {
    const int64_t target = K * t / nt;
    bounds[t] = std::lower_bound(off.begin(), off.end(), target)
                - off.begin();
  }
  std::vector<int64_t> pair_counts(static_cast<size_t>(nt), 0);
  parallel_for_threads(nt, [&](int t) {
    int64_t local = 0;
    for (int64_t l = bounds[t]; l < bounds[t + 1]; ++l) {
      const int64_t s = off[l], c = counts[l];
      std::stable_sort(order + s, order + s + c,
                       [att_pose](int64_t a, int64_t b) {
                         return att_pose[a] < att_pose[b];
                       });
      local += c * (c + 1) / 2;
    }
    pair_counts[t] = local;
  });
  int64_t total_pairs = 0;
  for (int t = 0; t < nt; ++t) total_pairs += pair_counts[t];
  return total_pairs;
}

// Enumerate all unordered pose pairs (a <= b) per landmark, in the
// (jj, ii<=jj) order of the NumPy triangular decode. Inputs are the
// *sorted* attach arrays (att_pose_s) and per-landmark counts. Outputs
// (each of length total_pairs): ai/bi (indices into the sorted attach
// list), pair_lm, pair_codes = pose_b * n_pose + pose_a.
void gx_pair_fill(const int64_t *counts, int64_t n_lm,
                  const int64_t *att_pose_s, int64_t n_pose, int64_t *ai,
                  int64_t *bi, int64_t *pair_lm, int64_t *pair_codes) {
  // Per-landmark segment + pair offsets (linear prefix scans), then the
  // fill runs in parallel over landmark ranges.
  std::vector<int64_t> seg_off(static_cast<size_t>(n_lm) + 1, 0);
  std::vector<int64_t> pair_off(static_cast<size_t>(n_lm) + 1, 0);
  for (int64_t l = 0; l < n_lm; ++l) {
    seg_off[l + 1] = seg_off[l] + counts[l];
    pair_off[l + 1] = pair_off[l] + counts[l] * (counts[l] + 1) / 2;
  }
  const int64_t total = pair_off[n_lm];
  int nt = num_threads();
  if (total < (int64_t(1) << 20)) nt = 1;
  parallel_for_threads(nt, [&](int t) {
    const int64_t lo_l = std::lower_bound(pair_off.begin(), pair_off.end(),
                                          total * t / nt)
                         - pair_off.begin();
    const int64_t hi_l =
        std::lower_bound(pair_off.begin(), pair_off.end(),
                         total * (t + 1) / nt)
        - pair_off.begin();
    for (int64_t l = lo_l; l < hi_l && l < n_lm; ++l) {
      const int64_t c = counts[l];
      const int64_t seg = seg_off[l];
      int64_t p = pair_off[l];
      for (int64_t jj = 0; jj < c; ++jj) {
        const int64_t pb = att_pose_s[seg + jj];
        for (int64_t ii = 0; ii <= jj; ++ii, ++p) {
          ai[p] = seg + ii;
          bi[p] = seg + jj;
          pair_lm[p] = l;
          pair_codes[p] = pb * n_pose + att_pose_s[seg + ii];
        }
      }
    }
  });
}

}  // extern "C"

namespace {

// LSD radix argsort: sorts (key, payload) pairs by key. src/dst are
// interleaved buffers of n entries each.
struct KV {
  int64_t k;
  int64_t v;
};

void radix_argsort(std::vector<KV> &a, std::vector<KV> &b) {
  const int64_t n = static_cast<int64_t>(a.size());
  if (n <= 1) return;
  int64_t mx = 0;
  for (const KV &e : a)
    if (e.k > mx) mx = e.k;
  KV *src = a.data();
  KV *dst = b.data();
  constexpr int kBits = 11;
  constexpr int kBuckets = 1 << kBits;
  int64_t count[kBuckets];
  bool swapped = false;
  for (int shift = 0; shift < 63 && (mx >> shift) != 0; shift += kBits) {
    std::memset(count, 0, sizeof(count));
    for (int64_t i = 0; i < n; ++i)
      ++count[(src[i].k >> shift) & (kBuckets - 1)];
    int64_t sum = 0;
    for (int b2 = 0; b2 < kBuckets; ++b2) {
      int64_t c = count[b2];
      count[b2] = sum;
      sum += c;
    }
    for (int64_t i = 0; i < n; ++i)
      dst[count[(src[i].k >> shift) & (kBuckets - 1)]++] = src[i];
    std::swap(src, dst);
    swapped = !swapped;
  }
  if (swapped) a.swap(b);
}

}  // namespace

extern "C" {

// Sorted unique + inverse indices (np.unique(codes, return_inverse=True))
// in ONE radix pass with payload. uniq has capacity n. Returns ns.
// Fast path: when bits(max_code) + bits(n) <= 63, key and origin index
// pack into one int64 (key<<ob | origin) — half the sort traffic.
int64_t gx_sort_unique_inverse(const int64_t *codes, int64_t n,
                               int64_t *uniq, int64_t *inverse) {
  if (n == 0) return 0;
  int64_t mx = 0;
  for (int64_t i = 0; i < n; ++i)
    if (codes[i] > mx) mx = codes[i];
  int kb = 1, ob = 1;
  while ((mx >> kb) != 0) ++kb;
  while (((n - 1) >> ob) != 0) ++ob;
  if (kb + ob <= 63) {
    std::vector<int64_t> a(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; ++i) a[i] = (codes[i] << ob) | i;
    std::vector<int64_t> tmp;
    radix_sort(a.data(), n, tmp);
    const int64_t omask = (int64_t(1) << ob) - 1;
    int64_t ns = 0;
    int64_t prev = -1;
    for (int64_t i = 0; i < n; ++i) {
      const int64_t k = a[i] >> ob;
      if (k != prev) {
        uniq[ns++] = k;
        prev = k;
      }
      inverse[a[i] & omask] = ns - 1;
    }
    return ns;
  }
  if (kb <= 63 - 20) {
    // Chunked pack-sort: split into chunks small enough that key+origin
    // still pack into one int64, then merge the per-chunk uniques and
    // remap local ranks to global ones. Requires chunks >= 2^20 so the
    // k-way merge stays over a handful of lists (otherwise fall through
    // to the struct-payload radix sort).
    int cb = 63 - kb;  // origin bits available per chunk
    int64_t chunk = int64_t(1) << cb;
    int64_t n_chunks = (n + chunk - 1) / chunk;
    std::vector<std::vector<int64_t>> uniqs(
        static_cast<size_t>(n_chunks));
    std::vector<int64_t> tmp;
    std::vector<int64_t> a;
    for (int64_t c = 0; c < n_chunks; ++c) {
      const int64_t lo = c * chunk;
      const int64_t m = std::min(chunk, n - lo);
      a.resize(static_cast<size_t>(m));
      for (int64_t i = 0; i < m; ++i) a[i] = (codes[lo + i] << cb) | i;
      radix_sort(a.data(), m, tmp);
      const int64_t omask = chunk - 1;
      auto &u = uniqs[c];
      u.reserve(static_cast<size_t>(m));
      int64_t prev = -1;
      for (int64_t i = 0; i < m; ++i) {
        const int64_t k = a[i] >> cb;
        if (k != prev) {
          u.push_back(k);
          prev = k;
        }
        // local rank, remapped to global below
        inverse[lo + (a[i] & omask)] = static_cast<int64_t>(u.size()) - 1;
      }
    }
    // k-way merge of the sorted unique lists (n_chunks is tiny)
    std::vector<size_t> cur(static_cast<size_t>(n_chunks), 0);
    int64_t ns = 0;
    for (;;) {
      int64_t best = INT64_MAX;
      for (int64_t c = 0; c < n_chunks; ++c)
        if (cur[c] < uniqs[c].size() && uniqs[c][cur[c]] < best)
          best = uniqs[c][cur[c]];
      if (best == INT64_MAX) break;
      uniq[ns++] = best;
      for (int64_t c = 0; c < n_chunks; ++c)
        if (cur[c] < uniqs[c].size() && uniqs[c][cur[c]] == best) ++cur[c];
    }
    // per-chunk local-rank -> global-rank maps, then remap inverse
    for (int64_t c = 0; c < n_chunks; ++c) {
      auto &u = uniqs[c];
      std::vector<int64_t> rank(u.size());
      for (size_t i = 0; i < u.size(); ++i)
        rank[i] = std::lower_bound(uniq, uniq + ns, u[i]) - uniq;
      const int64_t lo = c * chunk;
      const int64_t m = std::min(chunk, n - lo);
      for (int64_t i = 0; i < m; ++i)
        inverse[lo + i] = rank[inverse[lo + i]];
    }
    return ns;
  }
  std::vector<KV> a(static_cast<size_t>(n)), b(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) a[i] = {codes[i], i};
  radix_argsort(a, b);
  int64_t ns = 0;
  int64_t prev = a[0].k - 1;
  for (int64_t i = 0; i < n; ++i) {
    if (a[i].k != prev) {
      uniq[ns++] = a[i].k;
      prev = a[i].k;
    }
    inverse[a[i].v] = ns - 1;
  }
  return ns;
}

// Bounded-range unique+inverse: when codes < bound (small, e.g. the
// n_pose^2 pair-code range), a flag array + prefix-sum rank beats any
// sort: three linear passes. Returns ns; uniq capacity min(n, bound),
// inverse length n.
int64_t gx_unique_inverse_bounded(const int64_t *codes, int64_t n,
                                  int64_t bound, int64_t *uniq,
                                  int64_t *inverse) {
  if (n == 0) return 0;
  std::vector<int32_t> rank(static_cast<size_t>(bound), 0);
  for (int64_t i = 0; i < n; ++i) rank[codes[i]] = 1;
  int64_t ns = 0;
  for (int64_t c = 0; c < bound; ++c) {
    if (rank[c]) {
      uniq[ns] = c;
      rank[c] = static_cast<int32_t>(ns++);
    } else {
      rank[c] = -1;
    }
  }
  for (int64_t i = 0; i < n; ++i) inverse[i] = rank[codes[i]];
  return ns;
}

// Stable counting-sort permutation: perm sorts `keys` stably, with keys in
// [0, n_buckets). Equivalent to np.argsort(keys, kind="stable").
void gx_counting_sort_perm(const int64_t *keys, int64_t n, int64_t n_buckets,
                           int64_t *perm) {
  std::vector<int64_t> count(static_cast<size_t>(n_buckets) + 1, 0);
  for (int64_t i = 0; i < n; ++i) ++count[keys[i] + 1];
  for (int64_t b2 = 0; b2 < n_buckets; ++b2) count[b2 + 1] += count[b2];
  for (int64_t i = 0; i < n; ++i) perm[count[keys[i]]++] = i;
}

// Stable counting sort by int32 keys in [0, n_buckets) that APPLIES the
// permutation to three int32 payload arrays in one scatter pass — the
// Schur product-plan sort (dst + left/right/mid, schur.hpp:484-585's
// MulOp grouping). One histogram + one scatter replaces perm
// materialization plus four NumPy fancy-index gathers. Threaded: slice
// histograms, bucket-major prefix combine, per-slice stable scatter.
void gx_counting_sort_apply3_i32(const int32_t *keys, int64_t n,
                                 int64_t n_buckets, const int32_t *p0,
                                 const int32_t *p1, const int32_t *p2,
                                 int32_t *keys_out, int32_t *q0, int32_t *q1,
                                 int32_t *q2) {
  // int32 perm scatter, then one random-READ gather pass per payload:
  // gathers (random reads, sequential writes) measured 25-40% faster
  // than a fused 4-stream random-write scatter at 17.1M x 1.58M, and
  // the all-int32 layout halves index traffic vs the int64 perm path.
  std::vector<int32_t> perm(static_cast<size_t>(n));
  {
    std::vector<int64_t> count(static_cast<size_t>(n_buckets) + 1, 0);
    for (int64_t i = 0; i < n; ++i) ++count[keys[i] + 1];
    for (int64_t b = 0; b < n_buckets; ++b) count[b + 1] += count[b];
    for (int64_t i = 0; i < n; ++i)
      perm[static_cast<size_t>(count[keys[i]]++)] =
          static_cast<int32_t>(i);
  }
  int nt = num_threads();
  if (n < (int64_t(1) << 21)) nt = 1;
  const int64_t chunk = (n + nt - 1) / nt;
  parallel_for_threads(nt, [&](int t) {
    const int64_t lo = t * chunk, hi = std::min(lo + chunk, n);
    for (int64_t i = lo; i < hi; ++i) keys_out[i] = keys[perm[i]];
    for (int64_t i = lo; i < hi; ++i) q0[i] = p0[perm[i]];
    for (int64_t i = lo; i < hi; ++i) q1[i] = p1[perm[i]];
    for (int64_t i = lo; i < hi; ++i) q2[i] = p2[perm[i]];
  });
}

// gx_pair_fill variant that also writes the pose ids of each pair (saves
// two 17M-row gathers on the Python side) and uses int32 pair indices.
void gx_pair_fill2(const int64_t *counts, int64_t n_lm,
                   const int64_t *att_pose_s, int64_t n_pose, int32_t *ai,
                   int32_t *bi, int32_t *pair_lm, int64_t *pair_codes,
                   int32_t *pose_a, int32_t *pose_b) {
  std::vector<int64_t> seg_off(static_cast<size_t>(n_lm) + 1, 0);
  std::vector<int64_t> pair_off(static_cast<size_t>(n_lm) + 1, 0);
  for (int64_t l = 0; l < n_lm; ++l) {
    seg_off[l + 1] = seg_off[l] + counts[l];
    pair_off[l + 1] = pair_off[l] + counts[l] * (counts[l] + 1) / 2;
  }
  const int64_t total = pair_off[n_lm];
  int nt = num_threads();
  if (total < (int64_t(1) << 20)) nt = 1;
  parallel_for_threads(nt, [&](int t) {
    const int64_t lo_l = std::lower_bound(pair_off.begin(), pair_off.end(),
                                          total * t / nt)
                         - pair_off.begin();
    const int64_t hi_l =
        std::lower_bound(pair_off.begin(), pair_off.end(),
                         total * (t + 1) / nt)
        - pair_off.begin();
    for (int64_t l = lo_l; l < hi_l && l < n_lm; ++l) {
      const int64_t c = counts[l];
      const int64_t seg = seg_off[l];
      int64_t p = pair_off[l];
      for (int64_t jj = 0; jj < c; ++jj) {
        const int64_t pb = att_pose_s[seg + jj];
        for (int64_t ii = 0; ii <= jj; ++ii, ++p) {
          const int64_t pa = att_pose_s[seg + ii];
          ai[p] = static_cast<int32_t>(seg + ii);
          bi[p] = static_cast<int32_t>(seg + jj);
          pair_lm[p] = static_cast<int32_t>(l);
          pose_a[p] = static_cast<int32_t>(pa);
          pose_b[p] = static_cast<int32_t>(pb);
          pair_codes[p] = pb * n_pose + pa;
        }
      }
    }
  });
}

}  // extern "C"

extern "C" {

// pair_fill variant for the single-(dp,dl)-group fast path: emits the
// left/right attach VALUES (att_vals[seg+ii], att_vals[seg+jj]) directly
// at pair-generation time — replacing two 17M-row random-read gathers
// with sequential writes (schur.hpp:484-585's MulOp list build).
void gx_pair_fill_vals(const int64_t *counts, int64_t n_lm,
                       const int64_t *att_pose_s, int64_t n_pose,
                       const int32_t *att_vals, int32_t *left,
                       int32_t *right, int32_t *pair_lm,
                       int64_t *pair_codes) {
  std::vector<int64_t> seg_off(static_cast<size_t>(n_lm) + 1, 0);
  std::vector<int64_t> pair_off(static_cast<size_t>(n_lm) + 1, 0);
  for (int64_t l = 0; l < n_lm; ++l) {
    seg_off[l + 1] = seg_off[l] + counts[l];
    pair_off[l + 1] = pair_off[l] + counts[l] * (counts[l] + 1) / 2;
  }
  const int64_t total = pair_off[n_lm];
  int nt = num_threads();
  if (total < (int64_t(1) << 20)) nt = 1;
  parallel_for_threads(nt, [&](int t) {
    const int64_t lo_l = std::lower_bound(pair_off.begin(), pair_off.end(),
                                          total * t / nt)
                         - pair_off.begin();
    const int64_t hi_l =
        std::lower_bound(pair_off.begin(), pair_off.end(),
                         total * (t + 1) / nt)
        - pair_off.begin();
    for (int64_t l = lo_l; l < hi_l && l < n_lm; ++l) {
      const int64_t c = counts[l];
      const int64_t seg = seg_off[l];
      int64_t p = pair_off[l];
      for (int64_t jj = 0; jj < c; ++jj) {
        const int64_t pb = att_pose_s[seg + jj];
        const int32_t vb = att_vals[seg + jj];
        for (int64_t ii = 0; ii <= jj; ++ii, ++p) {
          left[p] = att_vals[seg + ii];
          right[p] = vb;
          pair_lm[p] = static_cast<int32_t>(l);
          pair_codes[p] = pb * n_pose + att_pose_s[seg + ii];
        }
      }
    }
  });
}

}  // extern "C"

extern "C" {

// Fused Schur-plan builder for the single-(dp,dl)-group case with a
// bounded pair-code range (n_pose^2 <= ~2^23): replaces pair fill +
// bounded unique + counting sort (schur.hpp:397-476 + 484-585) with two
// generation passes over the attach lists:
//   pass 1: histogram pair codes (no pair materialization);
//   scan:    S sparsity = {codes with pairs} U {Hpp codes}, global rank
//            + dst-sorted base offsets;
//   pass 2: regenerate pairs, scattering left/right/mid/dst directly to
//            their dst-sorted positions (stable: generation order within
//            each destination bucket).
// Returns ns (number of S blocks); writes hpp_pos = rank of each Hpp code.
int64_t gx_pair_fill_sorted(const int64_t *counts, int64_t n_lm,
                            const int64_t *att_pose_s,
                            const int32_t *att_vals, int64_t n_pose,
                            const int64_t *hpp_codes, int64_t n_hpp,
                            int32_t *left, int32_t *right, int32_t *mid,
                            int32_t *dst, int64_t *s_codes,
                            int64_t *hpp_pos) {
  const int64_t n_codes = n_pose * n_pose;
  std::vector<int64_t> seg_off(static_cast<size_t>(n_lm) + 1, 0);
  for (int64_t l = 0; l < n_lm; ++l) seg_off[l + 1] = seg_off[l] + counts[l];
  std::vector<int32_t> cnt(static_cast<size_t>(n_codes), 0);
  std::vector<uint8_t> hflag(static_cast<size_t>(n_codes), 0);
  for (int64_t i = 0; i < n_hpp; ++i) hflag[hpp_codes[i]] = 1;
  // pass 1: pair-code histogram, no pair writes
  for (int64_t l = 0; l < n_lm; ++l) {
    const int64_t c = counts[l], seg = seg_off[l];
    for (int64_t jj = 0; jj < c; ++jj) {
      const int64_t base = att_pose_s[seg + jj] * n_pose;
      for (int64_t ii = 0; ii <= jj; ++ii)
        ++cnt[base + att_pose_s[seg + ii]];
    }
  }
  // scan: rank + dst-sorted base cursor (cnt becomes the cursor)
  std::vector<int32_t> rank(static_cast<size_t>(n_codes));
  int64_t ns = 0, base = 0;
  for (int64_t code = 0; code < n_codes; ++code) {
    const int32_t c = cnt[code];
    if (c || hflag[code]) {
      s_codes[ns] = code;
      rank[code] = static_cast<int32_t>(ns++);
      cnt[code] = static_cast<int32_t>(base);
      base += c;
    }
  }
  for (int64_t i = 0; i < n_hpp; ++i) hpp_pos[i] = rank[hpp_codes[i]];
  // pass 2: regenerate pairs, scatter to final dst-sorted positions.
  // The four payloads are written INTERLEAVED (one 16-byte store per
  // pair = one cache line touched instead of four random streams),
  // then deinterleaved sequentially — measured ~2x on pass 2.
  const int64_t total = base;
  std::vector<int32_t> buf(static_cast<size_t>(total) * 4);
  for (int64_t l = 0; l < n_lm; ++l) {
    const int64_t c = counts[l], seg = seg_off[l];
    for (int64_t jj = 0; jj < c; ++jj) {
      const int64_t pbase = att_pose_s[seg + jj] * n_pose;
      const int32_t vb = att_vals[seg + jj];
      for (int64_t ii = 0; ii <= jj; ++ii) {
        const int64_t code = pbase + att_pose_s[seg + ii];
        int32_t *q = buf.data() + static_cast<size_t>(cnt[code]++) * 4;
        q[0] = att_vals[seg + ii];
        q[1] = vb;
        q[2] = static_cast<int32_t>(l);
        q[3] = rank[code];
      }
    }
  }
  int nt = num_threads();
  if (total < (int64_t(1) << 21)) nt = 1;
  const int64_t chunk = (total + nt - 1) / nt;
  parallel_for_threads(nt, [&](int t) {
    const int64_t lo = t * chunk, hi = std::min(lo + chunk, total);
    for (int64_t i = lo; i < hi; ++i) {
      const int32_t *q = buf.data() + static_cast<size_t>(i) * 4;
      left[i] = q[0];
      right[i] = q[1];
      mid[i] = q[2];
      dst[i] = q[3];
    }
  });
  return ns;
}

}  // extern "C"
