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
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

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

}  // namespace

extern "C" {

// Sorted unique of `codes` (non-negative) into `out` (capacity n).
// Returns the number of unique values.
int64_t gx_sort_unique(const int64_t *codes, int64_t n, int64_t *out) {
  if (n == 0) return 0;
  std::memcpy(out, codes, static_cast<size_t>(n) * 8);
  std::vector<int64_t> tmp;
  radix_sort(out, n, tmp);
  int64_t ns = 1;
  for (int64_t i = 1; i < n; ++i)
    if (out[i] != out[ns - 1]) out[ns++] = out[i];
  return ns;
}

// np.searchsorted(sorted, q, side='left') for each query.
void gx_searchsorted(const int64_t *sorted, int64_t n, const int64_t *q,
                     int64_t m, int64_t *pos) {
  for (int64_t i = 0; i < m; ++i) {
    const int64_t *it = std::lower_bound(sorted, sorted + n, q[i]);
    pos[i] = it - sorted;
  }
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
  int64_t total_pairs = 0;
  for (int64_t l = 0; l < n_lm; ++l) {
    int64_t s = off[l], c = counts[l];
    std::stable_sort(order + s, order + s + c,
                     [att_pose](int64_t a, int64_t b) {
                       return att_pose[a] < att_pose[b];
                     });
    total_pairs += c * (c + 1) / 2;
  }
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
  int64_t p = 0, seg = 0;
  for (int64_t l = 0; l < n_lm; ++l) {
    const int64_t c = counts[l];
    for (int64_t jj = 0; jj < c; ++jj) {
      const int64_t pb = att_pose_s[seg + jj];
      for (int64_t ii = 0; ii <= jj; ++ii, ++p) {
        ai[p] = seg + ii;
        bi[p] = seg + jj;
        pair_lm[p] = l;
        pair_codes[p] = pb * n_pose + att_pose_s[seg + ii];
      }
    }
    seg += c;
  }
}

}  // extern "C"
