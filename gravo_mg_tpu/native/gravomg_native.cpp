// Native host-side setup kernels for gravo_mg_tpu.
//
// Role: the reference implements its whole setup path in C++
// (gravomg/src/multigrid_solver.cpp); in the TPU build the device owns the
// numerics, and C++ owns the irregular host-side *plan construction* that
// feeds it — the parts numpy handles poorly at the 1M-vertex scale:
//
//   * galerkin_dedup: sort + deduplicate the 9*nnz contribution keys of
//     the Galerkin triple-product plan (sparse.py make_galerkin_plan),
//     producing the contribution->output-slot map and the unique key list.
//     OpenMP bucket sort: ~10x numpy argsort at 66M keys.
//   * unique_i64: sorted unique of an int64 array (coarse-graph edge
//     dedup, hierarchy/builder.py _coarse_graph).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Build: cc -O3 -fopenmp -shared -fPIC gravomg_native.cpp -o libgravomg_native.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// LSD radix sort of (key, original-index) pairs by key, 16-bit digits.
// Memory-bound O(n * passes) with passes = ceil(bits(key_max)/16) — the
// right shape for the 2-core host this runs on (comparison sorts lose).
void parallel_sort_pairs(const int64_t* keys, int64_t n, int64_t key_max,
                         std::vector<int64_t>& sorted_keys,
                         std::vector<int64_t>& order) {
  sorted_keys.assign(keys, keys + n);
  order.resize(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  if (n < 2) return;

  int bits = 1;
  while ((key_max >> bits) > 0) ++bits;
  const int kDigitBits = 16;
  const int64_t kRadix = 1 << kDigitBits;
  const int passes = (bits + kDigitBits - 1) / kDigitBits;

  std::vector<int64_t> tmp_keys(n), tmp_order(n);
  std::vector<int64_t> hist(kRadix + 1);
  int64_t* src_k = sorted_keys.data();
  int64_t* src_o = order.data();
  int64_t* dst_k = tmp_keys.data();
  int64_t* dst_o = tmp_order.data();

  for (int p = 0; p < passes; ++p) {
    const int shift = p * kDigitBits;
    std::fill(hist.begin(), hist.end(), 0);
    for (int64_t i = 0; i < n; ++i)
      ++hist[((uint64_t)src_k[i] >> shift) & (kRadix - 1)];
    int64_t acc = 0;
    for (int64_t d = 0; d < kRadix; ++d) {
      int64_t c = hist[d];
      hist[d] = acc;
      acc += c;
    }
    for (int64_t i = 0; i < n; ++i) {
      int64_t pos = hist[((uint64_t)src_k[i] >> shift) & (kRadix - 1)]++;
      dst_k[pos] = src_k[i];
      dst_o[pos] = src_o[i];
    }
    std::swap(src_k, dst_k);
    std::swap(src_o, dst_o);
  }
  if (src_k != sorted_keys.data()) {
    std::memcpy(sorted_keys.data(), src_k, n * sizeof(int64_t));
    std::memcpy(order.data(), src_o, n * sizeof(int64_t));
  }
}

}  // namespace

extern "C" {

// keys: n contribution keys; entries equal to `invalid_key` are padding.
// Outputs: out_slot[n] (int32 slot per contribution, nnz_out for padding),
// uniq[<=n] unique valid keys ascending. Returns nnz_out.
int64_t galerkin_dedup(const int64_t* keys, int64_t n, int64_t invalid_key,
                       int32_t* out_slot, int64_t* uniq) {
  std::vector<int64_t> sorted_keys, order;
  parallel_sort_pairs(keys, n, invalid_key, sorted_keys, order);

  // sequential scan for unique assignment (cheap: single pass)
  int64_t nnz_out = 0;
  std::vector<int32_t> slot_sorted(n);
  int64_t prev = invalid_key;
  for (int64_t i = 0; i < n; ++i) {
    int64_t k = sorted_keys[i];
    if (k == invalid_key) {
      slot_sorted[i] = -1;  // patched below once nnz_out is known
      continue;
    }
    if (k != prev) {
      uniq[nnz_out] = k;
      ++nnz_out;
      prev = k;
    }
    slot_sorted[i] = (int32_t)(nnz_out - 1);
  }
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int32_t s = slot_sorted[i];
    out_slot[order[i]] = s < 0 ? (int32_t)nnz_out : s;
  }
  return nnz_out;
}

// Fused Galerkin contribution-key builder (replaces the numpy broadcast
// chain in sparse.make_galerkin_plan, which materialized ~1 GB of
// temporaries at 1M vertices).  Layout matches the device contraction
// contrib[a, b, k, i] flattened C-order.  Entries failing any mask get
// `big`.
void galerkin_keys(const int32_t* A_idx, const uint8_t* A_mask,
                   int64_t K, int64_t N,
                   const int32_t* U_cols, const uint8_t* U_mask, int64_t W,
                   int64_t ncoarse, int64_t big, int64_t* keys) {
#pragma omp parallel for collapse(3) schedule(static)
  for (int64_t a = 0; a < W; ++a)
    for (int64_t b = 0; b < W; ++b)
      for (int64_t k = 0; k < K; ++k) {
        const int32_t* arow = A_idx + k * N;
        const uint8_t* am = A_mask + k * N;
        const int32_t* ua = U_cols + a * N;
        const uint8_t* uam = U_mask + a * N;
        const int32_t* ub = U_cols + b * N;
        const uint8_t* ubm = U_mask + b * N;
        int64_t* out = keys + ((a * W + b) * K + k) * N;
        for (int64_t i = 0; i < N; ++i) {
          int64_t j = arow[i];
          bool ok = am[i] && uam[i] && ubm[j];
          out[i] = ok ? (int64_t)ua[i] * ncoarse + ub[j] : big;
        }
      }
}

// Radix argsort of int64 keys: fills sorted[n] and order[n] such that
// sorted[i] = keys[order[i]], ascending.  key_max bounds the bit width.
void sort_pairs_i64(const int64_t* keys, int64_t n, int64_t key_max,
                    int64_t* sorted, int64_t* order) {
  std::vector<int64_t> sk, od;
  parallel_sort_pairs(keys, n, key_max, sk, od);
  std::memcpy(sorted, sk.data(), n * sizeof(int64_t));
  std::memcpy(order, od.data(), n * sizeof(int64_t));
}

// Sorted unique of keys[n] into uniq (caller-allocated, size >= n).
// Returns the number of unique values.
int64_t unique_i64(const int64_t* keys, int64_t n, int64_t* uniq) {
  if (n == 0) return 0;
  std::vector<int64_t> tmp(keys, keys + n);
  int64_t mx = *std::max_element(tmp.begin(), tmp.end());
  std::vector<int64_t> sorted, order;
  parallel_sort_pairs(tmp.data(), n, mx, sorted, order);
  int64_t m = 0;
  int64_t prev = sorted[0] - 1;
  for (int64_t i = 0; i < n; ++i) {
    if (sorted[i] != prev) {
      uniq[m++] = sorted[i];
      prev = sorted[i];
    }
  }
  return m;
}

int native_version() { return 1; }

}  // extern "C"
