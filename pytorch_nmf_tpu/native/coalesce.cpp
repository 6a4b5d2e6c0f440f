// Native sparse-COO ingestion kernels.
//
// The host-side runtime work of the sparse path — sorting COO entries into
// canonical row-major order and summing duplicates ("coalescing", the
// contract torch.sparse_coo_tensor().coalesce() provides; consumed by the
// split beta-divergence solver in ops/sparse.py) — is pure CPU data
// movement and belongs in native code, not Python.  This translation unit
// builds into a small shared library loaded via ctypes.
//
// Functions are C-ABI, operate on caller-allocated buffers, and are
// parallelized with std::thread block sort + k-way merge for large inputs.
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
//            coalesce.cpp -o libpnt_native.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Entry {
  int64_t key;
  float val;
};

// Sort [begin, end) blocks in parallel then merge pairwise.
void parallel_sort(std::vector<Entry>& v) {
  const size_t n = v.size();
  unsigned hw = std::thread::hardware_concurrency();
  if (n < (1u << 16) || hw < 2) {
    std::sort(v.begin(), v.end(),
              [](const Entry& a, const Entry& b) { return a.key < b.key; });
    return;
  }
  unsigned nthreads = std::min<unsigned>(hw, 8);
  const size_t chunk = (n + nthreads - 1) / nthreads;
  std::vector<std::thread> workers;
  std::vector<size_t> bounds;
  bounds.push_back(0);
  for (unsigned t = 0; t < nthreads; ++t) {
    size_t lo = t * chunk;
    size_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    bounds.push_back(hi);
    workers.emplace_back([&v, lo, hi]() {
      std::sort(v.begin() + lo, v.begin() + hi,
                [](const Entry& a, const Entry& b) { return a.key < b.key; });
    });
  }
  for (auto& w : workers) w.join();
  // pairwise in-place merges
  while (bounds.size() > 2) {
    std::vector<size_t> next;
    next.push_back(0);
    for (size_t i = 0; i + 2 < bounds.size(); i += 2) {
      std::inplace_merge(
          v.begin() + bounds[i], v.begin() + bounds[i + 1],
          v.begin() + bounds[i + 2],
          [](const Entry& a, const Entry& b) { return a.key < b.key; });
      next.push_back(bounds[i + 2]);
    }
    if (bounds.size() % 2 == 0) next.push_back(bounds.back());
    bounds.swap(next);
  }
}

}  // namespace

extern "C" {

// Coalesce float32 COO entries addressed by flattened (row-major) indices.
// Writes sorted unique keys and summed values into out_* (size >= nnz) and
// returns the coalesced count.
int64_t pnt_coalesce_f32(const int64_t* flat, const float* vals, int64_t nnz,
                         int64_t* out_flat, float* out_vals) {
  if (nnz <= 0) return 0;
  std::vector<Entry> entries(static_cast<size_t>(nnz));
  for (int64_t i = 0; i < nnz; ++i) entries[i] = {flat[i], vals[i]};
  parallel_sort(entries);

  int64_t out = 0;
  out_flat[0] = entries[0].key;
  out_vals[0] = entries[0].val;
  for (int64_t i = 1; i < nnz; ++i) {
    if (entries[i].key == out_flat[out]) {
      out_vals[out] += entries[i].val;
    } else {
      ++out;
      out_flat[out] = entries[i].key;
      out_vals[out] = entries[i].val;
    }
  }
  return out + 1;
}

// Threshold-extract nonzeros from a dense row-major float32 matrix:
// writes flattened indices/values of entries > threshold, returns count.
// Two-pass parallel scan: per-thread counts, prefix offsets, then fill.
int64_t pnt_extract_f32(const float* dense, int64_t size, float threshold,
                        int64_t* out_flat, float* out_vals) {
  unsigned hw = std::thread::hardware_concurrency();
  unsigned nthreads = (size < (1 << 18) || hw < 2)
                          ? 1
                          : std::min<unsigned>(hw, 8);
  const int64_t chunk = (size + nthreads - 1) / nthreads;

  std::vector<int64_t> counts(nthreads, 0);
  std::vector<std::thread> workers;
  for (unsigned t = 0; t < nthreads; ++t) {
    workers.emplace_back([&, t]() {
      int64_t lo = t * chunk, hi = std::min<int64_t>(size, lo + chunk);
      int64_t c = 0;
      for (int64_t i = lo; i < hi; ++i) c += dense[i] > threshold;
      counts[t] = c;
    });
  }
  for (auto& w : workers) w.join();
  workers.clear();

  std::vector<int64_t> offsets(nthreads, 0);
  for (unsigned t = 1; t < nthreads; ++t)
    offsets[t] = offsets[t - 1] + counts[t - 1];
  const int64_t total = offsets[nthreads - 1] + counts[nthreads - 1];

  for (unsigned t = 0; t < nthreads; ++t) {
    workers.emplace_back([&, t]() {
      int64_t lo = t * chunk, hi = std::min<int64_t>(size, lo + chunk);
      int64_t o = offsets[t];
      for (int64_t i = lo; i < hi; ++i) {
        if (dense[i] > threshold) {
          out_flat[o] = i;
          out_vals[o] = dense[i];
          ++o;
        }
      }
    });
  }
  for (auto& w : workers) w.join();
  return total;
}

}  // extern "C"
