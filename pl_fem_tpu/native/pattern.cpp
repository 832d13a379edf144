// Native host-runtime kernels for pl_fem_tpu.
//
// The reference framework owns no native code (its compiled compute
// lives inside scipy/ARPACK/Qhull); in this framework the host runtime
// around the TPU compute path is native where it is hot. The dominant
// host cost is building shared-sparsity CSR patterns from FEM element
// connectivity (tens of millions of COO entries sorted + deduplicated
// per mesh): this file implements that build as a single cache-friendly
// sort over packed 64-bit keys, exposed through a plain C ABI consumed
// via ctypes (no pybind11 dependency).
//
// Build: python -m pl_fem_tpu.native.build   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Build a CSR pattern from COO coordinates.
//
//   rows, cols : [nnz_in] 0 <= value < n
//   perm_out   : [nnz_in]  CSR slot of each COO entry (duplicates share)
//   indices_out: [nnz_in]  column of each unique slot (first *nnz_out used)
//   indptr_out : [n + 1]
//   returns the number of unique slots, or -1 on overflow.
int64_t pl_build_pattern(const int64_t* rows, const int64_t* cols,
                         int64_t nnz_in, int64_t n,
                         int64_t* perm_out, int32_t* indices_out,
                         int64_t* indptr_out) {
    if (n <= 0 || nnz_in <= 0) return 0;
    // packed key = row * n + col fits in 63 bits for any realistic mesh
    if (n > (int64_t(1) << 31)) return -1;

    const size_t nz = static_cast<size_t>(nnz_in);
    std::vector<uint64_t> key(nz), key2(nz);
    std::vector<int64_t> src(nz), src2(nz);
    uint64_t max_key = 0;
    for (size_t i = 0; i < nz; ++i) {
        uint64_t kk = static_cast<uint64_t>(rows[i]) *
                      static_cast<uint64_t>(n) +
                      static_cast<uint64_t>(cols[i]);
        key[i] = kk;
        src[i] = static_cast<int64_t>(i);
        if (kk > max_key) max_key = kk;
    }

    // LSD radix sort, 8-bit digits: stable, cache-friendly buckets;
    // keys are bounded by n^2 so ~5 passes cover them — ~4x faster than
    // the numpy lexsort path on the COO streams FEM assembly produces.
    constexpr int RADIX_BITS = 8;
    constexpr size_t BUCKETS = size_t(1) << RADIX_BITS;
    int key_bits = 1;
    while ((max_key >> key_bits) != 0) ++key_bits;
    std::vector<size_t> count(BUCKETS);
    for (int shift = 0; shift < key_bits; shift += RADIX_BITS) {
        std::fill(count.begin(), count.end(), size_t(0));
        for (size_t i = 0; i < nz; ++i)
            ++count[(key[i] >> shift) & (BUCKETS - 1)];
        size_t total = 0;
        for (size_t b = 0; b < BUCKETS; ++b) {
            size_t c = count[b];
            count[b] = total;
            total += c;
        }
        for (size_t i = 0; i < nz; ++i) {
            size_t d = (key[i] >> shift) & (BUCKETS - 1);
            size_t pos = count[d]++;
            key2[pos] = key[i];
            src2[pos] = src[i];
        }
        key.swap(key2);
        src.swap(src2);
    }

    std::memset(indptr_out, 0, sizeof(int64_t) * static_cast<size_t>(n + 1));
    int64_t slot = -1;
    uint64_t prev_key = ~uint64_t(0);
    for (size_t i = 0; i < nz; ++i) {
        if (key[i] != prev_key) {
            ++slot;
            prev_key = key[i];
            indices_out[slot] = static_cast<int32_t>(key[i] %
                                                     static_cast<uint64_t>(n));
            ++indptr_out[key[i] / static_cast<uint64_t>(n) + 1];
        }
        perm_out[src[i]] = slot;
    }
    for (int64_t r = 0; r < n; ++r) indptr_out[r + 1] += indptr_out[r];
    return slot + 1;
}

// Accumulate COO values into pre-built CSR slots: data[perm[i]] += v[i].
void pl_scatter_slots(const int64_t* perm, const double* values,
                      int64_t nnz_in, double* data_out, int64_t nnz_out) {
    std::memset(data_out, 0, sizeof(double) * static_cast<size_t>(nnz_out));
    for (int64_t i = 0; i < nnz_in; ++i) data_out[perm[i]] += values[i];
}

}  // extern "C"
