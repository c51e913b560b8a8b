// Native host-side mesh/topology kernels.
//
// The reference delegates mesh topology (facet/edge extraction,
// connectivity) to the dolfin C++ core; here the equivalent setup-time
// work runs through these kernels when the shared library is built
// (navierstokes_tpu.native builds it with g++ on first use), with a NumPy
// fallback otherwise.  Loaded via ctypes -- no pybind11 dependency.
//
// Functions operate on raw int32 buffers:
//   unique_rows_i32     -- deduplicate fixed-width int32 rows
//                          (np.unique(axis=0) semantics: unique rows in
//                          lexicographic order, inverse map, counts)
//   build_transpose_i32 -- counting-sort ELL transpose table
//                          (node -> contributing flat slots, padded)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Returns the number of unique rows; fills out_unique (capacity
// n_rows*width), out_inverse (n_rows), out_counts (capacity n_rows).
long long unique_rows_i32(const int32_t* rows, long long n_rows, int width,
                          int32_t* out_unique, long long* out_inverse,
                          long long* out_counts) {
    if (n_rows <= 0) return 0;
    std::vector<long long> order(n_rows);
    std::iota(order.begin(), order.end(), 0LL);

    auto less = [rows, width](long long a, long long b) {
        const int32_t* ra = rows + a * width;
        const int32_t* rb = rows + b * width;
        for (int k = 0; k < width; ++k) {
            if (ra[k] != rb[k]) return ra[k] < rb[k];
        }
        return false;
    };
    std::sort(order.begin(), order.end(), less);

    auto equal = [rows, width](long long a, long long b) {
        return std::memcmp(rows + a * width, rows + b * width,
                           sizeof(int32_t) * width) == 0;
    };

    long long n_unique = 0;
    for (long long i = 0; i < n_rows; ++i) {
        long long idx = order[i];
        if (i == 0 || !equal(idx, order[i - 1])) {
            std::memcpy(out_unique + n_unique * width, rows + idx * width,
                        sizeof(int32_t) * width);
            if (out_counts) out_counts[n_unique] = 0;
            ++n_unique;
        }
        out_inverse[idx] = n_unique - 1;
        if (out_counts) out_counts[n_unique - 1] += 1;
    }
    return n_unique;
}

// Counting-sort transpose table.  flat_nodes: n_flat values in
// [0, n_nodes).  out_table has capacity n_nodes * k; pad entries are
// n_flat.  If k <= 0, only computes and returns the required K (max
// valence) without writing the table.  Returns K, or -1 if k < K.
long long build_transpose_i32(const int32_t* flat_nodes, long long n_flat,
                              long long n_nodes, long long k,
                              int32_t* out_table) {
    std::vector<long long> counts(n_nodes, 0);
    for (long long i = 0; i < n_flat; ++i) counts[flat_nodes[i]] += 1;
    long long K = 0;
    for (long long n = 0; n < n_nodes; ++n) K = std::max(K, counts[n]);
    if (k <= 0) return K;
    if (k < K) return -1;

    for (long long i = 0; i < n_nodes * k; ++i)
        out_table[i] = static_cast<int32_t>(n_flat);
    std::vector<long long> fill(n_nodes, 0);
    for (long long i = 0; i < n_flat; ++i) {
        long long node = flat_nodes[i];
        out_table[node * k + fill[node]] = static_cast<int32_t>(i);
        fill[node] += 1;
    }
    return K;
}

}  // extern "C"
