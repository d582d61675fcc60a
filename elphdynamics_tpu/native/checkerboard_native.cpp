// Native host-side graph preprocessing for the checkerboard decomposition.
//
// The greedy bond-grouping (ops/checkerboard.py:checkerboard_groups; same
// algorithm as the reference, Checkerboard.jl:471-515) is O(nbonds^2) and the
// dense-matrix assembly is O(nbonds * N) row updates — both pure host-side
// preprocessing on the critical path of model construction for large
// lattices. This translation unit provides C implementations loaded via
// ctypes (see native/__init__.py); the Python versions remain as the
// behavioural reference and fallback.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// table: [2, nb] row-major (site indices), groups: [nb] output (0-based ids).
// Returns the number of groups.
int64_t ckb_groups(const int64_t* table_i, const int64_t* table_j, int64_t nb,
                   int64_t nsites, int64_t* groups) {
    for (int64_t n = 0; n < nb; ++n) groups[n] = -1;
    std::vector<uint8_t> occupied(static_cast<size_t>(nsites));
    int64_t group = -1;
    int64_t assigned = 0;
    while (assigned < nb) {
        ++group;
        std::fill(occupied.begin(), occupied.end(), 0);
        for (int64_t n = 0; n < nb; ++n) {
            if (groups[n] >= 0) continue;
            const int64_t i = table_i[n];
            const int64_t j = table_j[n];
            if (occupied[i] || occupied[j]) continue;
            groups[n] = group;
            occupied[i] = 1;
            occupied[j] = 1;
            ++assigned;
        }
    }
    return group + 1;
}

// Dense checkerboard product: D <- E_{nb-1} ... E_0 (or the exact inverse
// when inverse != 0), with D a row-major [N, N] buffer pre-initialised to
// the identity by the caller. Mirrors ops/checkerboard.dense_matrix.
void ckb_dense(const int64_t* table_i, const int64_t* table_j, int64_t nb,
               int64_t nsites, const double* cosh_b, const double* sinh_b,
               int inverse, double* D) {
    std::vector<double> row_i(static_cast<size_t>(nsites));
    std::vector<double> row_j(static_cast<size_t>(nsites));
    for (int64_t k = 0; k < nb; ++k) {
        const int64_t n = inverse ? (nb - 1 - k) : k;
        const int64_t i = table_i[n];
        const int64_t j = table_j[n];
        const double c = cosh_b[n];
        const double s = inverse ? -sinh_b[n] : sinh_b[n];
        double* Di = D + i * nsites;
        double* Dj = D + j * nsites;
        for (int64_t m = 0; m < nsites; ++m) {
            const double ri = Di[m];
            const double rj = Dj[m];
            Di[m] = c * ri + s * rj;
            Dj[m] = c * rj + s * ri;
        }
    }
}

// Neighbor-table duplicate removal (Lattices.jl:297-313): keep[n] = 1 if the
// (unordered) pair first appears at n.
void dedup_pairs(const int64_t* a, const int64_t* b, int64_t n, uint8_t* keep) {
    for (int64_t i = 0; i < n; ++i) keep[i] = 1;
    for (int64_t i = 0; i < n - 1; ++i) {
        if (!keep[i]) continue;
        for (int64_t j = i + 1; j < n; ++j) {
            if ((a[i] == a[j] && b[i] == b[j]) || (a[i] == b[j] && b[i] == a[j]))
                keep[j] = 0;
        }
    }
}

}  // extern "C"
