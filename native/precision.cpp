// Sparse banded spatial-precision builder.
//
// Native equivalent of the reference's numba-JIT loops
// (examples/spatial/model.py:53-88): entries tau^D((i,j),(k,l)) for Manhattan
// distance D <= r_y on a d x d grid, emitted in COO layout. The reference's
// only compiled-at-runtime component; here a proper C++ library with a
// ctypes binding (see aux_ssm_tpu/native/precision.py).
//
// Two-pass API so the caller owns all allocations:
//   precision_count(tau, r_y, d)            -> number of nonzeros
//   precision_fill(tau, r_y, d, data, rows, cols)
#include <cstdint>
#include <cmath>

extern "C" {

int64_t precision_count(double /*tau*/, double r_y, int64_t d) {
    const int64_t r = static_cast<int64_t>(r_y);
    int64_t count = 0;
    for (int64_t i = 0; i < d; ++i) {
        for (int64_t j = 0; j < d; ++j) {
            // Neighbours within the Manhattan ball of radius r, clipped to grid.
            for (int64_t di = -r; di <= r; ++di) {
                const int64_t k = i + di;
                if (k < 0 || k >= d) continue;
                const int64_t rem = r - (di < 0 ? -di : di);
                for (int64_t dj = -rem; dj <= rem; ++dj) {
                    const int64_t l = j + dj;
                    if (l < 0 || l >= d) continue;
                    ++count;
                }
            }
        }
    }
    return count;
}

void precision_fill(double tau, double r_y, int64_t d,
                    double* data, int64_t* rows, int64_t* cols) {
    const int64_t r = static_cast<int64_t>(r_y);
    int64_t n = 0;
    for (int64_t i = 0; i < d; ++i) {
        for (int64_t j = 0; j < d; ++j) {
            const int64_t row = i * d + j;
            for (int64_t di = -r; di <= r; ++di) {
                const int64_t k = i + di;
                if (k < 0 || k >= d) continue;
                const int64_t adi = di < 0 ? -di : di;
                const int64_t rem = r - adi;
                for (int64_t dj = -rem; dj <= rem; ++dj) {
                    const int64_t l = j + dj;
                    if (l < 0 || l >= d) continue;
                    const int64_t D = adi + (dj < 0 ? -dj : dj);
                    data[n] = std::pow(tau, static_cast<double>(D));
                    rows[n] = row;
                    cols[n] = k * d + l;
                    ++n;
                }
            }
        }
    }
}

}  // extern "C"
