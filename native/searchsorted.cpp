// Batched row-wise binary search — native parity artifact.
//
// Role of the reference's torchsearchsorted C++/CUDA extension
// (torchsearchsorted/src/cpu/searchsorted_cpu_wrapper.cpp:42-126): for each
// row, find for every value v the index idx such that
//   side=left :  a[row, idx-1] <  v <= a[row, idx]
//   side=right:  a[row, idx-1] <= v <  a[row, idx]
// i.e. numpy's searchsorted contract. Rows broadcast: if either input has one
// row it is shared across the other's rows.
//
// This host-side kernel exists for parity testing against the numpy oracle
// and as the native companion of the TPU path (the train path uses the
// branchless VPU formulation in ops/sampling.py). Exposed with a plain C ABI
// for ctypes; OpenMP-free (deterministic, trivially small inputs).

#include <cstdint>

namespace {

// numpy's searchsorted uses the same total order as np.sort: NaN compares
// greater than every number (so a NaN query lands at the end, and NaN
// entries in `a` sort last). Plain IEEE comparisons would return 0 for a
// NaN query instead. For integer T these reduce to the plain comparisons.
template <typename T>
bool total_lt(T a, T b) {
  if (a != a) return false;  // NaN < anything: false
  if (b != b) return true;   // number < NaN: true
  return a < b;
}

template <typename T>
int64_t bisect(const T* row, int64_t n, T v, bool right) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    bool go_right = right ? !total_lt(v, row[mid]) : total_lt(row[mid], v);
    if (go_right) {
      lo = mid + 1;
    } else {
      hi = mid;
    }
  }
  return lo;
}

template <typename T>
void searchsorted_impl(const T* a, int64_t a_rows, int64_t a_cols,
                       const T* v, int64_t v_rows, int64_t v_cols,
                       int64_t* out, bool right) {
  int64_t rows = a_rows > v_rows ? a_rows : v_rows;
  for (int64_t r = 0; r < rows; ++r) {
    const T* arow = a + (a_rows == 1 ? 0 : r) * a_cols;
    const T* vrow = v + (v_rows == 1 ? 0 : r) * v_cols;
    int64_t* orow = out + r * v_cols;
    for (int64_t c = 0; c < v_cols; ++c) {
      orow[c] = bisect(arow, a_cols, vrow[c], right);
    }
  }
}

}  // namespace

extern "C" {

void searchsorted_f32(const float* a, int64_t a_rows, int64_t a_cols,
                      const float* v, int64_t v_rows, int64_t v_cols,
                      int64_t* out, int32_t side_right) {
  searchsorted_impl(a, a_rows, a_cols, v, v_rows, v_cols, out,
                    side_right != 0);
}

void searchsorted_f64(const double* a, int64_t a_rows, int64_t a_cols,
                      const double* v, int64_t v_rows, int64_t v_cols,
                      int64_t* out, int32_t side_right) {
  searchsorted_impl(a, a_rows, a_cols, v, v_rows, v_cols, out,
                    side_right != 0);
}

}  // extern "C"
