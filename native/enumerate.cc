// Native path-candidate enumerator.
//
// TPU-native replacement for the reference's Rust `differt_core.rt` crate
// (complete-graph path iteration consumed at reference
// differt2d/scene.py:154-174). Enumerates, in lexicographic order, every
// sequence of `order` node indices drawn from `allowed` with no two
// consecutive repeats, writing int32 rows into a caller-provided buffer.
//
// The inner loop is a carry-propagating odometer over "positions into
// `allowed` excluding the previous position", which emits rows in the same
// order as a depth-first traversal of the complete graph visiting
// neighbors in increasing index order.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <vector>

extern "C" {

// Returns the number of candidate rows for `m` allowed nodes and `order`
// interactions: m * (m - 1)^(order - 1); 0 if infeasible; 1 for order == 0.
int64_t num_candidates(int64_t m, int64_t order) {
  if (order == 0) return 1;
  if (m == 0 || (order >= 2 && m == 1)) return 0;
  int64_t total = m;
  for (int64_t j = 1; j < order; ++j) total *= (m - 1);
  return total;
}

// Fills `out` (shape [num_candidates(m, order), order], row-major int32)
// with all candidates over the `m` node indices in `allowed`.
// Returns the number of rows written.
int64_t enumerate_paths(const int32_t* allowed, int64_t m, int64_t order,
                        int32_t* out) {
  const int64_t total = num_candidates(m, order);
  if (order == 0 || total == 0) return total;

  // Odometer digits: digit 0 in [0, m), digits 1..order-1 in [0, m-1).
  std::vector<int64_t> digits(order, 0);
  // Current row as positions into `allowed` (after skip-the-previous map).
  std::vector<int64_t> pos(order, 0);

  for (int64_t row = 0; row < total; ++row) {
    pos[0] = digits[0];
    for (int64_t j = 1; j < order; ++j) {
      int64_t d = digits[j];
      // The d-th allowed position once the previous one is removed.
      pos[j] = d + (d >= pos[j - 1] ? 1 : 0);
    }
    int32_t* dst = out + row * order;
    for (int64_t j = 0; j < order; ++j) dst[j] = allowed[pos[j]];

    // Increment odometer, last digit fastest (lexicographic rows).
    for (int64_t j = order - 1; j >= 0; --j) {
      const int64_t radix = (j == 0) ? m : m - 1;
      if (++digits[j] < radix) break;
      digits[j] = 0;
    }
  }
  return total;
}

}  // extern "C"
