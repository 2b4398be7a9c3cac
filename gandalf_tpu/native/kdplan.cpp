// Native host-side planners for gandalf_tpu.
//
// TPU-native split of the reference's runtime: device compute is JAX/XLA,
// but the host-side planning passes (the analogue of KDTree::BuildTree's
// recursive longest-axis median splits, reference src/Tree/KDTree.cpp:442-595)
// are latency-critical CPU code that runs every tree-rebuild cadence.  The
// numpy implementation needs seconds per million particles on this class of
// host; this C++ version is O(N log G) with nth_element and runs in tens of
// milliseconds.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Task {
  int64_t lo, hi;   // particle index range [lo, hi)
  double box_lo[8];
  double box_hi[8];
};

}  // namespace

extern "C" {

// KD bucket planner: splits [0, N) by longest-axis medians until every
// bucket holds <= leaf_size particles.  Writes bucket-major particle ids
// into gmap (G_pad x leaf_size, -1 padded) and returns the number of
// buckets used, or -1 if G_pad is too small.
//
//   r         : (N x ndim) float64 positions
//   idx_tmp   : (N,) int64 scratch (any contents)
//   gmap      : (G_pad * leaf_size) int32, pre-filled with -1 by caller
int64_t kd_plan_buckets(const double* r, int64_t N, int32_t ndim,
                        int32_t leaf_size, int32_t* gmap, int64_t G_pad) {
  if (N <= 0 || ndim <= 0 || leaf_size <= 0 || ndim > 8) return 0;
  std::vector<int64_t> idx(N);
  for (int64_t i = 0; i < N; ++i) idx[i] = i;

  // root bounding box (the only full scan; children use split-plane boxes,
  // which are exact enough for axis choice — the device-side stocking
  // recomputes tight boxes from live particle positions anyway)
  Task root{0, N, {}, {}};
  for (int k = 0; k < ndim; ++k) {
    root.box_lo[k] = 1e300;
    root.box_hi[k] = -1e300;
  }
  for (int64_t i = 0; i < N; ++i) {
    const double* p = r + i * ndim;
    for (int k = 0; k < ndim; ++k) {
      if (p[k] < root.box_lo[k]) root.box_lo[k] = p[k];
      if (p[k] > root.box_hi[k]) root.box_hi[k] = p[k];
    }
  }

  std::vector<Task> stack;
  stack.push_back(root);
  int64_t next_bucket = 0;

  while (!stack.empty()) {
    Task t = stack.back();
    stack.pop_back();
    const int64_t n = t.hi - t.lo;
    if (n <= leaf_size) {
      if (next_bucket >= G_pad) return -1;
      int32_t* row = gmap + next_bucket * leaf_size;
      for (int64_t i = 0; i < n; ++i)
        row[i] = static_cast<int32_t>(idx[t.lo + i]);
      ++next_bucket;
      continue;
    }
    int axis = 0;
    double best = -1.0;
    for (int k = 0; k < ndim; ++k) {
      const double ext = t.box_hi[k] - t.box_lo[k];
      if (ext > best) {
        best = ext;
        axis = k;
      }
    }
    const int64_t mid = t.lo + (n + 1) / 2;
    std::nth_element(idx.begin() + t.lo, idx.begin() + mid,
                     idx.begin() + t.hi,
                     [r, ndim, axis](int64_t a, int64_t b) {
                       return r[a * ndim + axis] < r[b * ndim + axis];
                     });
    const double split = r[idx[mid] * ndim + axis];
    Task upper = t;
    upper.lo = mid;
    upper.box_lo[axis] = split;
    Task lower = t;
    lower.hi = mid;
    lower.box_hi[axis] = split;
    // push upper half first so the lower half is processed next (keeps
    // bucket ids in near-spatial order for the implicit pairing above)
    stack.push_back(upper);
    stack.push_back(lower);
  }
  return next_bucket;
}

// Cell binning helper for the structured grid: computes flattened cell ids
// (row-major over ncells) with clamping.  Used by the grid27 planner's
// host-side occupancy histogram.
void grid_cell_ids(const double* r, int64_t N, int32_t ndim,
                   const double* lo, const double* inv_cell,
                   const int64_t* ncells, int64_t* out) {
  for (int64_t i = 0; i < N; ++i) {
    int64_t id = 0;
    for (int k = 0; k < ndim; ++k) {
      int64_t c = static_cast<int64_t>((r[i * ndim + k] - lo[k])
                                       * inv_cell[k]);
      if (c < 0) c = 0;
      if (c >= ncells[k]) c = ncells[k] - 1;
      id = id * ncells[k] + c;
    }
    out[i] = id;
  }
}

}  // extern "C"
