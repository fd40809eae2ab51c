// Native brute-force descriptor matcher for the VO host tail.
//
// Role: the reference's VO pipeline reaches OpenCV's C++ BFMatcher through
// cv2 (src/visual_odometry/feature_matcher.py:234-249, knnMatch k=2 +
// ratio test + one-to-one dedup). This is our own native implementation:
// blocked L2 distance with OpenMP over queries and a fused top-2 scan, so
// the (N1 x N2 x C) work never materializes a distance matrix.
//
// Exposed C ABI (ctypes):
//   knn2_l2(d1, n1, d2, n2, dim, idx_out[2*n1], dist_out[2*n1])
//   ratio_match_one_to_one(d1, n1, d2, n2, dim, ratio,
//                          idx1_out[n1], idx2_out[n1], dist_out[n1]) -> n
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC matcher.cpp -o libmatcher.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// For each row of d1, find the 2 nearest rows of d2 by squared L2.
void knn2_l2(const float* d1, int n1, const float* d2, int n2, int dim,
             int32_t* idx_out, float* dist_out) {
  // precompute |d2|^2
  std::vector<float> nb(n2);
#pragma omp parallel for schedule(static)
  for (int j = 0; j < n2; ++j) {
    float s = 0.f;
    const float* row = d2 + (size_t)j * dim;
    for (int c = 0; c < dim; ++c) s += row[c] * row[c];
    nb[j] = s;
  }

#pragma omp parallel for schedule(static)
  for (int i = 0; i < n1; ++i) {
    const float* q = d1 + (size_t)i * dim;
    float qa = 0.f;
    for (int c = 0; c < dim; ++c) qa += q[c] * q[c];

    float best = std::numeric_limits<float>::max();
    float second = std::numeric_limits<float>::max();
    int bi = -1, si = -1;
    for (int j = 0; j < n2; ++j) {
      const float* row = d2 + (size_t)j * dim;
      float dot = 0.f;
      // the inner product vectorizes under -O3 -march=native
      for (int c = 0; c < dim; ++c) dot += q[c] * row[c];
      float d = qa + nb[j] - 2.f * dot;
      if (d < best) {
        second = best; si = bi;
        best = d; bi = j;
      } else if (d < second) {
        second = d; si = j;
      }
    }
    idx_out[2 * i] = bi;
    idx_out[2 * i + 1] = si;
    dist_out[2 * i] = best > 0.f ? std::sqrt(best) : 0.f;
    dist_out[2 * i + 1] = second > 0.f ? std::sqrt(second) : 0.f;
  }
}

// Lowe ratio test + one-to-one train-index dedup keeping the smallest
// distance (feature_matcher.py:179-209 semantics). Returns match count.
int ratio_match_one_to_one(const float* d1, int n1, const float* d2, int n2,
                           int dim, float ratio, int32_t* idx1_out,
                           int32_t* idx2_out, float* dist_out) {
  if (n1 < 2 || n2 < 2) return 0;
  std::vector<int32_t> idx(2 * (size_t)n1);
  std::vector<float> dist(2 * (size_t)n1);
  knn2_l2(d1, n1, d2, n2, dim, idx.data(), dist.data());

  // best query per train index (serial pass; n1 is a few thousand)
  std::vector<float> best_for_train(n2, std::numeric_limits<float>::max());
  std::vector<int32_t> slot_for_train(n2, -1);
  int n = 0;
  for (int i = 0; i < n1; ++i) {
    float d0 = dist[2 * i], d1n = dist[2 * i + 1];
    if (d0 > ratio * d1n) continue;
    int t = idx[2 * i];
    if (slot_for_train[t] < 0) {
      best_for_train[t] = d0;
      slot_for_train[t] = n;
      idx1_out[n] = i;
      idx2_out[n] = t;
      dist_out[n] = d0;
      ++n;
    } else if (d0 < best_for_train[t]) {
      best_for_train[t] = d0;
      int s = slot_for_train[t];
      idx1_out[s] = i;
      dist_out[s] = d0;
    }
  }
  return n;
}

}  // extern "C"
