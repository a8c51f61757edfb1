// mmtpu native host kernels.
//
// The reference keeps all of its native compute in external dependencies
// (torchvision NMS, hnswlib, OpenCV — SURVEY.md §2.3); this library is the
// framework's own native runtime for the host-side hot paths:
//
//  * exact float64 greedy NMS with the stage-3 class-aware semantics
//    (3_combine_grids.py:80-138) and the torchvision-style class-agnostic
//    variant (1_doclayout_bboxes.py:219-223) — bit-identical keep sets and
//    selection order to the Python/NumPy host path;
//  * pairwise IoU matrix (float64);
//  * brute-force cosine top-k over a float32 corpus with a boolean
//    metadata mask (the host fallback of the store's TPU matmul+top_k).
//
// Exposed with a plain C ABI for ctypes. Build: `make -C native`.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

extern "C" {

// IoU between two xyxy boxes, mirroring the reference's arithmetic order
// (clamped intersection, union = a1 + a2 - inter, 0 when union <= 0).
static inline double iou_one(const double* a, const double* b) {
  const double x_left = std::max(a[0], b[0]);
  const double y_top = std::max(a[1], b[1]);
  const double x_right = std::min(a[2], b[2]);
  const double y_bottom = std::min(a[3], b[3]);
  const double iw = x_right - x_left;
  const double ih = y_bottom - y_top;
  const double inter = std::max(0.0, iw) * std::max(0.0, ih);
  const double area_a = (a[2] - a[0]) * (a[3] - a[1]);
  const double area_b = (b[2] - b[0]) * (b[3] - b[1]);
  const double uni = area_a + area_b - inter;
  return uni > 0.0 ? inter / uni : 0.0;
}

void iou_matrix(const double* boxes_a, int64_t na, const double* boxes_b,
                int64_t nb, double* out) {
  for (int64_t i = 0; i < na; ++i) {
    for (int64_t j = 0; j < nb; ++j) {
      out[i * nb + j] = iou_one(boxes_a + 4 * i, boxes_b + 4 * j);
    }
  }
}

// Greedy NMS. classes == nullptr -> class-agnostic. Returns the number of
// kept boxes; indices (selection order: descending score, first index wins
// ties) written to out_keep.
int64_t greedy_nms(const double* boxes, const double* scores,
                   const double* classes, int64_t n, double iou_threshold,
                   int64_t* out_keep) {
  if (n <= 0) return 0;
  std::vector<uint8_t> alive(n, 1);
  int64_t kept = 0;
  for (int64_t step = 0; step < n; ++step) {
    // first max among alive (matches scores.index(max(scores)))
    int64_t best = -1;
    double best_score = -std::numeric_limits<double>::infinity();
    for (int64_t i = 0; i < n; ++i) {
      if (alive[i] && scores[i] > best_score) {
        best_score = scores[i];
        best = i;
      }
    }
    if (best < 0) break;
    out_keep[kept++] = best;
    alive[best] = 0;
    const double* bb = boxes + 4 * best;
    for (int64_t i = 0; i < n; ++i) {
      if (!alive[i]) continue;
      if (classes != nullptr && classes[i] != classes[best]) continue;
      if (iou_one(bb, boxes + 4 * i) > iou_threshold) alive[i] = 0;
    }
  }
  return kept;
}

// Cosine top-k: corpus (n, d) float32 rows assumed unit-normalized; query
// (d,) unit-normalized; mask (n,) uint8 row filter (nullptr = all).
// Writes up to k (index, similarity) pairs, best first. Returns count.
int64_t cosine_topk(const float* corpus, int64_t n, int64_t d,
                    const float* query, const uint8_t* mask, int64_t k,
                    int64_t* out_idx, float* out_sim) {
  std::vector<std::pair<float, int64_t>> sims;
  sims.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    if (mask != nullptr && !mask[i]) continue;
    const float* row = corpus + i * d;
    float acc = 0.0f;
    for (int64_t j = 0; j < d; ++j) acc += row[j] * query[j];
    sims.emplace_back(acc, i);
  }
  const int64_t kk = std::min<int64_t>(k, (int64_t)sims.size());
  std::partial_sort(
      sims.begin(), sims.begin() + kk, sims.end(),
      [](const auto& a, const auto& b) {
        // descending similarity, ascending index on ties (stable ranking)
        if (a.first != b.first) return a.first > b.first;
        return a.second < b.second;
      });
  for (int64_t i = 0; i < kk; ++i) {
    out_idx[i] = sims[i].second;
    out_sim[i] = sims[i].first;
  }
  return kk;
}

// Edge-filter predicate over a batch (2_edge_box_filter.py:44-90 contract).
void internal_edge_mask(const double* boxes, int64_t n, const double* cell,
                        double image_width, double image_height,
                        double threshold, uint8_t* out) {
  const double cx0 = cell[0], cy0 = cell[1], cx1 = cell[2], cy1 = cell[3];
  const bool right_internal = std::abs(cx1 - image_width) > threshold;
  const bool bottom_internal = std::abs(cy1 - image_height) > threshold;
  const bool left_internal = cx0 > threshold;
  const bool top_internal = cy0 > threshold;
  for (int64_t i = 0; i < n; ++i) {
    const double* b = boxes + 4 * i;
    bool touch = false;
    if (right_internal && b[2] >= cx1 - threshold) touch = true;
    else if (bottom_internal && b[3] >= cy1 - threshold) touch = true;
    else if (left_internal && b[0] <= cx0 + threshold) touch = true;
    else if (top_internal && b[1] <= cy0 + threshold) touch = true;
    out[i] = touch ? 1 : 0;
  }
}

}  // extern "C"
