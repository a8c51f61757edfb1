// Native HNSW approximate-nearest-neighbor index (cosine space).
//
// The reference's vector store is ChromaDB over hnswlib
// (deprecated_package/db_operations.py:28-33: space=cosine, M=32,
// ef_construction=200, ef=200). The TPU store's default retrieval is an
// EXACT masked matmul+top-k (strictly better at the reference's corpus
// scale — see store/embedding_store.py); this index is the native-runtime
// equivalent of hnswlib for corpora large enough that an O(n·d) scan per
// query stops being free: the classic multi-layer skip-list graph
// (Malkov & Yashunin, arXiv 1603.09320) with hnswlib's neighbor-selection
// heuristic, bidirectional link pruning, and filtered layer-0 search.
//
// Determinism: level assignment uses a seeded xorshift64* stream; inserts
// are single-threaded in call order, so index builds are reproducible.
//
// Exposed with a plain C ABI for ctypes (opaque handle). Build: part of
// libmmtpu.so (`make -C native`).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <utility>
#include <vector>

namespace {

struct HnswIndex {
  int64_t dim = 0;
  int m = 16;               // max links per node on layers > 0
  int m0 = 32;              // max links on layer 0 (hnswlib: 2*M)
  int ef_construction = 200;
  double level_mult = 0.0;  // 1 / ln(M)
  uint64_t rng_state = 0;

  std::vector<float> data;  // n * dim, L2-normalized rows
  std::vector<int> levels;  // per node
  // links[node][layer] = neighbor ids (layer <= levels[node])
  std::vector<std::vector<std::vector<int>>> links;
  int entry = -1;
  int max_level = -1;

  int64_t size() const { return static_cast<int64_t>(levels.size()); }

  const float* vec(int i) const { return data.data() + int64_t(i) * dim; }

  // cosine distance over normalized rows: 1 - dot
  float dist(const float* a, const float* b) const {
    float dot = 0.f;
    for (int64_t d = 0; d < dim; ++d) dot += a[d] * b[d];
    return 1.0f - dot;
  }

  uint64_t next_rand() {
    // xorshift64* — deterministic across platforms
    uint64_t x = rng_state;
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    rng_state = x;
    return x * 0x2545F4914F6CDD1DULL;
  }

  int random_level() {
    // uniform in (0, 1]; floor(-ln(u) * mult) as in hnswlib
    const double u =
        (static_cast<double>(next_rand() >> 11) + 1.0) / 9007199254740992.0;
    return static_cast<int>(-std::log(u) * level_mult);
  }
};

using DistNode = std::pair<float, int>;  // (distance, node)

// Beam search within one layer: returns up to `ef` closest (dist, node)
// pairs as a max-heap-ordered vector (furthest first). `mask` (optional)
// gates RESULT collection only — masked nodes are still traversed, the
// standard filtered-HNSW behavior, so sparse filters don't disconnect
// the graph walk.
std::vector<DistNode> search_layer(const HnswIndex& ix, const float* q,
                                   int ep, int ef, int layer,
                                   const uint8_t* mask) {
  std::vector<uint8_t> visited(ix.size(), 0);
  // candidates: closest first; results: furthest first
  std::priority_queue<DistNode, std::vector<DistNode>, std::greater<DistNode>>
      candidates;
  std::priority_queue<DistNode> results;

  const float d0 = ix.dist(q, ix.vec(ep));
  visited[ep] = 1;
  candidates.emplace(d0, ep);
  if (!mask || mask[ep]) results.emplace(d0, ep);
  // traversal bound: distance of the worst collected result once full
  float bound = results.empty() ? std::numeric_limits<float>::infinity()
                                : results.top().first;

  while (!candidates.empty()) {
    const DistNode c = candidates.top();
    if (c.first > bound && static_cast<int>(results.size()) >= ef) break;
    candidates.pop();
    const auto& nbrs = ix.links[c.second][layer];
    for (int nb : nbrs) {
      if (visited[nb]) continue;
      visited[nb] = 1;
      const float d = ix.dist(q, ix.vec(nb));
      if (static_cast<int>(results.size()) < ef || d < bound) {
        candidates.emplace(d, nb);
        if (!mask || mask[nb]) {
          results.emplace(d, nb);
          if (static_cast<int>(results.size()) > ef) results.pop();
        }
        if (static_cast<int>(results.size()) >= ef) bound = results.top().first;
      }
    }
  }
  std::vector<DistNode> out;
  out.reserve(results.size());
  while (!results.empty()) {
    out.push_back(results.top());
    results.pop();
  }
  return out;  // furthest → closest
}

// hnswlib's getNeighborsByHeuristic2: walk candidates closest-first, keep
// a candidate only if it is closer to the base than to every already-kept
// neighbor (diversifies link directions; crucial for graph navigability).
std::vector<int> select_neighbors(const HnswIndex& ix,
                                  std::vector<DistNode> cands, int m) {
  std::sort(cands.begin(), cands.end());  // closest first
  std::vector<int> kept;
  for (const auto& c : cands) {
    if (static_cast<int>(kept.size()) >= m) break;
    bool good = true;
    for (int s : kept) {
      if (ix.dist(ix.vec(c.second), ix.vec(s)) < c.first) {
        good = false;
        break;
      }
    }
    if (good) kept.push_back(c.second);
  }
  return kept;
}

void link_bidirectional(HnswIndex& ix, int node, int layer,
                        const std::vector<int>& nbrs) {
  const int cap = layer == 0 ? ix.m0 : ix.m;
  ix.links[node][layer] = nbrs;
  for (int nb : nbrs) {
    auto& back = ix.links[nb][layer];
    back.push_back(node);
    if (static_cast<int>(back.size()) > cap) {
      // re-select the neighbor's links by the same heuristic
      std::vector<DistNode> cands;
      cands.reserve(back.size());
      for (int b : back) cands.emplace_back(ix.dist(ix.vec(nb), ix.vec(b)), b);
      back = select_neighbors(ix, std::move(cands), cap);
    }
  }
}

void insert(HnswIndex& ix, const float* v) {
  const int node = static_cast<int>(ix.size());
  const int level = ix.random_level();
  ix.data.insert(ix.data.end(), v, v + ix.dim);
  ix.levels.push_back(level);
  ix.links.emplace_back(level + 1);

  if (ix.entry < 0) {
    ix.entry = node;
    ix.max_level = level;
    return;
  }

  int ep = ix.entry;
  // greedy descent on layers above the new node's level
  for (int layer = ix.max_level; layer > level; --layer) {
    bool changed = true;
    float d = ix.dist(v, ix.vec(ep));
    while (changed) {
      changed = false;
      for (int nb : ix.links[ep][layer]) {
        const float dn = ix.dist(v, ix.vec(nb));
        if (dn < d) {
          d = dn;
          ep = nb;
          changed = true;
        }
      }
    }
  }
  // beam + heuristic linking on layers <= level
  for (int layer = std::min(level, ix.max_level); layer >= 0; --layer) {
    auto cands =
        search_layer(ix, v, ep, ix.ef_construction, layer, nullptr);
    const int cap = layer == 0 ? ix.m0 : ix.m;
    auto nbrs = select_neighbors(ix, cands, cap);
    link_bidirectional(ix, node, layer, nbrs);
    // closest candidate seeds the next layer down
    if (!cands.empty()) ep = cands.back().second;
  }
  if (level > ix.max_level) {
    ix.max_level = level;
    ix.entry = node;
  }
}

}  // namespace

extern "C" {

void* hnsw_new(int64_t dim, int m, int ef_construction, uint64_t seed) {
  auto* ix = new HnswIndex();
  ix->dim = dim;
  // m < 2 would make level_mult = 1/log(m) inf/NaN (undefined int cast in
  // random_level) — clamp to the smallest navigable degree
  if (m < 2) m = 2;
  if (ef_construction < 1) ef_construction = 1;
  ix->m = m;
  ix->m0 = 2 * m;
  ix->ef_construction = ef_construction;
  ix->level_mult = 1.0 / std::log(static_cast<double>(m));
  ix->rng_state = seed ? seed : 0x9E3779B97F4A7C15ULL;
  return ix;
}

void hnsw_free(void* handle) { delete static_cast<HnswIndex*>(handle); }

int64_t hnsw_size(void* handle) {
  return static_cast<HnswIndex*>(handle)->size();
}

// Append n vectors (row-major n x dim). Rows are L2-normalized into the
// index (cosine space); labels are implicit: insertion order 0..n-1.
void hnsw_add(void* handle, const float* vecs, int64_t n) {
  auto* ix = static_cast<HnswIndex*>(handle);
  std::vector<float> row(ix->dim);
  for (int64_t i = 0; i < n; ++i) {
    const float* src = vecs + i * ix->dim;
    double norm = 0.0;
    for (int64_t d = 0; d < ix->dim; ++d) norm += double(src[d]) * src[d];
    const float inv = norm > 0 ? static_cast<float>(1.0 / std::sqrt(norm))
                               : 0.f;
    for (int64_t d = 0; d < ix->dim; ++d) row[d] = src[d] * inv;
    insert(*ix, row.data());
  }
}

// Filtered k-NN for nq queries (row-major nq x dim). mask: per-node uint8
// (may be null = no filter). Writes k (index, cosine-distance) pairs per
// query, padded with (-1, inf) when fewer than k nodes match. Queries are
// normalized internally. Returns the number of valid results for the
// LAST query (informational).
int64_t hnsw_search(void* handle, const float* queries, int64_t nq,
                    int64_t k, int64_t ef, const uint8_t* mask,
                    int64_t* out_idx, float* out_dist) {
  auto* ix = static_cast<HnswIndex*>(handle);
  const int64_t n = ix->size();
  int64_t last_valid = 0;
  std::vector<float> q(ix->dim);
  for (int64_t qi = 0; qi < nq; ++qi) {
    int64_t* oi = out_idx + qi * k;
    float* od = out_dist + qi * k;
    for (int64_t j = 0; j < k; ++j) {
      oi[j] = -1;
      od[j] = std::numeric_limits<float>::infinity();
    }
    if (n == 0 || ix->entry < 0) continue;
    const float* src = queries + qi * ix->dim;
    double norm = 0.0;
    for (int64_t d = 0; d < ix->dim; ++d) norm += double(src[d]) * src[d];
    const float inv = norm > 0 ? static_cast<float>(1.0 / std::sqrt(norm))
                               : 0.f;
    for (int64_t d = 0; d < ix->dim; ++d) q[d] = src[d] * inv;

    int ep = ix->entry;
    float dep = ix->dist(q.data(), ix->vec(ep));
    for (int layer = ix->max_level; layer > 0; --layer) {
      bool changed = true;
      while (changed) {
        changed = false;
        for (int nb : ix->links[ep][layer]) {
          const float d = ix->dist(q.data(), ix->vec(nb));
          if (d < dep) {
            dep = d;
            ep = nb;
            changed = true;
          }
        }
      }
    }
    auto res = search_layer(*ix, q.data(), ep,
                            static_cast<int>(std::max(ef, k)), 0, mask);
    // res is furthest → closest; take the k closest
    const int64_t valid = std::min<int64_t>(k, res.size());
    for (int64_t j = 0; j < valid; ++j) {
      const auto& r = res[res.size() - 1 - j];
      oi[j] = r.second;
      od[j] = r.first;
    }
    last_valid = valid;
  }
  return last_valid;
}

}  // extern "C"
