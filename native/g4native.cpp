// g4native — host-side C++ geometry runtime for g4splat_tpu.
//
// Native counterpart of the reference's host-side C++/CUDA helpers
// (simple-knn's boxed Morton search, tetra-triangulation's CGAL binding,
// the sklearn KDTree in eval/mesh_eval.py): a 3D KD-tree with exact k-NN
// queries, Morton codes, and voxel downsampling — the hot host-side
// primitives of mesh evaluation, point-cloud dedup and scale seeding.
//
// Pure C ABI (ctypes binding in g4splat_tpu/native.py); no external deps.
// Build: make -C native   (emits libg4native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <vector>

namespace {

struct KDNode {
  int32_t left = -1;
  int32_t right = -1;
  int32_t axis = 0;
  int32_t begin = 0;   // leaf range into the index array
  int32_t end = 0;
  float split = 0.f;
};

struct KDTree {
  std::vector<float> pts;       // (n, 3) row-major copy
  std::vector<int32_t> index;   // permutation
  std::vector<KDNode> nodes;
  int32_t n = 0;
  static constexpr int kLeaf = 16;

  int32_t build(int32_t begin, int32_t end, int depth) {
    KDNode node;
    const int32_t id = static_cast<int32_t>(nodes.size());
    nodes.push_back(node);
    if (end - begin <= kLeaf) {
      nodes[id].begin = begin;
      nodes[id].end = end;
      return id;
    }
    // Split on the widest axis at the median.
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = begin; i < end; ++i) {
      const float* p = &pts[3 * index[i]];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], p[a]);
        hi[a] = std::max(hi[a], p[a]);
      }
    }
    int axis = 0;
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > hi[axis] - lo[axis]) axis = a;
    const int32_t mid = begin + (end - begin) / 2;
    std::nth_element(
        index.begin() + begin, index.begin() + mid, index.begin() + end,
        [&](int32_t a, int32_t b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
    nodes[id].axis = axis;
    nodes[id].split = pts[3 * index[mid] + axis];
    nodes[id].begin = -1;  // internal
    const int32_t l = build(begin, mid, depth + 1);
    const int32_t r = build(mid, end, depth + 1);
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }

  void knn(const float* q, int k, float* out_d, int32_t* out_i) const {
    // max-heap of (dist2, idx)
    using Pair = std::pair<float, int32_t>;
    std::priority_queue<Pair> heap;
    struct Frame { int32_t node; float dist2; };
    std::vector<Frame> stack;
    stack.push_back({0, 0.f});
    while (!stack.empty()) {
      Frame f = stack.back();
      stack.pop_back();
      if (static_cast<int>(heap.size()) == k && f.dist2 > heap.top().first)
        continue;
      const KDNode& nd = nodes[f.node];
      if (nd.begin >= 0) {  // leaf
        for (int32_t i = nd.begin; i < nd.end; ++i) {
          const int32_t pi = index[i];
          const float* p = &pts[3 * pi];
          const float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
          const float d2 = dx * dx + dy * dy + dz * dz;
          if (static_cast<int>(heap.size()) < k) {
            heap.push({d2, pi});
          } else if (d2 < heap.top().first) {
            heap.pop();
            heap.push({d2, pi});
          }
        }
        continue;
      }
      const float delta = q[nd.axis] - nd.split;
      const int32_t near = delta <= 0 ? nd.left : nd.right;
      const int32_t far = delta <= 0 ? nd.right : nd.left;
      stack.push_back({far, delta * delta});
      stack.push_back({near, 0.f});
    }
    int m = static_cast<int>(heap.size());
    for (int i = m - 1; i >= 0; --i) {
      out_d[i] = std::sqrt(heap.top().first);
      out_i[i] = heap.top().second;
      heap.pop();
    }
    for (int i = m; i < k; ++i) {
      out_d[i] = 1e30f;
      out_i[i] = -1;
    }
  }
};

uint32_t spread_bits(uint32_t v) {
  v &= 0x3FF;
  v = (v | (v << 16)) & 0x030000FF;
  v = (v | (v << 8)) & 0x0300F00F;
  v = (v | (v << 4)) & 0x030C30C3;
  v = (v | (v << 2)) & 0x09249249;
  return v;
}

}  // namespace

extern "C" {

// Build + query in one call: for each of m queries, the k nearest of n points.
// points (n*3), queries (m*3); out_dists (m*k), out_idx (m*k).
int g4_knn(const float* points, int32_t n, const float* queries, int32_t m,
           int32_t k, float* out_dists, int32_t* out_idx) {
  if (n <= 0 || m < 0 || k <= 0) return -1;
  KDTree tree;
  tree.n = n;
  tree.pts.assign(points, points + 3 * static_cast<size_t>(n));
  tree.index.resize(n);
  std::iota(tree.index.begin(), tree.index.end(), 0);
  tree.nodes.reserve(2 * n / KDTree::kLeaf + 4);
  tree.build(0, n, 0);
#pragma omp parallel for schedule(static)
  for (int32_t i = 0; i < m; ++i) {
    tree.knn(&queries[3 * static_cast<size_t>(i)], k,
             &out_dists[static_cast<size_t>(i) * k],
             &out_idx[static_cast<size_t>(i) * k]);
  }
  return 0;
}

// Mean squared distance to the 3 nearest neighbors (excluding self) — the
// simple-knn distCUDA2 contract for seeding splat scales.
int g4_mean_knn3_sq_dist(const float* points, int32_t n, float* out) {
  if (n <= 0) return -1;
  const int k = 4;  // self + 3
  std::vector<float> d(static_cast<size_t>(n) * k);
  std::vector<int32_t> idx(static_cast<size_t>(n) * k);
  int rc = g4_knn(points, n, points, n, k, d.data(), idx.data());
  if (rc != 0) return rc;
  for (int32_t i = 0; i < n; ++i) {
    float acc = 0.f;
    int cnt = 0;
    for (int j = 0; j < k && cnt < 3; ++j) {
      if (idx[static_cast<size_t>(i) * k + j] == i) continue;
      const float dist = d[static_cast<size_t>(i) * k + j];
      acc += dist * dist;
      ++cnt;
    }
    out[i] = cnt ? acc / cnt : 0.f;
  }
  return 0;
}

// 30-bit Morton codes on a 1024^3 grid over the bounding box.
int g4_morton_codes(const float* points, int32_t n, uint32_t* out) {
  if (n <= 0) return -1;
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int32_t i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], points[3 * i + a]);
      hi[a] = std::max(hi[a], points[3 * i + a]);
    }
  for (int32_t i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int a = 0; a < 3; ++a) {
      const float r = hi[a] - lo[a];
      float t = r > 1e-12f ? (points[3 * i + a] - lo[a]) / r : 0.f;
      q[a] = static_cast<uint32_t>(t * 1023.f);
    }
    out[i] = spread_bits(q[0]) | (spread_bits(q[1]) << 1) |
             (spread_bits(q[2]) << 2);
  }
  return 0;
}

// Voxel downsample: writes per-voxel mean points; returns the output count.
int g4_voxel_downsample(const float* points, int32_t n, float voxel,
                        float* out_points, int32_t max_out) {
  if (n <= 0 || voxel <= 0) return -1;
  struct Key {
    int64_t x, y, z;
    bool operator<(const Key& o) const {
      if (x != o.x) return x < o.x;
      if (y != o.y) return y < o.y;
      return z < o.z;
    }
  };
  std::vector<std::pair<Key, int32_t>> keys(n);
  for (int32_t i = 0; i < n; ++i) {
    keys[i] = {{static_cast<int64_t>(std::floor(points[3 * i] / voxel)),
                static_cast<int64_t>(std::floor(points[3 * i + 1] / voxel)),
                static_cast<int64_t>(std::floor(points[3 * i + 2] / voxel))},
               i};
  }
  std::sort(keys.begin(), keys.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
  int32_t out_n = 0;
  size_t i = 0;
  while (i < keys.size() && out_n < max_out) {
    size_t j = i;
    double acc[3] = {0, 0, 0};
    while (j < keys.size() && !(keys[i].first < keys[j].first) &&
           !(keys[j].first < keys[i].first)) {
      const float* p = &points[3 * keys[j].second];
      acc[0] += p[0];
      acc[1] += p[1];
      acc[2] += p[2];
      ++j;
    }
    const double cnt = static_cast<double>(j - i);
    out_points[3 * out_n] = static_cast<float>(acc[0] / cnt);
    out_points[3 * out_n + 1] = static_cast<float>(acc[1] / cnt);
    out_points[3 * out_n + 2] = static_cast<float>(acc[2] / cnt);
    ++out_n;
    i = j;
  }
  return out_n;
}

}  // extern "C"
