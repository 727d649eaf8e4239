// himo_native — host-side runtime primitives for the himo_tpu framework.
//
// The TPU owns the per-point compute path; this library owns the host hot
// loops around it (the roles the reference delegates to scipy cKDTree /
// mmcv CUDA / Python file IO):
//   * a bucketed 3-D KD-tree with multi-threaded nearest-neighbor queries
//     (eval-time Chamfer, SSL dynamic-point labeling),
//   * symmetric Chamfer distance in one call,
//   * raw attribute-file readers for Scania superframes,
//   * a multi-threaded pad-and-stack batch packer feeding the device.
//
// C ABI only; Python binds via ctypes (no pybind11 in the image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int kLeafSize = 16;

// Bucketed KD-tree: points are reordered into contiguous storage; leaves
// hold [lo, hi) ranges scanned linearly (cache/SIMD friendly).
struct KDTree {
  std::vector<float> pts;    // 3 * n, reordered
  std::vector<int32_t> ids;  // n, original row of each reordered point
  struct Node {
    float split;
    int16_t axis;  // -1 for leaf
    int32_t left, right;  // children (internal) or
    int32_t lo, hi;       // range (leaf)
  };
  std::vector<Node> nodes;
  int32_t root = -1;
};

int32_t build(KDTree& t, int lo, int hi) {
  KDTree::Node node{};
  const int32_t id = static_cast<int32_t>(t.nodes.size());
  t.nodes.push_back(node);
  if (hi - lo <= kLeafSize) {
    t.nodes[id] = {0.f, -1, -1, -1, lo, hi};
    return id;
  }
  // Split on the axis with the largest extent.
  float mins[3] = {1e30f, 1e30f, 1e30f}, maxs[3] = {-1e30f, -1e30f, -1e30f};
  for (int i = lo; i < hi; ++i) {
    for (int a = 0; a < 3; ++a) {
      const float v = t.pts[3 * i + a];
      mins[a] = std::min(mins[a], v);
      maxs[a] = std::max(maxs[a], v);
    }
  }
  int axis = 0;
  for (int a = 1; a < 3; ++a) {
    if (maxs[a] - mins[a] > maxs[axis] - mins[axis]) axis = a;
  }
  const int mid = (lo + hi) / 2;
  // Sort index ranges by rearranging interleaved storage via an index pass.
  std::vector<int32_t> order(hi - lo);
  for (int i = 0; i < hi - lo; ++i) order[i] = lo + i;
  std::nth_element(order.begin(), order.begin() + (mid - lo), order.end(),
                   [&](int32_t a, int32_t b) {
                     return t.pts[3 * a + axis] < t.pts[3 * b + axis];
                   });
  // Apply the permutation to pts/ids within [lo, hi).
  std::vector<float> tmp_pts(3 * (hi - lo));
  std::vector<int32_t> tmp_ids(hi - lo);
  for (int i = 0; i < hi - lo; ++i) {
    std::memcpy(&tmp_pts[3 * i], &t.pts[3 * order[i]], 12);
    tmp_ids[i] = t.ids[order[i]];
  }
  std::memcpy(&t.pts[3 * lo], tmp_pts.data(), tmp_pts.size() * 4);
  std::memcpy(&t.ids[lo], tmp_ids.data(), tmp_ids.size() * 4);

  const float split = t.pts[3 * mid + axis];
  const int32_t left = build(t, lo, mid);
  const int32_t right = build(t, mid, hi);
  t.nodes[id] = {split, static_cast<int16_t>(axis), left, right, -1, -1};
  return id;
}

inline float sq(float v) { return v * v; }

void query_one(const KDTree& t, const float* q, float* best_d2,
               int32_t* best_idx) {
  float best = std::numeric_limits<float>::max();
  int32_t best_i = -1;
  // (node, axis-distance^2) stack.
  struct Entry {
    int32_t node;
    float bound;
  };
  Entry stack[128];
  int top = 0;
  stack[top++] = {t.root, 0.f};
  while (top > 0) {
    const Entry e = stack[--top];
    if (e.bound >= best) continue;
    const KDTree::Node& n = t.nodes[e.node];
    if (n.axis < 0) {
      for (int i = n.lo; i < n.hi; ++i) {
        const float d2 = sq(q[0] - t.pts[3 * i]) + sq(q[1] - t.pts[3 * i + 1]) +
                         sq(q[2] - t.pts[3 * i + 2]);
        if (d2 < best) {
          best = d2;
          best_i = t.ids[i];
        }
      }
      continue;
    }
    const float delta = q[n.axis] - n.split;
    const int32_t near = delta <= 0 ? n.left : n.right;
    const int32_t far = delta <= 0 ? n.right : n.left;
    if (top < 126) {
      stack[top++] = {far, sq(delta)};
      stack[top++] = {near, e.bound};
    }
  }
  *best_d2 = best;
  *best_idx = best_i;
}

void parallel_for(int n, int nthreads, const std::function<void(int, int)>& fn,
                  int min_per_call = 2048) {
  if (nthreads <= 1 || n < min_per_call) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    const int lo = t * chunk;
    const int hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

KDTree* kd_build(const float* pts, int32_t n) {
  auto* t = new KDTree();
  t->pts.resize(3 * static_cast<size_t>(n));
  std::memcpy(t->pts.data(), pts, 12 * static_cast<size_t>(n));
  t->ids.resize(n);
  for (int32_t i = 0; i < n; ++i) t->ids[i] = i;
  t->nodes.reserve(2 * n / kLeafSize + 8);
  t->root = build(*t, 0, n);
  return t;
}

}  // namespace

extern "C" {

void* himo_kd_build(const float* pts, int32_t n) { return kd_build(pts, n); }

void himo_kd_free(void* handle) { delete static_cast<KDTree*>(handle); }

void himo_kd_query(const void* handle, const float* queries, int32_t nq,
                   float* out_d2, int32_t* out_idx, int32_t nthreads) {
  const auto* tree = static_cast<const KDTree*>(handle);
  parallel_for(nq, nthreads, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      query_one(*tree, queries + 3 * i, out_d2 + i, out_idx + i);
    }
  });
}

// k-nearest: per-query sorted insertion into a k-slot buffer (k is small —
// the coherence votes / smoothed-chamfer losses use k <= 8), same pruned
// traversal as query_one with the bound = current k-th best.
void himo_kd_query_k(const void* handle, const float* queries, int32_t nq,
                     int32_t k, float* out_d2, int32_t* out_idx,
                     int32_t nthreads) {
  const auto* tree = static_cast<const KDTree*>(handle);
  parallel_for(nq, nthreads, [&](int lo, int hi) {
    std::vector<float> bd(k);
    std::vector<int32_t> bi(k);
    for (int i = lo; i < hi; ++i) {
      const float* q = queries + 3 * i;
      int filled = 0;
      float bound = std::numeric_limits<float>::max();
      struct Entry {
        int32_t node;
        float bound;
      };
      Entry stack[128];
      int top = 0;
      stack[top++] = {tree->root, 0.f};
      while (top > 0) {
        const Entry e = stack[--top];
        if (e.bound >= bound) continue;
        const KDTree::Node& n = tree->nodes[e.node];
        if (n.axis < 0) {
          for (int p = n.lo; p < n.hi; ++p) {
            const float d2 = sq(q[0] - tree->pts[3 * p]) +
                             sq(q[1] - tree->pts[3 * p + 1]) +
                             sq(q[2] - tree->pts[3 * p + 2]);
            if (d2 >= bound) continue;
            int at = filled < k ? filled : k - 1;
            while (at > 0 && bd[at - 1] > d2) {
              if (at < k) {
                bd[at] = bd[at - 1];
                bi[at] = bi[at - 1];
              }
              --at;
            }
            bd[at] = d2;
            bi[at] = tree->ids[p];
            if (filled < k) ++filled;
            if (filled == k) bound = bd[k - 1];
          }
          continue;
        }
        const float delta = q[n.axis] - n.split;
        const int32_t near = delta <= 0 ? n.left : n.right;
        const int32_t far = delta <= 0 ? n.right : n.left;
        if (top < 126) {
          stack[top++] = {far, sq(delta)};
          stack[top++] = {near, e.bound};
        }
      }
      for (int j = 0; j < k; ++j) {
        out_d2[static_cast<int64_t>(i) * k + j] =
            j < filled ? bd[j] : std::numeric_limits<float>::max();
        out_idx[static_cast<int64_t>(i) * k + j] = j < filled ? bi[j] : -1;
      }
    }
  });
}

// Symmetric mean-NN chamfer: out[0] = mean d(a->b), out[1] = mean d(b->a)
// (distances, not squared — matching the eval definition).
void himo_chamfer(const float* a, int32_t na, const float* b, int32_t nb,
                  double* out, int32_t nthreads) {
  if (na == 0 || nb == 0) {
    out[0] = out[1] = std::nan("");
    return;
  }
  KDTree* tb = kd_build(b, nb);
  KDTree* ta = kd_build(a, na);
  std::vector<float> d2(std::max(na, nb));
  std::vector<int32_t> idx(std::max(na, nb));
  himo_kd_query(tb, a, na, d2.data(), idx.data(), nthreads);
  double sum_ab = 0;
  for (int i = 0; i < na; ++i) sum_ab += std::sqrt(static_cast<double>(d2[i]));
  himo_kd_query(ta, b, nb, d2.data(), idx.data(), nthreads);
  double sum_ba = 0;
  for (int i = 0; i < nb; ++i) sum_ba += std::sqrt(static_cast<double>(d2[i]));
  out[0] = sum_ab / na;
  out[1] = sum_ba / nb;
  delete ta;
  delete tb;
}

// Raw attribute reader: returns elements read, -1 on error. dtype codes:
// 0 = float32, 1 = int32, 2 = int8 (widened to int32 in out).
int64_t himo_read_attr(const char* path, int32_t dtype_code, void* out,
                       int64_t capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const int64_t bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  int64_t count = 0;
  if (dtype_code == 0 || dtype_code == 1) {
    count = bytes / 4;
    if (count > capacity) count = capacity;
    count = static_cast<int64_t>(std::fread(out, 4, count, f));
  } else if (dtype_code == 2) {
    count = bytes;
    if (count > capacity) count = capacity;
    std::vector<int8_t> tmp(count);
    count = static_cast<int64_t>(std::fread(tmp.data(), 1, count, f));
    int32_t* dst = static_cast<int32_t*>(out);
    for (int64_t i = 0; i < count; ++i) dst[i] = tmp[i];
  } else {
    count = -1;
  }
  std::fclose(f);
  return count;
}

// Pad-and-stack batch packer: frames[i] is an (ns[i], cols) float32 row-major
// array; writes a (nframes, target, cols) batch (zero padding) and a
// (nframes, target) uint8 valid mask. Multi-threaded over frames.
void himo_pack_frames(const float** frames, const int32_t* ns, int32_t nframes,
                      int32_t cols, int32_t target, float* out_batch,
                      uint8_t* out_valid, int32_t nthreads) {
  parallel_for(
      nframes, std::max(1, std::min(nthreads, nframes)),
      [&](int lo, int hi) {
                 for (int i = lo; i < hi; ++i) {
                   const int32_t n = std::min(ns[i], target);
                   float* dst =
                       out_batch + static_cast<int64_t>(i) * target * cols;
                   std::memcpy(dst, frames[i],
                               static_cast<size_t>(n) * cols * 4);
                   std::memset(dst + static_cast<int64_t>(n) * cols, 0,
                               static_cast<size_t>(target - n) * cols * 4);
        uint8_t* v = out_valid + static_cast<int64_t>(i) * target;
        std::memset(v, 1, n);
        std::memset(v + n, 0, target - n);
        }
      },
      /*min_per_call=*/2);
}

}  // extern "C"
