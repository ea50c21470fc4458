// Parallel impact-ordered postings builder.
//
// Input: doc-major sparse rows (token_ids [N, L] int32, weights [N, L] f32,
// zero-weight = inactive). Output: per-token top-C (doc_id, weight) pairs,
// weight-descending (post_docs [V, C] int32 padded with INT32_MAX,
// post_w [V, C] f32 zeros).
//
// Replaces the numpy packed-key argsort over all nnz entries (~20 min at
// 1.1B entries) with a two-pass counting bucket-by-token + per-token partial
// selection, parallelized over token ranges. O(nnz) grouping, O(sum n_t log C)
// selection.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Entry {
  int32_t doc;
  float w;
};

}  // namespace

extern "C" {

// toks/ws: [N*L] row-major. out_docs/out_w: [V*C] caller-allocated.
// Returns 0 on success.
int build_postings(const int32_t* toks, const float* ws, int64_t n_docs,
                   int64_t l, int64_t vocab, int64_t cap, int32_t* out_docs,
                   float* out_w, int32_t n_threads) {
  const int64_t total = n_docs * l;
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 8;
  }

  // pass 1: per-token counts (parallel, atomic)
  std::vector<std::atomic<int64_t>> counts(vocab);
  for (auto& c : counts) c.store(0, std::memory_order_relaxed);
  {
    std::vector<std::thread> threads;
    int64_t chunk = (total + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk, hi = std::min(total, lo + chunk);
      threads.emplace_back([&, lo, hi]() {
        for (int64_t i = lo; i < hi; ++i) {
          if (ws[i] > 0.0f) {
            counts[toks[i]].fetch_add(1, std::memory_order_relaxed);
          }
        }
      });
    }
    for (auto& th : threads) th.join();
  }

  // offsets (exclusive prefix sum)
  std::vector<int64_t> offsets(vocab + 1, 0);
  for (int64_t v = 0; v < vocab; ++v) {
    offsets[v + 1] = offsets[v] + counts[v].load(std::memory_order_relaxed);
  }
  const int64_t nnz = offsets[vocab];

  // pass 2: scatter entries into token-grouped storage (parallel, atomic
  // cursor per token)
  std::vector<Entry> grouped(nnz);
  std::vector<std::atomic<int64_t>> cursor(vocab);
  for (int64_t v = 0; v < vocab; ++v) {
    cursor[v].store(offsets[v], std::memory_order_relaxed);
  }
  {
    std::vector<std::thread> threads;
    int64_t chunk = (n_docs + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk, hi = std::min(n_docs, lo + chunk);
      threads.emplace_back([&, lo, hi]() {
        for (int64_t d = lo; d < hi; ++d) {
          const int64_t base = d * l;
          for (int64_t j = 0; j < l; ++j) {
            float w = ws[base + j];
            if (w > 0.0f) {
              int32_t tok = toks[base + j];
              int64_t pos = cursor[tok].fetch_add(1, std::memory_order_relaxed);
              grouped[pos] = {(int32_t)d, w};
            }
          }
        }
      });
    }
    for (auto& th : threads) th.join();
  }

  // pass 3: per-token top-C selection, weight-descending (parallel over
  // tokens)
  const int32_t PAD = INT32_MAX;
  {
    std::vector<std::thread> threads;
    std::atomic<int64_t> next_tok(0);
    const int64_t grain = 256;
    for (int t = 0; t < n_threads; ++t) {
      threads.emplace_back([&]() {
        for (;;) {
          int64_t v0 = next_tok.fetch_add(grain);
          if (v0 >= vocab) return;
          int64_t v1 = std::min(vocab, v0 + grain);
          for (int64_t v = v0; v < v1; ++v) {
            Entry* beg = grouped.data() + offsets[v];
            int64_t n = offsets[v + 1] - offsets[v];
            int64_t keep = std::min(n, cap);
            auto cmp = [](const Entry& a, const Entry& b) { return a.w > b.w; };
            if (n > keep) {
              std::nth_element(beg, beg + keep, beg + n, cmp);
            }
            std::sort(beg, beg + keep, cmp);
            int32_t* od = out_docs + v * cap;
            float* ow = out_w + v * cap;
            int64_t i = 0;
            for (; i < keep; ++i) {
              od[i] = beg[i].doc;
              ow[i] = beg[i].w;
            }
            for (; i < cap; ++i) {
              od[i] = PAD;
              ow[i] = 0.0f;
            }
          }
        }
      });
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}

// Merge two impact-(weight-descending-)sorted postings sets per token row,
// keeping the top `cap` of the union: the incremental-build merge step.
// b's doc ids get `b_doc_offset` added (chunk builds emit LOCAL doc ids).
// a may alias out (in-place running-state merge is the intended use);
// b must not alias out. Rows are independent -> parallel over token ranges.
int merge_postings(const int32_t* a_docs, const float* a_w,
                   const int32_t* b_docs, const float* b_w, int64_t vocab,
                   int64_t cap, int32_t b_doc_offset, int32_t* out_docs,
                   float* out_w, int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 8;
  }
  const int32_t PAD = INT32_MAX;
  std::vector<std::thread> threads;
  std::atomic<int64_t> next_tok(0);
  const int64_t grain = 512;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&]() {
      std::vector<int32_t> md(cap);
      std::vector<float> mw(cap);
      for (;;) {
        int64_t v0 = next_tok.fetch_add(grain);
        if (v0 >= vocab) return;
        int64_t v1 = std::min(vocab, v0 + grain);
        for (int64_t v = v0; v < v1; ++v) {
          const int32_t* ad = a_docs + v * cap;
          const float* aw = a_w + v * cap;
          const int32_t* bd = b_docs + v * cap;
          const float* bw = b_w + v * cap;
          int64_t i = 0, j = 0, k = 0;
          // w == 0 marks padding in either input (sorted last)
          while (k < cap) {
            bool a_ok = i < cap && aw[i] > 0.0f;
            bool b_ok = j < cap && bw[j] > 0.0f;
            if (!a_ok && !b_ok) break;
            if (a_ok && (!b_ok || aw[i] >= bw[j])) {
              md[k] = ad[i];
              mw[k] = aw[i];
              ++i;
            } else {
              md[k] = bd[j] + b_doc_offset;
              mw[k] = bw[j];
              ++j;
            }
            ++k;
          }
          int32_t* od = out_docs + v * cap;
          float* ow = out_w + v * cap;
          std::memcpy(od, md.data(), k * sizeof(int32_t));
          std::memcpy(ow, mw.data(), k * sizeof(float));
          for (; k < cap; ++k) {
            od[k] = PAD;
            ow[k] = 0.0f;
          }
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
