// Native host-runtime ops for gliclass.c_tpu.
//
// TPU-native equivalents of the reference engine's native host components:
//   * prompt packing      (reference src/preprocessor.c:67-111)
//   * decision kernels    (reference src/postprocessor.c:88-147)
//   * padded batch fill   (reference src/tokenizer.c:44-84)
//   * threaded batch fan-out (reference src/parallel_processor.c:25-50, OpenMP)
//
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in the
// image). All functions are allocation-disciplined: buffers returned to the
// caller are malloc'd and released with gct_free().
//
// Build: make -C native   (produces libgliclass_host.so)

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr const char kLabelTag[] = "<<LABEL>>";
constexpr const char kSepTag[] = "<<SEP>>";
constexpr size_t kLabelTagLen = sizeof(kLabelTag) - 1;
constexpr size_t kSepTagLen = sizeof(kSepTag) - 1;

// ASCII-only lowercasing, byte-wise — parity with C tolower in the "C" locale
// (reference src/preprocessor.c:88-93). Non-ASCII bytes pass through.
inline char ascii_lower(char c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<char>(c - 'A' + 'a') : c;
}

// Pack one prompt into `out` (append).
void pack_one(const char* text, const char* const* labels, int64_t n_labels,
              bool prompt_first, std::string& out) {
  out.clear();
  size_t text_len = std::strlen(text);
  size_t total = text_len + kSepTagLen;
  for (int64_t i = 0; i < n_labels; ++i)
    total += kLabelTagLen + std::strlen(labels[i]);
  out.reserve(total);

  auto append_labels = [&]() {
    for (int64_t i = 0; i < n_labels; ++i) {
      out.append(kLabelTag, kLabelTagLen);
      for (const char* p = labels[i]; *p; ++p) out.push_back(ascii_lower(*p));
    }
  };
  if (prompt_first) {
    append_labels();
    out.append(kSepTag, kSepTagLen);
    out.append(text, text_len);
  } else {
    out.append(text, text_len);
    append_labels();
    out.append(kSepTag, kSepTagLen);
  }
}

void parallel_for(int64_t n, int n_threads, const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1 || n < 256) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void gct_free(void* p) { std::free(p); }

// Pack n_texts prompts. Labels for text i are
// labels[label_offsets[i] .. label_offsets[i+1]).
// Output: one contiguous NUL-separated buffer (*out_buf) plus n_texts+1
// offsets (*out_offsets) into it. Prompt i = buf[off[i] .. off[i+1]-1).
// Returns 0 on success.
int64_t gct_pack_prompts(const char* const* texts, int64_t n_texts,
                         const char* const* labels,
                         const int64_t* label_offsets, int32_t prompt_first,
                         int32_t n_threads, char** out_buf,
                         int64_t** out_offsets) {
  std::vector<std::string> packed(n_texts);
  parallel_for(n_texts, n_threads, [&](int64_t lo, int64_t hi) {
    std::string tmp;
    for (int64_t i = lo; i < hi; ++i) {
      pack_one(texts[i], labels + label_offsets[i],
               label_offsets[i + 1] - label_offsets[i], prompt_first != 0, tmp);
      packed[i] = tmp;
    }
  });

  int64_t total = 0;
  for (auto& s : packed) total += static_cast<int64_t>(s.size()) + 1;
  char* buf = static_cast<char*>(std::malloc(total));
  int64_t* offs =
      static_cast<int64_t*>(std::malloc((n_texts + 1) * sizeof(int64_t)));
  if (!buf || !offs) {
    std::free(buf);
    std::free(offs);
    return -1;
  }
  int64_t pos = 0;
  for (int64_t i = 0; i < n_texts; ++i) {
    offs[i] = pos;
    std::memcpy(buf + pos, packed[i].data(), packed[i].size());
    pos += static_cast<int64_t>(packed[i].size());
    buf[pos++] = '\0';
  }
  offs[n_texts] = pos;
  *out_buf = buf;
  *out_offsets = offs;
  return 0;
}

// Multi-label decisions: emit (row, col, score) for every prob strictly above
// threshold within the first num_valid[row] columns
// (reference src/postprocessor.c:88-115 semantics). Returns the count.
int64_t gct_decide_multilabel(const float* probs, int64_t B, int64_t C,
                              float threshold, const int64_t* num_valid,
                              int64_t** out_rows, int64_t** out_cols,
                              float** out_scores) {
  std::vector<int64_t> rows, cols;
  std::vector<float> scores;
  rows.reserve(B);
  cols.reserve(B);
  scores.reserve(B);
  for (int64_t i = 0; i < B; ++i) {
    int64_t nv = num_valid ? num_valid[i] : C;
    if (nv > C) nv = C;
    const float* row = probs + i * C;
    for (int64_t j = 0; j < nv; ++j) {
      if (row[j] > threshold) {
        rows.push_back(i);
        cols.push_back(j);
        scores.push_back(row[j]);
      }
    }
  }
  int64_t n = static_cast<int64_t>(rows.size());
  *out_rows = static_cast<int64_t*>(std::malloc(n * sizeof(int64_t)));
  *out_cols = static_cast<int64_t*>(std::malloc(n * sizeof(int64_t)));
  *out_scores = static_cast<float*>(std::malloc(n * sizeof(float)));
  std::memcpy(*out_rows, rows.data(), n * sizeof(int64_t));
  std::memcpy(*out_cols, cols.data(), n * sizeof(int64_t));
  std::memcpy(*out_scores, scores.data(), n * sizeof(float));
  return n;
}

// Single-label decisions: strict-> scan from prob 0.0 so the first maximum
// wins and all-zero rows give index -1
// (reference src/postprocessor.c:118-127 semantics).
void gct_decide_single(const float* probs, int64_t B, int64_t C,
                       const int64_t* num_valid, int64_t* out_idx,
                       float* out_scores) {
  for (int64_t i = 0; i < B; ++i) {
    int64_t nv = num_valid ? num_valid[i] : C;
    if (nv > C) nv = C;
    const float* row = probs + i * C;
    float best = 0.0f;
    int64_t best_j = -1;
    for (int64_t j = 0; j < nv; ++j) {
      if (row[j] > best) {
        best = row[j];
        best_j = j;
      }
    }
    out_idx[i] = best_j;
    out_scores[i] = best;
  }
}

// Fill a padded [n, target] batch from flat variable-length token rows
// (truncate-at-target + pad, mask 1/0; reference src/tokenizer.c:44-84).
// flat_ids holds rows back to back; row i spans [row_offsets[i], row_offsets[i+1]).
void gct_pad_batch(const int32_t* flat_ids, const int64_t* row_offsets,
                   int64_t n, int64_t target, int32_t pad_id, int32_t n_threads,
                   int32_t* out_ids, int32_t* out_mask) {
  parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t len = row_offsets[i + 1] - row_offsets[i];
      if (len > target) len = target;
      const int32_t* src = flat_ids + row_offsets[i];
      int32_t* ids = out_ids + i * target;
      int32_t* mask = out_mask + i * target;
      for (int64_t j = 0; j < len; ++j) {
        ids[j] = src[j];
        mask[j] = 1;
      }
      for (int64_t j = len; j < target; ++j) {
        ids[j] = pad_id;
        mask[j] = 0;
      }
    }
  });
}

}  // extern "C"
