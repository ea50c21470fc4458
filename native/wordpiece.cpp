// Fast WordPiece tokenizer (BERT-uncased semantics), C library with a ctypes
// interface (models/native_tokenizer.py).
//
// The reference outsources tokenization to HF's Rust tokenizers; this is the
// TPU build's native equivalent for the bulk ingest/search path, where host
// tokenization otherwise dominates encoder throughput.
//
// Scope: exact parity with the Python reference implementation
// (models/tokenizer.py) for ASCII text. The Python wrapper routes any text
// containing non-ASCII bytes through the Python path, so Unicode behavior
// (NFD accent stripping, CJK spacing, unicode punctuation) stays identical
// while the common case runs at C speed.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk_id = 100;
  int32_t cls_id = 101;
  int32_t sep_id = 102;
  int32_t max_chars_per_word = 100;
};

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
         (c >= 123 && c <= 126);
}

inline bool is_ascii_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
         c == '\v' || c == '\f';
}

// greedy longest-match-first WordPiece on one lowercased word
void wordpiece(const Tokenizer& tk, const std::string& word,
               std::vector<int32_t>* out) {
  if ((int32_t)word.size() > tk.max_chars_per_word) {
    out->push_back(tk.unk_id);
    return;
  }
  size_t start = 0;
  const size_t n = word.size();
  std::vector<int32_t> pieces;
  std::string sub;
  while (start < n) {
    size_t end = n;
    int32_t piece = -1;
    while (start < end) {
      sub.clear();
      if (start > 0) sub = "##";
      sub.append(word, start, end - start);
      auto it = tk.vocab.find(sub);
      if (it != tk.vocab.end()) {
        piece = it->second;
        break;
      }
      --end;
    }
    if (piece < 0) {
      out->push_back(tk.unk_id);
      return;
    }
    pieces.push_back(piece);
    start = end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

// basic-tokenize (ASCII): lowercase, split on whitespace + punctuation,
// then wordpiece each word; emits ids into `out` (no specials).
void tokenize_ascii(const Tokenizer& tk, const char* text, size_t len,
                    std::vector<int32_t>* out) {
  std::string word;
  word.reserve(32);
  auto flush = [&]() {
    if (!word.empty()) {
      wordpiece(tk, word, out);
      word.clear();
    }
  };
  for (size_t i = 0; i < len; ++i) {
    unsigned char c = (unsigned char)text[i];
    if (c == 0 || is_ascii_space(c) || c < 32 || c == 127) {
      flush();
    } else if (is_ascii_punct(c)) {
      flush();
      word.push_back((char)c);
      flush();
    } else {
      word.push_back((char)(c >= 'A' && c <= 'Z' ? c + 32 : c));
    }
  }
  flush();
}

}  // namespace

extern "C" {

// vocab_blob: '\n'-joined UTF-8 tokens in id order.
void* wp_create(const char* vocab_blob, int64_t blob_len) {
  auto* tk = new Tokenizer();
  int32_t id = 0;
  const char* p = vocab_blob;
  const char* end = vocab_blob + blob_len;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    size_t n = nl ? (size_t)(nl - p) : (size_t)(end - p);
    std::string tok(p, n);
    tk->vocab.emplace(std::move(tok), id++);
    if (!nl) break;
    p = nl + 1;
  }
  auto find_id = [&](const char* s, int32_t dflt) {
    auto it = tk->vocab.find(s);
    return it == tk->vocab.end() ? dflt : it->second;
  };
  tk->unk_id = find_id("[UNK]", 100);
  tk->cls_id = find_id("[CLS]", 101);
  tk->sep_id = find_id("[SEP]", 102);
  return tk;
}

void wp_destroy(void* handle) { delete (Tokenizer*)handle; }

// Encode a batch of ASCII texts: out_ids is caller-allocated [n * max_len]
// int32 (pad id 0 pre-filled by caller or zeroed here); out_lens [n].
// Each row: [CLS] pieces... [SEP], truncated to max_len (HF semantics:
// body truncated to max_len-2).
void wp_encode_batch(void* handle, const char** texts, const int64_t* lens,
                     int32_t n, int32_t max_len, int32_t* out_ids,
                     int32_t* out_lens) {
  const Tokenizer& tk = *(const Tokenizer*)handle;
  // every row normally holds [CLS] and [SEP]: max_len < 2 would write past
  // the caller-allocated [n, max_len] buffer. Degenerate lengths emit the
  // same ([CLS] + body + [SEP])[:max_len] prefix as the Python path.
  if (max_len < 2) {
    for (int32_t i = 0; i < n; ++i) {
      if (max_len == 1) {
        out_ids[(int64_t)i] = tk.cls_id;
        out_lens[i] = 1;
      } else {
        out_lens[i] = 0;
      }
    }
    return;
  }
  std::vector<int32_t> ids;
  for (int32_t i = 0; i < n; ++i) {
    ids.clear();
    tokenize_ascii(tk, texts[i], (size_t)lens[i], &ids);
    int32_t body = (int32_t)ids.size();
    if (body > max_len - 2) body = max_len - 2;
    int32_t* row = out_ids + (int64_t)i * max_len;
    int32_t m = 0;
    row[m++] = tk.cls_id;
    for (int32_t j = 0; j < body; ++j) row[m++] = ids[j];
    row[m++] = tk.sep_id;
    out_lens[i] = m;
    for (; m < max_len; ++m) row[m] = 0;
  }
}

}  // extern "C"
