// libbayeslm_tokenizer: native corpus tokenizer exposed over a C ABI.
//
// Replaces the hot part of the reference's python data pipeline
// (data.py:36-52 — per-line split, vocab lookup, <s> append, OOV->.<unk>)
// with a single-pass C++ scanner. Loaded from python via ctypes
// (bayeslms_tpu/data/native.py); the python implementation stays as the
// portable fallback.
//
// C ABI:
//   void* blm_vocab_load(const char* words_txt);
//   void  blm_vocab_free(void* vocab);
//   int64_t blm_tokenize(void* vocab, const char* text_path,
//                        int32_t** out_ids);   // returns count, malloc'd ids
//   void  blm_free_ids(int32_t* ids);
#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> word2idx;
  int32_t bos = -1, unk = -1;
};

}  // namespace

extern "C" {

void* blm_vocab_load(const char* words_txt) {
  std::ifstream f(words_txt);
  if (!f) return nullptr;
  auto* v = new Vocab();
  std::string word, idx;
  std::string line;
  while (std::getline(f, line)) {
    size_t sp = line.find_first_of(" \t");
    if (sp == std::string::npos) continue;
    word = line.substr(0, sp);
    if (!v->word2idx.count(word))
      v->word2idx.emplace(word, (int32_t)v->word2idx.size());
  }
  auto it = v->word2idx.find("<s>");
  v->bos = it == v->word2idx.end() ? -1 : it->second;
  it = v->word2idx.find("<unk>");
  v->unk = it == v->word2idx.end() ? -1 : it->second;
  return v;
}

void blm_vocab_free(void* vocab) { delete static_cast<Vocab*>(vocab); }

int64_t blm_vocab_size(void* vocab) {
  return (int64_t)static_cast<Vocab*>(vocab)->word2idx.size();
}

// Tokenize a text file: per line, words then <s>; OOV -> <unk>.
// Returns token count; *out_ids receives a malloc'd buffer (caller frees via
// blm_free_ids). Returns -1 on error.
int64_t blm_tokenize(void* vocab, const char* text_path, int32_t** out_ids) {
  auto* v = static_cast<Vocab*>(vocab);
  std::ifstream f(text_path);
  if (!f || v->bos < 0) return -1;
  std::vector<int32_t> ids;
  ids.reserve(1 << 20);
  std::string line, tok;
  while (std::getline(f, line)) {
    size_t i = 0, n = line.size();
    while (i < n) {
      while (i < n && (line[i] == ' ' || line[i] == '\t')) ++i;
      size_t j = i;
      while (j < n && line[j] != ' ' && line[j] != '\t') ++j;
      if (j > i) {
        tok.assign(line, i, j - i);
        auto it = v->word2idx.find(tok);
        if (it != v->word2idx.end())
          ids.push_back(it->second);
        else if (v->unk >= 0)
          ids.push_back(v->unk);
        else
          return -1;
      }
      i = j;
    }
    ids.push_back(v->bos);
  }
  *out_ids = (int32_t*)std::malloc(ids.size() * sizeof(int32_t));
  std::memcpy(*out_ids, ids.data(), ids.size() * sizeof(int32_t));
  return (int64_t)ids.size();
}

void blm_free_ids(int32_t* ids) { std::free(ids); }
void blm_free_i64(int64_t* v) { std::free(v); }

// Vocab from an in-memory "word idx\n" buffer with EXPLICIT ids — the
// scorer's word2idx mapping may be arbitrary, unlike dense words.txt.
void* blm_vocab_from_pairs(const char* buf) {
  auto* v = new Vocab();
  const char* p = buf;
  while (*p) {
    const char* nl = std::strchr(p, '\n');
    size_t len = nl ? (size_t)(nl - p) : std::strlen(p);
    const char* sp = (const char*)std::memchr(p, ' ', len);
    if (sp) {
      std::string word(p, (size_t)(sp - p));
      int32_t id = (int32_t)std::strtol(sp + 1, nullptr, 10);
      v->word2idx.emplace(std::move(word), id);
    }
    if (!nl) break;
    p = nl + 1;
  }
  auto it = v->word2idx.find("<s>");
  v->bos = it == v->word2idx.end() ? -1 : it->second;
  it = v->word2idx.find("<unk>");
  v->unk = it == v->word2idx.end() ? 0 : it->second;  // python .get(unk, 0)
  return v;
}

// Batch-encode newline-separated hypothesis lines (the N-best scorer's
// encode hot path, compute_sentence_scores_bayes_jianwei.py:87-120 word
// mapping): per line, word ids with OOV -> <unk>. Outputs the flat id
// stream, (n_lines+1) offsets into it, and the per-line OOV count (the dev
// scorer's tally, `…copy.py`:123-144). BOS framing stays python-side.
// Callers join WITHOUT a trailing newline so n_lines == number of hyps.
// Returns n_lines; caller frees via blm_free_ids / blm_free_i64.
int64_t blm_encode_lines(void* vocab, const char* buf, int32_t** out_ids,
                         int64_t** out_offs, int32_t** out_oov) {
  auto* v = static_cast<Vocab*>(vocab);
  std::vector<int32_t> ids;
  ids.reserve(1 << 16);
  std::vector<int64_t> offs;
  offs.push_back(0);
  std::vector<int32_t> oov;
  const char* p = buf;
  std::string tok;
  while (true) {
    const char* nl = std::strchr(p, '\n');
    size_t n = nl ? (size_t)(nl - p) : std::strlen(p);
    int32_t line_oov = 0;
    size_t i = 0;
    while (i < n) {
      while (i < n && (p[i] == ' ' || p[i] == '\t')) ++i;
      size_t j = i;
      while (j < n && p[j] != ' ' && p[j] != '\t') ++j;
      if (j > i) {
        tok.assign(p + i, j - i);
        auto it = v->word2idx.find(tok);
        if (it != v->word2idx.end()) {
          ids.push_back(it->second);
        } else {
          ids.push_back(v->unk);
          ++line_oov;
        }
      }
      i = j;
    }
    offs.push_back((int64_t)ids.size());
    oov.push_back(line_oov);
    if (!nl) break;
    p = nl + 1;
  }
  *out_ids = (int32_t*)std::malloc(std::max<size_t>(ids.size(), 1) *
                                   sizeof(int32_t));
  std::memcpy(*out_ids, ids.data(), ids.size() * sizeof(int32_t));
  *out_offs = (int64_t*)std::malloc(offs.size() * sizeof(int64_t));
  std::memcpy(*out_offs, offs.data(), offs.size() * sizeof(int64_t));
  *out_oov = (int32_t*)std::malloc(oov.size() * sizeof(int32_t));
  std::memcpy(*out_oov, oov.data(), oov.size() * sizeof(int32_t));
  return (int64_t)oov.size();
}

}  // extern "C"
