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

}  // extern "C"
