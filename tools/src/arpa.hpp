// ARPA n-gram language model: loader + backoff sentence scoring.
//
// Native equivalent of the reference pipeline's old-LM score handling
// (lmrescore_nbest_pytorchnn_cuda.sh:116-174): where Kaldi composes each
// linear hypothesis with G.fst / G.carpa to obtain the n-gram score to be
// subtracted/interpolated, a linear hypothesis composed with an n-gram FST
// degenerates to a per-token ARPA lookup with backoff — computed here
// directly. Scores are natural-log costs (Kaldi convention: -ln p), with
// <s>/</s> sentence framing.
#pragma once

#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

#include "common.hpp"

namespace bayeslm {

class ArpaLM {
 public:
  struct Entry {
    float logp = 0.0f;     // log10 probability
    float backoff = 0.0f;  // log10 backoff weight
  };

  explicit ArpaLM(const std::string& path) { load(path); }

  int order() const { return order_; }

  // -ln P(sentence) with <s> … </s> framing; OOVs hit <unk> when present —
  // both as the predicted word AND inside the context vector (Kaldi's
  // G-composition sees <unk>-mapped symbols in the history too; keeping the
  // raw word would silently back off to unigram for every context that
  // contains an OOV).
  double sentence_cost(const std::vector<std::string>& words) const {
    const bool has_unk = known(unk_);
    std::vector<std::string> ctx = {bos_};
    double log10_total = 0.0;
    for (size_t i = 0; i <= words.size(); ++i) {
      const std::string& raw = (i < words.size()) ? words[i] : eos_;
      const std::string& w = (has_unk && !known(raw)) ? unk_ : raw;
      log10_total += word_logp(ctx, w);
      ctx.push_back(w);
      if ((int)ctx.size() >= order_) ctx.erase(ctx.begin());
    }
    return -log10_total * std::log(10.0);
  }

  // log10 P(w | context), with recursive backoff.
  double word_logp(const std::vector<std::string>& ctx, const std::string& w) const {
    std::string word = known(w) ? w : unk_;
    // try longest context first
    int max_ctx = std::min((int)ctx.size(), order_ - 1);
    for (int len = max_ctx; len >= 0; --len) {
      std::string key = join(ctx, (int)ctx.size() - len, word);
      auto it = grams_.find(key);
      if (it != grams_.end()) {
        double bo = 0.0;
        // accumulate backoff weights of the skipped longer contexts
        for (int skip = max_ctx; skip > len; --skip) {
          std::string bo_key = join(ctx, (int)ctx.size() - skip, "");
          auto bit = grams_.find(bo_key);
          if (bit != grams_.end()) bo += bit->second.backoff;
        }
        return it->second.logp + bo;
      }
    }
    return -99.0;  // unseen even as unigram (no <unk> in LM)
  }

 private:
  bool known(const std::string& w) const {
    return grams_.count(w) > 0;
  }

  static std::string join(const std::vector<std::string>& ctx, int start,
                          const std::string& last) {
    std::string out;
    for (size_t i = start; i < ctx.size(); ++i) {
      if (!out.empty()) out += " ";
      out += ctx[i];
    }
    if (!last.empty()) {
      if (!out.empty()) out += " ";
      out += last;
    }
    return out;
  }

  void load(const std::string& path) {
    auto f = open_in(path);
    std::string line;
    int cur_order = 0;
    bool in_data = false;
    while (std::getline(f, line)) {
      if (line.rfind("\\data\\", 0) == 0) {
        in_data = true;
        continue;
      }
      if (line.rfind("ngram ", 0) == 0 && in_data) {
        auto p = split_on(line.substr(6), '=');
        order_ = std::max(order_, std::stoi(p[0]));
        continue;
      }
      if (line.rfind("\\end\\", 0) == 0) break;
      if (!line.empty() && line[0] == '\\') {
        auto f2 = split_on(line.substr(1), '-');
        cur_order = std::stoi(f2[0]);
        continue;
      }
      if (cur_order == 0) continue;
      auto fields = split(line);
      if ((int)fields.size() < cur_order + 1) continue;
      Entry e;
      e.logp = std::stof(fields[0]);
      std::string key;
      for (int i = 1; i <= cur_order; ++i) {
        if (!key.empty()) key += " ";
        key += fields[i];
      }
      if ((int)fields.size() > cur_order + 1) e.backoff = std::stof(fields.back());
      grams_[key] = e;
    }
    if (order_ == 0) die("no \\data\\ section in " + path);
  }

  std::unordered_map<std::string, Entry> grams_;
  int order_ = 0;
  std::string bos_ = "<s>", eos_ = "</s>", unk_ = "<unk>";
};

}  // namespace bayeslm
