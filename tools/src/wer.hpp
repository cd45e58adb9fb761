// Word-error-rate scoring: Levenshtein alignment + sclite-style summary.
//
// Native replacement for the SCTK hubscr/asclite/sclite stage
// (local/score_asclite.sh:36, invoked at lmrescore_nbest_pytorchnn_cuda.sh:
// 239-245): aligns each hypothesis against its reference transcript and
// accumulates substitutions / deletions / insertions, reporting the same
// "%WER" summary line shape as Kaldi's compute-wer.
#pragma once

#include <algorithm>
#include <cctype>
#include <string>
#include <vector>

#include "common.hpp"

namespace bayeslm {

struct WerCounts {
  long long sub = 0, del = 0, ins = 0, ref_len = 0, sent = 0, err_sent = 0;

  double wer() const {
    return ref_len ? 100.0 * (sub + del + ins) / (double)ref_len : 0.0;
  }
  void add(const WerCounts& o) {
    sub += o.sub;
    del += o.del;
    ins += o.ins;
    ref_len += o.ref_len;
    sent += o.sent;
    err_sent += o.err_sent;
  }
};

// ---------------------------------------------------------------- filtering
//
// GLM transcript filtering (hubscr.pl -g <glm>, local/score_asclite.sh:36 /
// score_sclite.sh): token-rewrite rules "LHS => RHS / context ;; comment",
// matched case-insensitively, longest LHS first. RHS alternations
// "{ A / B }" take the first alternative; context specifications after an
// unbraced "/" are ignored (the common GLM rules use the universal
// "[ ] __ [ ]" context).
class GlmFilter {
 public:
  GlmFilter() = default;

  explicit GlmFilter(const std::string& path) {
    auto f = open_in(path);
    std::string line;
    while (std::getline(f, line)) {
      size_t c = line.find(";;");
      if (c != std::string::npos) line = line.substr(0, c);
      size_t arrow = line.find("=>");
      if (arrow == std::string::npos) continue;
      std::string lhs_s = line.substr(0, arrow);
      std::string rhs_s = line.substr(arrow + 2);
      // cut the context spec: first '/' outside { } braces
      int depth = 0;
      for (size_t i = 0; i < rhs_s.size(); ++i) {
        if (rhs_s[i] == '{') depth++;
        else if (rhs_s[i] == '}') depth--;
        else if (rhs_s[i] == '/' && depth == 0) { rhs_s = rhs_s.substr(0, i); break; }
      }
      // "{ A / B }" -> first alternative
      std::string clean;
      depth = 0;
      for (size_t i = 0; i < rhs_s.size(); ++i) {
        char ch = rhs_s[i];
        if (ch == '{') { depth++; continue; }
        if (ch == '}') { depth = std::max(0, depth - 1); continue; }
        if (ch == '/' && depth > 0) {  // skip rest of the alternation
          while (i + 1 < rhs_s.size() && rhs_s[i + 1] != '}') ++i;
          continue;
        }
        clean += ch;
      }
      auto lhs = split(upper(lhs_s));
      auto rhs = split(upper(clean));
      if (lhs.empty()) continue;
      rules_.push_back({lhs, rhs});
    }
    // longest-LHS-first so multiword rules win over their prefixes
    std::stable_sort(rules_.begin(), rules_.end(),
                     [](const Rule& a, const Rule& b) {
                       return a.lhs.size() > b.lhs.size();
                     });
  }

  bool empty() const { return rules_.empty(); }

  std::vector<std::string> apply(const std::vector<std::string>& words) const {
    std::vector<std::string> up;
    up.reserve(words.size());
    for (const auto& w : words) up.push_back(upper(w));
    std::vector<std::string> out;
    size_t i = 0;
    while (i < up.size()) {
      bool hit = false;
      for (const auto& r : rules_) {
        if (i + r.lhs.size() <= up.size() &&
            std::equal(r.lhs.begin(), r.lhs.end(), up.begin() + i)) {
          out.insert(out.end(), r.rhs.begin(), r.rhs.end());
          i += r.lhs.size();
          hit = true;
          break;
        }
      }
      if (!hit) out.push_back(up[i++]);
    }
    return out;
  }

 private:
  struct Rule {
    std::vector<std::string> lhs, rhs;
  };
  static std::string upper(const std::string& s) {
    std::string o = s;
    for (auto& c : o) c = (char)std::toupper((unsigned char)c);
    return o;
  }
  std::vector<Rule> rules_;
};

// Hypothesis cleanup of score_asclite.sh:87-93: drop noise/laughter tags,
// the hesitation word list, and <unk> before scoring.
inline std::vector<std::string> asclite_clean(const std::vector<std::string>& w) {
  static const std::vector<std::string> hes = {
      "ACH", "AH", "EEE", "EH", "ER", "EW", "HA", "HEE", "HM", "HMM",
      "HUH", "MM", "OOF", "UH", "UM", "%HESITATION"};
  std::vector<std::string> out;
  for (const auto& x : w) {
    std::string u = x;
    for (auto& c : u) c = (char)std::toupper((unsigned char)c);
    if (u == "<UNK>") continue;
    if (!u.empty() && u.front() == '[' && u.back() == ']') continue;  // [noise] etc.
    bool is_hes = false;
    for (const auto& h : hes)
      if (u == h) { is_hes = true; break; }
    if (is_hes) continue;
    out.push_back(x);
  }
  return out;
}

inline WerCounts align_wer(const std::vector<std::string>& ref,
                           const std::vector<std::string>& hyp) {
  const size_t R = ref.size(), H = hyp.size();
  // dp[i][j] = (cost, op-counts packed separately via backtrace-free count dp)
  // Track three count matrices to recover S/D/I exactly.
  std::vector<std::vector<int>> cost(R + 1, std::vector<int>(H + 1, 0));
  for (size_t i = 0; i <= R; ++i) cost[i][0] = (int)i;
  for (size_t j = 0; j <= H; ++j) cost[0][j] = (int)j;
  for (size_t i = 1; i <= R; ++i)
    for (size_t j = 1; j <= H; ++j) {
      int match = cost[i - 1][j - 1] + (ref[i - 1] == hyp[j - 1] ? 0 : 1);
      cost[i][j] = std::min({match, cost[i - 1][j] + 1, cost[i][j - 1] + 1});
    }
  // backtrace for counts
  WerCounts c;
  size_t i = R, j = H;
  while (i > 0 || j > 0) {
    if (i > 0 && j > 0 &&
        cost[i][j] == cost[i - 1][j - 1] + (ref[i - 1] == hyp[j - 1] ? 0 : 1)) {
      if (ref[i - 1] != hyp[j - 1]) c.sub++;
      --i;
      --j;
    } else if (i > 0 && cost[i][j] == cost[i - 1][j] + 1) {
      c.del++;
      --i;
    } else {
      c.ins++;
      --j;
    }
  }
  c.ref_len = (long long)R;
  c.sent = 1;
  c.err_sent = (c.sub + c.del + c.ins) > 0 ? 1 : 0;
  return c;
}

// asclite-style overlapping-speaker alignment (hubscr.pl -a -o <k>,
// local/score_asclite.sh:99-110): the hypothesis word stream is aligned
// simultaneously against up to 4 concurrent reference streams — each stream
// must be consumed in order, every hypothesis word aligns to exactly one
// stream (or is an insertion), unconsumed reference words are deletions.
// Product-space edit-distance DP; optimal for the same S/D/I objective
// asclite minimizes on word-level multi-streams.
inline WerCounts align_wer_multi(const std::vector<std::vector<std::string>>& refs,
                                 const std::vector<std::string>& hyp) {
  if (refs.size() == 1) return align_wer(refs[0], hyp);
  const size_t K = refs.size();
  if (K > 4) die("align_wer_multi: at most 4 overlapping speakers");
  std::vector<size_t> dims(K), stride(K);
  size_t states = 1;
  for (size_t k = 0; k < K; ++k) {
    dims[k] = refs[k].size() + 1;
    stride[k] = states;
    states *= dims[k];
  }
  const size_t H = hyp.size();
  // product-space size guard: (H+1)*prod(R_k+1) cells; four ~50-word
  // streams would need GBs where asclite prunes — fail with a clear
  // message instead of thrashing
  if (states > (50u * 1000 * 1000) / (H + 1))
    die("align_wer_multi: overlap DP too large (" +
        std::to_string(states) + " states x " + std::to_string(H + 1) +
        " hyp positions); split the segment or reduce overlapping speakers");
  const int INF = 1 << 29;
  std::vector<int> cost(states * (H + 1), INF);
  auto at = [&](size_t s, size_t j) -> int& { return cost[s * (H + 1) + j]; };
  auto digit = [&](size_t s, size_t k) { return (s / stride[k]) % dims[k]; };
  at(0, 0) = 0;
  for (size_t s = 0; s < states; ++s)
    for (size_t j = 0; j <= H; ++j) {
      int best = at(s, j);
      if (j > 0 && at(s, j - 1) + 1 < best) best = at(s, j - 1) + 1;  // ins
      for (size_t k = 0; k < K; ++k) {
        size_t ik = digit(s, k);
        if (ik == 0) continue;
        size_t ps = s - stride[k];
        if (at(ps, j) + 1 < best) best = at(ps, j) + 1;  // del from stream k
        if (j > 0) {
          int m = at(ps, j - 1) + (refs[k][ik - 1] == hyp[j - 1] ? 0 : 1);
          if (m < best) best = m;
        }
      }
      at(s, j) = best;
    }
  // backtrace for S/D/I counts (prefer match/sub like align_wer)
  WerCounts c;
  size_t s = states - 1, j = H;
  while (s > 0 || j > 0) {
    bool moved = false;
    for (size_t k = 0; k < K && !moved; ++k) {
      size_t ik = digit(s, k);
      if (ik == 0 || j == 0) continue;
      size_t ps = s - stride[k];
      bool eq = refs[k][ik - 1] == hyp[j - 1];
      if (at(s, j) == at(ps, j - 1) + (eq ? 0 : 1)) {
        if (!eq) c.sub++;
        s = ps;
        --j;
        moved = true;
      }
    }
    if (moved) continue;
    for (size_t k = 0; k < K && !moved; ++k) {
      size_t ik = digit(s, k);
      if (ik == 0) continue;
      size_t ps = s - stride[k];
      if (at(s, j) == at(ps, j) + 1) {
        c.del++;
        s = ps;
        moved = true;
      }
    }
    if (moved) continue;
    c.ins++;
    --j;
  }
  for (const auto& r : refs) c.ref_len += (long long)r.size();
  c.sent = 1;
  c.err_sent = (c.sub + c.del + c.ins) > 0 ? 1 : 0;
  return c;
}

}  // namespace bayeslm
