// Word-error-rate scoring: Levenshtein alignment + sclite-style summary.
//
// Native replacement for the SCTK hubscr/asclite/sclite stage
// (local/score_asclite.sh:36, invoked at lmrescore_nbest_pytorchnn_cuda.sh:
// 239-245): aligns each hypothesis against its reference transcript and
// accumulates substitutions / deletions / insertions, reporting the same
// "%WER" summary line shape as Kaldi's compute-wer.
#pragma once

#include <algorithm>
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

}  // namespace bayeslm
