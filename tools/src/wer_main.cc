// wer: align hypotheses against references and print a Kaldi/sclite-style
// summary. Native replacement for the SCTK scoring stage
// (local/score_asclite.sh via lmrescore_nbest_pytorchnn_cuda.sh:239-245).
//
// Usage: wer <ref.txt> <hyp.txt>
//   both files: "utt word word …"; utterances matched by id; hyps missing a
//   ref are skipped with a warning (refs missing a hyp count as deletions).
// Prints: %WER P [ N / R, I ins, D del, S sub ]  and %SER.
#include <map>

#include "wer.hpp"

using namespace bayeslm;

static std::map<std::string, std::vector<std::string>> read_trans(const std::string& p) {
  std::map<std::string, std::vector<std::string>> m;
  auto f = open_in(p);
  std::string line;
  while (std::getline(f, line)) {
    auto w = split(line);
    if (w.empty()) continue;
    m[w[0]] = std::vector<std::string>(w.begin() + 1, w.end());
  }
  return m;
}

int main(int argc, char** argv) {
  if (argc != 3) die("usage: wer <ref.txt> <hyp.txt>");
  auto ref = read_trans(argv[1]);
  auto hyp = read_trans(argv[2]);

  WerCounts total;
  for (const auto& [utt, r] : ref) {
    auto it = hyp.find(utt);
    std::vector<std::string> h = (it == hyp.end()) ? std::vector<std::string>{} : it->second;
    total.add(align_wer(r, h));
  }
  long long err = total.sub + total.del + total.ins;
  std::printf("%%WER %.2f [ %lld / %lld, %lld ins, %lld del, %lld sub ]\n",
              total.wer(), err, total.ref_len, total.ins, total.del, total.sub);
  std::printf("%%SER %.2f [ %lld / %lld ]\n",
              total.sent ? 100.0 * total.err_sent / total.sent : 0.0,
              total.err_sent, total.sent);
  return 0;
}
