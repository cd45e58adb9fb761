// arpa_score: score hypotheses with an ARPA n-gram LM (backoff), emitting
// "utt-K cost" lines (natural-log costs, -ln p).
//
// Native equivalent of the reference's old-LM score recovery: Kaldi removes
// G.fst/G.carpa scores by composition (lmrescore_nbest_pytorchnn_cuda.sh:
// 116-174) and later reconstructs lmwt.lmonly = withlm - nolm via awk
// (:186-195); here the n-gram score of each (linear) hypothesis is computed
// directly.
//
// Usage: arpa_score <lm.arpa> <hyps.txt> <scores.out>
//   hyps.txt lines: "utt-K word word …" (text words)
#include "arpa.hpp"

using namespace bayeslm;

int main(int argc, char** argv) {
  if (argc != 4) die("usage: arpa_score <lm.arpa> <hyps.txt> <scores.out>");
  ArpaLM lm(argv[1]);
  auto in = open_in(argv[2]);
  auto out = open_out(argv[3]);
  std::string line;
  long long n = 0;
  while (std::getline(in, line)) {
    auto f = split(line);
    if (f.empty()) continue;
    std::vector<std::string> words(f.begin() + 1, f.end());
    out << f[0] << " " << lm.sentence_cost(words) << "\n";
    n++;
  }
  std::cerr << "arpa_score: scored " << n << " hypotheses (order "
            << lm.order() << ")\n";
  return 0;
}
