// lattice-to-nbest: extract N best paths from text word lattices and emit
// linear archives in one pass.
//
// Fuses the reference pipeline's `lattice-to-nbest | nbest-to-linear` stages
// (lmrescore_nbest_pytorchnn_cuda.sh:100-165) into a single tool: for each
// utterance it writes `utt-K` entries to a words archive (int ids), a graph-
// score (lmwt) archive, an acoustic-score (acwt) archive, and optionally an
// alignment archive.
//
// Usage:
//   lattice_to_nbest --n=20 --acoustic-scale=0.1 <args...>
#include <cstring>
#include <iomanip>

#include "kaldi_ark.hpp"
#include "nbest.hpp"

using namespace bayeslm;

int main(int argc, char** argv) {
  int n = 20;
  double ac_scale = 0.1;
  std::vector<std::string> args;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a.rfind("--n=", 0) == 0)
      n = std::stoi(a.substr(4));
    else if (a.rfind("--acoustic-scale=", 0) == 0)
      ac_scale = std::stod(a.substr(17));
    else
      args.push_back(a);
  }
  if (args.size() < 4 || args.size() > 5)
    die("usage: lattice_to_nbest [--n=N] [--acoustic-scale=S] "
        "<lattices> <words.out> <lmwt.out> <acwt.out> [<ali.out>]");

  LatticeSource in(args[0]);  // text / binary / gzipped archives alike
  auto words_out = open_out(args[1]);
  auto lmwt_out = open_out(args[2]);
  auto acwt_out = open_out(args[3]);
  std::ofstream ali_out;
  if (args.size() == 5) ali_out = open_out(args[4]);

  Lattice lat;
  long long utts = 0, paths = 0;
  while (in.next(&lat)) {
    auto nb = nbest_paths(lat, n, ac_scale);
    for (size_t k = 0; k < nb.size(); ++k) {
      std::string key = lat.utt + "-" + std::to_string(k + 1);
      words_out << key;
      for (int32_t w : nb[k].words) words_out << " " << w;
      words_out << "\n";
      lmwt_out << key << " " << std::setprecision(9) << nb[k].graph << "\n";
      acwt_out << key << " " << std::setprecision(9) << nb[k].acoustic << "\n";
      if (ali_out.is_open()) ali_out << key << " " << nb[k].ali << "\n";
    }
    utts++;
    paths += (long long)nb.size();
  }
  std::cerr << "lattice_to_nbest: " << paths << " paths from " << utts
            << " lattices (n=" << n << ", acwt=" << ac_scale << ")\n";
  return 0;
}
