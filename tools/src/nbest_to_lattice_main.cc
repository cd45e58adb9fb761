// nbest_to_lattice: rebuild lattices from linear n-best archives.
//
// Native equivalent of `linear-to-nbest | nbest-to-lattice` (reference
// pipeline :231-237): each utterance's K hypotheses become a union of linear
// paths from a common start state; the (rescored) LM cost sits on the first
// arc, the acoustic cost is carried per-path on its final weight.
//
// Usage: nbest_to_lattice <words.txt> <lmwt.txt> <acwt.txt> <lats.out>
//   words: "utt-K w1 w2 …"; lmwt/acwt: "utt-K cost".
#include <map>

#include "lattice.hpp"

using namespace bayeslm;

int main(int argc, char** argv) {
  if (argc != 5)
    die("usage: nbest_to_lattice <words> <lmwt> <acwt> <lats.out>");

  std::map<std::string, double> lmwt, acwt;
  for (int i = 2; i <= 3; ++i) {
    auto f = open_in(argv[i]);
    std::string line;
    while (std::getline(f, line)) {
      auto p = split(line);
      if (p.size() == 2) (i == 2 ? lmwt : acwt)[p[0]] = std::stod(p[1]);
    }
  }

  // group hyps by utterance (key = prefix before last '-')
  std::map<std::string, std::vector<std::pair<std::string, std::vector<int32_t>>>> utts;
  {
    auto f = open_in(argv[1]);
    std::string line;
    while (std::getline(f, line)) {
      auto p = split(line);
      if (p.empty()) continue;
      std::string key = p[0].substr(0, p[0].rfind('-'));
      std::vector<int32_t> ws;
      for (size_t j = 1; j < p.size(); ++j) ws.push_back(std::stoi(p[j]));
      utts[key].push_back({p[0], ws});
    }
  }

  auto out = open_out(argv[4]);
  for (const auto& [utt, hyps] : utts) {
    Lattice lat;
    lat.utt = utt;
    lat.num_states = 1;  // state 0 = start
    for (const auto& [hkey, words] : hyps) {
      double g = lmwt.count(hkey) ? lmwt.at(hkey) : 0.0;
      double a = acwt.count(hkey) ? acwt.at(hkey) : 0.0;
      int cur = 0;
      for (size_t i = 0; i < words.size(); ++i) {
        Arc arc;
        arc.src = cur;
        arc.dst = lat.num_states++;
        arc.word = words[i];
        arc.graph = (i == 0) ? g : 0.0;  // LM cost on the first arc
        arc.acoustic = 0.0;
        lat.arcs.push_back(arc);
        cur = arc.dst;
      }
      if (words.empty()) {
        Arc arc;  // epsilon path for an empty hypothesis
        arc.src = 0;
        arc.dst = lat.num_states++;
        arc.word = 0;
        arc.graph = g;
        lat.arcs.push_back(arc);
        cur = arc.dst;
      }
      lat.finals[cur] = {0.0, a};
    }
    write_lattice(out, lat);
  }
  return 0;
}
