// Word lattice representation + Kaldi-compatible text (de)serialization.
//
// Reads the text form emitted by Kaldi's `lattice-copy` on CompactLattice
// archives (the on-disk format the reference pipeline's lattice stages
// consume, lmrescore_nbest_pytorchnn_cuda.sh:100-174):
//
//   <utt-id>
//   <src> <dst> <word> <graph_cost>,<acoustic_cost>[,<ali>]
//   <final_state> [<graph_cost>,<acoustic_cost>[,<ali>]]
//   <blank line>
//
// Also accepts a simplified 5-column form `src dst word graph ac`.
#pragma once

#include <algorithm>
#include <cstdint>
#include <map>
#include <queue>
#include <string>
#include <vector>

#include "common.hpp"

namespace bayeslm {

struct Arc {
  int32_t src = 0, dst = 0, word = 0;
  double graph = 0.0, acoustic = 0.0;
  std::string ali;  // opaque frame-alignment payload, carried through
};

struct Lattice {
  std::string utt;
  int32_t num_states = 0;
  std::vector<Arc> arcs;
  // final costs per state; states absent are non-final
  std::map<int32_t, std::pair<double, double>> finals;  // graph, acoustic
  // alignment strings on final weights (binary CompactLattice only; the
  // text form and N-best extraction ignore them, like lattice-rmali)
  std::map<int32_t, std::string> final_ali;

  std::vector<std::vector<int>> out_arcs() const {
    std::vector<std::vector<int>> adj(num_states);
    for (int i = 0; i < (int)arcs.size(); ++i) adj[arcs[i].src].push_back(i);
    return adj;
  }
};

// Parse one utterance block; returns false at EOF.
inline bool read_lattice(std::istream& in, Lattice* lat) {
  lat->arcs.clear();
  lat->finals.clear();
  lat->num_states = 0;
  lat->utt.clear();
  std::string line;
  // skip blank lines, read utt id
  while (std::getline(in, line)) {
    auto f = split(line);
    if (!f.empty()) {
      if (f.size() != 1) die("expected utterance id line, got: " + line);
      lat->utt = f[0];
      break;
    }
  }
  if (lat->utt.empty()) return false;

  while (std::getline(in, line)) {
    auto f = split(line);
    if (f.empty()) break;  // end of block
    if (f.size() == 1) {
      lat->finals[std::stoi(f[0])] = {0.0, 0.0};
      lat->num_states = std::max(lat->num_states, std::stoi(f[0]) + 1);
    } else if (f.size() == 2) {
      auto w = split_on(f[1], ',');
      lat->finals[std::stoi(f[0])] = {std::stod(w[0]), w.size() > 1 ? std::stod(w[1]) : 0.0};
      lat->num_states = std::max(lat->num_states, std::stoi(f[0]) + 1);
    } else if (f.size() == 4 || f.size() == 5) {
      Arc a;
      a.src = std::stoi(f[0]);
      a.dst = std::stoi(f[1]);
      a.word = std::stoi(f[2]);
      if (f.size() == 4) {
        auto w = split_on(f[3], ',');
        a.graph = std::stod(w[0]);
        a.acoustic = w.size() > 1 && !w[1].empty() ? std::stod(w[1]) : 0.0;
        if (w.size() > 2) a.ali = w[2];
      } else {
        a.graph = std::stod(f[3]);
        a.acoustic = std::stod(f[4]);
      }
      lat->arcs.push_back(a);
      lat->num_states = std::max(lat->num_states, std::max(a.src, a.dst) + 1);
    } else {
      die("bad lattice line: " + line);
    }
  }
  return true;
}

inline void write_lattice(std::ostream& out, const Lattice& lat) {
  out << lat.utt << "\n";
  for (const auto& a : lat.arcs) {
    out << a.src << " " << a.dst << " " << a.word << " " << a.graph << ","
        << a.acoustic;
    if (!a.ali.empty()) out << "," << a.ali;
    out << "\n";
  }
  for (const auto& [s, w] : lat.finals) {
    if (w.first == 0.0 && w.second == 0.0)
      out << s << "\n";
    else
      out << s << " " << w.first << "," << w.second << "\n";
  }
  out << "\n";
}

// Topological order of states (lattices are acyclic); dies on cycles.
inline std::vector<int32_t> topo_order(const Lattice& lat) {
  std::vector<int> indeg(lat.num_states, 0);
  for (const auto& a : lat.arcs) indeg[a.dst]++;
  auto adj = lat.out_arcs();
  std::vector<int32_t> order;
  std::queue<int32_t> q;
  for (int s = 0; s < lat.num_states; ++s)
    if (indeg[s] == 0) q.push(s);
  while (!q.empty()) {
    int s = q.front();
    q.pop();
    order.push_back(s);
    for (int ai : adj[s])
      if (--indeg[lat.arcs[ai].dst] == 0) q.push(lat.arcs[ai].dst);
  }
  if ((int)order.size() != lat.num_states) die("lattice has a cycle: " + lat.utt);
  return order;
}

}  // namespace bayeslm
