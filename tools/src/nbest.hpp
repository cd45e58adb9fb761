// Exact N-shortest-paths over acyclic word lattices.
//
// Native equivalent of Kaldi `lattice-to-nbest --acoustic-scale=S --n=N`
// followed by `nbest-to-linear` (reference pipeline
// lmrescore_nbest_pytorchnn_cuda.sh:100-165): extracts the N lowest-cost
// paths under cost = graph + S * acoustic and splits each into the word
// sequence plus separate graph/acoustic totals (and carried alignments).
//
// Algorithm: final-stopping is modeled as an arc to a virtual super-final
// state so backward best-costs beta(v) make the A* heuristic exact; lazy
// path enumeration with priority f = g + beta then yields paths in strict
// cost order. O(N * E log E) worst case, linear in practice on ASR lattices.
#pragma once

#include <queue>
#include <string>
#include <vector>

#include "lattice.hpp"

namespace bayeslm {

struct NBestPath {
  std::vector<int32_t> words;  // non-epsilon labels along the path
  double graph = 0.0, acoustic = 0.0;
  std::string ali;
};

inline std::vector<NBestPath> nbest_paths(const Lattice& lat, int n,
                                          double acoustic_scale) {
  std::vector<NBestPath> out;
  if (lat.num_states == 0) return out;

  // Augmented arc set: real arcs + one stop-arc per final state into the
  // virtual super-final state (id = num_states, word 0).
  const int SF = lat.num_states;
  std::vector<Arc> arcs = lat.arcs;
  for (const auto& [s, w] : lat.finals) {
    Arc a;
    a.src = s;
    a.dst = SF;
    a.word = 0;
    a.graph = w.first;
    a.acoustic = w.second;
    arcs.push_back(a);
  }
  std::vector<std::vector<int>> adj(SF + 1);
  for (int i = 0; i < (int)arcs.size(); ++i) adj[arcs[i].src].push_back(i);

  // beta(v): best cost to the super-final, by reverse topological sweep.
  auto order = topo_order(lat);  // over real states; SF handled as base case
  const double INF = 1e30;
  std::vector<double> beta(SF + 1, INF);
  beta[SF] = 0.0;
  for (auto it = order.rbegin(); it != order.rend(); ++it) {
    int s = *it;
    for (int ai : adj[s]) {
      const Arc& a = arcs[ai];
      double c = a.graph + acoustic_scale * a.acoustic + beta[a.dst];
      if (c < beta[s]) beta[s] = c;
    }
  }
  if (beta[0] >= INF) return out;  // no path to a final state

  struct Partial {
    double g;    // cost so far
    int state;
    int parent;  // index into pool
    int arc;     // arc taken to reach state (-1 for root)
  };
  struct Cmp {
    bool operator()(const std::pair<double, int>& a,
                    const std::pair<double, int>& b) const {
      return a.first > b.first;
    }
  };
  std::vector<Partial> pool;
  std::priority_queue<std::pair<double, int>, std::vector<std::pair<double, int>>,
                      Cmp>
      pq;
  pool.push_back({0.0, 0, -1, -1});
  pq.push({beta[0], 0});

  while (!pq.empty() && (int)out.size() < n) {
    auto [f, idx] = pq.top();
    pq.pop();
    Partial p = pool[idx];
    if (p.state == SF) {
      NBestPath path;
      for (int cur = idx; pool[cur].arc >= 0; cur = pool[cur].parent) {
        const Arc& a = arcs[pool[cur].arc];
        if (a.word != 0) path.words.push_back(a.word);
        path.graph += a.graph;
        path.acoustic += a.acoustic;
        if (!a.ali.empty())
          path.ali = path.ali.empty() ? a.ali : a.ali + "_" + path.ali;
      }
      std::reverse(path.words.begin(), path.words.end());
      out.push_back(std::move(path));
      continue;
    }
    for (int ai : adj[p.state]) {
      const Arc& a = arcs[ai];
      double g = p.g + a.graph + acoustic_scale * a.acoustic;
      pool.push_back({g, a.dst, idx, ai});
      pq.push({g + beta[a.dst], (int)pool.size() - 1});
    }
  }
  return out;
}

}  // namespace bayeslm
