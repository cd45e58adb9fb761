// lattice_copy: convert lattice archives between text and binary
// CompactLattice form (the subset of Kaldi's `lattice-copy` the pipeline
// needs; kaldi-compatible byte layout documented in kaldi_ark.hpp).
//
// Usage: lattice_copy [--binary] <in> <out>
//   <in> : text, binary, or gzipped archive (auto-detected)
//   <out>: text form by default; --binary writes "<key> \0B<fst>" entries
//          (gzip the result externally for a lat.*.gz fixture).
#include "kaldi_ark.hpp"

using namespace bayeslm;

int main(int argc, char** argv) {
  bool binary = false;
  std::vector<std::string> pos;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--binary")
      binary = true;
    else
      pos.push_back(a);
  }
  if (pos.size() != 2) die("usage: lattice_copy [--binary] <in> <out>");
  LatticeSource in(pos[0]);
  std::ofstream out(pos[1], std::ios::binary);
  if (!out) die("cannot open " + pos[1] + " for writing");
  Lattice lat;
  long long n = 0;
  while (in.next(&lat)) {
    if (binary)
      write_binary_compact_lattice(out, lat);
    else
      write_lattice(out, lat);
    ++n;
  }
  std::cerr << "lattice_copy: " << n << " lattices ("
            << (in.binary() ? "binary" : "text") << " -> "
            << (binary ? "binary" : "text") << ")\n";
  return 0;
}
