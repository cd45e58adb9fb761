// int2sym: map integer word ids to text using a words.txt symbol table.
// Native equivalent of utils/int2sym.pl (reference pipeline :190).
// Usage: int2sym [--field-begin=2] <words.txt> <in.txt> <out.txt>
#include <unordered_map>

#include "common.hpp"

using namespace bayeslm;

int main(int argc, char** argv) {
  int field_begin = 2;  // 1-based; fields before it pass through (utt ids)
  std::vector<std::string> args;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a.rfind("--field-begin=", 0) == 0)
      field_begin = std::stoi(a.substr(14));
    else
      args.push_back(a);
  }
  if (args.size() != 3) die("usage: int2sym [--field-begin=K] <words.txt> <in> <out>");

  std::unordered_map<int64_t, std::string> sym;
  {
    auto f = open_in(args[0]);
    std::string line;
    while (std::getline(f, line)) {
      auto p = split(line);
      if (p.size() >= 2) sym[std::stoll(p[1])] = p[0];
    }
  }
  auto in = open_in(args[1]);
  auto out = open_out(args[2]);
  std::string line;
  while (std::getline(in, line)) {
    auto f = split(line);
    for (size_t i = 0; i < f.size(); ++i) {
      if (i) out << " ";
      if ((int)i + 1 >= field_begin) {
        auto it = sym.find(std::stoll(f[i]));
        if (it == sym.end()) die("no symbol for id " + f[i]);
        out << it->second;
      } else {
        out << f[i];
      }
    }
    out << "\n";
  }
  return 0;
}
