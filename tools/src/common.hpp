// Shared helpers for the bayeslms_tpu native tool family.
//
// These tools are the TPU-framework equivalents of the external Kaldi/SCTK
// binaries the reference pipeline shells out to
// (steps/pytorchnn/lmrescore_nbest_pytorchnn_cuda.sh): lattice N-best
// extraction, ARPA old-LM scoring, archive (de)serialization, symbol
// mapping, and WER scoring.
#pragma once

#include <cstdint>
#include <fstream>
#include <iostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace bayeslm {

inline std::vector<std::string> split(const std::string& s) {
  std::vector<std::string> out;
  std::istringstream iss(s);
  std::string tok;
  while (iss >> tok) out.push_back(tok);
  return out;
}

inline std::vector<std::string> split_on(const std::string& s, char sep) {
  std::vector<std::string> out;
  std::string cur;
  for (char c : s) {
    if (c == sep) {
      out.push_back(cur);
      cur.clear();
    } else {
      cur.push_back(c);
    }
  }
  out.push_back(cur);
  return out;
}

[[noreturn]] inline void die(const std::string& msg) {
  std::cerr << "ERROR: " << msg << std::endl;
  std::exit(1);
}

inline std::ifstream open_in(const std::string& path) {
  std::ifstream f(path);
  if (!f) die("cannot open " + path);
  return f;
}

inline std::ofstream open_out(const std::string& path) {
  std::ofstream f(path);
  if (!f) die("cannot open " + path + " for writing");
  return f;
}

}  // namespace bayeslm
