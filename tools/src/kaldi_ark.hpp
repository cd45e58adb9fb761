// Binary Kaldi CompactLattice archive (ark / lat.*.gz) reader + writer.
//
// The reference pipeline consumes binary CompactLattice archives straight
// from the decode dir ("ark:gunzip -c $indir/lat.JOB.gz|",
// lmrescore_nbest_pytorchnn_cuda.sh:100-113). This header teaches the tool
// family that on-disk format so lattice_to_nbest can run on a real decode
// dir without a Kaldi `lattice-copy` pre-conversion (text archives keep
// working unchanged through lattice.hpp).
//
// Byte layout (little-endian host assumed, as in Kaldi/OpenFst):
//   archive entry : <key> ' ' '\0' 'B' <openfst-vector-fst>
//     ("\0B" is Kaldi's binary-mode marker, written by WriteCompactLattice,
//      kaldi/src/lat/kaldi-lattice.cc; the table writer emits "<key> ")
//   fst header    : int32 magic=2125659606, string fsttype ("vector"),
//                   string arctype ("compactlattice44"), int32 version,
//                   int32 flags, uint64 properties, int64 start,
//                   int64 numstates, int64 numarcs
//                   (strings = int32 length + raw chars; OpenFst
//                    FstHeader::Write, fst/fst.cc)
//   per state     : <final CompactLatticeWeight> int64 narcs, then narcs x
//                   { int32 ilabel, int32 olabel, <CompactLatticeWeight>,
//                     int32 nextstate }   (VectorFst body, fst/vector-fst.h)
//   CompactLatticeWeight = { float graph_cost, float acoustic_cost,
//                            int32 n, n x int32 transition-ids }
//     (LatticeWeightTpl<float>::Write then the label string,
//      kaldi/src/fstext/lattice-weight.h)
//
// Gzipped inputs (*.gz, possibly multi-member from concatenated jobs) are
// inflated in memory via zlib.
#pragma once

#include <zlib.h>

#include <cstring>
#include <limits>
#include <sstream>
#include <string>
#include <vector>

#include "lattice.hpp"

namespace bayeslm {

constexpr int32_t kFstMagic = 2125659606;

// ---------------------------------------------------------------- gz / file
inline std::string read_file_maybe_gz(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) die("cannot open " + path);
  std::string raw((std::istreambuf_iterator<char>(f)),
                  std::istreambuf_iterator<char>());
  if (raw.size() < 2 || (unsigned char)raw[0] != 0x1f ||
      (unsigned char)raw[1] != 0x8b)
    return raw;  // not gzip
  std::string out;
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 16) != Z_OK) die("zlib init failed");
  zs.next_in = (Bytef*)raw.data();
  zs.avail_in = (uInt)raw.size();
  std::vector<char> buf(1 << 20);
  for (;;) {
    zs.next_out = (Bytef*)buf.data();
    zs.avail_out = (uInt)buf.size();
    int rc = inflate(&zs, Z_NO_FLUSH);
    out.append(buf.data(), buf.size() - zs.avail_out);
    if (rc == Z_STREAM_END) {
      if (zs.avail_in == 0) break;      // done
      if (inflateReset(&zs) != Z_OK)    // next gzip member (concatenated .gz)
        die("zlib reset failed in " + path);
    } else if (rc != Z_OK) {
      inflateEnd(&zs);
      die("gzip decompression failed in " + path + " (zlib rc " +
          std::to_string(rc) + ")");
    }
  }
  inflateEnd(&zs);
  return out;
}

// ------------------------------------------------------------ binary parse
class BinReader {
 public:
  BinReader(const std::string& data, const std::string& name)
      : d_(data), name_(name) {}

  bool eof() const { return pos_ >= d_.size(); }
  size_t pos() const { return pos_; }
  size_t remaining() const { return d_.size() - pos_; }

  template <class T>
  T get() {
    if (pos_ + sizeof(T) > d_.size()) die("truncated archive " + name_);
    T v;
    std::memcpy(&v, d_.data() + pos_, sizeof(T));
    pos_ += sizeof(T);
    return v;
  }

  std::string get_string() {
    int32_t n = get<int32_t>();
    if (n < 0 || pos_ + (size_t)n > d_.size())
      die("bad string length in " + name_);
    std::string s = d_.substr(pos_, n);
    pos_ += n;
    return s;
  }

  // key is everything up to the separating space
  std::string get_key() {
    size_t sp = d_.find(' ', pos_);
    if (sp == std::string::npos) die("missing key separator in " + name_);
    std::string k = d_.substr(pos_, sp - pos_);
    pos_ = sp + 1;
    return k;
  }

  void expect_binary_marker() {
    if (pos_ + 2 > d_.size() || d_[pos_] != '\0' || d_[pos_ + 1] != 'B')
      die("expected binary marker \\0B in " + name_ +
          " (is this a text archive?)");
    pos_ += 2;
  }

 private:
  const std::string& d_;
  std::string name_;
  size_t pos_ = 0;
};

struct CLWeight {
  float graph = 0.f, acoustic = 0.f;
  std::vector<int32_t> ali;
  bool is_zero() const {
    return graph == std::numeric_limits<float>::infinity() &&
           acoustic == std::numeric_limits<float>::infinity();
  }
};

inline CLWeight read_cl_weight(BinReader& r) {
  CLWeight w;
  w.graph = r.get<float>();
  w.acoustic = r.get<float>();
  int32_t n = r.get<int32_t>();
  // validate against the bytes actually present BEFORE allocating — a
  // corrupt length field must not buy a multi-hundred-MB resize
  if (n < 0 || n > (1 << 26) ||
      (size_t)n * sizeof(int32_t) > r.remaining())
    die("implausible alignment length");
  w.ali.resize(n);
  for (int32_t i = 0; i < n; ++i) w.ali[i] = r.get<int32_t>();
  return w;
}

inline std::string join_ali(const std::vector<int32_t>& ali) {
  std::string s;
  for (size_t i = 0; i < ali.size(); ++i) {
    if (i) s.push_back('_');
    s += std::to_string(ali[i]);
  }
  return s;
}

// Parse one "<key> \0B<fst>" entry starting at the reader position.
inline void read_binary_compact_lattice(BinReader& r, Lattice* lat) {
  lat->arcs.clear();
  lat->finals.clear();
  lat->final_ali.clear();
  lat->num_states = 0;
  lat->utt = r.get_key();
  r.expect_binary_marker();
  int32_t magic = r.get<int32_t>();
  if (magic != kFstMagic)
    die("bad FST magic in " + lat->utt + " (got " + std::to_string(magic) + ")");
  std::string fsttype = r.get_string();
  std::string arctype = r.get_string();
  if (fsttype != "vector")
    die("unsupported fst type '" + fsttype + "' (only vector)");
  if (arctype != "compactlattice44")
    die("unsupported arc type '" + arctype + "' (only compactlattice44)");
  (void)r.get<int32_t>();  // version
  (void)r.get<int32_t>();  // flags (no symbol tables in archives)
  (void)r.get<uint64_t>(); // properties
  int64_t start = r.get<int64_t>();
  int64_t nstates = r.get<int64_t>();
  (void)r.get<int64_t>();  // numarcs (redundant with per-state counts)
  // each state occupies >= 20 bytes (12-byte zero-ali final + 8-byte narcs)
  if (nstates < 0 || nstates > (1 << 28) ||
      (uint64_t)nstates * 20 > r.remaining())
    die("implausible state count");
  lat->num_states = (int32_t)nstates;
  for (int64_t s = 0; s < nstates; ++s) {
    CLWeight fin = read_cl_weight(r);
    if (!fin.is_zero()) {
      lat->finals[(int32_t)s] = {fin.graph, fin.acoustic};
      if (!fin.ali.empty()) lat->final_ali[(int32_t)s] = join_ali(fin.ali);
    }
    int64_t narcs = r.get<int64_t>();
    // each arc occupies >= 24 bytes (labels + zero-ali weight + nextstate)
    if (narcs < 0 || narcs > (1 << 28) ||
        (uint64_t)narcs * 24 > r.remaining())
      die("implausible arc count");
    for (int64_t a = 0; a < narcs; ++a) {
      Arc arc;
      arc.src = (int32_t)s;
      int32_t il = r.get<int32_t>();
      int32_t ol = r.get<int32_t>();
      (void)ol;  // CompactLattice is an acceptor: ilabel == olabel == word
      CLWeight w = read_cl_weight(r);
      arc.word = il;
      arc.graph = w.graph;
      arc.acoustic = w.acoustic;
      arc.ali = join_ali(w.ali);
      arc.dst = r.get<int32_t>();
      lat->arcs.push_back(arc);
    }
  }
  if (nstates > 0 && start != 0) {
    // our Lattice convention is start == 0; remap by swapping ids
    auto remap = [&](int32_t s) -> int32_t {
      if (s == 0) return (int32_t)start;
      if (s == (int32_t)start) return 0;
      return s;
    };
    for (auto& a : lat->arcs) {
      a.src = remap(a.src);
      a.dst = remap(a.dst);
    }
    std::map<int32_t, std::pair<double, double>> nf;
    for (auto& [s, w] : lat->finals) nf[remap(s)] = w;
    lat->finals = std::move(nf);
    std::map<int32_t, std::string> na;
    for (auto& [s, w] : lat->final_ali) na[remap(s)] = w;
    lat->final_ali = std::move(na);
  }
}

// ------------------------------------------------------------ binary write
inline void put_i32(std::ostream& os, int32_t v) {
  os.write(reinterpret_cast<const char*>(&v), sizeof(v));
}
inline void put_i64(std::ostream& os, int64_t v) {
  os.write(reinterpret_cast<const char*>(&v), sizeof(v));
}
inline void put_u64(std::ostream& os, uint64_t v) {
  os.write(reinterpret_cast<const char*>(&v), sizeof(v));
}
inline void put_f32(std::ostream& os, float v) {
  os.write(reinterpret_cast<const char*>(&v), sizeof(v));
}
inline void put_str(std::ostream& os, const std::string& s) {
  put_i32(os, (int32_t)s.size());
  os.write(s.data(), (std::streamsize)s.size());
}

inline void write_cl_weight(std::ostream& os, float graph, float acoustic,
                            const std::string& ali) {
  put_f32(os, graph);
  put_f32(os, acoustic);
  std::vector<int32_t> ids;
  if (!ali.empty())
    for (const auto& t : split_on(ali, '_'))
      if (!t.empty()) ids.push_back((int32_t)std::stol(t));
  put_i32(os, (int32_t)ids.size());
  for (int32_t id : ids) put_i32(os, id);
}

// Emit one "<key> \0B<fst>" binary archive entry (fixture generation and
// the read->nbest->rebuild round trip; format mirror of the reader above).
inline void write_binary_compact_lattice(std::ostream& os, const Lattice& lat) {
  const float inf = std::numeric_limits<float>::infinity();
  os << lat.utt << ' ';
  os.put('\0');
  os.put('B');
  put_i32(os, kFstMagic);
  put_str(os, "vector");
  put_str(os, "compactlattice44");
  put_i32(os, 2);   // VectorFst file version
  put_i32(os, 0);   // flags: no symbol tables
  put_u64(os, 0);   // properties: none asserted
  put_i64(os, lat.num_states > 0 ? 0 : -1);  // start state
  put_i64(os, lat.num_states);
  put_i64(os, (int64_t)lat.arcs.size());
  auto adj = lat.out_arcs();
  for (int32_t s = 0; s < lat.num_states; ++s) {
    auto fit = lat.finals.find(s);
    if (fit == lat.finals.end()) {
      write_cl_weight(os, inf, inf, "");
    } else {
      auto ait = lat.final_ali.find(s);
      write_cl_weight(os, (float)fit->second.first, (float)fit->second.second,
                      ait == lat.final_ali.end() ? "" : ait->second);
    }
    put_i64(os, (int64_t)adj[s].size());
    for (int ai : adj[s]) {
      const Arc& a = lat.arcs[ai];
      put_i32(os, a.word);
      put_i32(os, a.word);
      write_cl_weight(os, (float)a.graph, (float)a.acoustic, a.ali);
      put_i32(os, a.dst);
    }
  }
}

// --------------------------------------------------------------- dispatcher
// Iterates lattices from a path that may be: text archive (lattice-copy
// form), binary archive, or either one gzipped.
class LatticeSource {
 public:
  explicit LatticeSource(const std::string& path)
      : data_(read_file_maybe_gz(path)), name_(path), bin_(data_, path) {
    // binary archives contain "\0B" right after the first "<key> "
    size_t sp = data_.find(' ');
    binary_ = sp != std::string::npos && sp + 2 < data_.size() &&
              data_[sp + 1] == '\0' && data_[sp + 2] == 'B';
    if (!binary_) text_.str(data_);
  }

  bool binary() const { return binary_; }

  bool next(Lattice* lat) {
    if (binary_) {
      if (bin_.eof()) return false;
      read_binary_compact_lattice(bin_, lat);
      return true;
    }
    return read_lattice(text_, lat);
  }

 private:
  std::string data_;
  std::string name_;
  BinReader bin_;
  std::istringstream text_;
  bool binary_ = false;
};

}  // namespace bayeslm
