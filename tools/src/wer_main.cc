// wer: align hypotheses against references and print a Kaldi/sclite-style
// summary. Native replacement for the SCTK scoring stage
// (local/score_asclite.sh via lmrescore_nbest_pytorchnn_cuda.sh:239-245).
//
// Usage: wer [--glm=FILE] [--asclite-clean] <ref.txt> <hyp.txt>
//   both files: "utt word word …"; utterances matched by id; hyps missing a
//   ref are skipped (refs missing a hyp count as deletions). MULTIPLE ref
//   lines with the same utt id are overlapping speakers — the hypothesis is
//   aligned against all of them simultaneously (asclite-style, hubscr -a -o).
//   --glm applies SCTK GLM token-rewrite rules to refs AND hyps (hubscr -g);
//   --asclite-clean drops noise tags / hesitations / <unk> from the hyps
//   (score_asclite.sh:87-93).
// Prints: %WER P [ N / R, I ins, D del, S sub ]  and %SER.
#include <cstdio>
#include <map>

#include "wer.hpp"

using namespace bayeslm;

static std::map<std::string, std::vector<std::vector<std::string>>> read_trans(
    const std::string& p) {
  std::map<std::string, std::vector<std::vector<std::string>>> m;
  auto f = open_in(p);
  std::string line;
  while (std::getline(f, line)) {
    auto w = split(line);
    if (w.empty()) continue;
    std::vector<std::string> words(w.begin() + 1, w.end());
    auto& lists = m[w[0]];
    // exact duplicate lines (same id AND same words) are accidental —
    // concatenated ref files — and must not become phantom overlap
    // streams; distinct word sequences under one id are real overlapping
    // speakers (asclite format)
    bool dup = false;
    for (const auto& prev : lists)
      if (prev == words) { dup = true; break; }
    if (dup)
      // stderr so concatenated-file accidents stay visible, and genuinely
      // identical overlapping-speaker segments aren't silently altered
      std::fprintf(stderr,
                   "wer: warning: dropping exact duplicate line for utterance "
                   "'%s' in %s\n", w[0].c_str(), p.c_str());
    else
      lists.push_back(std::move(words));
  }
  return m;
}

int main(int argc, char** argv) {
  GlmFilter glm;
  bool clean = false;
  std::vector<std::string> pos;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a.rfind("--glm=", 0) == 0)
      glm = GlmFilter(a.substr(6));
    else if (a == "--asclite-clean")
      clean = true;
    else
      pos.push_back(a);
  }
  if (pos.size() != 2)
    die("usage: wer [--glm=FILE] [--asclite-clean] <ref.txt> <hyp.txt>");
  auto ref = read_trans(pos[0]);
  auto hyp = read_trans(pos[1]);

  WerCounts total;
  for (const auto& [utt, rlists] : ref) {
    auto it = hyp.find(utt);
    std::vector<std::string> h =
        (it == hyp.end() || it->second.empty()) ? std::vector<std::string>{}
                                                : it->second.front();
    if (clean) h = asclite_clean(h);
    std::vector<std::vector<std::string>> rs = rlists;
    if (!glm.empty()) {
      for (auto& r : rs) r = glm.apply(r);
      h = glm.apply(h);
    } else if (rlists.size() > 1 || clean) {
      // multi-ref / cleaned comparisons are case-insensitive like sclite
      for (auto& r : rs)
        for (auto& w : r)
          for (auto& c : w) c = (char)std::toupper((unsigned char)c);
      for (auto& w : h)
        for (auto& c : w) c = (char)std::toupper((unsigned char)c);
    }
    total.add(align_wer_multi(rs, h));
  }
  long long err = total.sub + total.del + total.ins;
  std::printf("%%WER %.2f [ %lld / %lld, %lld ins, %lld del, %lld sub ]\n",
              total.wer(), err, total.ref_len, total.ins, total.del, total.sub);
  std::printf("%%SER %.2f [ %lld / %lld ]\n",
              total.sent ? 100.0 * total.err_sent / total.sent : 0.0,
              total.err_sent, total.sent);
  return 0;
}
