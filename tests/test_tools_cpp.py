"""Native tool family: build + behavioral tests on synthetic data.

Covers the C++ equivalents of the reference's external binaries: N-best
extraction ordering/scores, ARPA backoff scoring vs hand computation, WER
alignment counts, int2sym, nbest->lattice round-trip, and native-vs-python
tokenizer parity.
"""

import math
import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(ROOT, "tools", "bin")


@pytest.fixture(scope="module", autouse=True)
def build_tools():
    subprocess.run(["make", "-C", os.path.join(ROOT, "tools")], check=True,
                   capture_output=True)


def tool(name):
    return os.path.join(BIN, name)


LATTICE = """utt1
0 1 5 1.0,2.0
0 2 6 0.5,1.0
1 3 7 0.5,0.5
2 3 8 2.0,3.0
3 0.5,0.5

utt2
0 1 9 0.0,10.0
1

"""


def test_lattice_to_nbest_exact_order(tmp_path):
    lat = tmp_path / "lats.txt"
    lat.write_text(LATTICE)
    w, g, a = tmp_path / "w", tmp_path / "g", tmp_path / "a"
    subprocess.run(
        [tool("lattice_to_nbest"), "--n=5", "--acoustic-scale=0.1",
         str(lat), str(w), str(g), str(a)],
        check=True, capture_output=True,
    )
    words = w.read_text().splitlines()
    graphs = dict(l.split() for l in g.read_text().splitlines())
    acs = dict(l.split() for l in a.read_text().splitlines())

    # utt1 path costs at acwt=0.1 (graph + 0.1*acoustic, incl. final 0.5,0.5):
    #   5->7: (1.0+0.5+0.5) + 0.1*(2.0+0.5+0.5) = 2.30
    #   6->8: (0.5+2.0+0.5) + 0.1*(1.0+3.0+0.5) = 3.45
    assert words[0] == "utt1-1 5 7"
    assert words[1] == "utt1-2 6 8"
    np.testing.assert_allclose(float(graphs["utt1-1"]), 2.0)
    np.testing.assert_allclose(float(acs["utt1-1"]), 3.0)
    np.testing.assert_allclose(float(graphs["utt1-2"]), 3.0)
    np.testing.assert_allclose(float(acs["utt1-2"]), 4.5)
    # utt2: single arc, zero-cost final
    assert words[2] == "utt2-1 9"
    np.testing.assert_allclose(float(acs["utt2-1"]), 10.0)


ARPA = """\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-0.5\t<s>\t-0.30103
-0.60206\ta\t-0.30103
-0.69897\tb\t0.0
-1.0\t</s>
-2.0\t<unk>

\\2-grams:
-0.30103\t<s> a
-0.15490\ta b

\\end\\
"""


def test_arpa_score_backoff(tmp_path):
    lm = tmp_path / "lm.arpa"
    lm.write_text(ARPA)
    hyps = tmp_path / "hyps.txt"
    hyps.write_text("u-1 a b\nu-2 zzz\n")
    out = tmp_path / "scores.txt"
    subprocess.run([tool("arpa_score"), str(lm), str(hyps), str(out)],
                   check=True, capture_output=True)
    scores = dict(l.split() for l in out.read_text().splitlines())

    # u-1 "a b": log10 P = P(a|<s>) + P(b|<s> a -> backoff(<s> a)?  no 3-grams:
    #   context (<s>, a): bigram "a b" exists with backoff from... order=2 so
    #   context is just previous word:
    #   P(a|<s>) = -0.30103 (bigram)
    #   P(b|a)   = -0.15490 (bigram)
    #   P(</s>|b)= backoff(b)=0.0 + P(</s>) = -1.0
    log10p = -0.30103 - 0.15490 - 1.0
    np.testing.assert_allclose(float(scores["u-1"]), -log10p * math.log(10), rtol=1e-4)

    # u-2 "zzz" -> <unk>: P(<unk>|<s>) = backoff(<s>) + P(<unk>) = -0.30103-2.0
    #   P(</s>|<unk>) = backoff(<unk>)=0 + P(</s>) = -1.0
    log10p2 = (-0.30103 - 2.0) + (-1.0)
    np.testing.assert_allclose(float(scores["u-2"]), -log10p2 * math.log(10), rtol=1e-4)


def test_wer_counts(tmp_path):
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 a b c d\nu2 x y\n")
    # u1: 1 sub (b->q), 1 del (d); u2: 1 ins (z)
    hyp.write_text("u1 a q c\nu2 x y z\n")
    out = subprocess.run([tool("wer"), str(ref), str(hyp)], check=True,
                         capture_output=True, text=True).stdout
    assert "%WER 50.00 [ 3 / 6, 1 ins, 1 del, 1 sub ]" in out
    assert "%SER 100.00 [ 2 / 2 ]" in out


def test_int2sym(tmp_path):
    wt = tmp_path / "words.txt"
    wt.write_text("<eps> 0\nfoo 1\nbar 2\n")
    inp = tmp_path / "in.txt"
    inp.write_text("utt-1 1 2 1\n")
    out = tmp_path / "out.txt"
    subprocess.run([tool("int2sym"), str(wt), str(inp), str(out)],
                   check=True, capture_output=True)
    assert out.read_text() == "utt-1 foo bar foo\n"


def test_nbest_to_lattice_roundtrip(tmp_path):
    """nbest -> lattice -> nbest preserves words and total costs."""
    w = tmp_path / "w"; g = tmp_path / "g"; a = tmp_path / "a"
    w.write_text("u-1 5 7\nu-2 6 8\n")
    g.write_text("u-1 2.0\nu-2 3.0\n")
    a.write_text("u-1 3.0\nu-2 4.0\n")
    lats = tmp_path / "lats.txt"
    subprocess.run([tool("nbest_to_lattice"), str(w), str(g), str(a), str(lats)],
                   check=True, capture_output=True)
    w2 = tmp_path / "w2"; g2 = tmp_path / "g2"; a2 = tmp_path / "a2"
    subprocess.run(
        [tool("lattice_to_nbest"), "--n=5", "--acoustic-scale=0.1",
         str(lats), str(w2), str(g2), str(a2)],
        check=True, capture_output=True,
    )
    assert w2.read_text().splitlines() == ["u-1 5 7", "u-2 6 8"]
    graphs = dict(l.split() for l in g2.read_text().splitlines())
    acs = dict(l.split() for l in a2.read_text().splitlines())
    np.testing.assert_allclose(float(graphs["u-1"]), 2.0)
    np.testing.assert_allclose(float(acs["u-2"]), 4.0)


def test_native_tokenizer_matches_python(tmp_path):
    from bayeslms_tpu.data.corpus import Corpus

    (tmp_path / "words.txt").write_text("<s> 0\n<unk> 1\nhello 2\nworld 3\n")
    text = "hello world\nworld OOV hello\n\nhello\n"
    for split in ("train", "valid", "test"):
        (tmp_path / f"{split}.txt").write_text(text)

    c_native = Corpus(str(tmp_path), use_native=True)
    c_python = Corpus(str(tmp_path), use_native=False)
    assert c_native._native is not None, "native tokenizer should have loaded"
    np.testing.assert_array_equal(c_native.train, c_python.train)
    np.testing.assert_array_equal(c_native.valid, c_python.valid)


ARPA_UNK_CTX = """\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-0.5\t<s>\t-0.30103
-0.60206\ta\t-0.30103
-0.69897\tb\t0.0
-1.0\t</s>
-2.0\t<unk>\t-0.1

\\2-grams:
-0.30103\t<s> a
-0.15490\ta b
-0.25\t<unk> b

\\end\\
"""


def test_arpa_oov_in_context_maps_to_unk(tmp_path):
    """An OOV word must enter the CONTEXT as <unk> (like Kaldi's
    G-composition), so a following word can hit its '<unk> w' bigram instead
    of silently backing off to unigram."""
    lm = tmp_path / "lm.arpa"
    lm.write_text(ARPA_UNK_CTX)
    hyps = tmp_path / "hyps.txt"
    hyps.write_text("u-1 zzz b\n")
    out = tmp_path / "scores.txt"
    subprocess.run([tool("arpa_score"), str(lm), str(hyps), str(out)],
                   check=True, capture_output=True)
    scores = dict(l.split() for l in out.read_text().splitlines())
    # P(<unk>|<s>) = backoff(<s>) + P(<unk>) = -0.30103 - 2.0
    # P(b|<unk>)   = -0.25            (the '<unk> b' bigram MUST be hit)
    # P(</s>|b)    = backoff(b)=0 + P(</s>) = -1.0
    log10p = (-0.30103 - 2.0) + (-0.25) + (-1.0)
    np.testing.assert_allclose(float(scores["u-1"]), -log10p * math.log(10),
                               rtol=1e-4)


def test_wer_glm_filtering(tmp_path):
    """GLM token-rewrite rules (hubscr -g): applied to refs AND hyps,
    multiword LHS, first alternative of { A / B }, case-insensitive."""
    glm = tmp_path / "test.glm"
    glm.write_text(
        ";; test rules\n"
        "GONNA => GOING TO / [ ] __ [ ]\n"
        "WANNA => { WANT TO / WANT A } / [ ] __ [ ]\n"
        "KIND OF => KINDA / [ ] __ [ ]\n"
    )
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 i am gonna go\nu2 kind of nice\n")
    hyp.write_text("u1 i am going to go\nu2 kinda nice\n")
    out = subprocess.run(
        [tool("wer"), f"--glm={glm}", str(ref), str(hyp)],
        check=True, capture_output=True, text=True,
    ).stdout
    # after filtering both sides are identical -> 0 errors
    assert "%WER 0.00" in out, out

    # wanna -> first alternative WANT TO
    ref.write_text("u1 i wanna go\n")
    hyp.write_text("u1 i want to go\n")
    out = subprocess.run(
        [tool("wer"), f"--glm={glm}", str(ref), str(hyp)],
        check=True, capture_output=True, text=True,
    ).stdout
    assert "%WER 0.00" in out, out


def test_wer_asclite_clean(tmp_path):
    """--asclite-clean drops hesitations / [noise] tags / <unk> from hyps
    (score_asclite.sh:87-93)."""
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 hello world\n")
    hyp.write_text("u1 uh hello [noise] world <unk> hmm\n")
    out = subprocess.run(
        [tool("wer"), "--asclite-clean", str(ref), str(hyp)],
        check=True, capture_output=True, text=True,
    ).stdout
    assert "%WER 0.00" in out, out


def test_wer_overlapping_speakers(tmp_path):
    """Two ref lines with the same utt id = two concurrent speakers: the hyp
    interleaving of both streams must align with 0 errors (asclite-style
    multi-stream alignment), and a plain single-ref alignment of the same
    data would not."""
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    # speaker A: "a b c", speaker B: "x y" — hyp hears the interleaving
    ref.write_text("u1 a b c\nu1 x y\n")
    hyp.write_text("u1 a x b y c\n")
    out = subprocess.run([tool("wer"), str(ref), str(hyp)], check=True,
                         capture_output=True, text=True).stdout
    assert "%WER 0.00 [ 0 / 5" in out, out

    # one substituted word in speaker B's stream
    hyp.write_text("u1 a x b q c\n")
    out = subprocess.run([tool("wer"), str(ref), str(hyp)], check=True,
                         capture_output=True, text=True).stdout
    assert "%WER 20.00 [ 1 / 5, 0 ins, 0 del, 1 sub ]" in out, out


def test_wer_duplicate_ref_lines_deduped(tmp_path):
    """Exact duplicate ref lines (concatenated ref files) must not become
    phantom overlap streams that turn every word into a deletion."""
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 a b c\nu1 a b c\nu2 x y\n")  # u1 duplicated verbatim
    hyp.write_text("u1 a b c\nu2 x y\n")
    out = subprocess.run([tool("wer"), str(ref), str(hyp)], check=True,
                         capture_output=True, text=True).stdout
    assert "%WER 0.00 [ 0 / 5" in out


def test_binary_lattice_roundtrip(tmp_path):
    """Binary CompactLattice archives (kaldi_ark.hpp): text -> binary -> text
    preserves every arc/weight/alignment, gzipped binary reads transparently,
    and lattice_to_nbest produces identical archives from text and binary
    inputs (the real lat.*.gz decode-dir path,
    lmrescore_nbest_pytorchnn_cuda.sh:100-113)."""
    import gzip

    text = (
        "u1\n0 1 5 1.25,2.5,10_11_12\n0 2 6 0.5,1.0,13\n1 3 7 0.5,0.5,14_15\n"
        "2 3 8 2.0,3.0\n3 0.5,0.25\n\n"
        "u2\n0 1 9 0.0,10.0,21_22\n1\n\n"
    )
    t = tmp_path / "lats.txt"
    t.write_text(text)
    b = tmp_path / "lats.ark"
    subprocess.run([tool("lattice_copy"), "--binary", str(t), str(b)],
                   check=True, capture_output=True)
    # gzip the binary archive like a decode dir's lat.1.gz
    gz = tmp_path / "lat.1.gz"
    gz.write_bytes(gzip.compress(b.read_bytes()))
    # binary -> text round trip (from the gz) matches a text->text copy
    # exactly (same printer normalizes float formatting, e.g. 1.0 -> 1)
    norm = tmp_path / "norm.txt"
    subprocess.run([tool("lattice_copy"), str(t), str(norm)],
                   check=True, capture_output=True)
    back = tmp_path / "back.txt"
    subprocess.run([tool("lattice_copy"), str(gz), str(back)],
                   check=True, capture_output=True)
    assert back.read_text() == norm.read_text()
    # binary -> binary copy is byte-stable (final_ali etc. preserved)
    b2 = tmp_path / "lats2.ark"
    subprocess.run([tool("lattice_copy"), "--binary", str(gz), str(b2)],
                   check=True, capture_output=True)
    assert b2.read_bytes() == b.read_bytes()

    # nbest from text and from gzipped binary are identical
    outs = {}
    for name, src in [("text", t), ("bin", gz)]:
        w = tmp_path / f"w.{name}"
        g = tmp_path / f"g.{name}"
        a = tmp_path / f"a.{name}"
        al = tmp_path / f"al.{name}"
        subprocess.run(
            [tool("lattice_to_nbest"), "--n=5", "--acoustic-scale=0.1",
             str(src), str(w), str(g), str(a), str(al)],
            check=True, capture_output=True)
        outs[name] = (w.read_text(), g.read_text(), a.read_text(),
                      al.read_text())
    assert outs["text"] == outs["bin"]


def test_binary_lattice_fixture_in_tree():
    """The checked-in gzipped binary fixture decodes and extracts n-best."""
    fix = os.path.join(ROOT, "tests", "fixtures", "lat.1.gz")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "t.txt")
        subprocess.run([tool("lattice_copy"), fix, out], check=True,
                       capture_output=True)
        txt = open(out).read()
        assert txt.startswith("AMI_ES2011a_H00-u1\n")
        assert "10_11_12" in txt  # alignments survive
        w = os.path.join(d, "w")
        subprocess.run(
            [tool("lattice_to_nbest"), "--n=5", "--acoustic-scale=0.1", fix,
             w, os.path.join(d, "g"), os.path.join(d, "a")],
            check=True, capture_output=True)
        lines = open(w).read().splitlines()
        assert lines[0].startswith("AMI_ES2011a_H00-u1-1 ")


def test_binary_marker_on_text_input_errors(tmp_path):
    """A text archive never trips the binary parser; a corrupt binary header
    dies with a clear message instead of garbage output."""
    bad = tmp_path / "bad.ark"
    bad.write_bytes(b"u1 \x00Bxxxxgarbage")
    proc = subprocess.run([tool("lattice_copy"), str(bad), str(tmp_path / "o")],
                          capture_output=True, text=True)
    assert proc.returncode != 0
    assert "magic" in proc.stderr or "truncated" in proc.stderr


def test_binary_reader_malformed_inputs(tmp_path):
    """Fuzz-shaped robustness of the binary CompactLattice reader: corrupt
    length fields, truncations, and random byte flips must produce a clean
    nonzero exit (die() with a message), never a signal death (segfault /
    OOM-kill from an alloc-before-validate) or a hang."""
    import gzip
    import struct

    def run(path):
        return subprocess.run(
            [tool("lattice_copy"), str(path), str(tmp_path / "out")],
            capture_output=True, text=True, errors="replace", timeout=20)

    def pstr(s):
        return struct.pack("<i", len(s)) + s.encode()

    header = (b"u1 \x00B" + struct.pack("<i", 2125659606) + pstr("vector") +
              pstr("compactlattice44") + struct.pack("<ii", 2, 0) +
              struct.pack("<Q", 0) + struct.pack("<qqq", 0, 1, 1))

    # corrupt alignment length on state 0's final weight: claims 2^25 int32s
    # with zero bytes behind it — must die BEFORE allocating 128 MB
    inf = float("inf")
    huge_ali = header + struct.pack("<ffi", inf, inf, 1 << 25) + b"\x00" * 8
    p = tmp_path / "huge_ali.ark"
    p.write_bytes(huge_ali)
    proc = run(p)
    assert proc.returncode != 0 and proc.returncode >= 0
    assert "alignment" in proc.stderr

    # absurd state / arc counts similarly die on the remaining-bytes bound
    bad_states = (b"u1 \x00B" + struct.pack("<i", 2125659606) + pstr("vector") +
                  pstr("compactlattice44") + struct.pack("<ii", 2, 0) +
                  struct.pack("<Q", 0) + struct.pack("<qqq", 0, 1 << 27, 1))
    p = tmp_path / "states.ark"
    p.write_bytes(bad_states)
    proc = run(p)
    assert proc.returncode != 0 and "state count" in proc.stderr

    bad_arcs = header + struct.pack("<ffiq", inf, 1.0, 0, 1 << 27)
    p = tmp_path / "arcs.ark"
    p.write_bytes(bad_arcs)
    proc = run(p)
    assert proc.returncode != 0 and "arc count" in proc.stderr

    # a real entry truncated at every prefix length parses or dies cleanly
    lat = tmp_path / "lats.txt"
    lat.write_text(LATTICE)
    full_bin = tmp_path / "full.ark"
    subprocess.run([tool("lattice_copy"), "--binary", str(lat), str(full_bin)],
                   check=True, capture_output=True)
    blob = full_bin.read_bytes()
    for cut in range(3, len(blob), 7):
        p = tmp_path / "cut.ark"
        p.write_bytes(blob[:cut])
        proc = run(p)
        assert proc.returncode >= 0, f"signal death at cut={cut}"

    # random single-byte flips: clean exit either way, never a crash
    rng = np.random.RandomState(0)
    for _ in range(64):
        i = int(rng.randint(len(blob)))
        mut = bytearray(blob)
        mut[i] ^= 1 << int(rng.randint(8))
        p = tmp_path / "flip.ark"
        p.write_bytes(bytes(mut))
        proc = run(p)
        assert proc.returncode >= 0, f"signal death flipping byte {i}"

    # truncated gzip stream: clean zlib error, not a crash
    gz = tmp_path / "trunc.gz"
    gz.write_bytes(gzip.compress(blob)[:40])
    proc = run(gz)
    assert proc.returncode != 0 and proc.returncode >= 0
    assert "gzip" in proc.stderr or "truncated" in proc.stderr


def test_adversarial_lattice_eps_multifinal_dup(tmp_path):
    """Real-data-shaped hazards: epsilon (word 0) arcs contribute cost but no
    words, several final states with distinct final costs all terminate
    paths, and two distinct lattice paths yielding the SAME word sequence
    both appear in the n-best (Kaldi emits them as separate hypotheses)."""
    lat = tmp_path / "lats.txt"
    # path A: 0-(eps)->1-(w5)->3(final 0.5,0.5)    cost 0.2+1.0 + final
    # path B: 0-(w5)->2(final 2.0,1.0)             same words "5", diff path
    # path C: 0-(eps)->1-(w6)->3                    words "6"
    lat.write_text(
        "u1\n"
        "0 1 0 0.2,0.1\n"
        "0 2 5 0.3,0.2\n"
        "1 3 5 1.0,0.5\n"
        "1 3 6 4.0,2.0\n"
        "2 2.0,1.0\n"
        "3 0.5,0.5\n\n")
    w, g, a = tmp_path / "w", tmp_path / "g", tmp_path / "a"
    subprocess.run(
        [tool("lattice_to_nbest"), "--n=5", "--acoustic-scale=0.1",
         str(lat), str(w), str(g), str(a)],
        check=True, capture_output=True)
    words = [l.split(None, 1) for l in w.read_text().splitlines()]
    graphs = [float(l.split()[1]) for l in g.read_text().splitlines()]
    acs = [float(l.split()[1]) for l in a.read_text().splitlines()]
    # costs at acwt=0.1 (incl. finals):
    #   A: g=0.2+1.0+0.5=1.7  ac=0.1+0.5+0.5=1.1  -> 1.81
    #   B: g=0.3+2.0=2.3      ac=0.2+1.0=1.2      -> 2.42
    #   C: g=0.2+4.0+0.5=4.7  ac=0.1+2.0+0.5=2.6  -> 4.96
    assert [x[1] for x in words] == ["5", "5", "6"]  # dup word seq kept
    assert abs(graphs[0] - 1.7) < 1e-6 and abs(acs[0] - 1.1) < 1e-6
    assert abs(graphs[1] - 2.3) < 1e-6 and abs(acs[1] - 1.2) < 1e-6
    assert abs(graphs[2] - 4.7) < 1e-6 and abs(acs[2] - 2.6) < 1e-6


def test_unicode_int2sym_and_wer(tmp_path):
    """UTF-8 symbols flow through int2sym byte-exactly and WER aligns
    multi-byte words as units."""
    syms = tmp_path / "words.txt"
    syms.write_text("<eps> 0\ncafé 1\n日本語 2\nnaïve 3\nbücher 4\n",
                    encoding="utf-8")
    ints = tmp_path / "ints.txt"
    ints.write_text("u1 1 2 3\nu2 4\n")
    out = tmp_path / "out.txt"
    subprocess.run([tool("int2sym"), str(syms), str(ints), str(out)],
                   check=True, capture_output=True)
    assert out.read_text(encoding="utf-8") == "u1 café 日本語 naïve\nu2 bücher\n"

    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 café 日本語 naïve\n", encoding="utf-8")
    hyp.write_text("u1 café 日本語 naive\n", encoding="utf-8")  # 1 sub
    proc = subprocess.run([tool("wer"), str(ref), str(hyp)],
                          check=True, capture_output=True, text=True)
    assert "3, 0 ins, 0 del, 1 sub" in proc.stdout
