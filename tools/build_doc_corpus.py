"""Build a realistic word-level LM corpus from installed-package docstrings.

The environment has no downloadable corpora (zero egress); the largest body
of REAL English prose on disk is the ~114 MB of docstrings inside
site-packages. This harvests them into the reference's data-dir format
(/root/reference/steps/pytorchnn/data.py:28-52): words.txt ("word id" pairs),
train.txt/valid.txt/test.txt one sentence per line, whitespace-tokenized —
consumed identically by the reference's torch train.py and by our CLI.

The result has a real Zipf vocabulary (hundreds of thousands of distinct
words), real n-gram structure, and realistic sentence-length distribution —
what the flagship-scale convergence campaign (VERDICT r2 item 1) needs.

Usage:
  python tools/build_doc_corpus.py --out exp/corpus_full --vocab 50000
  python tools/build_doc_corpus.py --out exp/corpus_mid --vocab 10000 \
      --max-train-tokens 1200000
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import os
import random
import re
import site
import sys

DOCTEST = re.compile(r"^\s*(>>>|\.\.\.)")
FIELD = re.compile(r"^\s*(:param|:type|:return|:rtype|:raises|:meth|:class|"
                   r"Args:|Returns:|Raises:|Parameters|----|====|\.\. )")
WORD = re.compile(r"[a-z']+")
SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def harvest(roots):
    seen = set()
    for root in roots:
        for dirpath, dirs, fnames in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            dirs.sort()
            for f in sorted(fnames):
                if not f.endswith(".py"):
                    continue
                p = os.path.join(dirpath, f)
                try:
                    src = open(p, encoding="utf-8", errors="ignore").read()
                    tree = ast.parse(src)
                except (SyntaxError, ValueError, OSError, MemoryError):
                    continue
                for node in ast.walk(tree):
                    if not isinstance(
                        node,
                        (ast.Module, ast.ClassDef, ast.FunctionDef,
                         ast.AsyncFunctionDef),
                    ):
                        continue
                    doc = ast.get_docstring(node)
                    if not doc or len(doc) < 40:
                        continue
                    h = hashlib.md5(doc.encode()).digest()
                    if h in seen:  # license headers etc. repeat thousands of times
                        continue
                    seen.add(h)
                    yield doc


def sentences(doc):
    lines = []
    for ln in doc.splitlines():
        if DOCTEST.match(ln) or FIELD.match(ln):
            continue
        s = ln.strip()
        # drop table rows / separators / code-ish lines
        if s and sum(c.isalpha() or c in " '" for c in s) / len(s) < 0.7:
            continue
        lines.append(s)
    text = "\n".join(lines)
    for para in re.split(r"\n\s*\n", text):
        para = " ".join(para.split())
        for sent in SENT_SPLIT.split(para):
            toks = WORD.findall(sent.lower())
            toks = [t.strip("'") for t in toks]
            toks = [t for t in toks if t]
            if 3 <= len(toks) <= 60:
                yield toks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab", type=int, default=50000)
    ap.add_argument("--max-train-tokens", type=int, default=0,
                    help="0 = use everything")
    ap.add_argument("--valid-tokens", type=int, default=220000)
    ap.add_argument("--test-tokens", type=int, default=220000)
    ap.add_argument("--seed", type=int, default=1111)
    args = ap.parse_args()

    roots = site.getsitepackages()
    sents = []
    for doc in harvest(roots):
        sents.extend(sentences(doc))
    print(f"harvested {len(sents)} sentences, "
          f"{sum(len(s) for s in sents)/1e6:.1f}M tokens", file=sys.stderr)

    rng = random.Random(args.seed)
    rng.shuffle(sents)

    # split off valid/test first so their content is fixed regardless of
    # --max-train-tokens (mid-scale and full runs share eval sets modulo vocab)
    def take(n_tokens):
        out, tot = [], 0
        while sents and tot < n_tokens:
            s = sents.pop()
            out.append(s)
            tot += len(s) + 1  # +1 for the <s> the loader appends per line
        return out

    valid = take(args.valid_tokens)
    test = take(args.test_tokens)
    train = take(args.max_train_tokens) if args.max_train_tokens else sents

    from collections import Counter

    counts = Counter(t for s in train for t in s)
    keep = [w for w, _ in counts.most_common(max(args.vocab - 2, 1))]
    vocab = ["<s>", "<unk>"] + keep

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "words.txt"), "w") as f:
        for i, w in enumerate(vocab):
            f.write(f"{w} {i}\n")
    stats = {}
    for name, data in [("train", train), ("valid", valid), ("test", test)]:
        with open(os.path.join(args.out, f"{name}.txt"), "w") as f:
            for s in data:
                f.write(" ".join(s) + "\n")
        ntok = sum(len(s) + 1 for s in data)
        stats[name] = ntok
        print(f"{name}: {len(data)} sentences, {ntok} tokens "
              f"(incl. per-line <s>)", file=sys.stderr)
    vset = set(vocab)
    oov = sum(1 for s in train for t in s if t not in vset)
    print(f"train OOV rate at vocab {len(vocab)}: "
          f"{oov / max(sum(len(s) for s in train), 1):.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
