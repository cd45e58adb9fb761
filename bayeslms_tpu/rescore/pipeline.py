"""End-to-end N-best rescoring pipeline.

Python driver replacing the reference's 8-stage bash pipeline
(steps/pytorchnn/lmrescore_nbest_pytorchnn_cuda.sh) and its nj=5 process
array. Stages map 1:1:

1. lattice -> N-best linear archives            (C++ lattice_to_nbest; ref :100-165)
2. old n-gram LM score per hypothesis           (C++ arpa_score; ref :116-174 —
   composition with G.fst degenerates to per-token ARPA lookup, so
   lmwt.lmonly is computed directly and lmwt.nolm = withlm - lmonly)
3. int ids -> words                             (C++ int2sym; ref :190)
4. neural LM scores, batched + jitted           (BatchScorer; ref :197-219)
5. interpolation: lm = nolm + w*nn + (1-w)*ngram (ref awk :221-229)
6. rebuild rescored lattices                    (C++ nbest_to_lattice; ref :231-237)
7. WER sweep over LM-scale weights              (C++ wer; ref :239-245,
   local/score_asclite.sh:10-11 — total = lm + acoustic/LMWT, best hyp per
   utterance per LMWT, report the sweep)

The nj=5 job array disappears: stage 4 is one sharded batch run on the chip
(or mesh); the C++ stages are single-pass streaming.
"""

from __future__ import annotations

import os
import re
import subprocess
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ..core.config import RescoreConfig
from .nbest import load_nbest, write_scores

_TOOLS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "tools", "bin")
)


def _run_tool(cmd, retries: int = 2, **kw):
    """Run a pipeline stage with retries (the reference's flaky-job handling,
    utils/parallel/retry.pl)."""
    for attempt in range(retries + 1):
        try:
            return subprocess.run(cmd, check=True, **kw)
        except subprocess.CalledProcessError:
            if attempt == retries:
                raise
            time.sleep(0.5 * (attempt + 1))


def _tool(name: str, tools_dir: Optional[str] = None) -> str:
    path = os.path.join(tools_dir or _TOOLS, name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"native tool missing: {path} (run `make -C tools`)")
    return path


def _read_scores(path: str) -> Dict[str, float]:
    out = {}
    with open(path) as f:
        for line in f:
            k, v = line.split()
            out[k] = float(v)
    return out


@dataclass
class PipelineResult:
    n_utts: int = 0
    n_hyps: int = 0
    oov_tokens: int = 0
    wer_by_lmwt: Dict[int, float] = field(default_factory=dict)
    best_lmwt: Optional[int] = None
    best_wer: Optional[float] = None
    best_hyps_path: Optional[str] = None
    rescored_lattices: Optional[str] = None


def run_pipeline(
    lattices: str,
    words_txt: str,
    scorer,
    word2idx: Dict[str, int],
    workdir: str,
    rcfg: RescoreConfig,
    arpa_lm: Optional[str] = None,
    ref_text: Optional[str] = None,
    tools_dir: Optional[str] = None,
    glm: Optional[str] = None,
    asclite_clean: bool = False,
    sanity_test: bool = False,
) -> PipelineResult:
    os.makedirs(workdir, exist_ok=True)
    res = PipelineResult()

    # -- stage 1: lattice -> n-best archives
    words_int = os.path.join(workdir, "words.int")
    lmwt_withlm = os.path.join(workdir, "lmwt.withlm")
    acwt = os.path.join(workdir, "acwt")
    ali = os.path.join(workdir, "ali")
    _run_tool(
        [
            _tool("lattice_to_nbest", tools_dir),
            f"--n={rcfg.nbest}",
            f"--acoustic-scale={rcfg.acwt}",
            lattices, words_int, lmwt_withlm, acwt, ali,
        ]
    )

    if sanity_test:
        # The reference's `--test true` branch (lmrescore :176-184):
        # regenerate lattices from the N-best archives WITHOUT changing any
        # score and stop — rescoring these must reproduce the original WER.
        # Self-check: re-extract the N-best and assert every (lm, acoustic)
        # cost round-trips exactly.
        lats_out = os.path.join(workdir, "test_lats.txt")
        _run_tool([_tool("nbest_to_lattice", tools_dir),
                   words_int, lmwt_withlm, acwt, lats_out])
        res.rescored_lattices = lats_out
        chk = os.path.join(workdir, "roundtrip")
        os.makedirs(chk, exist_ok=True)
        w2, g2, a2, ali2 = (os.path.join(chk, n)
                            for n in ("w", "g", "a", "ali"))
        _run_tool([_tool("lattice_to_nbest", tools_dir), f"--n={rcfg.nbest}",
                   f"--acoustic-scale={rcfg.acwt}", lats_out, w2, g2, a2, ali2])

        def by_words(words_path, g_path, a_path):
            # duplicate word sequences with distinct costs are legal in an
            # N-best list (different lattice paths, same labels): aggregate
            # every (lm, acoustic) pair per (utt, words) and compare as
            # sorted multisets, not single members
            gsc, asc = _read_scores(g_path), _read_scores(a_path)
            out: Dict[tuple, list] = {}
            n = 0
            for line in open(words_path):
                parts = line.split()
                k = parts[0]
                utt = k[: k.rfind("-")]
                out.setdefault((utt, tuple(parts[1:])), []).append(
                    (gsc[k], asc[k]))
                n += 1
            for v in out.values():
                v.sort()
            return out, n

        before, n_before = by_words(words_int, lmwt_withlm, acwt)
        after, _ = by_words(w2, g2, a2)

        def close(va, vb):
            return len(va) == len(vb) and all(
                abs(a[0] - b[0]) <= 1e-3 and abs(a[1] - b[1]) <= 1e-3
                for a, b in zip(va, vb))

        bad = [k for k, v in before.items()
               if k not in after or not close(after[k], v)]
        if bad:
            raise RuntimeError(
                f"sanity test: {len(bad)} hypotheses changed scores in the "
                f"lattice round trip (first: {bad[:3]})")
        res.n_utts = len({u for u, _ in before})
        res.n_hyps = n_before
        return res

    # -- stage 3 (early, needed by 2 and 4): ids -> words
    words_text = os.path.join(workdir, "words.txt")
    _run_tool([_tool("int2sym", tools_dir), words_txt, words_int, words_text])

    # -- stage 2: old-LM scores
    lm_withlm = _read_scores(lmwt_withlm)
    if arpa_lm:
        lmonly_path = os.path.join(workdir, "lmwt.lmonly")
        _run_tool([_tool("arpa_score", tools_dir), arpa_lm, words_text, lmonly_path])
        lm_only = _read_scores(lmonly_path)
    else:
        lm_only = {k: 0.0 for k in lm_withlm}
    lm_nolm = {k: lm_withlm[k] - lm_only.get(k, 0.0) for k in lm_withlm}

    # -- stage 4: neural LM scores (batched, jitted, exact carry-over)
    nbest = load_nbest(words_text)
    res.n_utts = len(nbest)
    res.n_hyps = sum(len(h) for h in nbest.values())
    scored = scorer.score_nbest(nbest, word2idx)
    res.oov_tokens = getattr(scorer, "oov_stats", {"total": 0})["total"]
    nn_path = os.path.join(workdir, "nnlm.scores")
    write_scores(scored, nn_path)
    nn_scores = _read_scores(nn_path)

    # -- stage 5: interpolation (ref awk :221-229)
    w = rcfg.nn_weight
    lm_final = {
        k: lm_nolm[k] + w * nn_scores.get(k, 0.0) + (1.0 - w) * lm_only.get(k, 0.0)
        for k in lm_withlm
    }
    lmwt_final = os.path.join(workdir, "lmwt.rescored")
    with open(lmwt_final, "w") as f:
        for k, v in lm_final.items():
            f.write(f"{k} {v}\n")

    # -- stage 6: rebuild lattices
    lats_out = os.path.join(workdir, "rescored_lats.txt")
    _run_tool([_tool("nbest_to_lattice", tools_dir), words_int, lmwt_final, acwt, lats_out])
    res.rescored_lattices = lats_out

    # -- stage 7: WER sweep (needs references)
    if ref_text:
        ac_scores = _read_scores(acwt)
        hyp_texts: Dict[str, List[str]] = {}
        with open(words_text) as f:
            for line in f:
                parts = line.split()
                hyp_texts[parts[0]] = parts[1:]
        best = (None, None)
        for lmwt in range(rcfg.min_lmwt, rcfg.max_lmwt + 1):
            pick: Dict[str, str] = {}
            cost: Dict[str, float] = {}
            for k in lm_final:
                utt = k[: k.rfind("-")]
                total = lm_final[k] + ac_scores.get(k, 0.0) / lmwt
                if utt not in cost or total < cost[utt]:
                    cost[utt] = total
                    pick[utt] = k
            hyp_path = os.path.join(workdir, f"hyp.lmwt{lmwt}.txt")
            with open(hyp_path, "w") as f:
                for utt, k in pick.items():
                    f.write(utt + " " + " ".join(hyp_texts[k]) + "\n")
            wer_cmd = [_tool("wer", tools_dir)]
            if glm:
                wer_cmd.append(f"--glm={glm}")
            if asclite_clean:
                wer_cmd.append("--asclite-clean")
            out = _run_tool(
                wer_cmd + [ref_text, hyp_path], capture_output=True, text=True,
            ).stdout
            m = re.search(r"%WER (\d+\.\d+)", out)
            wer = float(m.group(1))
            res.wer_by_lmwt[lmwt] = wer
            if best[1] is None or wer < best[1]:
                best = (lmwt, wer)
                res.best_hyps_path = hyp_path
        res.best_lmwt, res.best_wer = best
    return res
