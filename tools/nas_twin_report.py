"""Tabulate the same-init NAS search twin (markdown for CONVERGENCE.md).

Parses the torch side's per-epoch arch prints (train_search_bayes.py:402-411
— a 3D tensor whose LAYER-0 columns are swapped before printing:
``model_dict_2[0, i, 0] = model_dict[0, i, 1]``; this parser un-swaps them)
and the ours side's ``ARCH epoch N: [...]`` lines
(tools/nas_sameinit_twin.py), and prints per-epoch per-gate branch-1
(stochastic) softmax weights side by side with the max |diff|.

Usage:
  python tools/nas_twin_report.py exp/campaign/torch_nas_bayeslstm/train.log \
      exp/campaign/ours_nas_bayeslstm.log
"""

import ast
import re
import sys

import numpy as np


def parse_torch(path):
    txt = open(path, errors="ignore").read()
    mats = []
    for m in re.finditer(r"tensor\((\[\[\[.*?\]\]\])", txt, re.S):
        arr = np.array(ast.literal_eval(m.group(1)))
        arr[0] = arr[0, :, ::-1]  # un-swap the layer-0 print quirk
        mats.append(arr)
    return mats


def parse_ours(path):
    txt = open(path, errors="ignore").read()
    mats = []
    for m in re.finditer(r"ARCH epoch \d+: (\[.*\])", txt):
        mats.append(np.array(ast.literal_eval(m.group(1))))
    return mats


def main():
    torch_mats = parse_torch(sys.argv[1])
    ours_mats = parse_ours(sys.argv[2])
    n = min(len(torch_mats), len(ours_mats))
    if n == 0:
        sys.exit("no epochs parsed")
    gates = ["in", "forget", "cell", "out"]
    print("| epoch | layer | gate | torch p(stochastic) | ours p(stochastic) | diff |")
    print("|---|---|---|---|---|---|")
    worst = 0.0
    for e in range(n):
        t, o = torch_mats[e], ours_mats[e]
        for l in range(t.shape[0]):
            for g in range(4):
                d = abs(t[l, g, 1] - o[l, g, 1])
                worst = max(worst, d)
                print(f"| {e + 1} | {l} | {gates[g]} | {t[l, g, 1]:.4f} "
                      f"| {o[l, g, 1]:.4f} | {d:.4f} |")
    td = (torch_mats[n - 1].argmax(-1) == ours_mats[n - 1].argmax(-1))
    print()
    print(f"Max per-gate |p_torch - p_ours| over {n} epochs: {worst:.4f}; "
          f"final derived branch agreement: {int(td.sum())}/{td.size} gates.")


if __name__ == "__main__":
    main()
