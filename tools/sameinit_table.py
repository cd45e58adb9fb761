"""Emit the same-init per-epoch parity table (markdown) for CONVERGENCE.md.

Pairs a torch train.log with a same_init_parity.py log (both print the
reference's epoch-summary line format) and tabulates valid PPL + ratio.

Usage:
  python tools/sameinit_table.py exp/campaign/torch_tm_base/train.log \
      exp/campaign/ours_tm_base_sameinit.log
"""

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# one copy of the reference epoch-summary parsers (width-sensitive patterns)
from convergence_report import EPOCH, FINAL  # noqa: E402

# same_init_parity.py also prints the full-precision loss list
LOSSES = re.compile(r"per-epoch valid_loss: \[([^\]]+)\]")
TEST = re.compile(r"test_loss: ([0-9.]+)")


def parse(path):
    txt = open(path, errors="ignore").read()
    m = LOSSES.search(txt)
    if m:  # ours: full-precision losses (list position = epoch)
        ppl = {i + 1: math.exp(float(x))
               for i, x in enumerate(m.group(1).split(","))}
        t = TEST.search(txt)
        return ppl, (math.exp(float(t.group(1))) if t else None)
    # torch: key on the printed epoch number, not file position — a
    # truncated/interleaved log (VM reset, duplicate writer) can lose lines
    # and positional indexing would silently shift every row.
    ppl = {int(e[0]): float(e[3]) for e in EPOCH.findall(txt)}
    f = FINAL.search(txt)
    return ppl, (float(f.group(2)) if f else None)


def main():
    torch_ppl, torch_test = parse(sys.argv[1])
    ours_ppl, ours_test = parse(sys.argv[2])
    for path, ppl in [(sys.argv[1], torch_ppl), (sys.argv[2], ours_ppl)]:
        if not ppl:
            sys.exit(f"no epoch-summary lines parsed from {path} "
                     "(wrong file, truncated log, or changed format?)")
    shared = sorted(set(torch_ppl) & set(ours_ppl))
    if not shared:
        sys.exit("no shared epochs between the two logs")
    print("| epoch | torch valid ppl | ours valid ppl | ratio |")
    print("|---|---|---|---|")
    devs = []
    for ep in shared:
        r = ours_ppl[ep] / torch_ppl[ep]
        devs.append(abs(r - 1))
        print(f"| {ep} | {torch_ppl[ep]:.2f} | {ours_ppl[ep]:.2f} | {r:.4f} |")
    print()
    line = f"Max per-epoch deviation {max(devs) * 100:.2f}%"
    if torch_test and ours_test:
        line += f"; final test-PPL ratio {ours_test / torch_test:.4f}"
    print(line + f" (over {len(shared)} shared epochs).")


if __name__ == "__main__":
    main()
