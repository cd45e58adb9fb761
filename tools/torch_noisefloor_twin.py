"""Noise-floor twin: the reference's train.py with IDENTICAL initial
weights (seed 1111 through model construction) but a different
training-time RNG stream.

Measures the reference's own torch-vs-torch seed spread from identical
init — the yardstick docs/CONVERGENCE.md needs to judge the stochastic
families' same-init deviations: an ours-vs-torch gap smaller than this
floor is indistinguishable from the reference's own sampling noise.

Mechanism: train.py seeds python+torch once (train.py:123-124),
constructs the model, then builds the SGD optimizer immediately before
"Start training" (train.py:465-469). We wrap ``torch.optim.SGD`` so its
FIRST construction reseeds python+torch RNG with ``--reseed``.
Everything before that point (weight init, prior load, batchify — none
of which draw RNG after construction) is bit-identical to the seed-1111
twin; every training-time draw (Bayesian weight sampling, dropout)
comes from the new stream. The reference is otherwise unmodified.

Also works for the NAS search script (``--script .../train_search_bayes.py``):
its weight-step SGD is likewise built right before "Start training"
(train_search_bayes.py:387), after the supernet ctor drew all init
randomness, and the Architect's Adam construction draws none.

Usage:
  python tools/torch_noisefloor_twin.py --reseed 2222 \
      [--script /root/reference/steps/pytorchnn/train_search_bayes.py] \
      <script args...>
"""

import random
import runpy
import sys

sys.path.insert(0, "/root/reference/steps/pytorchnn")

import torch  # noqa: E402
import torch.optim as optim  # noqa: E402

_i = sys.argv.index("--reseed")
RESEED = int(sys.argv[_i + 1])
del sys.argv[_i:_i + 2]

SCRIPT = "/root/reference/steps/pytorchnn/train.py"
if "--script" in sys.argv:
    _i = sys.argv.index("--script")
    SCRIPT = sys.argv[_i + 1]
    del sys.argv[_i:_i + 2]

_SGD = optim.SGD
_fired = []


class _ReseedingSGD(_SGD):
    def __init__(self, *a, **kw):
        if not _fired:
            _fired.append(True)
            random.seed(RESEED)
            torch.manual_seed(RESEED)
            print(f"[noisefloor] training RNG reseeded with {RESEED} "
                  "(init used train.py's own --seed)")
        super().__init__(*a, **kw)


optim.SGD = _ReseedingSGD

sys.argv = [SCRIPT.rsplit("/", 1)[-1]] + sys.argv[1:]
runpy.run_path(SCRIPT, run_name="__main__")
