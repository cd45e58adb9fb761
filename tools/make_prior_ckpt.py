"""Build a finetune `prior/model.pt` from a converged nn.LSTM baseline.

The reference's pretrain->prior->finetune workflow (README.md:43-117)
pretrains the SELF-BUILT standard LSTM (``--uncertainty Bayesian
--L_bayes_pos 0`` — BayesRNNModel with bayes_pos=0, whose state_dict
keys are ``rnn.{weight,bias}_{ih,hh}_mean_{1,2}``), copies its model.pt
to ``steps/pytorchnn/prior/lstm/``, then finetunes the Bayes model with
``--prior True`` (train.py:239-258: a key-filtered state_dict update —
only keys present in the Bayes model carry over, i.e. encoder/decoder
and the gate means).

The self-built pos-0 LSTM computes the identical function to torch's
``nn.LSTM`` (same i,f,g,o gate packing, same twin-bias convention), so a
converged ``--uncertainty none`` baseline checkpoint remaps 1:1 onto the
pos-0 key names:

    rnn.weight_ih_l0 -> rnn.weight_ih_mean_1      (and hh / bias / l1->_2)

This tool performs that remap, producing the prior checkpoint both
sides of the finetune twin load — provenance differs from the paper's
step 2 (which trains the self-built model directly) but the artifact is
the same class of object: a converged standard-LSTM state_dict under
mean-key names.

Usage:
  python tools/make_prior_ckpt.py \
      --src exp/campaign/torch_lstm_base_quick/model.pt \
      --out exp/campaign/prior_lstm
"""

import argparse
import os
from collections import OrderedDict

import torch

REMAP = {
    "rnn.weight_ih_l0": "rnn.weight_ih_mean_1",
    "rnn.weight_hh_l0": "rnn.weight_hh_mean_1",
    "rnn.bias_ih_l0": "rnn.bias_ih_mean_1",
    "rnn.bias_hh_l0": "rnn.bias_hh_mean_1",
    "rnn.weight_ih_l1": "rnn.weight_ih_mean_2",
    "rnn.weight_hh_l1": "rnn.weight_hh_mean_2",
    "rnn.bias_ih_l1": "rnn.bias_ih_mean_2",
    "rnn.bias_hh_l1": "rnn.bias_hh_mean_2",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True, help="prior DIR (model.pt inside)")
    args = ap.parse_args()

    sd = torch.load(args.src, map_location="cpu")
    out = OrderedDict()
    for k, v in sd.items():
        out[REMAP.get(k, k)] = v
    os.makedirs(args.out, exist_ok=True)
    dst = os.path.join(args.out, "model.pt")
    with open(dst, "wb") as f:
        torch.save(out, f)
    print(f"wrote {dst}: {len(out)} tensors "
          f"({sum(1 for k in sd if k in REMAP)} remapped)")


if __name__ == "__main__":
    main()
