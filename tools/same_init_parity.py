"""Same-initial-weights training-dynamics parity vs the reference.

The campaign A/B (tools/run_torch_campaign.sh) uses each side's own seed;
at small scale, init variance alone moves final PPL by several percent and
masks framework differences. This harness removes that variable:

1. Rebuild the reference's model with ITS exact construction order and seed
   (random.seed + torch.manual_seed, model_2 then model — train.py:123-130,
   :210-214) and save the initial state_dict.
2. Import it into this framework (core/checkpoint.import_torch_state_dict)
   and train with the same data/schedule via the prior-load path.
3. Run the reference's train.py with the same seed (it reconstructs the
   identical init internally) and compare per-epoch valid PPL.

Measured (LSTM 256/256x2, 10k vocab, 98k-token corpus slice, dropout 0,
lr 5, 6 epochs, 2026-08-17):

  valid ppl   ep1     ep2     ep3     ep4     ep5     ep6    test
  torch     905.89  624.09  499.83  416.25  378.08  324.10  331.08
  ours      906.17  615.37  503.59  414.47  372.42  325.57  334.37
  ratio     1.0003  0.986   1.008   0.996   0.985   1.005   1.0100

Final test-PPL ratio 1.010 with IDENTICAL initial weights — versus ~5%
final-PPL spread between different init seeds at this scale (the campaign
A/B's residual gap is init variance, not framework dynamics).

Usage:
  python tools/same_init_parity.py --data exp/corpus_mid --epochs 6 \
      --emsize 256 --nhid 256 [--dropout 0.0] [--workdir /tmp/same_init]
  # then run the reference side with the same flags and compare:
  PYTHONPATH=/root/reference/steps/pytorchnn python \
      /root/reference/steps/pytorchnn/train.py --data <data> --seq_len 100 \
      --clip 1.0 --batch-size 32 --epoch <E> --seed 1111 --dropout <D> \
      --tied --model LSTM --emsize <E> --nhid <H> --nlayers 2 --lr 5 \
      --uncertainty none --save /tmp/ref.pt
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--emsize", type=int, default=256)
    ap.add_argument("--nhid", type=int, default=256)
    ap.add_argument("--nlayers", type=int, default=2)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--lr", type=float, default=5.0)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--model", default="LSTM",
                    choices=["LSTM", "Transformer"])
    ap.add_argument("--nhead", type=int, default=4)
    ap.add_argument("--uncertainty", default="none",
                    choices=["none", "Bayesian", "Gaussian", "Variational"])
    ap.add_argument("--l_bayes_pos", type=int, default=3)
    ap.add_argument("--t_bayes_pos", default="FFN",
                    choices=["none", "FFN", "MHA", "EMB"])
    ap.add_argument("--t_gauss_pos", type=int, default=3)
    ap.add_argument("--l_gauss_pos", default="13")
    ap.add_argument("--l_v_pos", default="11")
    ap.add_argument("--t_v_pos", type=int, default=1)
    ap.add_argument("--ref-prior-path", default=None,
                    help="finetune twin: dir with a prior model.pt; the "
                         "reference's --prior True update (train.py:239-258 "
                         "— key-filtered state_dict update on the "
                         "seed-constructed model) is applied to the ref "
                         "model BEFORE its init is exported, so both "
                         "sides start from the converged baseline")
    ap.add_argument("--workdir", default="/tmp/same_init")
    ap.add_argument("--platform", default=None,
                    help="e.g. cpu to force off-TPU")
    ap.add_argument("--matmul-precision", default=None,
                    help="jax_default_matmul_precision override (e.g. "
                         "'highest' for true-f32 MXU passes — the "
                         "precision A/B for the LSTM same-init drift)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    import torch

    os.makedirs(args.workdir, exist_ok=True)

    # 1. the reference's exact init (construction order from train.py)
    sys.path.insert(0, "/root/reference/steps/pytorchnn")
    import model as refM

    from bayeslms_tpu.data.vocab import Vocab

    vocab = Vocab.from_file(os.path.join(args.data, "words.txt"))
    V = len(vocab)
    random.seed(args.seed)
    torch.manual_seed(args.seed)
    if args.model == "Transformer":
        if args.uncertainty == "Gaussian":
            # single-model construction (train.py:203-205)
            ref_model = refM.GaussTransformerModel(
                V, args.emsize, args.nhead, args.nhid, args.nlayers,
                args.dropout, True, args.t_gauss_pos)
        elif args.uncertainty == "Bayesian":
            # single-model construction (train.py:200-202)
            ref_model = refM.BayesTransformerModel(
                V, args.emsize, args.nhead, args.nhid, args.nlayers,
                args.dropout, True, args.t_bayes_pos)
        elif args.uncertainty == "Variational":
            # single-model construction (train.py:207-208)
            ref_model = refM.VTransformerModel(
                V, args.emsize, args.nhead, args.nhid, args.nlayers,
                args.dropout, True, args.t_v_pos)
        else:
            # none: model_2 then model, gelu (train.py:195-198)
            _model_2 = refM.TransformerModel(V, args.emsize, args.nhead,
                                             args.nhid, args.nlayers,
                                             args.dropout, "gelu", True)
            ref_model = refM.TransformerModel(V, args.emsize, args.nhead,
                                              args.nhid, args.nlayers,
                                              args.dropout, "gelu", True)
    elif args.uncertainty == "Bayesian":
        # Bayesian branch constructs a SINGLE model (train.py:215-217 —
        # no model_2), so the RNG stream differs from the none branch.
        ref_model = refM.BayesRNNModel("LSTM", V, args.emsize, args.nhid,
                                       args.nlayers, args.dropout, True,
                                       args.l_bayes_pos)
    elif args.uncertainty == "Gaussian":
        # single-model construction (train.py:218-220) — GPLSTM core
        ref_model = refM.GaussRNNModel("LSTM", V, args.emsize, args.nhid,
                                       args.nlayers, args.dropout, True,
                                       args.l_gauss_pos)
    elif args.uncertainty == "Variational":
        # single-model construction (train.py:222-223)
        ref_model = refM.VariationalRNNModel("LSTM", V, args.emsize,
                                             args.nhid, args.nlayers,
                                             args.dropout, True,
                                             args.l_v_pos)
    else:
        _model_2 = refM.RNNModel("LSTM", V, args.emsize, args.nhid,
                                 args.nlayers, args.dropout, True)
        ref_model = refM.RNNModel("LSTM", V, args.emsize, args.nhid,
                                  args.nlayers, args.dropout, True)
    if args.ref_prior_path:
        # the reference's prior load, verbatim semantics (train.py:239-258):
        # filter the prior dict to keys the finetune model has, update.
        with open(os.path.join(args.ref_prior_path, "model.pt"), "rb") as f:
            prior_dict = torch.load(f, map_location="cpu")
        model_dict = ref_model.state_dict()
        prior_dict = {k: v for k, v in prior_dict.items() if k in model_dict}
        model_dict.update(prior_dict)
        ref_model.load_state_dict(model_dict)
        print(f"[finetune] prior update applied to the seed-{args.seed} "
              f"model: {len(prior_dict)} tensors carried over")
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}

    # 2. import + train here
    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.core.checkpoint import (import_torch_state_dict,
                                              partial_update, save_checkpoint)
    from bayeslms_tpu.core.registry import build_model, init_params
    from bayeslms_tpu.data.corpus import Corpus
    from bayeslms_tpu.train.loop import Trainer

    cfg = ModelConfig(model=args.model, vocab_size=V, emsize=args.emsize,
                      nhid=args.nhid, nlayers=args.nlayers, nhead=args.nhead,
                      dropout=args.dropout, uncertainty=args.uncertainty,
                      l_bayes_pos=args.l_bayes_pos,
                      t_bayes_pos=args.t_bayes_pos,
                      t_gauss_pos=args.t_gauss_pos,
                      l_gauss_pos=args.l_gauss_pos,
                      l_v_pos=args.l_v_pos,
                      t_v_pos=args.t_v_pos)
    params = init_params(build_model(cfg), cfg)
    merged, updated = partial_update(params, import_torch_state_dict(sd, cfg))
    print(f"imported {len(updated)} tensors from the reference init")
    init_ckpt = os.path.join(args.workdir, "torch_init.ckpt")
    save_checkpoint(init_ckpt, merged, meta={})

    tcfg = TrainConfig(lr=args.lr, batch_size=32, epochs=args.epochs,
                       seq_len=100, clip=1.0, seed=args.seed, prior=True,
                       prior_path=init_ckpt,
                       save=os.path.join(args.workdir, "model.ckpt"))
    trainer = Trainer(cfg, tcfg)
    state, out = trainer.fit(Corpus(args.data))
    print("per-epoch valid_loss:",
          [round(e["val_loss"], 5) for e in out["history"]])
    print("test_loss:", out["test_loss"])


if __name__ == "__main__":
    main()
