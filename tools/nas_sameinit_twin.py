"""Same-init NAS search-dynamics twin (ours side).

Reconstructs the reference's Bayes-LSTM supernet init EXACTLY as
train_search_bayes.py does — random.seed+torch.manual_seed(seed), then
``BayesLSTMModelSearch('LSTM', V, emsize, nhid, nlayers, dropout, tied)``
(train_search_bayes.py:116-117, :180-181), whose constructor also draws
the (nlayers, 4, 2) arch logits ``1e-3 * randn`` — imports both into the
jax supernet, and runs `SearchRunner` on the same data/schedule. Prints
the per-epoch softmax(arch) matrices for comparison against the torch
run's per-epoch prints (train_search_bayes.py:402-411; NOTE the torch
print swaps layer 0's two columns before printing — tools/
nas_twin_report.py un-swaps when parsing).

Usage:
  python tools/nas_sameinit_twin.py --data exp/corpus_mid --epochs 4 \
      --emsize 128 --nhid 128 --lr 5 [--seq-len 50]
Then the torch side with the same flags via tools/run_sameinit_queue7.sh.
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
    ap.add_argument("--emsize", type=int, default=128)
    ap.add_argument("--nhid", type=int, default=128)
    ap.add_argument("--nlayers", type=int, default=2)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--lr", type=float, default=5.0)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--clip", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference/steps/pytorchnn")
    import model_search_bayes as refS

    from bayeslms_tpu.data.vocab import Vocab

    vocab = Vocab.from_file(os.path.join(args.data, "words.txt"))
    V = len(vocab)

    # 1. the reference's exact init (construction order from
    # train_search_bayes.py: seed -> BayesLSTMModelSearch; the ctor's
    # _initialize_arch_parameters draws the arch logits from the SAME stream)
    random.seed(args.seed)
    torch.manual_seed(args.seed)
    ref = refS.BayesLSTMModelSearch("LSTM", V, args.emsize, args.nhid,
                                    args.nlayers, args.dropout, True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    arch0 = ref.weights.detach().numpy()  # (nlayers, 4, 2), Variable not in sd

    # 2. key-map into the jax supernet's param tree
    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.nas.search import SearchRunner

    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=args.emsize,
                      nhid=args.nhid, nlayers=args.nlayers,
                      dropout=args.dropout)
    tcfg = TrainConfig(lr=args.lr, batch_size=args.batch_size,
                       epochs=args.epochs, seq_len=args.seq_len,
                       clip=args.clip, seed=args.seed)
    runner = SearchRunner(cfg, tcfg, mode="bayes")
    params, _ = runner.init_params(tcfg.seed)

    import jax.numpy as jnp

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        want = np.shape(node[path[-1]])
        assert want == val.shape, f"{path}: {want} vs {val.shape}"
        node[path[-1]] = jnp.asarray(val)

    params = jax.tree.map(np.asarray, params)  # mutable dict of np arrays
    put(params, ("embedding",), sd["encoder.weight"])
    put(params, ("decoder_b",), sd["decoder.bias"])
    gates = ("ingate", "forgate", "cellgate", "outgate")
    for l in range(args.nlayers):
        ref_l = f"rnn.rnn.{l}"
        cell = f"cell{l}"
        put(params, (cell, "w_ih"), sd[f"{ref_l}.weights_ih"])
        put(params, (cell, "b_ih"), sd[f"{ref_l}.bias_ih"])
        put(params, (cell, "w_hh"), sd[f"{ref_l}.weights_hh"])
        put(params, (cell, "b_hh"), sd[f"{ref_l}.bias_hh"])
        # the four per-gate Bayes modules -> concatenated row blocks in
        # reference chunk order [in, forget, cell, out]
        for field, ours in (("weights_mean", "branch_mean"),
                            ("weights_lgstd", "branch_lgstd"),
                            ("bias_mean", "branch_bias_mean"),
                            ("bias_lgstd", "branch_bias_lgstd")):
            cat = np.concatenate(
                [sd[f"{ref_l}.bayes_{g}.{field}"] for g in gates], axis=0)
            put(params, (cell, ours), cat)
    params = jax.tree.map(jnp.asarray, params)
    arch = jnp.asarray(arch0)
    print(f"imported supernet init: {len(sd)} torch tensors + arch {arch0.shape}")

    # 3. search on the same data/schedule
    from bayeslms_tpu.data.corpus import Corpus

    res = runner.run(Corpus(args.data), init=(params, arch))
    for h in res.history:
        print(f"ARCH epoch {h['epoch']}:", np.round(np.asarray(h["arch"]), 4).tolist())
    print("derived:", res.derived_choice.tolist())


if __name__ == "__main__":
    main()
