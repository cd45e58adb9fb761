"""Command-line interface.

Replaces the reference's recipe surface (run_nnlm_ami_{lstm,tm}.sh +
train.py/compute_sentence_scores argparse) with subcommands. Flag names
follow the reference (train.py:25-105) so recipes translate one-to-one:

  bayeslm train    --data DIR --model LSTM --uncertainty Bayesian \
                   --L_bayes_pos 3 --emsize 1024 --nhid 1024 ... --save m.ckpt
  bayeslm score    --nbest-list F --vocabulary words.txt --model-path m.ckpt ...
  bayeslm rescore  --lattices F --words words.txt --model-path m.ckpt \
                   --arpa lm.arpa --ref ref.txt --workdir WD
  bayeslm snr      --model-path m.ckpt [--L_bayes_pos 3]
  bayeslm search   --data DIR --model LSTM --search-mode bayes ...
"""

from __future__ import annotations

import argparse
import json
import sys

from ..core.config import ModelConfig, RescoreConfig, TrainConfig


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--model", default="LSTM",
                   choices=["LSTM", "GRU", "RNN_TANH", "RNN_RELU", "Transformer"])
    p.add_argument("--emsize", type=int, default=1024)
    p.add_argument("--nhid", type=int, default=1024)
    p.add_argument("--nlayers", type=int, default=2)
    p.add_argument("--nhead", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--tied", action="store_true", default=True)
    p.add_argument("--not-tied", dest="tied", action="store_false")
    p.add_argument("--uncertainty", default="none",
                   choices=["none", "Bayesian", "Gaussian", "Variational"])
    p.add_argument("--T_bayes_pos", default="none", choices=["none", "FFN", "MHA", "EMB"])
    p.add_argument("--L_bayes_pos", type=int, default=0)
    p.add_argument("--T_gauss_pos", type=int, default=3)
    p.add_argument("--L_gauss_pos", default="00")
    p.add_argument("--T_v_pos", type=int, default=0)
    p.add_argument("--L_v_pos", default="00")
    p.add_argument("--gp-sample", action="store_true")
    p.add_argument("--compute-dtype", default="float32")


def _model_cfg(args, vocab_size: int) -> ModelConfig:
    return ModelConfig(
        model=args.model, vocab_size=vocab_size, emsize=args.emsize, nhid=args.nhid,
        nlayers=args.nlayers, nhead=args.nhead, dropout=args.dropout, tied=args.tied,
        uncertainty=args.uncertainty, t_bayes_pos=args.T_bayes_pos,
        l_bayes_pos=args.L_bayes_pos, t_gauss_pos=args.T_gauss_pos,
        l_gauss_pos=args.L_gauss_pos, t_v_pos=args.T_v_pos, l_v_pos=args.L_v_pos,
        gp_sample=args.gp_sample, compute_dtype=args.compute_dtype,
    )


def cmd_train(args) -> int:
    from ..data.corpus import Corpus
    from ..train.loop import Trainer

    if args.multihost:
        # join a multi-host DCN job BEFORE any jax device use; the mesh below
        # then spans every process's devices (SURVEY §2c — replaces the
        # reference's queue/slurm launchers). Each process must see the same
        # data dir; checkpoints are written by every process via an atomic
        # temp+rename (core/checkpoint.py), so a shared --save path sees
        # last-rename-wins of identical replicated bytes (never a torn file)
        # and per-host filesystems each keep their own copy for reload-best.
        import jax

        from ..parallel.multihost import initialize_multihost

        if initialize_multihost():
            print(
                f"multihost: process {jax.process_index()+1}/{jax.process_count()}"
                f" ({len(jax.devices())} global devices)",
                file=sys.stderr,
            )
        else:
            print("multihost requested but JAX_COORDINATOR_ADDRESS/"
                  "JAX_NUM_PROCESSES not set", file=sys.stderr)
            return 1
    corpus = Corpus(args.data)
    cfg = _model_cfg(args, len(corpus.vocab))
    tcfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, eval_batch_size=args.eval_batch_size,
        epochs=args.epochs, seq_len=args.seq_len, clip=args.clip, seed=args.seed,
        log_interval=args.log_interval, data_fraction=args.data_fraction,
        prior=args.prior, prior_path=args.prior_path, prior_kl=args.prior_kl,
        save=args.save, rng_impl=args.rng_impl, dp_shards=args.dp_shards,
        profile_dir=args.profile, resume=args.resume,
    )
    mesh = None
    if args.tp_shards > 1 or args.multihost:
        from ..parallel.mesh import make_mesh

        # under --multihost an unset --dp-shards means "all global devices"
        dp = args.dp_shards if args.dp_shards > 1 else None
        if not args.multihost:
            dp = max(args.dp_shards, 1)
        mesh = make_mesh(dp=dp, tp=args.tp_shards)
    trainer = Trainer(cfg, tcfg, mesh=mesh)
    _, out = trainer.fit(corpus)
    print(json.dumps({"test_loss": out["test_loss"]}))
    return 0


def _scorer_mesh(args):
    """dp mesh for sharded rescoring (replaces the reference's nj=5 job
    array); each shard runs the full fused stack via shard_map."""
    if getattr(args, "dp_shards", 1) <= 1:
        return None
    from ..parallel.mesh import make_mesh

    return make_mesh(dp=args.dp_shards, tp=1)


def _inter_model(args, vocab_size: int):
    """Load the interpolation second model (reference: model_2 is built from
    the SAME args as the main model, compute_sentence_scores_bayes_jianwei.py
    :442-455). Here the checkpoint's JSON sidecar — written by Trainer.fit —
    takes precedence, so an independently-trained baseline with different
    geometry/uncertainty loads correctly; a sidecar-less checkpoint falls
    back to the reference's same-args behavior."""
    import dataclasses

    from ..core.checkpoint import load_checkpoint

    if not args.inter_path:
        raise SystemExit("--interpolation_flag requires --inter_path")
    params2, meta2 = load_checkpoint(args.inter_path)
    mc = (meta2 or {}).get("model_config")
    if isinstance(mc, dict):
        known = {f.name for f in dataclasses.fields(ModelConfig)}
        mc = {k: v for k, v in mc.items() if k in known}
        if mc.get("vocab_size", 0) and mc["vocab_size"] != vocab_size:
            raise SystemExit(
                f"--inter_path model was trained with vocab_size="
                f"{mc['vocab_size']}, but the vocabulary here has "
                f"{vocab_size} entries")
        mc["vocab_size"] = vocab_size
        cfg2 = ModelConfig(**mc)
    else:
        cfg2 = _model_cfg(args, vocab_size)
    return cfg2, params2


def cmd_score(args) -> int:
    """Score an n-best list with a trained model (the reference's
    compute_sentence_scores_* entry point)."""
    from ..core.checkpoint import load_checkpoint
    from ..data.vocab import Vocab
    from ..rescore.nbest import load_nbest, write_scores
    from ..rescore.scorer import BatchScorer

    vocab = Vocab.from_file(args.vocabulary)
    cfg = _model_cfg(args, len(vocab))
    params, _ = load_checkpoint(args.model_path)
    rcfg = RescoreConfig(
        carry_over=not args.no_carry_over, inter_flag=args.interpolation_flag,
        inter_alpha=args.inter_alpha, max_hyp_len=args.max_hyp_len,
        mc_samples=args.mc_samples,
        backward=args.backward or args.model_var == "back",
        splice_len=args.splice_len, xl_mems=args.model_var == "XL",
    )
    params2 = cfg2 = None
    if args.interpolation_flag:
        cfg2, params2 = _inter_model(args, len(vocab))
    scorer = BatchScorer(cfg, params, rcfg, cfg2, params2,
                         mesh=_scorer_mesh(args))
    nbest = load_nbest(args.nbest_list)
    context_map = None
    if args.context_file:
        # seg_wise context from a previous-decode file (dev scorer
        # `…copy.py`:101-120). Two formats: per-utterance "utt text…" lines
        # (every first field must be an n-best key), or a single global
        # context line applied to every utterance (the reference's format).
        with open(args.context_file, "r", encoding="utf-8") as f:
            lines = [ln.rstrip("\n") for ln in f if ln.strip()]
        per_utt = {}
        for ln in lines:
            head, _, rest = ln.partition(" ")
            per_utt[head] = rest
        unknown = [k for k in per_utt if k not in nbest]
        if not lines:
            context_map = None  # empty file = no context
        elif not unknown:
            context_map = {k: per_utt.get(k, "") for k in nbest}
        elif len(lines) == 1 and len(per_utt) == len(unknown) == 1:
            # single line whose first field is not an utterance id: the
            # reference's global-context format — one line spliced everywhere
            context_map = {k: lines[0] for k in nbest}
        else:
            # a per-utterance file with unrecognized ids must ERROR, not
            # silently fall back to splicing the first line (id included)
            # into every hypothesis
            print(f"context file: {len(unknown)} first fields are not "
                  f"n-best utterance ids (e.g. {unknown[:3]}); fix the ids "
                  "or use a single global-context line", file=sys.stderr)
            return 1
    if args.profile:
        from ..utils.profiling import trace

        with trace(args.profile):
            scored = scorer.score_nbest(nbest, vocab.word2idx,
                                        context_map=context_map)
    else:
        scored = scorer.score_nbest(nbest, vocab.word2idx,
                                    context_map=context_map)
    write_scores(scored, args.outfile)
    # dev-scorer OOV report (`…copy.py`:409 prints the total oov_num)
    print(f"oov tokens: {scorer.oov_stats['total']}")
    print(f"wrote {args.outfile}")
    return 0


def cmd_rescore(args) -> int:
    """Full lattice rescoring pipeline (replaces lmrescore_nbest_*.sh)."""
    from ..core.checkpoint import load_checkpoint
    from ..data.vocab import Vocab
    from ..rescore.pipeline import run_pipeline
    from ..rescore.scorer import BatchScorer

    vocab = Vocab.from_file(args.words)
    cfg = _model_cfg(args, len(vocab))
    params, _ = load_checkpoint(args.model_path)
    # Full dev-scorer configuration forwarded into the pipeline's scorer
    # stage, like the reference pipeline forwards interpolation flags
    # (lmrescore_nbest_pytorchnn_cuda.sh:197-219; run_nnlm_ami_tm.sh:133-134).
    rcfg = RescoreConfig(
        nbest=args.N, acwt=args.acwt, nn_weight=args.nn_weight,
        carry_over=not args.no_carry_over, min_lmwt=args.min_lmwt,
        max_lmwt=args.max_lmwt, inter_flag=args.interpolation_flag,
        inter_alpha=args.inter_alpha, mc_samples=args.mc_samples,
        backward=args.backward or args.model_var == "back",
        splice_len=args.splice_len, xl_mems=args.model_var == "XL",
        max_hyp_len=args.max_hyp_len,
    )
    params2 = cfg2 = None
    if args.interpolation_flag:
        cfg2, params2 = _inter_model(args, len(vocab))
    scorer = BatchScorer(cfg, params, rcfg, cfg2, params2,
                         mesh=_scorer_mesh(args))
    import contextlib

    prof = contextlib.nullcontext()
    if args.profile:
        from ..utils.profiling import trace

        prof = trace(args.profile)
    with prof:
        res = run_pipeline(
            args.lattices, args.words, scorer, vocab.word2idx, args.workdir,
            rcfg, arpa_lm=args.arpa, ref_text=args.ref, glm=args.glm,
            asclite_clean=args.asclite_clean, sanity_test=args.sanity_test,
        )
    print(json.dumps({
        "n_utts": res.n_utts, "n_hyps": res.n_hyps,
        "oov_tokens": res.oov_tokens,
        "wer_by_lmwt": res.wer_by_lmwt, "best_lmwt": res.best_lmwt,
        "best_wer": res.best_wer,
    }))
    return 0


def cmd_snr(args) -> int:
    from ..analysis.snr import snr_from_checkpoint

    cfg = None
    if args.L_bayes_pos:
        cfg = ModelConfig(vocab_size=1, nhid=args.nhid, l_bayes_pos=args.L_bayes_pos)
    print(json.dumps(snr_from_checkpoint(args.model_path, cfg), indent=2))
    return 0


def cmd_search(args) -> int:
    from ..data.corpus import Corpus
    from ..nas.search import SearchRunner

    corpus = Corpus(args.data)
    cfg = _model_cfg(args, len(corpus.vocab))
    tcfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        seq_len=args.seq_len, clip=args.clip, seed=args.seed,
    )
    runner = SearchRunner(cfg, tcfg, mode=args.search_mode, unrolled=args.unrolled,
                          arch_lr=args.arch_lr)
    res = runner.run(corpus)
    print(json.dumps({"arch_softmax": res.arch_softmax.tolist(),
                      "derived_choice": res.derived_choice.tolist()}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bayeslm", description=__doc__)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force the JAX backend (default: environment's)")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a language model")
    _add_model_args(t)
    t.add_argument("--data", required=True)
    t.add_argument("--lr", type=float, default=0.1)
    t.add_argument("--batch-size", type=int, default=32)
    t.add_argument("--eval-batch-size", type=int, default=20)
    t.add_argument("--epochs", type=int, default=32)
    t.add_argument("--seq_len", type=int, default=100)
    t.add_argument("--clip", type=float, default=1.0)
    t.add_argument("--seed", type=int, default=1111)
    t.add_argument("--log-interval", type=int, default=200)
    t.add_argument("--data-fraction", type=float, default=1.0,
                   help="reference --mark base-0.Xset ablations")
    t.add_argument("--prior", action="store_true")
    t.add_argument("--prior_path", default=None)
    t.add_argument("--prior_kl", action="store_true",
                   help="regularize posterior means toward the prior ckpt "
                        "(reference kl_divergence(prior) branch)")
    t.add_argument("--rng-impl", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="PRNG for dropout/sampling keys; rbg = TPU-native")
    t.add_argument("--dp-shards", type=int, default=1,
                   help="data-parallel shards over the device mesh")
    t.add_argument("--tp-shards", type=int, default=1,
                   help="tensor-parallel shards (vocab/FFN/gate sharding)")
    t.add_argument("--save", default="model.ckpt")
    t.add_argument("--resume", action="store_true",
                   help="continue an interrupted run from <save>.resume "
                        "(full state: params+momentum+schedule); the "
                        "reference's flag was wired out (train.py:92-93)")
    t.add_argument("--multihost", action="store_true",
                   help="join a jax.distributed multi-host job (coordinator "
                        "from JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID) before building the mesh")
    t.add_argument("--profile", default=None, metavar="DIR",
                   help="jax.profiler trace dir; traces the first epoch")
    t.set_defaults(fn=cmd_train)

    s = sub.add_parser("score", help="score an n-best list")
    _add_model_args(s)
    s.add_argument("--nbest-list", required=True)
    s.add_argument("--vocabulary", required=True)
    s.add_argument("--model-path", required=True)
    s.add_argument("--outfile", required=True)
    s.add_argument("--interpolation_flag", type=int, default=0)
    s.add_argument("--inter_path", default=None)
    s.add_argument("--inter_alpha", type=float, default=0.8)
    s.add_argument("--no-carry-over", action="store_true")
    s.add_argument("--max-hyp-len", type=int, default=128)
    s.add_argument("--mc-samples", type=int, default=0,
                   help="MC-average inference over K posterior draws")
    s.add_argument("--backward", action="store_true",
                   help="backward-LM scoring (reverse word order)")
    s.add_argument("--splice-len", type=int, default=0,
                   help="context-splice length (dev scorer --seg_wise)")
    s.add_argument("--model_var", default="none", choices=["none", "back", "XL"],
                   help="dev-scorer variants: back = backward LM, XL = "
                        "Transformer-XL cross-utterance memory")
    s.add_argument("--dp-shards", type=int, default=1,
                   help="shard hypothesis batches over a dp device mesh")
    s.add_argument("--profile", default=None, metavar="DIR",
                   help="jax.profiler trace dir around scoring")
    s.add_argument("--context-file", default=None,
                   help="previous-decode context text: per-utterance "
                        "'utt text…' lines or one global line "
                        "(dev scorer seg_wise file, copy.py:101-120)")
    s.set_defaults(fn=cmd_score)

    r = sub.add_parser("rescore", help="full lattice rescoring pipeline")
    _add_model_args(r)
    r.add_argument("--lattices", required=True)
    r.add_argument("--words", required=True)
    r.add_argument("--model-path", required=True)
    r.add_argument("--workdir", required=True)
    r.add_argument("--arpa", default=None)
    r.add_argument("--interpolation_flag", type=int, default=0,
                   help="1 = logit-level, 2 = score-level interpolation with a second model")
    r.add_argument("--inter_path", default=None)
    r.add_argument("--inter_alpha", type=float, default=0.8)
    r.add_argument("--mc-samples", type=int, default=0)
    r.add_argument("--backward", action="store_true")
    r.add_argument("--splice-len", type=int, default=0)
    r.add_argument("--model_var", default="none", choices=["none", "back", "XL"])
    r.add_argument("--max-hyp-len", type=int, default=128)
    r.add_argument("--profile", default=None, metavar="DIR",
                   help="jax.profiler trace dir around the pipeline")
    r.add_argument("--ref", default=None)
    r.add_argument("--N", type=int, default=20)
    r.add_argument("--acwt", type=float, default=0.1)
    r.add_argument("--nn-weight", type=float, default=1.0)
    r.add_argument("--no-carry-over", action="store_true")
    r.add_argument("--min-lmwt", type=int, default=7)
    r.add_argument("--max-lmwt", type=int, default=15)
    r.add_argument("--glm", default=None,
                   help="SCTK GLM filter rules applied to refs+hyps "
                        "(hubscr -g, score_asclite.sh:36)")
    r.add_argument("--asclite-clean", action="store_true",
                   help="drop hesitations/[noise]/<unk> from hyps "
                        "(score_asclite.sh:87-93)")
    r.add_argument("--dp-shards", type=int, default=1,
                   help="shard hypothesis batches over a dp device mesh")
    r.add_argument("--sanity-test", action="store_true",
                   help="reference --test true branch: rebuild lattices "
                        "without changing scores and verify the round trip "
                        "(lmrescore :176-184)")
    r.set_defaults(fn=cmd_rescore)

    n = sub.add_parser("snr", help="posterior SNR analysis (variance.py)")
    n.add_argument("--model-path", required=True)
    n.add_argument("--L_bayes_pos", type=int, default=0)
    n.add_argument("--nhid", type=int, default=1024)
    n.set_defaults(fn=cmd_snr)

    se = sub.add_parser("search", help="DARTS architecture search")
    _add_model_args(se)
    se.add_argument("--data", required=True)
    se.add_argument("--search-mode", default="bayes", choices=["bayes", "gauss"])
    se.add_argument("--unrolled", action="store_true")
    se.add_argument("--arch-lr", type=float, default=3e-4)
    se.add_argument("--lr", type=float, default=1.0)
    se.add_argument("--batch-size", type=int, default=16)
    se.add_argument("--epochs", type=int, default=3)
    se.add_argument("--seq_len", type=int, default=32)
    se.add_argument("--clip", type=float, default=1.0)
    se.add_argument("--seed", type=int, default=1111)
    se.set_defaults(fn=cmd_search)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        # Env vars cannot override an already-registered TPU plugin; the
        # config call is the reliable way to pick the backend.
        import jax

        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
