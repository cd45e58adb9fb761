"""Configuration dataclasses for the bayeslms_tpu framework.

The config surface mirrors the reference recipe flags (BayesLMs
`steps/pytorchnn/train.py:25-105` and `run_nnlm_ami_{lstm,tm}.sh`), expressed
as typed dataclasses instead of bash/argparse string plumbing:

- ``uncertainty``       -> --uncertainty {none,Bayesian,Gaussian,Variational}
- ``t_bayes_pos``       -> --T_bayes_pos {none,FFN,MHA,EMB}
- ``l_bayes_pos``       -> --L_bayes_pos 0-5 (gate row-slice; 5 = whole layer)
- ``t_gauss_pos``       -> --T_gauss_pos 0-4 (GPNN type; 4 = random-feature GPNN2)
- ``l_gauss_pos``       -> --L_gauss_pos 2-4 digit string (gate | gpnn type | ...)
- ``t_v_pos``           -> --T_v_pos 0-3 (variational layer placement)
- ``l_v_pos``           -> --L_v_pos 2-digit string (per-layer variational flag)

Everything here is hashable / static so model configs can be closed over by
``jax.jit`` without retriggering compilation on every step.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture + uncertainty-position configuration.

    Defaults follow the AMI recipes: LSTM 1024/1024 x2
    (run_nnlm_ami_lstm.sh:19-23) or Transformer 512/4096 x6
    (run_nnlm_ami_tm.sh:17-21).
    """

    # Architecture
    model: str = "LSTM"  # LSTM | GRU | RNN_TANH | RNN_RELU | Transformer
    vocab_size: int = 0
    emsize: int = 1024
    nhid: int = 1024
    nlayers: int = 2
    nhead: int = 8
    dropout: float = 0.2
    tied: bool = True

    # Uncertainty switches (reference flag surface)
    uncertainty: str = "none"  # none | Bayesian | Gaussian | Variational
    t_bayes_pos: str = "none"  # none | FFN | MHA | EMB
    l_bayes_pos: int = 0  # 0 none, 1-4 gate slice (i,f,g,o), 5 whole-layer KL
    t_gauss_pos: int = 3  # 0-3 GPNN type, 4 GPNN2, >4 none
    l_gauss_pos: str = "00"  # digit0 gate 1-7, digit1 gpnn type 0-4, len 2-4
    t_v_pos: int = 0  # 0 none, 1 layer0, 2 layer1, 3 layers 0+1
    l_v_pos: str = "00"  # per-layer variational flag, e.g. "11"

    # Orphaned reference variants, kept for full capability parity:
    # - l_gauss_legacy_pos 0-8 selects the older hand-rolled ``GaussLSTM``
    #   (model.py:1369-1606; GP unit substituted into layer-1 gates/cell/
    #   hidden/input paths; deterministic type-0 GPNN). -1 = off.
    # - l_v_legacy selects the whole-output-noise ``VLSTM``
    #   (model.py:2582-2733; trainable (32, H) posterior/prior tables,
    #   additive output noise during training). Requires batch_size == 32
    #   to sample noise exactly like the reference's broadcast.
    l_gauss_legacy_pos: int = -1
    l_v_legacy: bool = False

    # Whether GP layers actually draw weight/coef samples during training.
    # The reference GPNN ships with `self.sample = False` (model.py:1800) so
    # plain `train.py` training is deterministic-with-KL; the NAS loop toggles
    # the flag on. We expose it as an explicit config switch.
    gp_sample: bool = False

    # Numerics: params are kept in fp32 for optimizer parity; compute dtype
    # can be bf16 on TPU for MXU throughput.
    param_dtype: str = "float32"
    compute_dtype: str = "float32"

    # Variational transformer layers gate their noise/KL on this sequence
    # length (reference hardcodes 100: model.py:2756-2759, :2789).
    v_seq_len: int = 100

    @property
    def is_transformer(self) -> bool:
        return self.model == "Transformer"

    def validate(self) -> "ModelConfig":
        if self.model not in ("LSTM", "GRU", "RNN_TANH", "RNN_RELU", "Transformer"):
            raise ValueError(f"unknown model type {self.model!r}")
        if self.uncertainty not in ("none", "Bayesian", "Gaussian", "Variational"):
            raise ValueError(f"unknown uncertainty {self.uncertainty!r}")
        if self.t_bayes_pos not in ("none", "FFN", "MHA", "EMB"):
            raise ValueError(f"unknown t_bayes_pos {self.t_bayes_pos!r}")
        if not 0 <= self.l_bayes_pos <= 5:
            raise ValueError("l_bayes_pos must be in [0, 5]")
        if self.vocab_size <= 0:
            raise ValueError("vocab_size must be set (> 0)")
        return self


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop configuration (reference train.py:64-105, :464-512)."""

    lr: float = 0.1
    momentum: float = 0.9
    batch_size: int = 32
    eval_batch_size: int = 20
    epochs: int = 32
    seq_len: int = 100
    clip: float = 1.0
    seed: int = 1111
    log_interval: int = 200
    # Plateau scheduler: halve LR + reload best ckpt on non-improving epoch;
    # early-stop after `max_plateaus` plateaus (train.py:498-512).
    lr_decay: float = 0.5
    max_plateaus: int = 8
    # Data-fraction ablation (reference `--mark base-0.{5,25,1,05}set`,
    # train.py:151-165). 1.0 = full training set.
    data_fraction: float = 1.0
    # Prior / finetune-from-prior workflow (train.py:239-265).
    prior: bool = False
    prior_path: Optional[str] = None
    # Prior-mean KL regularization: regularize posterior means toward the
    # loaded prior checkpoint instead of N(0, I). The reference implements
    # this branch in kl_divergence(prior) (model.py:520-528 sum-reduced
    # weight-only for Bayes(2)LSTM; :1120-1122 mean-reduced for BayesLinear)
    # but never reaches it from its shipped call sites; here it is a config
    # switch (README step-3 finetune-with-prior semantics).
    prior_kl: bool = False
    save: str = "model.ckpt"
    # Full-state resume (params + momentum + schedule). The reference's
    # --resume flag existed but was wired out (train.py:92-93, :108-118).
    resume: bool = False
    # Parallelism: number of data-parallel shards (mesh 'dp' axis). The global
    # batch is sharded over this axis; 1 = single chip.
    dp_shards: int = 1
    # PRNG implementation for the training step keys (dropout masks + weight
    # sampling). 'rbg' uses the TPU-native hardware generator — measured 5.7
    # ms/step cheaper than threefry at the AMI Transformer config, where
    # dropout-mask generation was 28% of the step. Distributionally
    # equivalent; set 'threefry2x32' for jax-default key semantics.
    rng_impl: str = "rbg"
    # jax.profiler trace directory (SURVEY §5 tracing; the reference's probes
    # are commented-out wall clocks, train.py:310-311). When set, the FIRST
    # trained epoch runs under jax.profiler.trace into this dir (view with
    # TensorBoard/xprof).
    profile_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class RescoreConfig:
    """N-best rescoring configuration (lmrescore_nbest_pytorchnn_cuda.sh)."""

    nbest: int = 20
    acwt: float = 0.1
    nn_weight: float = 1.0  # `itpr` weight between NN score and n-gram score
    inter_flag: int = 0  # 0 none, 1 logit-level interp, 2 score-level interp
    inter_alpha: float = 0.8
    # LSTM cross-utterance hidden-state carry-over
    # (compute_sentence_scores_bayes_jianwei.py:261-274).
    carry_over: bool = True
    # Padded-batch scorer controls (TPU replacement of the per-hyp loop).
    max_hyp_len: int = 128
    batch_size: int = 64
    # Utterances per device call in carry-over mode: the serial utterance
    # chain runs as an on-device lax.scan per chunk, chunks dispatch
    # asynchronously (one host sync for the whole run), and the next
    # chunk's encode/build overlaps the previous chunk's device compute.
    # Smaller chunks pipeline better and adapt the time bucket to the
    # window, at the cost of one compiled shape per distinct (U, T).
    # Measured on v5e with the packed-time layout (chains as one packed
    # sequence): 3 -> 12.5k, 5 -> 18.1k, 10 -> 19.6k hyps/sec — dispatch
    # count dominates, so larger windows win.
    carry_chunk_utts: int = 10
    # WER sweep over LM-scale weights (local/score_asclite.sh:10-11).
    min_lmwt: int = 7
    max_lmwt: int = 15
    # Monte-Carlo-average inference: average predictive probabilities over K
    # stochastic forward passes (posterior samples) instead of scoring at the
    # posterior mean. 0 = mean scoring (reference eval default).
    mc_samples: int = 0
    # Backward-LM scoring (dev scorer `--model_var back`,
    # compute_sentence_scores_bayes_jianwei copy.py:176-217): reverse the
    # word order of every hypothesis before scoring.
    backward: bool = False
    # Cross-utterance context splice (dev scorer `--seg_wise`,
    # copy.py:101-120): prepend up to this many context tokens (from a
    # caller-provided context map) before each hypothesis; context positions
    # are masked out of the score.
    splice_len: int = 0
    # Transformer-XL cross-utterance memory (dev scorer `--model_var XL`,
    # copy.py:206-217): condition each utterance on segment memories built
    # from the previous utterance's first hypothesis, with exact position
    # offsets (== full-context scoring of [prev; hyp], tests/test_xl_mems.py).
    # Requires a Transformer whose encoder layers are all standard.
    xl_mems: bool = False


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def model_config_from_dict(d: dict) -> ModelConfig:
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    return ModelConfig(**{k: v for k, v in d.items() if k in fields})
