#!/usr/bin/env bash
# AMI LSTM-LM recipe — mirror of the reference run_nnlm_ami_lstm.sh
# (stage <=1 train, stage <=2 rescore; same hyperparameters:
# emb 1024, hid 1024, 2 layers, lr 5 / finetune 0.1, dropout 0.2,
# batch 32, seq_len 100, 32 epochs; N=20, acwt 0.1, lmwt sweep 7-15).
#
# Data layout expected under $data: words.txt train.txt valid.txt test.txt
# Lattices: text-format word lattices (see tools/src/lattice.hpp).
set -euo pipefail

stage=1
data=data/ami
expdir=exp/ami_lstm
# hyperparameters overridable via --flags, like the reference's
# parse_options surface (run_nnlm_ami_lstm.sh:19-24)
emsize=1024
nhid=1024
nlayers=2
seq_len=100
batch_size=32
epochs=32
uncertainty=none          # none | Bayesian | Gaussian | Variational
L_bayes_pos=0
L_gauss_pos=00
L_v_pos=00
lr=5
prior_flags=""
platform=""       # e.g. cpu for smoke runs off-TPU
# interpolated rescoring with a second (baseline) model, forwarded into the
# scorer stage like the reference pipeline (run_nnlm_*_*.sh:133-134 ->
# lmrescore_nbest_pytorchnn_cuda.sh:217-218)
inter_flag=0      # 1 = logit-level, 2 = score-level
inter_alpha=0.8
inter_path=""     # checkpoint of the interpolation model
lattices=""
arpa=""
ref=""

. "$(dirname "$0")/parse_options.sh" || true

mkdir -p "$expdir"

if [ "$stage" -le 1 ]; then
  python -m bayeslms_tpu.cli.main ${platform:+--platform "$platform"} train \
    --data "$data" --model LSTM --emsize "$emsize" --nhid "$nhid" --nlayers "$nlayers" \
    --dropout 0.2 --uncertainty "$uncertainty" --L_bayes_pos "$L_bayes_pos" \
    --L_gauss_pos "$L_gauss_pos" --L_v_pos "$L_v_pos" \
    --lr "$lr" --batch-size "$batch_size" --seq_len "$seq_len" --epochs "$epochs" --clip 1.0 \
    $prior_flags --save "$expdir/model.ckpt" | tee "$expdir/train.log"
fi

if [ "$stage" -le 2 ] && [ -n "$lattices" ]; then
  python -m bayeslms_tpu.cli.main ${platform:+--platform "$platform"} rescore \
    --lattices "$lattices" --words "$data/words.txt" \
    --model-path "$expdir/model.ckpt" --workdir "$expdir/rescore" \
    --model LSTM --emsize "$emsize" --nhid "$nhid" --nlayers "$nlayers" \
    --uncertainty "$uncertainty" --L_bayes_pos "$L_bayes_pos" \
    --N 20 --acwt 0.1 --min-lmwt 7 --max-lmwt 15 \
    --interpolation_flag "$inter_flag" --inter_alpha "$inter_alpha" \
    ${inter_path:+--inter_path "$inter_path"} \
    ${arpa:+--arpa "$arpa"} ${ref:+--ref "$ref"} | tee "$expdir/rescore.log"
fi
