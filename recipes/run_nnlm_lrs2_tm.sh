#!/usr/bin/env bash
# LRS2 Transformer-LM recipe — mirror of the reference run_nnlm_ami_tm.sh
# (emb 512, FFN 4096, 6 layers, 8 heads, lr 0.1 / finetune 0.01,
# dropout 0.2, batch 32, seq_len 100, 32 epochs).
set -euo pipefail

stage=1
data=data/lrs2
expdir=exp/lrs2_tm
# hyperparameters overridable via --flags, like the reference's
# parse_options surface (run_nnlm_ami_tm.sh:17-21)
emsize=512
nhid=4096
nlayers=6
nhead=8
seq_len=100
batch_size=32
epochs=32
uncertainty=none          # none | Bayesian | Gaussian | Variational
T_bayes_pos=none          # none | FFN | MHA | EMB
T_gauss_pos=3
T_v_pos=0
lr=0.1
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
    --data "$data" --model Transformer --emsize "$emsize" --nhid "$nhid" --nlayers "$nlayers" \
    --nhead "$nhead" --dropout 0.2 --uncertainty "$uncertainty" \
    --T_bayes_pos "$T_bayes_pos" --T_gauss_pos "$T_gauss_pos" --T_v_pos "$T_v_pos" \
    --lr "$lr" --batch-size "$batch_size" --seq_len "$seq_len" --epochs "$epochs" --clip 1.0 \
    $prior_flags --save "$expdir/model.ckpt" | tee "$expdir/train.log"
fi

if [ "$stage" -le 2 ] && [ -n "$lattices" ]; then
  python -m bayeslms_tpu.cli.main ${platform:+--platform "$platform"} rescore \
    --lattices "$lattices" --words "$data/words.txt" \
    --model-path "$expdir/model.ckpt" --workdir "$expdir/rescore" \
    --model Transformer --emsize "$emsize" --nhid "$nhid" --nlayers "$nlayers" --nhead "$nhead" \
    --uncertainty "$uncertainty" --T_bayes_pos "$T_bayes_pos" \
    --T_gauss_pos "$T_gauss_pos" --T_v_pos "$T_v_pos" \
    --N 20 --acwt 0.1 --min-lmwt 7 --max-lmwt 15 \
    --interpolation_flag "$inter_flag" --inter_alpha "$inter_alpha" \
    ${inter_path:+--inter_path "$inter_path"} \
    ${arpa:+--arpa "$arpa"} ${ref:+--ref "$ref"} | tee "$expdir/rescore.log"
fi
