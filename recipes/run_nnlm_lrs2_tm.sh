#!/usr/bin/env bash
# LRS2 Transformer-LM recipe — mirror of the reference run_nnlm_ami_tm.sh
# (emb 512, FFN 4096, 6 layers, 8 heads, lr 0.1 / finetune 0.01,
# dropout 0.2, batch 32, seq_len 100, 32 epochs).
set -euo pipefail

stage=1
data=data/lrs2
expdir=exp/lrs2_tm
uncertainty=none          # none | Bayesian | Gaussian | Variational
T_bayes_pos=none          # none | FFN | MHA | EMB
T_gauss_pos=3
T_v_pos=0
lr=0.1
prior_flags=""
lattices=""
arpa=""
ref=""

. "$(dirname "$0")/parse_options.sh" || true

mkdir -p "$expdir"

if [ "$stage" -le 1 ]; then
  python -m bayeslms_tpu.cli.main train \
    --data "$data" --model Transformer --emsize 512 --nhid 4096 --nlayers 6 \
    --nhead 8 --dropout 0.2 --uncertainty "$uncertainty" \
    --T_bayes_pos "$T_bayes_pos" --T_gauss_pos "$T_gauss_pos" --T_v_pos "$T_v_pos" \
    --lr "$lr" --batch-size 32 --seq_len 100 --epochs 32 --clip 1.0 \
    $prior_flags --save "$expdir/model.ckpt" | tee "$expdir/train.log"
fi

if [ "$stage" -le 2 ] && [ -n "$lattices" ]; then
  python -m bayeslms_tpu.cli.main rescore \
    --lattices "$lattices" --words "$data/words.txt" \
    --model-path "$expdir/model.ckpt" --workdir "$expdir/rescore" \
    --model Transformer --emsize 512 --nhid 4096 --nlayers 6 --nhead 8 \
    --uncertainty "$uncertainty" --T_bayes_pos "$T_bayes_pos" \
    --T_gauss_pos "$T_gauss_pos" --T_v_pos "$T_v_pos" \
    --N 20 --acwt 0.1 --min-lmwt 7 --max-lmwt 15 \
    ${arpa:+--arpa "$arpa"} ${ref:+--ref "$ref"} | tee "$expdir/rescore.log"
fi
