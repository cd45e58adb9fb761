#!/usr/bin/env bash
# Our-framework side of the convergence campaign (VERDICT r2 item 1):
# the same four A/B configs as tools/run_torch_campaign.sh, trained on the
# real TPU chip through the full plateau schedule. Sequential — never run
# two TPU jobs concurrently (tunnel contention corrupts timings).
set -u
DATA=${DATA:-/root/repo/exp/corpus_mid}
OUT=${OUT:-/root/repo/exp/campaign}
COMMON="--data $DATA --seq_len 100 --clip 1.0 --batch-size 32 --epochs 32 --seed 1111 --dropout 0.2"

run() {
  name=$1; shift
  d="$OUT/ours_$name"
  mkdir -p "$d"
  if [ -f "$d/DONE" ]; then echo "skip $name (done)"; return; fi
  echo "=== ours_$name: start $(date) ==="
  (cd /root/repo && python -m bayeslms_tpu.cli.main train \
      $COMMON --save "$d/model.ckpt" "$@" > "$d/train.log" 2>&1)
  rc=$?
  echo "$rc" > "$d/DONE"
  echo "=== ours_$name: rc=$rc end $(date) ==="
}

run lstm_base   --model LSTM --emsize 256 --nhid 256 --nlayers 2 --lr 5 --uncertainty none
run lstm_bayes3 --model LSTM --emsize 256 --nhid 256 --nlayers 2 --lr 5 --uncertainty Bayesian --L_bayes_pos 3
run tm_base     --model Transformer --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 --lr 0.1 --uncertainty none
run tm_gauss    --model Transformer --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 --lr 0.1 --uncertainty Gaussian --T_gauss_pos 3
echo "OURS ALL DONE $(date)"
