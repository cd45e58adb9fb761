#!/usr/bin/env bash
# Flagship-geometry convergence runs (VERDICT r2 item 1): the REAL recipe
# sizes — LSTM 1024/1024x2 (lr 5) and Transformer 512/4096x6/8h (lr 0.1) —
# on the 10.7M-token / 50k-vocab docstring corpus, full 32-epoch plateau
# schedule, on the real TPU chip. Sequential (one TPU job at a time).
set -u
DATA=${DATA:-/root/repo/exp/corpus_full}
OUT=${OUT:-/root/repo/exp/campaign}
COMMON="--data $DATA --seq_len 100 --clip 1.0 --batch-size 32 --epochs 32 --seed 1111 --dropout 0.2"

run() {
  name=$1; shift
  d="$OUT/flagship_$name"
  mkdir -p "$d"
  if [ -f "$d/DONE" ]; then echo "skip $name (done)"; return; fi
  echo "=== flagship_$name: start $(date) ==="
  (cd /root/repo && python -m bayeslms_tpu.cli.main train \
      $COMMON --save "$d/model.ckpt" "$@" > "$d/train.log" 2>&1)
  rc=$?
  echo "$rc" > "$d/DONE"
  echo "=== flagship_$name: rc=$rc end $(date) ==="
}

# wait for the mid-scale campaign to release the chip
while ! grep -q "OURS ALL DONE" /root/repo/exp/campaign/ours_driver.log 2>/dev/null; do
  sleep 30
done

run lstm   --model LSTM --emsize 1024 --nhid 1024 --nlayers 2 --lr 5 --uncertainty none
run tm     --model Transformer --emsize 512 --nhid 4096 --nlayers 6 --nhead 8 --lr 0.1 --uncertainty none
run lstm_bayes3 --model LSTM --emsize 1024 --nhid 1024 --nlayers 2 --lr 5 --uncertainty Bayesian --L_bayes_pos 3
run tm_bayes_ffn --model Transformer --emsize 512 --nhid 4096 --nlayers 6 --nhead 8 --lr 0.1 --uncertainty Bayesian --T_bayes_pos FFN
echo "FLAGSHIP ALL DONE $(date)"
