#!/usr/bin/env bash
# Round-4 torch twin queue. Priorities from VERDICT.md (round 3):
#   1. Bayes-Transformer same-init twin (the last missing family x arch
#      cell with a planned run; paper's headline TM config, FFN pos).
#   2. Noise-floor run: train.py with IDENTICAL init but training RNG
#      reseeded (tools/torch_noisefloor_twin.py) — measures the
#      reference's own torch-vs-torch seed spread for lstm_bayes3,
#      the yardstick for every stochastic-family deviation claim.
#   3. GP-LSTM same-init twin (remaining open cell; python step loop on
#      the torch side, so smallest geometry).
#   4. lstm_bayes3 16-epoch extension (queue5 carryover).
#   5. lstm_base 32-epoch regeneration (least novel).
# ADVICE.md (round 3) fixes applied: DONE is only honored when it
# recorded rc=0 and is not a placeholder; an existing train.log is
# preserved as train.log.prev; --epochs is spelled out in full.
# Sequential, nice'd: ONE host core; foreground jobs take precedence.
set -u
REF=/root/reference/steps/pytorchnn
DATA=${DATA:-/root/repo/exp/corpus_mid}
OUT=exp/campaign
cd /root/repo

COMMON="--data $DATA --seq_len 100 --clip 1.0 --batch-size 32 --seed 1111 --dropout 0.2 --tied"

twin() {
  name=$1; epochs=$2; driver=$3; shift 3
  d="$OUT/torch_$name"
  mkdir -p "$d"
  if [ -f "$d/DONE" ]; then
    if grep -q placeholder "$d/DONE" 2>/dev/null; then
      rm -f "$d/DONE"           # queue2's placeholder, not a real run
    elif [ "$(cat "$d/DONE")" = 0 ]; then
      echo "skip torch_$name (DONE rc=0)"; return
    else
      echo "torch_$name: previous DONE rc=$(cat "$d/DONE") — retrying"
      rm -f "$d/DONE"
    fi
  fi
  [ -f "$d/train.log" ] && mv "$d/train.log" "$d/train.log.prev"
  echo "=== torch_$name: start $(date) ==="
  (cd "$d" && PYTHONPATH=$REF nice -n 10 python "$driver" \
      $COMMON --epochs "$epochs" --save model.pt "$@" > train.log 2>&1)
  echo "$?" > "$d/DONE"
  echo "=== torch_$name: rc=$(cat $d/DONE) $(date) ==="
}

twin tm_bayes 8 $REF/train.py \
    --model Transformer --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 \
    --lr 0.1 --uncertainty Bayesian --T_bayes_pos FFN

twin lstm_bayes3_nf2222 8 /root/repo/tools/torch_noisefloor_twin.py \
    --reseed 2222 \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty Bayesian --L_bayes_pos 3

twin lstm_gp 6 $REF/train.py \
    --model LSTM --emsize 128 --nhid 128 --nlayers 2 \
    --lr 5 --uncertainty Gaussian --L_gauss_pos 13

twin lstm_bayes3 16 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty Bayesian --L_bayes_pos 3

twin lstm_base 32 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty none

echo "QUEUE6 ALL DONE $(date)"
