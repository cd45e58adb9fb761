#!/usr/bin/env bash
# Torch-CPU side of the convergence campaign (VERDICT r2 item 1).
#
# Runs the REFERENCE's own train.py (/root/reference/steps/pytorchnn/train.py)
# sequentially over the A/B configs at the mid-scale geometry, writing each
# run's stdout to exp/campaign/torch_<name>/train.log. Sequential because the
# box has ONE CPU core; nice'd so interactive work stays responsive.
#
# Reference invocation mirrored from /root/reference/run_nnlm_ami_lstm.sh:84-111
# (minus --cuda; the reference trains fine on CPU when cuda is absent).
set -u
REF=/root/reference/steps/pytorchnn
DATA=${DATA:-/root/repo/exp/corpus_mid}
OUT=${OUT:-exp/campaign}
COMMON="--data $DATA --seq_len 100 --clip 1.0 --batch-size 32 --epoch 32 --seed 1111 --dropout 0.2 --tied"

run() {
  name=$1; shift
  d="$OUT/torch_$name"
  mkdir -p "$d"
  if [ -f "$d/DONE" ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: start $(date) ==="
  (cd "$d" && PYTHONPATH=$REF nice -n 10 python $REF/train.py \
      $COMMON --save model.pt "$@" > train.log 2>&1)
  rc=$?
  echo "$rc" > "$d/DONE"
  echo "=== $name: rc=$rc end $(date) ==="
}

cd /root/repo
run lstm_base   --model LSTM --emsize 256 --nhid 256 --nlayers 2 --lr 5 --uncertainty none
run lstm_bayes3 --model LSTM --emsize 256 --nhid 256 --nlayers 2 --lr 5 --uncertainty Bayesian --L_bayes_pos 3
run tm_base     --model Transformer --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 --lr 0.1 --uncertainty none
run tm_gauss    --model Transformer --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 --lr 0.1 --uncertainty Gaussian --T_gauss_pos 3
echo "ALL DONE $(date)"
