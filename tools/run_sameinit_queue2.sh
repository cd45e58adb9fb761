#!/usr/bin/env bash
# Second same-init torch queue (after tools/run_sameinit_variational.sh):
#   1. vtm_fixed  — V-Transformer twin via tools/torch_vtm_twin.py (the
#                   unmodified reference crashes; see that file's docstring)
#   2. tm_gauss   — extend the GP-TM twin 3 -> 8 epochs (torch-CPU is
#                   deterministic at fixed seed, so a fresh --epoch 8 run
#                   reproduces epochs 1-3 bit-for-bit and continues)
#   3. lstm_bayes3 — extend the Bayes-LSTM twin 8 -> 16 epochs (same logic)
# Sequential, nice'd: ONE host core.
set -u
REF=/root/reference/steps/pytorchnn
DATA=${DATA:-/root/repo/exp/corpus_mid}
OUT=exp/campaign
cd /root/repo

# wait for the variational campaign to release the core
if [ -f /tmp/sameinit_var.pid ]; then
  while kill -0 "$(cat /tmp/sameinit_var.pid)" 2>/dev/null; do sleep 30; done
fi

COMMON="--data $DATA --seq_len 100 --clip 1.0 --batch-size 32 --seed 1111 --dropout 0.2 --tied"

twin() {
  name=$1; epochs=$2; driver=$3; shift 3
  d="$OUT/torch_$name"
  mkdir -p "$d"
  [ -f "$d/DONE" ] && { echo "skip torch_$name"; return; }
  echo "=== torch_$name: start $(date) ==="
  (cd "$d" && PYTHONPATH=$REF nice -n 10 python "$driver" \
      $COMMON --epoch "$epochs" --save model.pt "$@" > train.log 2>&1)
  echo "$?" > "$d/DONE"
  echo "=== torch_$name: rc=$(cat $d/DONE) $(date) ==="
}

twin vtm_fixed 10 /root/repo/tools/torch_vtm_twin.py \
    --model Transformer --emsize 128 --nhid 512 --nlayers 2 --nhead 4 \
    --lr 0.1 --uncertainty Variational --T_v_pos 1

# extensions: remove the short run's DONE marker so the longer run replaces it
rm -f "$OUT/torch_tm_gauss/DONE"
twin tm_gauss 8 $REF/train.py \
    --model Transformer --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 \
    --lr 0.1 --uncertainty Gaussian --T_gauss_pos 3

# the LSTM twins' logs were lost to a VM reset (tables live in
# docs/CONVERGENCE.md); regenerate the evidence, extending bayes3 8 -> 16
twin lstm_bayes3 16 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty Bayesian --L_bayes_pos 3

# best-effort: regenerate the 32-epoch lstm_base twin evidence last
twin lstm_base 32 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty none

echo "QUEUE2 ALL DONE $(date)"
