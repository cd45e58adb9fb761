#!/usr/bin/env bash
# Fifth same-init torch queue: restart after the 4th VM reset wiped the
# in-flight queue2/3/4 runs (exp/corpus_mid rebuilt deterministically by
# tools/build_doc_corpus.py first — same seed, same site-packages prose).
# Order mirrors the queue3/queue4 priority decision: the V-Transformer
# 3-patch rerun first (novel evidence), then the Bayes-LSTM 16-epoch
# extension, then the 32-epoch lstm_base regeneration (least novel: its
# table already lives in docs/CONVERGENCE.md).
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

twin lstm_bayes3 16 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty Bayesian --L_bayes_pos 3

twin lstm_base 32 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty none

echo "QUEUE5 ALL DONE $(date)"
