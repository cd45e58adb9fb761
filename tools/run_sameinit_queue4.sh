#!/usr/bin/env bash
# Fourth queue: regenerate the 32-epoch lstm_base twin evidence LAST.
# (Its slot in queue2 was deliberately skipped via a placeholder DONE so
# the more valuable V-Transformer rerun in queue3 gets the core first.)
# Waits for queue3 (PID as $1) to exit.
set -u
REF=/root/reference/steps/pytorchnn
DATA=${DATA:-/root/repo/exp/corpus_mid}
OUT=exp/campaign
cd /root/repo

Q3PID=${1:-}
if [ -n "$Q3PID" ]; then
  while kill -0 "$Q3PID" 2>/dev/null; do sleep 60; done
fi

d="$OUT/torch_lstm_base"
if grep -q placeholder "$d/DONE" 2>/dev/null; then rm -f "$d/DONE"; fi
[ -f "$d/DONE" ] && { echo "skip torch_lstm_base (real DONE)"; exit 0; }
mkdir -p "$d"
echo "=== torch_lstm_base: start $(date) ==="
(cd "$d" && PYTHONPATH=$REF nice -n 10 python $REF/train.py \
    --data "$DATA" --seq_len 100 --clip 1.0 --batch-size 32 --seed 1111 \
    --dropout 0.2 --tied --epoch 32 --save model.pt \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty none > train.log 2>&1)
echo "$?" > "$d/DONE"
echo "=== torch_lstm_base: rc=$(cat $d/DONE) $(date) ==="
echo "QUEUE4 ALL DONE $(date)"
