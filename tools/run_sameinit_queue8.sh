#!/usr/bin/env bash
# Quick trained baseline twin (torch RNNModel 256/256x2, 6 epochs on
# exp/corpus_mid): provides the trained --ckpt2 baseline for the WER
# parity harness's interpolated config (VERDICT r3 item 3). Waits for
# queue7 (NAS twin) so at most two torch jobs share the core.
set -u
REF=/root/reference/steps/pytorchnn
DATA=${DATA:-/root/repo/exp/corpus_mid}
OUT=exp/campaign
cd /root/repo
while [ ! -f "$OUT/torch_nas_bayeslstm/DONE" ]; do sleep 60; done
d="$OUT/torch_lstm_base_quick"
mkdir -p "$d"
if [ -f "$d/DONE" ] && [ "$(cat "$d/DONE")" = 0 ]; then
  echo "skip torch_lstm_base_quick"; exit 0
fi
rm -f "$d/DONE"
[ -f "$d/train.log" ] && mv "$d/train.log" "$d/train.log.prev"
echo "=== torch_lstm_base_quick: start $(date) ==="
(cd "$d" && PYTHONPATH=$REF nice -n 10 python $REF/train.py \
    --data "$DATA" --seq_len 100 --clip 1.0 --batch-size 32 --seed 1111 \
    --dropout 0.2 --tied --epochs 6 --save model.pt \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty none > train.log 2>&1)
echo "$?" > "$d/DONE"
echo "=== torch_lstm_base_quick: rc=$(cat $d/DONE) $(date) ==="
