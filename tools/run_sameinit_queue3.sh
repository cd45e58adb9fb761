#!/usr/bin/env bash
# Third same-init torch queue: rerun the V-Transformer twin with the
# three-patch driver (tools/torch_vtm_twin.py grew repair 3: the reference's
# kl_divergence computes the prior term before its own size-100 gate and
# crashes on the epoch's ragged 99-step window; see that file's docstring).
# Waits for queue2 (tools/run_sameinit_queue2.sh) to release the one core.
set -u
REF=/root/reference/steps/pytorchnn
DATA=${DATA:-/root/repo/exp/corpus_mid}
OUT=exp/campaign
cd /root/repo

# wait for queue2 to release the core: its PID is passed as $1 (falls back
# to the lstm_base DONE marker if no PID given)
Q2PID=${1:-}
if [ -n "$Q2PID" ]; then
  while kill -0 "$Q2PID" 2>/dev/null; do sleep 60; done
else
  while [ ! -f "$OUT/torch_lstm_base/DONE" ]; do sleep 60; done
fi

d="$OUT/torch_vtm_fixed"
# preserve the two-patch crash log cited by the driver docstring
[ -f "$d/train.log" ] && [ ! -f "$d/train.log.2patch" ] && \
    mv "$d/train.log" "$d/train.log.2patch"
rm -f "$d/DONE"
mkdir -p "$d"
echo "=== torch_vtm_fixed (3-patch): start $(date) ==="
(cd "$d" && PYTHONPATH=$REF nice -n 10 python /root/repo/tools/torch_vtm_twin.py \
    --data "$DATA" --seq_len 100 --clip 1.0 --batch-size 32 --seed 1111 \
    --dropout 0.2 --tied --epoch 10 --save model.pt \
    --model Transformer --emsize 128 --nhid 512 --nlayers 2 --nhead 4 \
    --lr 0.1 --uncertainty Variational --T_v_pos 1 > train.log 2>&1)
echo "$?" > "$d/DONE"
echo "=== torch_vtm_fixed (3-patch): rc=$(cat $d/DONE) $(date) ==="
echo "QUEUE3 ALL DONE $(date)"
