#!/usr/bin/env bash
# NAS same-init search twin, torch side (VERDICT r3 missing #4).
# Runs CONCURRENTLY with queue6 (both nice'd; they share the one core).
# Config mirrors tools/nas_sameinit_twin.py: Bayes-LSTM supernet, 64/64x2,
# seq 50, clip 0.25 (the search script's default), lr 5, 3 epochs on the
# deterministic exp/corpus_nas slice (~280k train tokens) — search
# DYNAMICS parity is scale-independent; the torch python per-timestep
# supernet loop makes bigger geometries prohibitive on this host.
set -u
REF=/root/reference/steps/pytorchnn
DATA=${DATA:-/root/repo/exp/corpus_nas}
OUT=exp/campaign
cd /root/repo
d="$OUT/torch_nas_bayeslstm"
mkdir -p "$d"
if [ -f "$d/DONE" ] && [ "$(cat "$d/DONE")" = 0 ]; then
  echo "skip torch_nas_bayeslstm"; exit 0
fi
rm -f "$d/DONE"
[ -f "$d/train.log" ] && mv "$d/train.log" "$d/train.log.prev"
echo "=== torch_nas_bayeslstm: start $(date) ==="
(cd "$d" && PYTHONPATH=$REF nice -n 10 python $REF/train_search_bayes.py \
    --data "$DATA" --model LSTM --uncertainty Bayesian --L_bayes_pos 1 \
    --emsize 64 --nhid 64 --nlayers 2 --lr 5 --batch-size 32 --seq_len 50 \
    --clip 0.25 --dropout 0.2 --tied --epochs 3 --seed 1111 \
    --save model.pt > train.log 2>&1)
echo "$?" > "$d/DONE"
echo "=== torch_nas_bayeslstm: rc=$(cat $d/DONE) $(date) ==="
