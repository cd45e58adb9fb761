#!/usr/bin/env bash
# Ours-side same-init LSTM runs (TPU): regenerate the evidence logs lost to
# a VM reset, at the torch twins' extended horizons (lstm_base 32 epochs,
# lstm_bayes3 16). The init is reconstructed deterministically from the
# reference's seed-1111 construction order (tools/same_init_parity.py), so
# these runs do not depend on the torch twins' completion.
# ONE TPU job at a time: run only when the chip is free.
set -u
cd /root/repo
OUT=exp/campaign
mkdir -p "$OUT"

echo "=== ours lstm_base sameinit: start $(date) ==="
python tools/same_init_parity.py --data exp/corpus_mid --epochs 32 \
    --model LSTM --uncertainty none --emsize 256 --nhid 256 \
    --dropout 0.2 --lr 5 --workdir /tmp/sameinit_lstm_base \
    > "$OUT/ours_lstm_base_sameinit.log" 2>&1
echo rc=$?

echo "=== ours lstm_bayes3 sameinit: start $(date) ==="
python tools/same_init_parity.py --data exp/corpus_mid --epochs 16 \
    --model LSTM --uncertainty Bayesian --l_bayes_pos 3 \
    --emsize 256 --nhid 256 --dropout 0.2 --lr 5 \
    --workdir /tmp/sameinit_lstm_bayes3 \
    > "$OUT/ours_lstm_bayes3_sameinit.log" 2>&1
echo rc=$?
echo "OURS LSTM SAMEINIT DONE $(date)"
