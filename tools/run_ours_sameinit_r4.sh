#!/usr/bin/env bash
# Round-4 ours-side same-init runs (real TPU chip, sequential — one TPU
# job at a time). Counterparts of tools/run_sameinit_queue6.sh's torch
# twins, plus the matmul-precision A/B from VERDICT.md item 2:
# lstm_base/lstm_bayes3 rerun with jax_default_matmul_precision=highest
# (true-f32 MXU passes) to test whether the LSTM families' early-epoch
# same-init drift is bf16-multiply accumulation (TPU DEFAULT precision
# does bf16 passes even on f32 inputs) or something else.
set -u
cd /root/repo
OUT=exp/campaign
mkdir -p "$OUT"

ours() {
  name=$1; shift
  [ -f "$OUT/ours_${name}_sameinit.DONE" ] && \
    [ "$(cat "$OUT/ours_${name}_sameinit.DONE")" = 0 ] && \
    { echo "skip ours_$name"; return; }
  echo "=== ours_$name: start $(date) ==="
  python tools/same_init_parity.py --data exp/corpus_mid \
      --workdir "/tmp/sameinit_$name" "$@" \
      > "$OUT/ours_${name}_sameinit.log" 2>&1
  echo "$?" > "$OUT/ours_${name}_sameinit.DONE"
  echo "=== ours_$name: rc=$(cat $OUT/ours_${name}_sameinit.DONE) $(date) ==="
}

ours tm_bayes --epochs 10 --dropout 0.2 \
    --model Transformer --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 \
    --lr 0.1 --uncertainty Bayesian --t_bayes_pos FFN

ours lstm_gp --epochs 6 --dropout 0.2 \
    --model LSTM --emsize 128 --nhid 128 --nlayers 2 \
    --lr 5 --uncertainty Gaussian --l_gauss_pos 13

ours lstm_base_f32 --epochs 10 --dropout 0.2 \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty none --matmul-precision highest

ours lstm_bayes3_f32 --epochs 8 --dropout 0.2 \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty Bayesian --l_bayes_pos 3 --matmul-precision highest

echo "OURS R4 SAMEINIT DONE $(date)"
