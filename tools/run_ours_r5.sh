#!/usr/bin/env bash
# Round-5 ours-side TPU lane (sequential — ONE chip, never two TPU jobs).
# Companions to tools/run_sameinit_queue9.sh (the torch lane):
#   1. tm_bayes same-init at 8 epochs WITH test eval — closes the
#      round-4 horizon mismatch (torch ran 8, ours 10, no comparable
#      test ratio).
#   2. lstm_gp same-init extended to 12 epochs (cell-strengthening).
#   3/4. lstm_bayes3 + tm_gauss FRESH runs stopped at 8 epochs — gives
#      the fresh-init table matched-horizon test ratios (round-4
#      VERDICT: 8-ep torch vs 32-ep ours ratios are horizon artifacts).
#   5. TM Bayes-FFN finetune twin (waits for the torch lane to publish
#      exp/campaign/prior_tm/model.pt).
set -u
cd /root/repo
DATA=/root/repo/exp/corpus_mid
OUT=exp/campaign

log() { echo "[ours-r5] $1 $(date)"; }

# 1. tm_bayes same-init, 8 epochs (test ratio vs torch's 8-epoch run)
if [ ! -f $OUT/ours_tm_bayes8_sameinit.DONE ]; then
  log "start tm_bayes8"
  python tools/same_init_parity.py --data $DATA --epochs 8 \
    --model Transformer --uncertainty Bayesian --t_bayes_pos FFN \
    --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 --lr 0.1 \
    --dropout 0.2 --workdir /tmp/r5_tmb8 \
    > $OUT/ours_tm_bayes8_sameinit.log 2>&1
  echo $? > $OUT/ours_tm_bayes8_sameinit.DONE
fi

# 2. lstm_gp same-init extension to 12 epochs
if [ ! -f $OUT/ours_lstm_gp12_sameinit.DONE ]; then
  log "start lstm_gp12"
  python tools/same_init_parity.py --data $DATA --epochs 12 \
    --uncertainty Gaussian --l_gauss_pos 13 \
    --emsize 128 --nhid 128 --lr 5 --dropout 0.2 \
    --workdir /tmp/r5_gp12 \
    > $OUT/ours_lstm_gp12_sameinit.log 2>&1
  echo $? > $OUT/ours_lstm_gp12_sameinit.DONE
fi

# 3/4. fresh-init matched-horizon reruns (seed 1111, first 8 epochs of
# the 32-epoch campaign runs, now with a test eval at this horizon)
if [ ! -f $OUT/ours_lstm_bayes3_e8/DONE ]; then
  log "start lstm_bayes3_e8"
  mkdir -p $OUT/ours_lstm_bayes3_e8
  python -m bayeslms_tpu.cli.main train --data $DATA --seq_len 100 \
    --clip 1.0 --batch-size 32 --epochs 8 --seed 1111 --dropout 0.2 \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 --lr 5 \
    --uncertainty Bayesian --L_bayes_pos 3 \
    --save $OUT/ours_lstm_bayes3_e8/model.ckpt \
    > $OUT/ours_lstm_bayes3_e8/train.log 2>&1
  echo $? > $OUT/ours_lstm_bayes3_e8/DONE
fi
if [ ! -f $OUT/ours_tm_gauss_e8/DONE ]; then
  log "start tm_gauss_e8"
  mkdir -p $OUT/ours_tm_gauss_e8
  python -m bayeslms_tpu.cli.main train --data $DATA --seq_len 100 \
    --clip 1.0 --batch-size 32 --epochs 8 --seed 1111 --dropout 0.2 \
    --model Transformer --emsize 256 --nhid 1024 --nlayers 4 --nhead 4 \
    --lr 0.1 --uncertainty Gaussian --T_gauss_pos 3 \
    --save $OUT/ours_tm_gauss_e8/model.ckpt \
    > $OUT/ours_tm_gauss_e8/train.log 2>&1
  echo $? > $OUT/ours_tm_gauss_e8/DONE
fi

# 5. TM finetune twin — wait (up to 4h) for the torch lane's prior
log "waiting for prior_tm"
for i in $(seq 1 240); do
  [ -f $OUT/prior_tm/model.pt ] && break
  sleep 60
done
if [ -f $OUT/prior_tm/model.pt ] && [ ! -f $OUT/ours_tm_bayesft_sameinit.DONE ]; then
  log "start tm_bayesft"
  python tools/same_init_parity.py --data $DATA --epochs 8 \
    --model Transformer --uncertainty Bayesian --t_bayes_pos FFN \
    --emsize 128 --nhid 512 --nlayers 2 --nhead 4 --lr 0.01 \
    --dropout 0.2 --ref-prior-path $OUT/prior_tm \
    --workdir /tmp/r5_tmft \
    > $OUT/ours_tm_bayesft_sameinit.log 2>&1
  echo $? > $OUT/ours_tm_bayesft_sameinit.DONE
fi
log "OURS R5 LANE DONE"
