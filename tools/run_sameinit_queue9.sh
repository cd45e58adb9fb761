#!/usr/bin/env bash
# Round-5 torch twin queue. Priorities from VERDICT.md (round 4):
#   1. Finetune twins — the pretrain->prior->finetune workflow
#      (README.md:43-117, train.py:239-265) is the last reference
#      training regime with no cross-framework dynamics evidence.
#      LSTM: Bayes pos-3 finetune at lr 0.1 from the converged
#      nn.LSTM baseline (tools/make_prior_ckpt.py remap).
#      TM: pretrain the self-built standard TM (T_bayes_pos none,
#      compact 128/512x2 geometry), then Bayes-FFN finetune at lr 0.01.
#   2. Dropout-stream noise floors for the deterministic families
#      (lstm_base, lstm_gp) — reseed after init, dropout is the only
#      training-time draw.
#   3. lstm_gp extension to 12 epochs (round-4 cell was 6 epochs and
#      trending; the 12-epoch floor above is its yardstick).
#   4. (stretch) regenerate the two VM-reset-lost logs: vlstm 10ep,
#      lstm_base 32ep.
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
  if [ -f "$d/DONE" ]; then
    if [ "$(cat "$d/DONE")" = 0 ]; then
      echo "skip torch_$name (DONE rc=0)"; return
    else
      echo "torch_$name: previous DONE rc=$(cat "$d/DONE") — retrying"
      rm -f "$d/DONE"
    fi
  fi
  [ -f "$d/train.log" ] && mv "$d/train.log" "$d/train.log.prev"
  echo "=== torch_$name: start $(date) ==="
  (cd "$d" && PYTHONPATH=$REF nice -n 10 python "$driver" \
      $COMMON --epochs "$epochs" --save model.pt "$@" > train.log 2>&1)
  echo "$?" > "$d/DONE"
  echo "=== torch_$name: rc=$(cat $d/DONE) $(date) ==="
}

# 1a. LSTM Bayes pos-3 finetune from the converged baseline prior
twin lstm_bayes3_ft 10 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 0.1 --uncertainty Bayesian --L_bayes_pos 3 \
    --prior True --prior_path /root/repo/exp/campaign/prior_lstm

# 1b-i. TM prior pretrain: self-built standard TM (paper step 2)
twin tm_small_prior 6 $REF/train.py \
    --model Transformer --emsize 128 --nhid 512 --nlayers 2 --nhead 4 \
    --lr 0.1 --uncertainty Bayesian --T_bayes_pos none

# publish it as the TM prior dir (both sides load this file)
if [ "$(cat $OUT/torch_tm_small_prior/DONE 2>/dev/null)" = 0 ] \
   && [ ! -f $OUT/prior_tm/model.pt ]; then
  mkdir -p $OUT/prior_tm
  cp $OUT/torch_tm_small_prior/model.pt $OUT/prior_tm/model.pt
fi

# 1b-ii. TM Bayes-FFN finetune at the ship finetune LR
twin tm_bayesft 8 $REF/train.py \
    --model Transformer --emsize 128 --nhid 512 --nlayers 2 --nhead 4 \
    --lr 0.01 --uncertainty Bayesian --T_bayes_pos FFN \
    --prior True --prior_path /root/repo/exp/campaign/prior_tm

# 2a. lstm_base dropout-stream noise floor (reseed after init)
twin lstm_base_nf2222 8 /root/repo/tools/torch_noisefloor_twin.py \
    --reseed 2222 \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty none

# 3. lstm_gp 12-epoch extension (deterministic rerun covers ep 1-6)
twin lstm_gp12 12 $REF/train.py \
    --model LSTM --emsize 128 --nhid 128 --nlayers 2 \
    --lr 5 --uncertainty Gaussian --L_gauss_pos 13

# 2b. lstm_gp dropout-stream noise floor at the extended horizon
twin lstm_gp_nf2222 12 /root/repo/tools/torch_noisefloor_twin.py \
    --reseed 2222 \
    --model LSTM --emsize 128 --nhid 128 --nlayers 2 \
    --lr 5 --uncertainty Gaussian --L_gauss_pos 13

# 4. stretch: regenerate the VM-reset-lost logs
twin vlstm 10 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty Variational --L_v_pos 11

twin lstm_base32 32 $REF/train.py \
    --model LSTM --emsize 256 --nhid 256 --nlayers 2 \
    --lr 5 --uncertainty none

echo "QUEUE9 ALL DONE $(date)"
