#!/usr/bin/env bash
# Same-init Variational twins (round 3: completes same-init evidence for the
# fourth uncertainty family — baseline/Bayes/GP are in docs/CONVERGENCE.md).
#
# Sequential on purpose: ONE host core, ONE TPU chip. Our side (TPU) runs
# first, then the reference's train.py twins (torch-CPU, same seed — it
# reconstructs the identical init internally, same construction order as
# tools/same_init_parity.py step 1).
set -u
REF=/root/reference/steps/pytorchnn
DATA=${DATA:-/root/repo/exp/corpus_mid}
OUT=exp/campaign
EPOCHS=${EPOCHS:-10}
cd /root/repo
mkdir -p "$OUT"

COMMON_TORCH="--data $DATA --seq_len 100 --clip 1.0 --batch-size 32 --epoch $EPOCHS --seed 1111 --dropout 0.2 --tied"

ours() {
  name=$1; shift
  [ -f "$OUT/ours_${name}_sameinit.DONE" ] && { echo "skip ours_$name"; return; }
  echo "=== ours_$name: start $(date) ==="
  python tools/same_init_parity.py --data "$DATA" --epochs "$EPOCHS" \
      --dropout 0.2 --workdir "$OUT/sameinit_$name" "$@" \
      > "$OUT/ours_${name}_sameinit.log" 2>&1
  echo "$?" > "$OUT/ours_${name}_sameinit.DONE"
  echo "=== ours_$name: rc=$(cat $OUT/ours_${name}_sameinit.DONE) $(date) ==="
}

torch_twin() {
  name=$1; shift
  d="$OUT/torch_$name"
  mkdir -p "$d"
  [ -f "$d/DONE" ] && { echo "skip torch_$name"; return; }
  echo "=== torch_$name: start $(date) ==="
  (cd "$d" && PYTHONPATH=$REF nice -n 10 python $REF/train.py \
      $COMMON_TORCH --save model.pt "$@" > train.log 2>&1)
  echo "$?" > "$d/DONE"
  echo "=== torch_$name: rc=$(cat $d/DONE) $(date) ==="
}

ours vtm   --model Transformer --emsize 128 --nhid 512 --nlayers 2 --nhead 4 \
           --lr 0.1 --uncertainty Variational --t_v_pos 1
ours vlstm --model LSTM --emsize 128 --nhid 128 --nlayers 2 \
           --lr 5 --uncertainty Variational --l_v_pos 11

torch_twin vtm   --model Transformer --emsize 128 --nhid 512 --nlayers 2 --nhead 4 \
                 --lr 0.1 --uncertainty Variational --T_v_pos 1
torch_twin vlstm --model LSTM --emsize 128 --nhid 128 --nlayers 2 \
                 --lr 5 --uncertainty Variational --L_v_pos 11

echo "ALL DONE $(date)"
